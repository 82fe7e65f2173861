package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Snapshot-log (de)serialization via Jackson (ships with Spark).
  * Hand-mapped tree model — no reflection modules, stable field layout.
  */
object Json {
  private val mapper = new ObjectMapper()

  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode = mapper.createArrayNode()
  def parse(s: String): JsonNode = mapper.readTree(s)
  // COMPACT on the commit path: pretty-printing inflated every metadata/
  // manifest write ~2×, and the metadata file is re-serialized in full on
  // EVERY commit — at 1000 retained snapshots the indentation alone was a
  // measurable slice of per-commit latency (commit-curve bench, round 8).
  def write(n: JsonNode): String = mapper.writeValueAsString(n)

  def fileToNode(f: DataFileMeta): ObjectNode = {
    val n = obj()
    n.put("path", f.path)
    n.put("sizeBytes", f.sizeBytes)
    n.put("rowCount", f.rowCount)
    n.put("partitionValue", f.partitionValue)
    n.put("format", f.format)
    if (f.seq != 0L) n.put("seq", f.seq)
    if (f.schemaId != 0) n.put("schemaId", f.schemaId)
    if (f.specId != 0) n.put("specId", f.specId)
    val st = n.putObject("stats")
    f.stats.foreach { case (c, s) =>
      val cs = st.putObject(c)
      s.longMin.foreach(cs.put("min", _))
      s.longMax.foreach(cs.put("max", _))
      s.strMin.foreach(cs.put("strMin", _))
      s.strMax.foreach(cs.put("strMax", _))
      s.nullCount.foreach(cs.put("nulls", _))
      s.valueCount.foreach(cs.put("values", _))
    }
    n
  }

  def nodeToFile(n: JsonNode): DataFileMeta = {
    val stats = Option(n.get("stats")).map { st =>
      st.properties().asScala.map { e =>
        val v = e.getValue
        def optLong(k: String) = Option(v.get(k)).map(_.asLong)
        def optStr(k: String) = Option(v.get(k)).map(_.asText)
        e.getKey -> ColStats(optLong("min"), optLong("max"),
          optStr("strMin"), optStr("strMax"), optLong("nulls"), optLong("values"))
      }.toMap
    }.getOrElse(Map.empty[String, ColStats])
    DataFileMeta(
      path = n.get("path").asText,
      sizeBytes = n.get("sizeBytes").asLong,
      rowCount = n.get("rowCount").asLong,
      partitionValue = n.get("partitionValue").asLong,
      format = Option(n.get("format")).map(_.asText).getOrElse("parquet"),
      stats = stats,
      seq = Option(n.get("seq")).map(_.asLong).getOrElse(0L),
      schemaId = Option(n.get("schemaId")).map(_.asInt).getOrElse(0),
      specId = Option(n.get("specId")).map(_.asInt).getOrElse(0))
  }

  def manifestToJson(files: Seq[DataFileMeta]): String = {
    val root = obj()
    val a = root.putArray("files")
    files.foreach(f => a.add(fileToNode(f)))
    write(root)
  }

  def manifestFromJson(s: String): Seq[DataFileMeta] =
    parse(s).get("files").elements().asScala.map(nodeToFile).toSeq

  def deleteManifestToJson(files: Seq[DeleteFileMeta]): String = {
    val root = obj()
    val a = root.putArray("deleteFiles")
    files.foreach { f =>
      val n = a.addObject()
      n.put("path", f.path)
      n.put("sizeBytes", f.sizeBytes)
      n.put("rowCount", f.rowCount)
      n.put("minDataPath", f.minDataPath)
      n.put("maxDataPath", f.maxDataPath)
      if (f.dataPaths.nonEmpty) {
        val dp = n.putArray("dataPaths")
        f.dataPaths.foreach(dp.add)
      }
      if (f.kind != DeleteFileMeta.KindPos) n.put("kind", f.kind)
      if (f.eqColumns.nonEmpty) {
        val ec = n.putArray("eqColumns")
        f.eqColumns.foreach(ec.add)
      }
      if (f.seq != 0L) n.put("seq", f.seq)
    }
    write(root)
  }

  def deleteManifestFromJson(s: String): Seq[DeleteFileMeta] =
    parse(s).get("deleteFiles").elements().asScala.map { n =>
      DeleteFileMeta(
        path = n.get("path").asText,
        sizeBytes = n.get("sizeBytes").asLong,
        rowCount = n.get("rowCount").asLong,
        minDataPath = n.get("minDataPath").asText,
        maxDataPath = n.get("maxDataPath").asText,
        dataPaths = Option(n.get("dataPaths"))
          .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil),
        kind = Option(n.get("kind")).map(_.asText)
          .getOrElse(DeleteFileMeta.KindPos),
        eqColumns = Option(n.get("eqColumns"))
          .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil),
        seq = Option(n.get("seq")).map(_.asLong).getOrElse(0L))
    }.toSeq

  /** Delta-encode one snapshot list against its parent's. Emitted only
    * when replaying (parent minus removed, plus added) reproduces the
    * child EXACTLY and the delta is strictly smaller than the full list —
    * anything else (reorders, missing parent, full rewrites) falls back
    * to the inline form, so correctness never depends on the encoding.
    */
  private def putListDelta(n: ObjectNode, cur: Seq[String],
      parent: Option[(Long, Seq[String])], fullKey: String, baseKey: String,
      addKey: String, remKey: String): Unit = {
    val asDelta = parent.flatMap { case (pid, p) =>
      // fast path: child extends parent (every fast-append commit). The
      // prefix check compares mostly reference-identical strings (child
      // lists are built as parent :+ new), so this is O(len) pointer
      // compares vs the general path's four hashed passes — the encoder
      // runs over EVERY historical snapshot on EVERY commit, and the
      // hashing was half the per-commit latency at depth 1000
      // (commit-curve bench, round 8).
      if (p.nonEmpty && cur.size >= p.size && cur.startsWith(p))
        Some((pid, cur.drop(p.size), Nil))
      else {
        val pSet = p.toSet
        val cSet = cur.toSet
        val added = cur.filterNot(pSet)
        val removed = p.filterNot(cSet)
        val replay = p.filterNot(removed.toSet) ++ added
        if (replay == cur && added.size + removed.size < cur.size)
          Some((pid, added, removed))
        else None
      }
    }
    asDelta match {
      case Some((pid, added, removed)) =>
        n.put(baseKey, pid)
        if (added.nonEmpty) { val a = n.putArray(addKey); added.foreach(a.add) }
        if (removed.nonEmpty) { val r = n.putArray(remKey); removed.foreach(r.add) }
      case None =>
        if (cur.nonEmpty || fullKey == "manifests") {
          val a = n.putArray(fullKey); cur.foreach(a.add)
        }
    }
  }

  /** Table metadata. Snapshot manifest lists are DELTA-encoded against the
    * parent snapshot (added/removed names) whenever that is smaller: a
    * snapshot log keeps near-identical lists per commit, so inline lists
    * make the metadata file O(snapshots × manifests) — at 100-some retained
    * snapshots times manifest-merge's ~200-manifest ceiling that is tens of
    * thousands of re-serialized names PER COMMIT, the dominant commit cost
    * once fixed overheads are gone. Deltas bring the file (and every
    * commit's write + every refresh's parse) to O(snapshots + changes),
    * the same scaling Iceberg gets from per-snapshot manifest-list files,
    * without a second metadata file kind to GC. Old inline metadata parses
    * unchanged; expiry naturally re-inlines a delta whose parent was
    * expired (the writer sees no parent and emits the full list).
    */
  def metaToJson(m: TableMeta): String = {
    val root = obj()
    root.put("formatVersion", m.formatVersion)
    root.put("location", m.location)
    root.put("schemaDdl", m.schemaDdl)
    val sp = root.putObject("spec")
    sp.put("column", m.spec.column)
    sp.put("widthMicros", m.spec.widthMicros)
    val pr = root.putObject("properties")
    m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => pr.put(k, v) }
    val byId = m.snapshots.map(s => s.id -> s).toMap
    val sn = root.putArray("snapshots")
    m.snapshots.foreach { s =>
      val n = sn.addObject()
      n.put("id", s.id)
      n.put("parentId", s.parentId)
      n.put("timestampMs", s.timestampMs)
      n.put("operation", s.operation)
      // a snapshot's pinned DDL is elided when it equals the table-level
      // DDL (the common case: every snapshot since the last evolution) —
      // inlining it re-serialized the full schema string per snapshot per
      // commit, the other depth-linear constant the commit-curve bench
      // exposed. metaFromJson restores the exact value from the file's
      // top-level schemaDdl, so the encoding is invisible to readers.
      s.schemaDdl.filterNot(_ == m.schemaDdl).foreach(n.put("schemaDdl", _))
      s.schemaId.foreach(n.put("schemaId", _))
      val parent = byId.get(s.parentId).filter(_.id < s.id)
      putListDelta(n, s.manifests, parent.map(p => (p.id, p.manifests)),
        "manifests", "baseManifests", "addedManifests", "removedManifests")
      putListDelta(n, s.deleteManifests,
        parent.map(p => (p.id, p.deleteManifests)),
        "deleteManifests", "baseDeleteManifests",
        "addedDeleteManifests", "removedDeleteManifests")
    }
    root.put("currentSnapshotId", m.currentSnapshotId)
    if (m.schemas.nonEmpty) {
      val sc = root.putArray("schemas")
      m.schemas.foreach { d =>
        val n = sc.addObject()
        n.put("id", d.id)
        n.put("ddl", d.ddl)
        val ids = n.putArray("fieldIds")
        d.ids.foreach(ids.add)
      }
      root.put("currentSchemaId", m.currentSchemaId)
    }
    if (m.specs.nonEmpty) {
      val sp2 = root.putArray("specs")
      m.specs.foreach { d =>
        val n = sp2.addObject()
        n.put("id", d.id)
        n.put("widthMicros", d.widthMicros)
      }
      root.put("currentSpecId", m.currentSpecId)
    }
    write(root)
  }

  def metaFromJson(s: String): TableMeta = {
    val n = parse(s)
    // raw pass, then resolve deltas ascending by id (parents always carry
    // smaller ids: version numbers are max+1 even for rollback commits)
    case class Raw(id: Long, parentId: Long, ts: Long, op: String,
        schemaDdl: Option[String], schemaId: Option[Int], node: JsonNode)
    // absent snapshot DDL = elided-as-equal by metaToJson (or genuinely
    // pre-evolution legacy metadata) — both resolve to the file's
    // top-level DDL, which is exactly the value the writer elided
    val topDdl = n.get("schemaDdl").asText
    val raws = n.get("snapshots").elements().asScala.map { sn =>
      Raw(sn.get("id").asLong, sn.get("parentId").asLong,
        sn.get("timestampMs").asLong, sn.get("operation").asText,
        Option(sn.get("schemaDdl")).map(_.asText).orElse(Some(topDdl)),
        Option(sn.get("schemaId")).map(_.asInt), sn)
    }.toSeq
    def strArr(node: JsonNode, k: String): Option[Seq[String]] =
      Option(node.get(k)).map(_.elements().asScala.map(_.asText).toSeq)
    val manifests = scala.collection.mutable.Map.empty[Long, Seq[String]]
    val delManifests = scala.collection.mutable.Map.empty[Long, Seq[String]]
    def resolve(raw: Raw, memo: scala.collection.mutable.Map[Long, Seq[String]],
        fullKey: String, baseKey: String, addKey: String,
        remKey: String): Seq[String] = {
      val v = strArr(raw.node, fullKey) match {
        case Some(full) => full
        case None => Option(raw.node.get(baseKey)) match {
          case Some(base) =>
            val p = memo.getOrElse(base.asLong, throw new IllegalStateException(
              s"snapshot ${raw.id}: $baseKey ${base.asLong} not resolved"))
            val removed = strArr(raw.node, remKey).getOrElse(Nil).toSet
            p.filterNot(removed) ++ strArr(raw.node, addKey).getOrElse(Nil)
          case None => Nil
        }
      }
      memo(raw.id) = v
      v
    }
    raws.sortBy(_.id).foreach { raw =>
      resolve(raw, manifests, "manifests",
        "baseManifests", "addedManifests", "removedManifests")
      resolve(raw, delManifests, "deleteManifests",
        "baseDeleteManifests", "addedDeleteManifests",
        "removedDeleteManifests")
    }
    // emit in file order (resolution above ran in id order)
    val snaps = raws.map { raw =>
      Snapshot(
        id = raw.id,
        parentId = raw.parentId,
        timestampMs = raw.ts,
        operation = raw.op,
        manifests = manifests(raw.id),
        schemaDdl = raw.schemaDdl,
        deleteManifests = delManifests(raw.id),
        schemaId = raw.schemaId)
    }
    val schemas = Option(n.get("schemas")).map(_.elements().asScala.map { d =>
      SchemaDef(d.get("id").asInt, d.get("ddl").asText,
        Option(d.get("fieldIds"))
          .map(_.elements().asScala.map(_.asInt).toSeq).getOrElse(Nil))
    }.toSeq).getOrElse(Nil)
    TableMeta(
      formatVersion = n.get("formatVersion").asInt,
      location = n.get("location").asText,
      schemaDdl = n.get("schemaDdl").asText,
      spec = TruncateSpec(
        n.get("spec").get("column").asText,
        n.get("spec").get("widthMicros").asLong),
      properties = n.get("properties").properties().asScala
        .map(e => e.getKey -> e.getValue.asText).toMap,
      snapshots = snaps,
      currentSnapshotId = n.get("currentSnapshotId").asLong,
      schemas = schemas,
      currentSchemaId =
        Option(n.get("currentSchemaId")).map(_.asInt).getOrElse(0),
      specs = Option(n.get("specs")).map(_.elements().asScala.map { d =>
        SpecDef(d.get("id").asInt, d.get("widthMicros").asLong)
      }.toSeq).getOrElse(Nil),
      currentSpecId =
        Option(n.get("currentSpecId")).map(_.asInt).getOrElse(0))
  }
}
