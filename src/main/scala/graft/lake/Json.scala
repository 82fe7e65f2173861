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
  def write(n: JsonNode): String = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)

  def fileToNode(f: DataFileMeta): ObjectNode = {
    val n = obj()
    n.put("path", f.path)
    n.put("sizeBytes", f.sizeBytes)
    n.put("rowCount", f.rowCount)
    n.put("partitionValue", f.partitionValue)
    n.put("format", f.format)
    if (f.seq != 0L) n.put("seq", f.seq)
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
      seq = Option(n.get("seq")).map(_.asLong).getOrElse(0L))
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
    val sn = root.putArray("snapshots")
    m.snapshots.foreach { s =>
      val n = sn.addObject()
      n.put("id", s.id)
      n.put("parentId", s.parentId)
      n.put("timestampMs", s.timestampMs)
      n.put("operation", s.operation)
      s.schemaDdl.foreach(n.put("schemaDdl", _))
      val ma = n.putArray("manifests")
      s.manifests.foreach(ma.add)
      if (s.deleteManifests.nonEmpty) {
        val dm = n.putArray("deleteManifests")
        s.deleteManifests.foreach(dm.add)
      }
    }
    root.put("currentSnapshotId", m.currentSnapshotId)
    write(root)
  }

  def metaFromJson(s: String): TableMeta = {
    val n = parse(s)
    val snaps = n.get("snapshots").elements().asScala.map { sn =>
      Snapshot(
        id = sn.get("id").asLong,
        parentId = sn.get("parentId").asLong,
        timestampMs = sn.get("timestampMs").asLong,
        operation = sn.get("operation").asText,
        manifests = sn.get("manifests").elements().asScala.map(_.asText).toSeq,
        schemaDdl = Option(sn.get("schemaDdl")).map(_.asText),
        deleteManifests = Option(sn.get("deleteManifests"))
          .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil))
    }.toSeq
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
      currentSnapshotId = n.get("currentSnapshotId").asLong)
  }
}
