package graft.lake

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz of the commit-time conflict validation (SURVEY §7.5):
  * random interleavings of append / position-delete / rewrite, each op
  * scanning at a possibly-STALE snapshot, driven through the REAL commit
  * protocol (`append` / `commitPositionDeletes` / `replaceFiles`). The
  * deterministic race specs in DeltaMergeSpec pin the known interleavings;
  * this spec searches the schedule space: across ≥500 generated schedules,
  * whatever subset of ops the validation admits must satisfy
  *   - NO RESURRECTION: a row whose delete committed never reappears;
  *   - NO DUPLICATION: a row id is live in at most one file;
  *   - NO LOSS: every appended, never-deleted row stays live;
  *   - NO DANGLING: every surviving delete entry still references at
  *     least one live data file (dead entries are pruned by rewrites).
  * Ops the validation aborts (ConcurrentModificationException) must leave
  * the table byte-identical. Metadata-level (fake file paths, real
  * manifests/commits), so no Spark session is needed and schedules run in
  * milliseconds.
  */
class ConcurrencyPropertySpec extends AnyFunSuite {

  private sealed trait Op
  private case class Append(nFiles: Int, rowsPer: Int) extends Op
  private case class Del(lag: Int, seed: Long) extends Op
  private case class Rewrite(lag: Int, seed: Long) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    4 -> (for {
      n <- Gen.choose(1, 3); r <- Gen.choose(1, 4)
    } yield Append(n, r)),
    3 -> (for {
      lag <- Gen.choose(0, 3); s <- Gen.long
    } yield Del(lag, s)),
    3 -> (for {
      lag <- Gen.choose(0, 3); s <- Gen.long
    } yield Rewrite(lag, s)))

  private val genSchedule: Gen[List[Op]] =
    Gen.choose(6, 14).flatMap(n => Gen.listOfN(n, genOp))

  /** Model state as of one committed snapshot: live data paths and the
    * already-committed delete positions per path.
    */
  private case class Snap(sid: Long, live: Set[String],
      delPos: Map[String, Set[Int]])

  private def runSchedule(schedule: List[Op]): Unit = {
    val loc = java.nio.file.Files.createTempDirectory("lake-fuzz").toString
    LakeTable.drop(loc)
    val t = LakeTable.create(loc, LakeWriter.EventSchemaDdl, LakeWriter.EventSpec)
    try {
      var nextRow = 0L
      var nextFile = 0
      var nextDel = 0
      // content of every fake file ever created: position index -> row id
      val fileRows = scala.collection.mutable.Map.empty[String, Vector[Long]]
      // positions carried by each fake delete parquet, per data path
      val delContent =
        scala.collection.mutable.Map.empty[String, Map[String, Set[Int]]]
      var deletedRows = Set.empty[Long]
      val history = scala.collection.mutable.ArrayBuffer.empty[Snap]
      var cur = Snap(-1L, Set.empty, Map.empty)

      def newDataFile(rowsPer: Int): DataFileMeta = {
        nextFile += 1
        val path = f"$loc/data/f$nextFile%05d.parquet"
        val rows = Vector.fill(rowsPer) { nextRow += 1; nextRow }
        fileRows(path) = rows
        DataFileMeta(path, 1024L, rows.size.toLong, 0L)
      }
      def scanAt(lag: Int): Option[Snap] =
        if (history.isEmpty) None
        else Some(history(math.max(0, history.size - 1 - lag)))

      schedule.foreach {
        case Append(n, rowsPer) =>
          val metas = Seq.fill(n)(newDataFile(rowsPer))
          val sid = t.append(metas)
          cur = Snap(sid, cur.live ++ metas.map(_.path), cur.delPos)
          history += cur

        case Del(lag, seed) =>
          scanAt(lag).foreach { scan =>
            val rnd = new scala.util.Random(seed)
            val cands = scan.live.toSeq.sorted
            val chosen0 = cands.filter(_ => rnd.nextBoolean())
            val chosen = if (chosen0.nonEmpty) chosen0 else cands.take(1)
            // delete a random subset of positions LIVE AT THE SCAN
            val posMap = chosen.map { p =>
              val liveAtScan = fileRows(p).indices
                .filterNot(scan.delPos.getOrElse(p, Set.empty))
              p -> liveAtScan.filter(_ => rnd.nextInt(3) == 0).toSet
            }.filter(_._2.nonEmpty).toMap
            if (posMap.nonEmpty) {
              nextDel += 1
              val dp = f"$loc/deletes/d$nextDel%05d.parquet"
              delContent(dp) = posMap
              val refs = posMap.keys.toSeq.sorted
              val meta = DeleteFileMeta(dp, 128L,
                posMap.valuesIterator.map(_.size.toLong).sum,
                refs.head, refs.last, dataPaths = refs)
              val before = (t.files().map(_.path).toSet,
                t.deleteFilesMeta().map(_.path).toSet)
              try {
                val sid = t.commitPositionDeletes(Seq(meta))
                deletedRows ++= posMap.flatMap { case (p, ps) =>
                  ps.map(fileRows(p))
                }
                cur = Snap(sid, cur.live,
                  posMap.foldLeft(cur.delPos) { case (m, (p, ps)) =>
                    m.updated(p, m.getOrElse(p, Set.empty) ++ ps)
                  })
                history += cur
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  // aborted op must leave the table untouched
                  assert((t.files().map(_.path).toSet,
                    t.deleteFilesMeta().map(_.path).toSet) == before)
              }
            }
          }

        case Rewrite(lag, seed) =>
          scanAt(lag).foreach { scan =>
            val rnd = new scala.util.Random(seed)
            val cands = scan.live.toSeq.sorted
            val chosen0 = cands.filter(_ => rnd.nextInt(3) > 0)
            val chosen = if (chosen0.nonEmpty) chosen0 else cands.take(1)
            if (chosen.nonEmpty) {
              // the rewrite reads rows LIVE AT ITS SCAN and packs them
              // into one replacement file — exactly what compaction does
              val surviving = chosen.flatMap(p =>
                fileRows(p).zipWithIndex.collect {
                  case (r, i)
                      if !scan.delPos.getOrElse(p, Set.empty).contains(i) => r
                }).toVector
              val newMetas =
                if (surviving.isEmpty) Nil
                else {
                  nextFile += 1
                  val np = f"$loc/data/f$nextFile%05d.parquet"
                  fileRows(np) = surviving
                  Seq(DataFileMeta(np, 1024L, surviving.size.toLong, 0L))
                }
              val before = (t.files().map(_.path).toSet,
                t.deleteFilesMeta().map(_.path).toSet)
              try {
                val sid = t.replaceFiles(chosen.toSet, newMetas, Some(scan.sid))
                cur = Snap(sid,
                  cur.live -- chosen ++ newMetas.map(_.path),
                  cur.delPos -- chosen)
                history += cur
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  assert((t.files().map(_.path).toSet,
                    t.deleteFilesMeta().map(_.path).toSet) == before)
              }
            }
          }
      }

      // ---- invariants over the final table ------------------------------
      val livePaths = t.files().map(_.path)
      assert(livePaths.distinct.size == livePaths.size, "duplicate live path")
      assert(livePaths.toSet == cur.live, "model/table live-set divergence")
      val liveDels = t.deleteFilesMeta()
      liveDels.foreach { d =>
        assert(d.dataPaths.exists(cur.live),
          s"dangling delete entry ${d.path}: no live reference")
      }
      val masked: Map[String, Set[Int]] = liveDels
        .flatMap(d => delContent(d.path).toSeq)
        .groupBy(_._1).map { case (p, xs) => p -> xs.flatMap(_._2).toSet }
      val liveRows = livePaths.flatMap(p =>
        fileRows(p).zipWithIndex.collect {
          case (r, i) if !masked.getOrElse(p, Set.empty).contains(i) => r
        })
      assert(liveRows.distinct.size == liveRows.size, "row duplicated")
      assert(liveRows.toSet.intersect(deletedRows).isEmpty, "row resurrected")
      val expected = (1L to nextRow).toSet -- deletedRows
      assert(liveRows.toSet == expected, "row lost")
    } finally LakeTable.drop(loc)
  }

  test("500 random append/delete/rewrite schedules: no resurrection, " +
      "no duplication, no loss, no dangling deletes") {
    val prop = forAll(genSchedule) { schedule =>
      runSchedule(schedule); true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
