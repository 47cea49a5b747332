package graft.sink

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The table's commit log: one JSON record per snapshot under
  * `<tableDir>/_graft_log/`, emulating the observable metadata of
  * Iceberg's snapshot chain (`App.java:147-149` territory, SURVEY.md
  * A21/A24) with two operations:
  *
  *  - `append`: `files` join the table;
  *  - `rewrite`: `files` REPLACE the live set (compaction — same rows,
  *    fewer/bigger files).
  *
  * The live file set of a snapshot is the fold of operations up to it;
  * readers must resolve through the log (never the directory listing —
  * files replaced by a rewrite remain on disk until expiry, exactly
  * like Iceberg's snapshot isolation + GC split).
  *
  * `sources` records the consumed input files of an append — the
  * exactly-once ledger: re-offered source files that already appear in
  * a committed snapshot are skipped by the pipeline (a crash between
  * commit and source-delete can no longer double-ingest; SURVEY.md Q5).
  */
object GraftLog {

  final case class Record(
      snapshotId: Long, op: String, rows: Long,
      files: Seq[String], sources: Seq[String])

  def logDir(tableDir: String): Path = Paths.get(tableDir, "_graft_log")

  def records(tableDir: String): Seq[Record] = {
    val dir = logDir(tableDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .toSeq.sortBy(_.getFileName.toString)
      .map(p => parse(Files.readString(p)))
  }

  private def parse(json: String): Record = {
    val jv = JsonMethods.parse(json)
    def strs(field: String): Seq[String] = (jv \ field) match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _          => Seq.empty
    }
    def long(field: String, default: Long = 0L): Long = (jv \ field) match {
      case JInt(n)  => n.toLong
      case JLong(n) => n
      case _        => default
    }
    val op = (jv \ "op") match {
      case JString(s) => s
      case _          => "append"
    }
    Record(long("snapshotId"), op, long("rows"), strs("files"), strs("sources"))
  }

  /** Live data files (relative paths) as of `snapshotId` (or the
    * latest when None): fold appends/rewrites in snapshot order.
    */
  def liveFiles(tableDir: String, snapshotId: Option[Long] = None): Seq[String] = {
    val upTo = records(tableDir)
      .filter(r => snapshotId.forall(r.snapshotId <= _))
    upTo.foldLeft(Vector.empty[String]) { (live, r) =>
      r.op match {
        case "rewrite" => r.files.toVector
        case _         => live ++ r.files
      }
    }
  }

  /** Every source file ever committed — the exactly-once ledger. */
  def committedSources(tableDir: String): Set[String] =
    records(tableDir).flatMap(_.sources).toSet

  def write(tableDir: String, r: Record): Unit = {
    Files.createDirectories(logDir(tableDir))
    def arr(xs: Seq[String]) =
      xs.sorted.map(f => "\"" + f.replace("\\", "/") + "\"").mkString("[", ",", "]")
    Files.writeString(
      logDir(tableDir).resolve(f"${r.snapshotId}%020d.json"),
      s"""{"snapshotId":${r.snapshotId},"op":"${r.op}","rows":${r.rows},""" +
        s""""files":${arr(r.files)},"sources":${arr(r.sources)}}""")
  }

  def nextSnapshotId(tableDir: String): Long =
    records(tableDir).map(_.snapshotId).maxOption.getOrElse(0L) + 1L
}
