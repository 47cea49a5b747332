package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table maintenance + snapshot reads over the commit log — the lake
  * operations an Iceberg user relies on, re-expressed over the
  * emulated log (SURVEY.md §7 sink note):
  *
  *  - snapshot-isolated reads and time travel (`readTable` /
  *    `readSnapshot`) resolve the live file set through the log, never
  *    the directory listing;
  *  - `compact` rewrites the current live set into one file per
  *    partition directory (the antidote to the reference's
  *    file-per-(input × partition) fragmentation, Q6) as a `rewrite`
  *    snapshot — readers at older snapshots still see the old files;
  *  - `expireSnapshots` deletes data files unreachable from the kept
  *    snapshots (the GC half of Iceberg's `expire_snapshots`).
  */
object LakeOps {

  /** Current table state (snapshot-isolated: ignores files on disk that
    * are not in the live set).
    */
  def readTable(spark: SparkSession, tableDir: String): DataFrame =
    readSnapshot(spark, tableDir, GraftLog.records(tableDir).map(_.snapshotId).max)

  /** Time travel: the table as of `snapshotId`. */
  def readSnapshot(spark: SparkSession, tableDir: String, snapshotId: Long): DataFrame = {
    val files = GraftLog.liveFiles(tableDir, Some(snapshotId))
      .map(f => s"$tableDir/$f")
    // basePath keeps Hive partition columns when reading explicit files
    spark.read.option("basePath", tableDir).parquet(files: _*)
  }

  /** Bin-pack the live set: one file per partition directory, committed
    * as a `rewrite` snapshot. Same rows, fewer files; old snapshots
    * remain readable until expiry.
    */
  def compact(spark: SparkSession, tableDir: String): CommitInfo = {
    val live = GraftLog.liveFiles(tableDir, None)
    val partitionCols = live.flatMap(_.split("/").dropRight(1).map(_.takeWhile(_ != '=')))
      .distinct
    val df0 = readTable(spark, tableDir)
    // render partition values back to strings (they were path-rendered
    // on write; partition inference may have re-typed them). No
    // coalesce(1): writeFiles repartitions on the partition key, which
    // already yields one file per partition directory (all rows of a
    // key land in one task) while keeping the rewrite fully parallel —
    // a single-task funnel here would be the scale bottleneck of the
    // whole maintenance op.
    val df = partitionCols.foldLeft(df0)((d, c) => d.withColumn(c, d(c).cast("string")))
    val written = HiveParquetWriter.writeFiles(df, partitionCols, tableDir)
    val rows = written.map(_._2).sum
    val rec = GraftLog.commit(tableDir, "rewrite", rows, written.map(_._1).sorted, Seq.empty)
    CommitInfo(rec.snapshotId, rec.files, rows)
  }

  /** Delete data files unreachable from the newest `keepLast`
    * snapshots. Returns the deleted relative paths.
    */
  def expireSnapshots(tableDir: String, keepLast: Int): Seq[String] = {
    val recs = GraftLog.records(tableDir)
    if (recs.isEmpty) return Seq.empty
    val keptIds = recs.map(_.snapshotId).sorted.takeRight(keepLast)
    val reachable = keptIds.flatMap(id => GraftLog.liveFiles(tableDir, Some(id))).toSet
    val root = Paths.get(tableDir)
    import scala.jdk.CollectionConverters._
    val onDisk = Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString.replace("\\", "/")).toSeq
    val doomed = onDisk.filterNot(reachable)
    doomed.foreach(f => Files.deleteIfExists(root.resolve(f)))
    doomed.sorted
  }
}
