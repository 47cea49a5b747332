package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-corpus materialization of a shared derived relation (r10).
  *
  * Several query batteries consume the SAME derived table (the graph
  * battery's support-≥3 edge set; the dedup battery's ≥0.6-Jaccard pair
  * set), and rebuilding it inside every consumer is the dominant cost at
  * gen scale. This is the lake pattern for any shared derived table at
  * 100 TB: pay the corpus pass once, write the (always ≪ corpus) result
  * as a table, let every consumer read THAT. Here the "lake" is a
  * tmp-dir parquet keyed by the source file's identity so a changed
  * corpus can never serve a stale table; a production deployment would
  * make it a bucketed lake table via the `bucketed_join_e2e` pattern and
  * re-derive it on ingest.
  *
  * Race safety (two concurrent Verify/Bench PROCESSES): build into a
  * unique sibling dir, then atomically rename into place — rename(2)
  * either installs this build or fails because a racer won, in which
  * case the racer's (identical) table is used and ours is discarded.
  * The in-JVM lock only serializes builders within one session.
  */
object CorpusTable {

  /** Normalized identity of a corpus table file, shared with
    * `dev/spotcheck_gen1.py` (which re-derives the same key to locate a
    * materialized table): path + size + mtime-millis, so a regenerated
    * corpus at the same path gets a fresh table.
    */
  private[queries] def corpusKey(dir: String, table: String = "documents.parquet"): String = {
    val src = java.nio.file.Paths.get(dir, table)
    val a = java.nio.file.Files.readAttributes(
      src, classOf[java.nio.file.attribute.BasicFileAttributes])
    val id = s"${src.toAbsolutePath}:${a.size}:${a.lastModifiedTime.toMillis}"
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }

  private val lock = new Object

  /** Read the materialized table at `<tableDir>/<prefix>_<corpusKey>`,
    * building it first (once per corpus, process-race-safe) if absent.
    * `tableDir` comes from `spark.graft.corpusTableDir` (a deployment
    * points it at shared storage — the lake location every executor and
    * every job can read); default is the local tmpdir, right for this
    * single-machine harness.
    */
  private[queries] def materialized(s: SparkSession, dir: String, prefix: String)(
      build: => DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tableDir = s.conf.getOption("spark.graft.corpusTableDir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val path = Paths.get(tableDir, s"${prefix}_${corpusKey(dir)}")
    lock.synchronized {
      if (!Files.exists(path.resolve("_SUCCESS"))) {
        val tmp = Paths.get(s"$path.tmp-${java.util.UUID.randomUUID()}")
        var installed = false
        try {
          build.write.mode("overwrite").parquet(tmp.toString)
          try { Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE); installed = true }
          catch { case _: java.nio.file.FileSystemException =>
            // lost the race (or non-atomic fs): keep the winner's table
            if (!Files.exists(path.resolve("_SUCCESS"))) {
              // no winner — a stale/partial table (no _SUCCESS) blocks the
              // rename; REPLACE_EXISTING cannot replace a non-empty dir, so
              // clear it first
              deleteRecursively(path)
              Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING)
              installed = true
            }
          }
        } finally if (!installed) deleteRecursively(tmp)
      }
    }
    s.read.parquet(path.toString)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala
        .foreach(q => try Files.deleteIfExists(q) catch { case _: Exception => () })
  }
}
