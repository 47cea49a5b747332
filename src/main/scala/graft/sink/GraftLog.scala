package graft.sink

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The table's commit log: one JSON record per snapshot under
  * `<tableDir>/_graft_log/`, emulating the observable metadata of
  * Iceberg's snapshot chain (`App.java:147-149` territory, SURVEY.md
  * A21/A24) with three operations:
  *
  *  - `append`: `files` join the table;
  *  - `rewrite`: `files` REPLACE the live set (compaction — same rows,
  *    fewer/bigger files);
  *  - `overwrite`: `files` REPLACE the live set with CHANGED content
  *    (copy-on-write MERGE — [[LakeOps.upsert]] lists carried-over
  *    files of untouched partitions plus the rewritten ones, so the
  *    fold semantics are those of `rewrite`; the distinct op name keeps
  *    the ledger honest about which snapshots changed rows).
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
      .flatMap { p =>
        // A truncated/garbled record (torn write by a foreign or crashed
        // writer — our own commits are atomic renames and can't tear)
        // must not poison every subsequent read of the table. Quarantine
        // it: rename to a UNIQUE `<name>.<nonce>.corrupt` (kept for
        // forensics, no longer parsed) and carry on with the readable
        // chain. The nonce matters: a fixed `.corrupt` name collides
        // when a SECOND torn write lands on the same id (found by the
        // r5 randomized-sequence spec) — the rename then fails forever,
        // the id stays occupied-but-invisible to nextSnapshotId, and
        // commit() exhausts its 1000 retries on a permanent collision.
        try Some(parse(Files.readString(p)))
        catch {
          case _: Exception =>
            val nonce = java.util.UUID.randomUUID().toString.take(8)
            try Files.move(p,
              p.resolveSibling(s"${p.getFileName.toString}.$nonce.corrupt"))
            catch { case _: Exception => () } // read-only fs: just skip
            None
        }
      }
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
        // these ops commit the FULL live set (their record replaces the
        // fold); appends and unknown ops commit a delta
        case "rewrite" | "overwrite" | "delete" => r.files.toVector
        case _                                  => live ++ r.files
      }
    }
  }

  /** Every source file ever committed — the exactly-once ledger. */
  def committedSources(tableDir: String): Set[String] =
    records(tableDir).flatMap(_.sources).toSet

  /** Commit a record under the next free snapshot id — atomic and
    * collision-safe, the two properties "transactional append" actually
    * means (the reference gets both from Iceberg's optimistic-commit
    * protocol, `App.java:147-149`; the r1/r2 emulation had neither:
    * an unlocked read-modify-write id allocation plus a non-atomic
    * `Files.writeString`, so two writers could allocate the same id and
    * silently overwrite each other's commit, and a crash mid-write left
    * truncated JSON that poisoned every later read).
    *
    * Protocol: stage the full record to a temp file (invisible to
    * `records()` — no `.json` suffix), then publish via
    * `Files.createLink(target, tmp)` — an atomic CREATE-NEW on POSIX
    * (unlike `ATOMIC_MOVE`, whose rename(2) silently REPLACES an
    * existing target). If another writer claimed the id first, the link
    * throws `FileAlreadyExistsException`; re-read the log and retry
    * with a fresh id. Readers see either no file or the complete
    * record, and no commit is ever overwritten.
    */
  def commit(tableDir: String, op: String, rows: Long,
      files: Seq[String], sources: Seq[String]): Record = {
    var attempt = 0
    while (true) {
      val id = nextSnapshotId(tableDir)
      if (tryClaim(tableDir, id, op, rows, files, sources))
        return Record(id, op, rows, files.sorted, sources.sorted)
      attempt += 1 // id raced away — re-read the log, try the next
      if (attempt > 1000)
        throw new IllegalStateException(s"commit to $tableDir: 1000 id collisions")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Commit a live-set-REPLACING record (`rewrite`/`overwrite`/
    * `delete`) VALIDATED against the base snapshot the operation
    * planned from — the observable semantics of Iceberg's optimistic
    * commit protocol, which the id-CAS alone does not give: a plain
    * `commit("rewrite", ...)` racing an append wins the id race and
    * then its record REPLACES the fold, silently dropping the
    * concurrently-appended files from the live set (a lost update the
    * r6 two-session race test pins).
    *
    * If commits landed past `baseId`:
    *  - concurrent APPENDS are carried into the new live set when
    *    `carryAppends` (sound for content-neutral compaction — the
    *    appended files simply stay live and their rows join the total;
    *    Iceberg's RewriteFiles retries the same way);
    *  - otherwise — and always when a REPLACING commit intervened —
    *    throw `ConcurrentModificationException`: a content-dependent
    *    rewrite (MERGE, DELETE, rollback) planned its output rows from
    *    a stale snapshot and must re-run against the new state.
    */
  def commitReplacing(tableDir: String, op: String, rows: Long,
      files: Seq[String], sources: Seq[String], baseId: Long,
      carryAppends: Boolean): Record = {
    var attempt = 0
    while (true) {
      val recs = records(tableDir)
      val newer = recs.filter(_.snapshotId > baseId)
      if (newer.exists(_.op != "append"))
        throw new java.util.ConcurrentModificationException(
          s"$op on $tableDir planned from snapshot $baseId but a replacing " +
            s"commit landed after it; re-read and re-run")
      if (!carryAppends && newer.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"$op on $tableDir planned from snapshot $baseId but appends " +
            s"landed after it; re-read and re-run")
      val allFiles = files ++ newer.flatMap(_.files)
      val allRows = rows + newer.map(_.rows).sum
      val id = recs.map(_.snapshotId).maxOption.getOrElse(0L) + 1L
      if (tryClaim(tableDir, id, op, allRows, allFiles, sources))
        return Record(id, op, allRows, allFiles.sorted, sources.sorted)
      attempt += 1 // lost the id race — revalidate against the new log
      if (attempt > 1000)
        throw new IllegalStateException(s"commit to $tableDir: 1000 id collisions")
    }
    throw new IllegalStateException("unreachable")
  }

  /** One atomic claim of snapshot `id`: stage the full record to a temp
    * file (invisible to `records()` — no `.json` suffix), then publish
    * via `Files.createLink` — an atomic CREATE-NEW on POSIX (unlike
    * `ATOMIC_MOVE`, whose rename(2) silently REPLACES an existing
    * target). Returns false when another writer claimed the id first.
    */
  private def tryClaim(tableDir: String, id: Long, op: String, rows: Long,
      files: Seq[String], sources: Seq[String]): Boolean = {
    Files.createDirectories(logDir(tableDir))
    def arr(xs: Seq[String]) =
      xs.sorted.map(f => "\"" + f.replace("\\", "/") + "\"").mkString("[", ",", "]")
    val tmp = logDir(tableDir).resolve(s"_tmp_${java.util.UUID.randomUUID()}")
    Files.writeString(tmp,
      s"""{"snapshotId":$id,"op":"$op","rows":$rows,""" +
        s""""files":${arr(files)},"sources":${arr(sources)}}""")
    try {
      Files.createLink(logDir(tableDir).resolve(f"$id%020d.json"), tmp)
      Files.delete(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.delete(tmp)
        false
    }
  }

  def nextSnapshotId(tableDir: String): Long =
    records(tableDir).map(_.snapshotId).maxOption.getOrElse(0L) + 1L
}
