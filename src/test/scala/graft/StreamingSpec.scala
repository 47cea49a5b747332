package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.IngestQueries
import graft.streaming.StreamingIngest

/** Structured-Streaming ingest variant: AvailableNow drains the same
  * fixture tree through the shared decode/transform/sink path and
  * stops; a second run with the same checkpoint is a no-op (exactly-
  * once over the file source).
  */
class StreamingSpec extends SparkSpec {

  test("AvailableNow drains fixtures into the lake and checkpoints") {
    val root = Files.createTempDirectory("graft_stream_").toString
    IngestQueries.writeFixtures(root)
    val tableDir = s"$root/warehouse/t"
    val ckpt = s"$root/ckpt"

    val q = StreamingIngest.ingestAvailableNow(
      spark, root, "comp1", IngestQueries.fixtureTable, tableDir, ckpt)
    q.awaitTermination(120000)
    assert(!q.isActive)

    val back = spark.read.parquet(tableDir)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 5L))
    // partition columns flowed through the shared path
    assert(back.filter(col("event_date_day") === "2024-03-15" &&
      col("user_id_bucket") === "10").count() == 1)

    // re-run against the same checkpoint: no new input → no new snapshot
    val q2 = StreamingIngest.ingestAvailableNow(
      spark, root, "comp1", IngestQueries.fixtureTable, tableDir, ckpt)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(tableDir).count() == 4)
  }

  test("a replayed micro-batch does not double-append (crash between append and checkpoint)") {
    val root = Files.createTempDirectory("graft_replay_").toString
    IngestQueries.writeFixtures(root)
    val tableDir = s"$root/warehouse/t"
    val ckpt = s"$root/ckpt"
    val table = IngestQueries.fixtureTable
    val batch = graft.ingest.Pipeline.decode(spark, table,
      graft.ingest.Pipeline.listPending(root, "comp1"))

    // foreachBatch is at-least-once: simulate the replay by running the
    // same (checkpoint, batchId) append twice — exactly what a restart
    // after a pre-checkpoint crash does
    StreamingIngest.appendBatch(new graft.sink.HiveParquetWriter, batch,
      table, tableDir, ckpt, batchId = 0L)
    val rows = spark.read.parquet(tableDir).count()
    assert(rows > 0)
    StreamingIngest.appendBatch(new graft.sink.HiveParquetWriter, batch,
      table, tableDir, ckpt, batchId = 0L)
    assert(spark.read.parquet(tableDir).count() == rows)
    assert(graft.sink.GraftLog.records(tableDir).size == 1)
    // a genuinely new batch id still appends
    StreamingIngest.appendBatch(new graft.sink.HiveParquetWriter, batch,
      table, tableDir, ckpt, batchId = 1L)
    assert(spark.read.parquet(tableDir).count() == 2 * rows)
  }

  test("streaming MERGE: per-batch upsert, last-writer-wins, replay fenced (r5)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sink.{GraftLog, LakeOps}
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_stream_merge_")
    val tableDir = root.toString + "/t"
    val ckpt = root.toString + "/ckpt"
    def state: Map[Long, Long] =
      LakeOps.readTable(spark, tableDir).select(col("id"), col("v").cast("long"))
        .as[(Long, Long)].collect().toMap
    // batch 1: initial keys; batch 2: updates key 2, inserts key 3
    val in = MemoryStream[(Long, String, Long)]
    in.addData((1L, "a", 10L), (2L, "b", 20L))
    val q1 = StreamingIngest.upsertAvailableNow(
      in.toDF().toDF("id", "category", "v"), tableDir,
      keyCols = Seq("id"), partitionCols = Seq("category"), ckpt)
    q1.awaitTermination()
    assert(state == Map(1L -> 10L, 2L -> 20L))
    in.addData((2L, "b", 25L), (3L, "a", 30L))
    val q2 = StreamingIngest.upsertAvailableNow(
      in.toDF().toDF("id", "category", "v"), tableDir,
      keyCols = Seq("id"), partitionCols = Seq("category"), ckpt)
    q2.awaitTermination()
    assert(state == Map(1L -> 10L, 2L -> 25L, 3L -> 30L))
    // one overwrite snapshot per micro-batch, each carrying its fence key
    val recs = GraftLog.records(tableDir)
    assert(recs.map(_.op) == Seq("overwrite", "overwrite"))
    assert(recs.flatMap(_.sources) ==
      Seq(s"stream:$ckpt:0", s"stream:$ckpt:1"))
    // replay fencing: re-running batch 0's MERGE after batch 1 committed
    // must NOT resurrect the old value of key 2
    val replay = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "category", "v")
    StreamingIngest.upsertBatch(replay, tableDir, Seq("id"), Seq("category"),
      ckpt, batchId = 0L)
    assert(state(2L) == 25L, "replayed batch resurrected a stale value")
    assert(GraftLog.records(tableDir).size == 2)
  }
}
