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
}
