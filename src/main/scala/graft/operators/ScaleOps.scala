package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Scale-out building blocks for the hot aggregation/join paths —
  * the techniques a 1000-executor deployment of this engine leans on
  * when AQE alone isn't enough.
  */
object ScaleOps {

  /** Two-phase salted aggregation for skewed group keys: rows fan out
    * over `saltBuckets` sub-keys (phase 1 shuffles on (key, salt), so
    * one hot key spreads across `saltBuckets` reducers), then partials
    * re-aggregate on the key alone (phase 2 moves only
    * keys × saltBuckets rows). Correct for any algebraic aggregate —
    * the caller supplies the partial aggs and how to merge them.
    *
    * `partial`/`merge` column names must line up: each phase-1 output
    * column is merged by the same-named phase-2 expression, e.g.
    * {{{
    * saltedAgg(events, Seq(col("event_type")), 16)(
    *   Seq(count(lit(1)).as("n"), sum("value").as("s")),
    *   Seq(sum("n").as("n"), sum("s").as("s")))
    * }}}
    *
    * Spark's map-side partial aggregation already handles *moderate*
    * skew; explicit salting is for keys hot enough that a single
    * reducer partition would spill or straggle (rule of thumb: one key
    * > ~1 GiB of shuffle input).
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltBuckets: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted fact⋈dim equi-join for the known-hot-key regime — the join
    * twin of [[saltedAgg]], kept here so the shipped code has ONE
    * salting implementation per operation shape (review ask r6). Fact
    * rows get `salt = pmod(saltSrc, S)` from a DETERMINISTIC per-row
    * expression (an id column, not rand(): retry-safe and
    * engine-reproducible, the property hash-sampling has); the dim side
    * replicates S× with a generated salt; the join runs on (key, salt),
    * slicing any hot key into S independently-placed shuffle
    * partitions. The result is EXACTLY the unsalted join — each fact
    * row matches one replica — the pattern changes the partitioning,
    * never the answer. S multiplies the dim side's shuffle volume S×,
    * bounded because the dim is the small side by construction. AQE's
    * skew split covers the common case at runtime; this is the
    * plan-level tool for hot keys AQE can't slice (it only splits above
    * a size threshold and can't split an in-flight hash build).
    */
  def saltedJoin(fact: DataFrame, factKey: String, saltSrc: Column,
      dim: DataFrame, dimKey: String, saltBuckets: Int): DataFrame = {
    val f = fact.withColumn("__salt", pmod(saltSrc, lit(saltBuckets.toLong)))
    val d = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"))
      .drop("__salt")
  }

  /** Broadcast-threshold hint helper: force the dimension side of a
    * join to broadcast regardless of size estimation (statistics are
    * often missing on fresh files at scale; an 8 MiB dim mis-planned
    * into a 100 TB shuffle join is the single most expensive planner
    * mistake this engine can make).
    */
  def joinBroadcastDim(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys)

  /** Runtime bloom-filter pruning of a fact table against a dimension
    * key set — the explicit form of the planner's injected runtime
    * filters (Spark's `InjectRuntimeFilter` plants the same
    * BloomFilter-build + might-contain probe around shuffle joins, but
    * only when its own heuristics fire; this one survives any plan
    * shape). The dim keys fold into a driver-side bloom (~9.6 bits/key
    * at fpp 0.01 — 1.2 MiB per million keys, a broadcastable MODEL, not
    * data), and the probe is a map-side filter: at 100 TB the fact rows
    * that would die in the join never reach the shuffle at all —
    * selectivity × fact bytes of network traffic saved, at the cost of
    * fpp false positives that the exact join downstream removes anyway.
    * NO false negatives (bloom guarantee), so correctness is
    * unconditional; ScaleOpsSpec asserts the superset property.
    *
    * The build is `df.stat.bloomFilter` — one aggregation over the dim
    * side (mergeable sketch: per-partition blooms OR together), sized
    * by an exact count of the build side first (the "build-side stats"
    * step every runtime-filter implementation pays).
    */
  def bloomPrune(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, fpp: Double = 0.01): DataFrame = {
    // Key-type-generic via xxhash64 on BOTH sides: the bloom stores the
    // 64-bit hash of the dim key and the probe hashes the fact key the
    // same way, so build/probe can never see different representations
    // of the SAME type (a Long-typed probe UDF would silently
    // cast-to-null non-long keys and drop EVERY row — a false-negative
    // hole the review caught; review fix r5). xxhash64 is type-SENSITIVE
    // though: an Int 5 and a Long 5 hash differently, so cross-typed
    // key pairs would drop every matching row — refuse them up front
    // rather than document a guarantee the hash can't keep (advisor
    // finding r5; callers cast one side first). With same-typed keys,
    // hash collisions only add to the fpp, never subtract: no false
    // negatives.
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    require(ft == dt,
      s"bloomPrune: fact key '$factKey' is $ft but dim key '$dimKey' is $dt — " +
        "xxhash64 hashes equal values of different types differently, which would " +
        "silently drop every matching row; cast both keys to a common type first")
    val n = dim.count()
    // An EMPTY build side means no fact row can survive the downstream
    // equi-join, and Spark's stat.bloomFilter NPEs on it (zero rows →
    // no partial sketch → null merged buffer; hit by the r16
    // degenerate-fixture sweep via q_triangles' empty support-≥3 edge
    // table) — prune everything, exactly.
    if (n == 0L) return fact.filter(lit(false))
    val bf = dim.select(xxhash64(col(dimKey)).as("__k")).stat.bloomFilter("__k", n, fpp)
    val bytes = {
      val baos = new java.io.ByteArrayOutputStream()
      bf.writeTo(baos)
      baos.toByteArray
    }
    // Probe through Catalyst's own BloomFilterMightContain (the exact
    // expression InjectRuntimeFilter plants, with the serialized bloom
    // as a foldable binary literal — its codegen deserializes once per
    // task and emits a straight mightContainLong call inside
    // whole-stage codegen). At 100 TB the probe is the fact-scan hot
    // loop; the previous interpreted Scala UDF cost a
    // serialize/deserialize round-trip per row (the repo's measured
    // ~50× hot-path penalty for lambda UDFs — dev/PERF_NOTES.md).
    val probe = GraftBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      GraftBridge.expression(xxhash64(col(factKey)))))
    fact.filter(probe)
  }

  /** Write `df` as a hash-bucketed, per-bucket-sorted table: ONE
    * up-front shuffle on `key`, after which every equi-join or
    * aggregation between tables bucketed on the same key with the same
    * bucket count runs exchange-free (Spark matches the tables'
    * `HashPartitioning`; the sort feeds SortMergeJoin without a Sort
    * node either). This is the amortization play for the 100 TB fact
    * table joined every day: pay the shuffle once at ingest, never at
    * query time. ScaleOpsSpec asserts the joined plan contains no
    * Exchange.
    *
    * `path` is per-table because `spark.sql.warehouse.dir` is a static
    * conf (cannot vary per test/session).
    */
  def writeBucketed(
      df: DataFrame, table: String, path: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
