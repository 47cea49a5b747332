package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: wall-time named queries under the SAME harness as Bench
  * (local[32], 32 shuffle partitions, noop sink, cache cleared between
  * queries) but with warm-up + repeats, because single-run sf0.1 wall
  * clock is ±30% under driver load. Usage:
  *   Time <sfDir> <repeats> [-w] <queryName> [queryName...]
  * `-w` first replicates Bench's exact untimed warm-up, so a 1-rep run
  * measures what Bench would charge that query on its first execution
  * (the tool that isolated the r4 q_minhash_dup 3.5× as warm-up
  * coverage, not plan cost). Prints per-run and median seconds.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val benchWarm = args.length > 2 && args(2) == "-w"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (benchWarm) Bench.warmUp(spark, sfDir)
    args.drop(if (benchWarm) 3 else 2).foreach { name =>
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"TIME $name median=$med%.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
