package graft.queries

import java.nio.file.{Files, Paths}

/** Pins for the per-corpus materialization seam itself (r11): the happy
  * path is exercised implicitly by every graph/dedup query, so this
  * covers the recovery paths the r10 advice flagged — a stale partial
  * table (no `_SUCCESS`) squatting on the target path used to crash the
  * fallback move with `DirectoryNotEmptyException`, and a failed build
  * used to leak its `*.tmp-UUID` dir.
  */
class CorpusTableSpec extends graft.SparkSpec {

  private def tablePath(prefix: String) = Paths.get(
    CorpusTable.processTableDir,
    s"${prefix}_${CorpusTable.corpusKey(sfDir)}")

  private def deleteAll(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(q => Files.deleteIfExists(q))
  }

  test("materialized recovers from a stale partial table (no _SUCCESS) at the target path") {
    val path = tablePath("graft_teststale")
    deleteAll(path)
    Files.createDirectories(path)
    Files.writeString(path.resolve("junk.parquet"), "not parquet")
    try {
      val df = CorpusTable.materialized(spark, sfDir, "graft_teststale") {
        spark.range(5).toDF("v")
      }
      assert(df.count() == 5)
      assert(Files.exists(path.resolve("_SUCCESS")),
        "stale dir was not replaced by a completed table")
      assert(!Files.exists(path.resolve("junk.parquet")),
        "stale content survived the replace")
    } finally deleteAll(path)
  }

  test("a failed build leaves no tmp dir and no table") {
    val path = tablePath("graft_testfail")
    deleteAll(path)
    intercept[RuntimeException] {
      CorpusTable.materialized(spark, sfDir, "graft_testfail") {
        throw new RuntimeException("boom")
      }
    }
    assert(!Files.exists(path), "failed build installed a table")
    import scala.jdk.CollectionConverters._
    val leaked = Files.list(Paths.get(System.getProperty("java.io.tmpdir")))
      .iterator().asScala
      .filter(_.getFileName.toString.startsWith("graft_testfail"))
      .toSeq
    assert(leaked.isEmpty, s"leaked tmp dirs: $leaked")
  }

  test("dedup trio flows through ONE materialized pair table per corpus (r11 amortization pin)") {
    val path = tablePath("graft_jacpairs")
    deleteAll(path)
    // constructing q_dedup_ngram builds the table (materialized is eager)
    val pairs = graft.SparkEntry.queries("q_dedup_ngram")(spark, sfDir)
    assert(Files.exists(path.resolve("_SUCCESS")),
      "q_dedup_ngram did not build the per-corpus pair table")
    // the consumer plan READS the table — no inline PPJoin rebuild (a
    // shingle re-explode would show up as a Generate node)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("graft_jacpairs"),
      s"q_dedup_ngram does not scan the materialized pair table:\n$plan")
    assert(!plan.contains("Generate"),
      "consumer plan re-explodes shingles — the corpus pass leaked into the consumer")
    // the other two consumers reuse the SAME table without rebuilding it
    val mtime = Files.getLastModifiedTime(path.resolve("_SUCCESS"))
    val ccPath = tablePath("graft_jaccc")
    deleteAll(ccPath)
    // q_dedup_groups builds the shared CC label table off the pair table
    val labels = graft.SparkEntry.queries("q_dedup_groups")(spark, sfDir)
    assert(labels.count() > 0)
    assert(Files.exists(ccPath.resolve("_SUCCESS")),
      "q_dedup_groups did not build the per-corpus label table")
    val labelPlan = labels.queryExecution.executedPlan.toString
    assert(labelPlan.contains("graft_jaccc"),
      s"q_dedup_groups does not scan the materialized label table:\n$labelPlan")
    // q_dedup_canonical reuses BOTH tables without rebuilding either
    val ccMtime = Files.getLastModifiedTime(ccPath.resolve("_SUCCESS"))
    assert(graft.SparkEntry.queries("q_dedup_canonical")(spark, sfDir).count() > 0)
    assert(Files.getLastModifiedTime(path.resolve("_SUCCESS")) == mtime,
      "a consumer rebuilt the pair table instead of reading it")
    assert(Files.getLastModifiedTime(ccPath.resolve("_SUCCESS")) == ccMtime,
      "q_dedup_canonical rebuilt the label table instead of reading it")
  }

  test("default table store is per-process, not the shared tmpdir (r17 no-cross-run-caching rule)") {
    // The default store must NOT be the shared tmpdir root: a table
    // installed there by one JVM would be read by the next invocation,
    // i.e. a persisted intermediate keyed on the test corpus surviving
    // across runs. The per-process dir lives UNDER tmpdir with a unique
    // name and is registered for deletion on JVM exit.
    val d = Paths.get(CorpusTable.processTableDir)
    assert(d.getParent == Paths.get(System.getProperty("java.io.tmpdir")),
      s"process store not under tmpdir: $d")
    assert(d.getFileName.toString.startsWith("graft_corpus_"),
      s"unexpected process store name: $d")
    assert(d != Paths.get(System.getProperty("java.io.tmpdir")),
      "process store must not be the shared tmpdir root")
    // and the default build actually lands there
    val df = CorpusTable.materialized(spark, sfDir, "graft_testproc") {
      spark.range(3).toDF("v")
    }
    assert(df.count() == 3)
    assert(Files.exists(tablePath("graft_testproc").resolve("_SUCCESS")),
      "default build did not land in the process store")
    deleteAll(tablePath("graft_testproc"))
  }

  test("spark.graft.corpusTableDir relocates the table store (deployment knob)") {
    val alt = Files.createTempDirectory("graft_tabledir_test")
    spark.conf.set("spark.graft.corpusTableDir", alt.toString)
    try {
      val df = CorpusTable.materialized(spark, sfDir, "graft_testloc") {
        spark.range(7).toDF("v")
      }
      assert(df.count() == 7)
      val at = alt.resolve(s"graft_testloc_${CorpusTable.corpusKey(sfDir)}")
      assert(Files.exists(at.resolve("_SUCCESS")),
        s"table not installed under the configured dir: $at")
    } finally {
      spark.conf.unset("spark.graft.corpusTableDir")
      deleteAll(alt)
    }
  }

  test("GC removes expired same-prefix tables and crashed-build leftovers; the active table survives (r11 verdict #5)") {
    val alt = Files.createTempDirectory("graft_tablegc_test")
    spark.conf.set("spark.graft.corpusTableDir", alt.toString)
    try {
      // a superseded table (regenerated corpus → different key), 8 days old
      val expired = alt.resolve("graft_testgc_deadbeefdeadbeef")
      Files.createDirectories(expired)
      Files.writeString(expired.resolve("_SUCCESS"), "")
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 8L * 24 * 3600 * 1000)
      Files.setLastModifiedTime(expired, old)
      // a crashed build's tmp dir, 2 hours old
      val crashed = alt.resolve("graft_testgc_cafe.tmp-deadc0de")
      Files.createDirectories(crashed)
      Files.setLastModifiedTime(crashed,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 2L * 3600 * 1000))
      // a DIFFERENT prefix's expired table must NOT be touched by this call
      val otherPrefix = alt.resolve("graft_testother_deadbeefdeadbeef")
      Files.createDirectories(otherPrefix)
      Files.setLastModifiedTime(otherPrefix, old)

      val df = CorpusTable.materialized(spark, sfDir, "graft_testgc") {
        spark.range(4).toDF("v")
      }
      assert(df.count() == 4)
      assert(!Files.exists(expired), "expired same-prefix table survived GC")
      assert(!Files.exists(crashed), "crashed-build tmp dir survived GC")
      assert(Files.exists(otherPrefix),
        "GC crossed prefixes — another battery's table was deleted")
      val active = alt.resolve(s"graft_testgc_${CorpusTable.corpusKey(sfDir)}")
      assert(Files.exists(active.resolve("_SUCCESS")), "active table missing")
      // every read refreshes the TTL clock, so a table read at least once
      // per TTL window never expires (6 days old = within the 7-day TTL)
      Files.setLastModifiedTime(active,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 6L * 24 * 3600 * 1000))
      assert(CorpusTable.materialized(spark, sfDir, "graft_testgc") {
        fail("build re-ran for a cached table"); spark.emptyDataFrame
      }.count() == 4)
      assert(Files.getLastModifiedTime(active).toMillis >
        System.currentTimeMillis() - 60_000,
        "read did not refresh the table's TTL mtime")
    } finally {
      spark.conf.unset("spark.graft.corpusTableDir")
      deleteAll(alt)
    }
  }

  test("second call reads the cached table without re-running the build") {
    val path = tablePath("graft_testcache")
    deleteAll(path)
    try {
      var builds = 0
      def make() = CorpusTable.materialized(spark, sfDir, "graft_testcache") {
        builds += 1
        spark.range(3).toDF("v")
      }
      assert(make().count() == 3)
      assert(make().count() == 3)
      assert(builds == 1, s"build ran $builds times — cache miss on second call")
    } finally deleteAll(path)
  }
}
