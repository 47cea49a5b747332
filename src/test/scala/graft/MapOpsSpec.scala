package graft

import org.apache.spark.sql.functions._

/** Value semantics of q_map_ops (A9, string-keyed maps). The query
  * now also carries a DuckDB MAP-function oracle (scalarized output);
  * this spec pins the Spark-side semantics independently.
  */
class MapOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_map_ops values match the source columns row by row") {
    val src = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val rows = SparkEntry.queries("q_map_ops")(spark, sfDir).collect()
    assert(rows.length == src.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("lang") == src(id))             // element_at
      assert(r.getAs[String]("ks_str") == "lang,source")     // map_keys order
      assert(r.getAs[String]("const_v") == "x")              // map_concat
      assert(r.getAs[Int]("m2_size") == 3)                   // 2 + 1 keys
    }
  }

  test("duplicate map keys fail fast under ANSI (EXCEPTION policy)") {
    val e = intercept[Exception] {
      Seq(1).toDF("x")
        .select(map_concat(map(lit("k"), lit("a")), map(lit("k"), lit("b"))))
        .collect()
    }
    assert(e.getMessage.contains("DUPLICATED_MAP_KEY") ||
      e.getMessage.toLowerCase.contains("duplicate"))
  }
}
