package graft

import org.apache.spark.sql.functions._
import graft.functions.NormalizeText

/** Pins for the canonicalization rule (r12): the four-stage semantics
  * (lowercase → strip punct → fold digits → collapse ws), byte-level
  * edge cases the one-pass implementation must get right, equivalence
  * with the regex chain both oracle and scaladoc state, and the planted
  * case/punct/digit variants being caught ONLY via normalization.
  */
class NormalizeTextSpec extends SparkSpec {

  private def norm(s: String): String = {
    import org.apache.spark.unsafe.types.UTF8String
    NormalizeText.make(UTF8String.fromString(s)).toString
  }

  test("the exact rule, by example (order of stages is observable)") {
    assert(norm("Hello, World!") == "hello world")
    // punct stripped BEFORE digit folding: "1.2" is ONE run
    assert(norm("1.2") == "0")
    // a space DOES break a digit run
    assert(norm("1 .2") == "0 0")
    assert(norm("12 34") == "0 0")
    // digit runs fold to a single '0' wherever they sit in a token
    assert(norm("version 15") == "version 0")
    assert(norm("version 2") == "version 0")
    assert(norm("a1b22c") == "a0b0c")
    // whitespace runs (tab/newline too) collapse; ends trim
    assert(norm("  a\t\tb \n c  ") == "a b c")
    // a pure-punctuation token vanishes entirely
    assert(norm("a ! b") == "a b")
    // empty and degenerate inputs are total
    assert(norm("") == "")
    assert(norm("!!!") == "")
    assert(norm("   ") == "")
    assert(norm("123") == "0")
    // non-ASCII bytes pass through verbatim (no Unicode case folding)
    assert(norm("Café ÉTÉ") == "café ÉtÉ")
  }

  test("equivalent to the documented regex chain on ASCII inputs (codegen path)") {
    import spark.implicits._
    val samples = Seq(
      "Hello, World! It's 2024...", "a.b,c;d", "x  y\tz", "1.2.3-alpha",
      "THE quick (Brown) FOX #42", "trailing space ", " leading",
      "semi;colon:and:colon", "dig1ts 1n w0rds", "", "!!!", "42",
      "a-b_c=d+e", "[bracketed] {braced} <angled>", "q_dedup's \"quotes\"")
    val df = samples.toDF("s")
      .select(col("s"),
        NormalizeText.normalizeText(col("s")).as("got"),
        trim(regexp_replace(regexp_replace(regexp_replace(lower(col("s")),
          lit("[\\p{Punct}]"), lit("")),
          lit("[0-9]+"), lit("0")),
          lit("\\s+"), lit(" "))).as("want"))
    val bad = df.filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, s"mismatch vs regex chain: ${bad.mkString("; ")}")
  }

  test("unicode mode: planted non-ASCII variants are caught (r13)") {
    import org.apache.spark.unsafe.types.UTF8String
    def uni(s: String): String =
      NormalizeText.makeUnicode(UTF8String.fromString(s)).toString
    // accents lowercase, NBSP collapses, em dash strips, digits fold
    assert(uni("Héllo, Wörld — v2.5!") == "héllo wörld v0")
    // the byte pass is BLIND to all of those (É, NBSP, — pass through)
    assert(norm("Héllo, Wörld — v2.5!") ==
      "héllo wörld — v0")
    // smart quotes (Pi/Pf), en dash (Pd), em/en spaces (Zs)
    assert(uni("“Smart” ‘quotes’ – and em spaces")
      == "smart quotes and em spaces")
    // Turkish İ simple-lowercases to plain i (locale-INdependent
    // Character.toLowerCase(int)); Arabic-Indic digits are Nd → fold;
    // ² is No (not a digit, not punct) → passes through
    assert(uni("İstanbul ŞEHİR ٤٢ km²")
      == "istanbul şehir 0 km²")
    // currency/math symbols (Sc/Sm) strip; wave dash (Pd) strips
    assert(uni("€99.99 ≠ ¥100 〜 50%") == "0 0 0")
    // CJK letters pass through; Greek lowercases (Σ → σ, final ς stays)
    assert(uni("日本語 テスト 2024年")
      == "日本語 テスト 0年")
    assert(uni("ΑΣΔ Σοφός")
      == "ασδ σοφός")
    // degenerate inputs are total
    assert(uni("") == ""); assert(uni("—“€") == "")
  }

  test("unicode mode == byte mode on pure-ASCII input (the whole sf0.001 corpus)") {
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Tables(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach { t =>
      assert(t.forall(_ < 0x80), "fixture unexpectedly non-ASCII")
      assert(NormalizeText.makeUnicode(UTF8String.fromString(t)).toString == norm(t),
        s"modes diverge on ASCII input: $t")
    }
  }

  test("null in, null out") {
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("A b"))
      .toDF("s").select(NormalizeText.normalizeText(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(r.toSeq == Seq(null, "a b"))
  }

  test("q_dedup_normalized: planted variants are caught ONLY via normalization") {
    val out = SparkEntry.queries("q_dedup_normalized")(spark, sfDir)
      .selectExpr("sum(caught_raw)", "sum(caught_norm)", "count(*)",
        "max(jac_raw_e4)", "min(jac_raw_e4)", "min(jac_norm_e4)")
      .collect()(0)
    val (rawCaught, normCaught, n) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(n > 0)
    assert(rawCaught == 0,
      s"raw shingling caught $rawCaught planted pairs — the plant is too weak")
    assert(normCaught == n,
      s"normalization caught only $normCaught of $n planted pairs")
    // the raw similarity is genuinely nonzero (these ARE near-dups) yet
    // below every battery threshold — the blindness being measured
    assert(out.getLong(4) > 0, "raw Jaccard is zero — plant should be sparse")
    assert(out.getLong(3) < 6000)
    // normalized forms are byte-identical, so normalized Jaccard is exact 1
    assert(out.getLong(5) == 10000L)
  }
}
