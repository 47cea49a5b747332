package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch 5 ★ — text analysis over the `documents` table: token
  * statistics, quality scoring, language-marker scoring, and
  * shingle-based document fingerprinting. These are the text legs of a
  * training-data pipeline (north-star scope in SURVEY.md §2 Part B).
  *
  * Scale notes:
  *  - tokenization is a codegen'd `split`; explodes are generated
  *    row-wise (no driver materialization);
  *  - per-doc metrics are a single narrow projection — one pass over
  *    the text column, no shuffle;
  *  - token frequency is one hash aggregation on the token (shuffle on
  *    the token only, after map-side partial agg);
  *  - fingerprints use md5 (identical in every engine) so the oracle
  *    can reproduce them; ratio metrics are exact integer e2/e4 units
  *    (half-up integer division), never floats.
  */
object TextQueries {

  private def toks: Column = split(col("text"), " ")

  /** Half-up integer ratio in e4 units: round(1e4 * num/den). */
  private def ratioE4(num: Column, den: Column): Column =
    ((num * lit(20000L) + den) / (den * lit(2L))).cast("long")

  val entries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // q_text_tokens ★ — global token frequency, top 50. One explode +
    // one hash agg; n DESC with token tiebreak for a total order.
    QueryDef(
      "q_text_tokens",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(explode(toks).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(50),
      Some("""SELECT token, COUNT(*) AS n FROM (
             |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
             |) GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin)),

    // ------------------------------------------------------------------
    // q_text_quality ★ — per-document quality metrics: token count,
    // char count, mean token length (e2), stopword ratio (e4), and a
    // derived keep/drop quality flag — the filter stage of a pretraining
    // data pipeline. All exact integer arithmetic.
    QueryDef(
      "q_text_quality",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"), toks.as("t"))
          .select(
            col("doc_id"), col("lang"),
            size(col("t")).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("n_chars"),
            length(regexp_replace(col("text"), " ", "")).cast("long").as("n_nonspace"),
            size(expr("filter(t, x -> x = 'the' or x = 'a')")).cast("long").as("n_stop"))
          .select(
            col("doc_id"), col("lang"), col("n_tokens"), col("n_chars"),
            // mean token length in e2 (half-up): (200*chars + n) div (2n)
            ((col("n_nonspace") * 200L + col("n_tokens")) / (col("n_tokens") * 2L))
              .cast("long").as("avg_tok_len_e2"),
            ratioE4(col("n_stop"), col("n_tokens")).as("stop_ratio_e4"))
          .withColumn("quality",
            when(col("n_tokens") >= 20 && col("n_tokens") <= 80 &&
              col("stop_ratio_e4") < lit(2000L), lit("keep"))
              .otherwise(lit("drop")))
          .orderBy("doc_id"),
      Some("""WITH m AS (
             |  SELECT doc_id, lang,
             |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
             |    CAST(length(text) AS BIGINT) AS n_chars,
             |    CAST(length(replace(text,' ','')) AS BIGINT) AS n_nonspace,
             |    CAST(len(list_filter(string_split(text,' '), x -> x='the' OR x='a')) AS BIGINT) AS n_stop
             |  FROM documents)
             |SELECT doc_id, lang, n_tokens, n_chars,
             |  (n_nonspace*200 + n_tokens) // (n_tokens*2) AS avg_tok_len_e2,
             |  (n_stop*20000 + n_tokens) // (n_tokens*2) AS stop_ratio_e4,
             |  CASE WHEN n_tokens BETWEEN 20 AND 80
             |        AND (n_stop*20000 + n_tokens) // (n_tokens*2) < 2000
             |       THEN 'keep' ELSE 'drop' END AS quality
             |FROM m ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_text_lang_id ★ — n-gram/marker-word language scoring → a
    // (actual, predicted) confusion matrix. Marker counting is
    // `regexp_count` with \b-bounded alternations — fully codegen'd,
    // one pass over the raw text (the first cut filtered an exploded
    // token array through interpreted higher-order lambdas; on this
    // all-alphanumeric corpus the \b-regex count is exactly the token
    // match count). At 100 TB this is a single narrow map + one small
    // aggregation.
    QueryDef(
      "q_text_lang_id",
      (s: SparkSession, dir: String) => {
        val scored = Tables(s, dir, "documents")
          .select(
            col("doc_id"), col("lang"),
            regexp_count(col("text"), lit("\\b(the|a|of|and)\\b")).as("s_en"),
            regexp_count(col("text"), lit("\\b(der|die|das|und)\\b")).as("s_de"),
            regexp_count(col("text"), lit("\\b(el|la|los|y)\\b")).as("s_es"))
        scored
          .withColumn("predicted",
            when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
              col("s_en") > 0, lit("en"))
              .when(col("s_de") >= col("s_es") && col("s_de") > 0, lit("de"))
              .when(col("s_es") > 0, lit("es"))
              .otherwise(lit("und")))
          .groupBy("lang", "predicted")
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "predicted")
      },
      Some("""WITH sc AS (
             |  SELECT lang,
             |    len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS s_en,
             |    len(regexp_extract_all(text, '\b(der|die|das|und)\b')) AS s_de,
             |    len(regexp_extract_all(text, '\b(el|la|los|y)\b')) AS s_es
             |  FROM documents)
             |SELECT lang,
             |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
             |       WHEN s_de >= s_es AND s_de > 0 THEN 'de'
             |       WHEN s_es > 0 THEN 'es'
             |       ELSE 'und' END AS predicted,
             |  COUNT(*) AS n
             |FROM sc GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin)),

    // ------------------------------------------------------------------
    // q_text_fingerprint ★ — per-document fingerprints: full-text md5
    // plus a 5-token-shingle min-hash (the "document fingerprint" a
    // dedup pipeline keys on). md5 is engine-identical, so the oracle
    // reproduces the exact fingerprint; min over hex strings is plain
    // lexicographic min. Shingle construction is the codegen'd
    // Shingles expression (the transform(sequence…)+slice+concat_ws
    // chain is interpreted — dev/PERF_NOTES.md); min over its DISTINCT
    // shingles equals min over all, and array_min of the empty array
    // (< 5 tokens) is NULL, matching the oracle's CASE.
    QueryDef(
      "q_text_fingerprint",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(col("text")).as("doc_md5"),
            array_min(transform(
              graft.functions.Shingles.shingles(toks, 5), x => md5(x)))
              .as("shingle_min_md5"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS doc_md5,
             |  CASE WHEN len(string_split(text,' ')) >= 5 THEN
             |    list_min(list_transform(range(1, len(string_split(text,' ')) - 3),
             |      i -> md5(array_to_string(string_split(text,' ')[i:i+4], ' '))))
             |  ELSE NULL END AS shingle_min_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------------------------
    // q_text_token_count ★ — per-document token counting two ways:
    // whitespace tokens and a BPE-ish regex segmentation (letter runs /
    // digit runs / single non-alphanumerics — the GPT-2 pre-tokenizer
    // shape), the budget signal an LLM-data pipeline bins documents by.
    // One narrow codegen'd projection, no shuffle.
    QueryDef(
      "q_text_token_count",
      (s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .select(col("doc_id"),
            size(toks).cast("long").as("ws_tokens"),
            size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
              .cast("long").as("bpe_tokens"),
            length(col("text")).cast("long").as("n_chars"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens,
             |  CAST(len(text) AS BIGINT) AS n_chars
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
