package graft.queries

/** Deterministic planted NATURAL-TEXT fixtures unioned into the
  * learned/rule-based text rows (r15 verdict #4): the shipped corpus's
  * text is synthetic (all-English tokens under non-English lang
  * labels, no stopwords in most docs), so q_langid_apply's confusion
  * matrix collapsed to the majority prior and q_gopher_rules' funnel
  * rejected everything on one rule — honest, but the driver's green
  * row was then only evidence of cross-engine AGREEMENT, not of the
  * operator discriminating. These rows (negative doc_ids / dedicated
  * lang codes / dedicated sources — disjoint from every corpus at
  * every sf) ride along in BOTH engines, built from this one seq (the
  * MmFixture rule: oracle literals generated from the same constant,
  * zero drift), so the oracle-checked row itself now shows diagonal
  * dominance on the planted langs and a mixed per-rule funnel on the
  * planted sources.
  */
object TextFixture {

  /** Per-lang DISJOINT token vocabularies — text genuinely determines
    * lang for the planted docs. Lang codes disjoint from the corpus's
    * {en,de,zh,fr,es}.
    */
  val langIdLangs: Seq[String] = Seq("xx_a", "xx_b", "xx_c", "xx_d")

  /** 4 langs × 12 docs × 36 tokens rotated through the lang's 6-token
    * vocabulary: (doc_id, text, lang). The ×6 multiplicity matters:
    * the planted class's score on its own docs grows ~quadratically in
    * the per-doc token count (weight ∝ gradient ∝ c, score ∝ c·w)
    * while a corpus class's score on those docs grows only linearly
    * (its weights are set by the corpus, reached via hash collisions)
    * — at ×1 multiplicity two of the four langs lost the argmax to
    * 'en' at sf0.01.
    */
  val langIdDocs: Seq[(Long, String, String)] = for {
    (l, li) <- langIdLangs.zipWithIndex
    k <- 0 until 12
  } yield (-(201L + li * 12 + k),
    (0 until 36).map(j => s"${l.replace("_", "")}w${(k + j) % 6}")
      .mkString(" "),
    l)

  /** Content hash of the planted langid rows — folded into the
    * [[CorpusTable]] materialization prefix so a fixture change busts
    * the cached model (the corpus-file key alone cannot see it).
    */
  val langIdKey: String = java.security.MessageDigest.getInstance("MD5")
    .digest(langIdDocs.mkString("").getBytes("UTF-8"))
    .map("%02x".format(_)).mkString.take(8)

  /** The langid planted rows as a SQL relation (doc_id, text, lang),
    * generated from [[langIdDocs]] itself.
    */
  val langIdSqlRows: String = langIdDocs.map { case (id, text, lang) =>
    s"SELECT CAST($id AS BIGINT) AS doc_id, '$text' AS text, '$lang' AS lang"
  }.mkString("\n  UNION ALL ")

  private def words(n: Int, base: Seq[String]): String =
    (0 until n).map(i => base(i % base.size)).mkString(" ")

  private val GoodWords = Seq("the", "quick", "brown", "fox", "jumps",
    "over", "that", "lazy", "dog", "with", "great", "energy", "and",
    "vigor")

  /** Gopher planted docs, (text, source): three natural-English docs
    * that pass all seven rules under `planted_pass`, plus one doc per
    * rule failing exactly that rule under its own `planted_<rule>`
    * source — so the declared per-source funnel is LIVE: mixed rule
    * failures and a non-trivial pass rate in the driver's oracle run
    * (the TextSpec planted set promoted into the shipped row).
    */
  val gopherDocs: Seq[(String, String)] = Seq(
    ("planted_pass", words(60, GoodWords)),
    ("planted_pass", words(72, GoodWords.reverse)),
    ("planted_pass", words(55, GoodWords.drop(3) ++ GoodWords.take(3))),
    // < 50 words, everything else clean
    ("planted_wc", words(20, GoodWords)),
    // mean word length ~2 < 3; stopwords via 'the'/'and'
    ("planted_mwl", words(48, Seq("ab")) + " the and"),
    // >10% symbol chars; the symbol token is 1 of 61 words (alpha ok)
    ("planted_sym", words(60, GoodWords) + " ##########"),
    // every line starts with a bullet
    ("planted_bullet",
      (1 to 4).map(_ => "- " + words(15, GoodWords)).mkString("\n")),
    // every line ends with an ellipsis
    ("planted_ell",
      (1 to 4).map(_ => words(15, GoodWords) + " more...").mkString("\n")),
    // 15 of 63 words numeric -> alphabetic fraction 0.76 < 0.8
    ("planted_alpha",
      words(48, GoodWords) + " " + words(15, Seq("123", "456"))),
    // zero stopwords, everything else clean
    ("planted_stop",
      words(60, Seq("zebra", "lion", "tiger", "eagle", "shark"))))

  /** The gopher planted rows as a SQL relation (source, text) —
    * newlines carried as chr(10) concatenation so the literal is
    * byte-identical to the Scala string in every JSON/driver hop.
    */
  val gopherSqlRows: String = gopherDocs.map { case (src, text) =>
    val lit = "'" + text.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
    s"SELECT '$src' AS source, $lit AS text"
  }.mkString("\n  UNION ALL ")
}
