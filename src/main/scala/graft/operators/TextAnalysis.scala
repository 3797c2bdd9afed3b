package graft.operators

import graft.operators.Checkpoints._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines (SURVEY §2.5).
  * Everything stays inside codegen'd builtin functions (split/transform/
  * aggregate) — no UDFs in the hot path, so whole-stage codegen covers the
  * full pipeline and the same plan runs unchanged on a 1000-executor
  * cluster (per-row ops, zero shuffle except final top-n).
  */
object TextAnalysis {

  /** Whitespace tokenization as a column of words. */
  // separator class = RE2 `\s` (what the DuckDB oracles split on): Java's
  // `\s` also matches VT (\x0B), RE2's does not — the explicit class keeps
  // the two engines' word boundaries provably identical (ADVICE r10)
  private val wsClass = "[ \\t\\n\\f\\r]"
  private def words(text: Column): Column = split(trim(text), s"$wsClass+")

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  private val stopwordSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  // ---------------------------------------------------------------- x01

  /** BPE-ish pre-tokenizer regex (GPT-2-style word/number/punct pieces with
    * optional leading space; no lookahead so Java regex and RE2 agree).
    * The punct class spells out RE2's `\s` = `[ \t\n\f\r]` — the oracle's
    * `[^A-Za-z0-9\s]` under RE2 treats VT as punct, Java's `\s` would not.
    */
  val bpeishPattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\f\\r]+"

  /** x01: token counting — whitespace tokens, BPE-ish regex pieces, and
    * character length per doc.
    */
  def x01TokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(words(col("text"))).as("n_tokens"),
        size(regexp_extract_all(col("text"), lit(bpeishPattern), lit(0))).as("n_bpeish"),
        length(col("text")).as("len_chars"))
      .orderBy(col("doc_id"))

  val x01Oracle: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens,
       |  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS INT) AS n_bpeish,
       |  CAST(length(text) AS INT) AS len_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x02

  /** x02: quality scoring — length/stopword/word-shape metrics plus a
    * keep/drop flag, the standard pre-training corpus filter shape.
    */
  def x02QualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = words(col("text"))
    val inList = stopwords.map(w => s"'$w'").mkString(", ")
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        length(col("text")).as("len_chars"),
        size(ws).as("n_words"),
        expr(s"size(filter(split(trim(text), '[ \\\\t\\\\n\\\\f\\\\r]+'), w -> w IN ($inList)))").as("n_stopwords"),
        expr("aggregate(transform(split(trim(text), '[ \\\\t\\\\n\\\\f\\\\r]+'), w -> length(w)), 0, (a, x) -> a + x)")
          .as("sum_word_len"))
      .withColumn("stopword_ratio", col("n_stopwords").cast("double") / col("n_words"))
      .withColumn("mean_word_len", col("sum_word_len").cast("double") / col("n_words"))
      .withColumn("keep",
        col("n_words") >= 10 && col("n_words") <= 500 && col("n_stopwords") >= 1)
      .orderBy(col("doc_id"))
  }

  val x02Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS INT) AS len_chars,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_words,
       |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |         w -> w IN ($stopwordSqlList))) AS INT) AS n_stopwords,
       |    CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'),
       |         w -> length(w))) AS INT) AS sum_word_len
       |  FROM documents)
       |SELECT doc_id, len_chars, n_words, n_stopwords, sum_word_len,
       |  CAST(n_stopwords AS DOUBLE) / n_words AS stopword_ratio,
       |  CAST(sum_word_len AS DOUBLE) / n_words AS mean_word_len,
       |  (n_words >= 10 AND n_words <= 500 AND n_stopwords >= 1) AS keep
       |FROM t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x05

  /** x05: word-bigram extraction + corpus-wide top-50 frequency table.
    * Explode is per-row work; only the final count/top-n shuffles, on the
    * bigram key — at 100 TB this is the classic map-side-combine n-gram
    * count with a tiny global top-k at the end.
    */
  def x05NgramStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(words(col("text")).as("ws"))
      .select(explode(expr(
        """CASE WHEN size(ws) < 2 THEN array()
          |ELSE transform(sequence(1, size(ws) - 1),
          |  i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))
          |END""".stripMargin)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(50)

  val x05Oracle: String =
    """WITH ws AS (
      |  SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bigram
      |  FROM ws)
      |SELECT bigram, COUNT(*) AS n FROM bg
      |GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- x03

  /** Stopword marker profiles for the language-ID heuristic. Priority
    * breaks score ties deterministically (higher wins).
    */
  val langProfiles: Seq[(String, Int, Seq[String])] = Seq(
    ("en", 5, Seq("the", "and", "of", "is", "to", "in", "a", "that")),
    ("es", 4, Seq("el", "la", "de", "que", "y", "los", "las", "es")),
    ("fr", 3, Seq("le", "la", "de", "et", "les", "des", "est", "une")),
    ("de", 2, Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu")),
    ("zh", 1, Seq("的", "是", "了", "在", "我", "有", "他", "这")))

  /** x03: n-gram/stopword-profile language ID. Scores = marker-word hits
    * per language over whitespace tokens; argmax with deterministic
    * priority tie-break. Pure builtin array lambdas → codegen'd, per-row,
    * shuffle-free.
    */
  def x03LangId(spark: SparkSession, sfDir: String): DataFrame =
    langIdOver(Tables.documents(spark, sfDir), col("text"))
      .select(col("doc_id"), col("lang_pred"), col("lang_score"))
      .orderBy(col("doc_id"))

  /** Oracle mirror of the heuristic: per-language marker counts, argmax
    * with the same priority tie-break (the CASE chain tests languages in
    * priority-descending order, which is exactly the struct-sort order).
    */
  val x03Oracle: String = {
    val scoreDefs = langProfiles.map { case (lang, _, markers) =>
      val inList = markers.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w IN ($inList))) AS INT) AS s_$lang"
    }.mkString(",\n    ")
    val byPriority = langProfiles.sortBy(-_._2).map(_._1)
    val best = byPriority.map(l => s"s_$l").mkString("GREATEST(", ", ", ")")
    val caseChain = byPriority.map(l => s"WHEN s_$l = __best THEN '$l'").mkString("\n      ")
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    $scoreDefs
       |  FROM documents),
       |g AS (SELECT *, $best AS __best FROM scored)
       |SELECT doc_id,
       |  CASE $caseChain END AS lang_pred,
       |  __best AS lang_score
       |FROM g ORDER BY doc_id""".stripMargin
  }

  /** Language-ID columns over any dataframe with a text column. */
  def langIdOver(df: DataFrame, text: org.apache.spark.sql.Column): DataFrame = {
    val scoreCols = langProfiles.map { case (lang, prio, markers) =>
      val inList = markers.map(w => s"'$w'").mkString(", ")
      struct(
        expr(s"size(filter(split(trim(${text.toString}), '[ \\\\t\\\\n\\\\f\\\\r]+'), w -> w IN ($inList)))").as("score"),
        lit(prio).as("prio"), lit(lang).as("lang"))
    }
    df.withColumn("best", element_at(sort_array(array(scoreCols: _*), asc = false), 1))
      .withColumn("lang_pred", col("best.lang"))
      .withColumn("lang_score", col("best.score").cast("long"))
      .drop("best")
  }

  // ---------------------------------------------------------------- x04

  /** x04: rolling-hash document fingerprint (custom Catalyst expression,
    * codegen'd Rabin-Karp over UTF-8 bytes).
    */
  def x04Fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.F.fingerprint(col("text"), 16).as("fp"))
      .orderBy(col("doc_id"))

  /** x04 gate variant: the PORTABLE window fingerprint (two-prime
    * polynomial arithmetic, every intermediate < 2⁶³), so the DuckDB
    * oracle recomputes the identical values per document — converting the
    * fingerprint gate from rows-only to hash-checked. The wrapping-multiply
    * [[x04Fingerprint]] stays the fast path with its semantics spec'd in
    * ExpressionsSpec.
    */
  def x04FingerprintPortable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.F.portableFingerprint(col("text"), 16).as("fp"))
      .orderBy(col("doc_id"))

  // Mirrors PortableFingerprintKernel exactly, including its short-text
  // fallback: texts under the 16-cp window hash as ONE whole-text window
  // (the generate_series branch would be an empty list -> NULL fp), and an
  // empty text is one zero-length window = 11*2^32 + 7.
  val x04Oracle: String =
    """SELECT doc_id,
      |  CASE
      |    WHEN length(text) = 0 THEN CAST(47244640263 AS BIGINT)
      |    WHEN length(text) < 16 THEN
      |      list_reduce(list_prepend(CAST(11 AS BIGINT),
      |        [CAST(unicode(c) AS BIGINT) for c in regexp_split_to_array(text, '')]),
      |        (a, c) -> (a * 131 + c) % 2147483629) * 4294967296
      |      + list_reduce(list_prepend(CAST(7 AS BIGINT),
      |        [CAST(unicode(c) AS BIGINT) for c in regexp_split_to_array(text, '')]),
      |        (a, c) -> (a * 31 + c) % 2147483647)
      |    ELSE
      |      list_min([
      |        list_reduce(list_prepend(CAST(11 AS BIGINT),
      |          [CAST(unicode(c) AS BIGINT) for c in regexp_split_to_array(substring(text, i, 16), '')]),
      |          (a, c) -> (a * 131 + c) % 2147483629) * 4294967296
      |        + list_reduce(list_prepend(CAST(7 AS BIGINT),
      |          [CAST(unicode(c) AS BIGINT) for c in regexp_split_to_array(substring(text, i, 16), '')]),
      |          (a, c) -> (a * 31 + c) % 2147483647)
      |      for i in generate_series(1, length(text) - 15)])
      |  END AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x06

  /** x06: heavy-hitter words via the Misra–Gries sketch Aggregator —
    * bounded state per partition, one merge, no full-term shuffle. Exact
    * counts joined on for the surviving candidates (the standard
    * sketch-then-verify pattern).
    */
  def x06HeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val corpusWords = Tables.documents(spark, sfDir)
      .select(explode(words(col("text"))).as("word"))
    // k sized so the MG guarantee (every word with freq > n/k survives)
    // covers the top 20 with wide margin — then the exact-count verify join
    // makes the result identical to the exhaustive top-20, which is what
    // the oracle computes
    val sketch = corpusWords.as[String]
      .select(new graft.functions.MisraGries(1024).toColumn)
      .head()
    val candidates = sketch.keys.toSeq.toDF("word")
    corpusWords.join(broadcast(candidates), "word")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)
  }

  val x06Oracle: String =
    """WITH w AS (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents)
      |SELECT word, COUNT(*) AS n FROM w
      |GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- p01

  /** p01: the end-to-end pre-training corpus pipeline — exact dedup (d01
    * shape), quality filter (x02 thresholds), language ID (x03 heuristic),
    * then per-language document and token totals. Every stage is per-row
    * codegen'd builtins; the only shuffles are the dedup groupBy(text) and
    * the final tiny per-language aggregate — the 100 TB corpus-curation
    * shape end to end, and every stage is portable SQL so the WHOLE
    * pipeline is oracle-checked, not just its pieces.
    */
  def p01PretrainPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val deduped = Tables.documents(spark, sfDir)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val ws = words(col("text"))
    val inList = stopwords.map(w => s"'$w'").mkString(", ")
    val scored = deduped
      .withColumn("n_words", size(ws))
      .withColumn("n_stopwords",
        expr(s"size(filter(split(trim(text), '[ \\\\t\\\\n\\\\f\\\\r]+'), w -> w IN ($inList)))"))
      .filter(col("n_words") >= 10 && col("n_words") <= 500 && col("n_stopwords") >= 1)
    langIdOver(scored, col("text"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).cast("long").as("sum_tokens"))
      .orderBy(col("lang_pred"))
  }

  val p01Oracle: String = {
    val scoreDefs = langProfiles.map { case (lang, _, markers) =>
      val inList = markers.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w IN ($inList))) AS INT) AS s_$lang"
    }.mkString(",\n    ")
    val byPriority = langProfiles.sortBy(-_._2).map(_._1)
    val best = byPriority.map(l => s"s_$l").mkString("GREATEST(", ", ", ")")
    val caseChain = byPriority.map(l => s"WHEN s_$l = __best THEN '$l'").mkString("\n      ")
    s"""WITH dedup AS (
       |  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
       |q AS (
       |  SELECT doc_id, text,
       |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
       |    len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |        w -> w IN ($stopwordSqlList))) AS n_stop
       |  FROM dedup),
       |kept AS (SELECT * FROM q WHERE n_words >= 10 AND n_words <= 500 AND n_stop >= 1),
       |scored AS (
       |  SELECT doc_id, n_words,
       |    $scoreDefs
       |  FROM kept),
       |g AS (SELECT *, $best AS __best FROM scored)
       |SELECT CASE $caseChain END AS lang_pred,
       |  COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS sum_tokens
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- p02

  /** p02: TRAINING-SEQUENCE PACKING accounting — the GPT/LLaMA
    * concatenate-and-chunk step: per source corpus, documents are laid
    * end-to-end in doc_id order and cut into fixed `budget`-token
    * training sequences. Reports, per source, the sequence count, how
    * many documents straddle a sequence boundary (the attention-mask /
    * document-leakage concern), and the tail padding waste — the numbers
    * a data engineer checks before choosing a packing budget.
    *
    * Shape at 100 TB: one window cumsum per source partition (the only
    * shuffle) + one aggregate; at cluster scale you'd pack within write
    * partitions, which is this same plan with source buckets pre-split.
    */
  def p02SequencePacking(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = 256L
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"),
      size(words(col("text"))).cast("long").as("tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val placed = d
      .withColumn("start", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("crossing",
        col("tokens") > 0 &&
          expr(s"(start div $budget) != ((start + tokens - 1) div $budget)"))
    placed.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_tokens"),
        sum(when(col("crossing"), 1L).otherwise(0L)).as("n_crossing"))
      .withColumn("n_sequences", expr(s"(total_tokens + ${budget - 1}) div $budget"))
      .withColumn("tail_waste", col("n_sequences") * budget - col("total_tokens"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("n_sequences"), col("n_crossing"), col("tail_waste"))
      .orderBy(col("source"))
  }

  val p02Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tokens
      |  FROM documents),
      |placed AS (
      |  SELECT source, tokens,
      |    COALESCE(SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      |  FROM d)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(tokens) AS BIGINT) AS total_tokens,
      |  CAST((SUM(tokens) + 255) // 256 AS BIGINT) AS n_sequences,
      |  CAST(SUM(CASE WHEN tokens > 0 AND (start // 256) <> ((start + tokens - 1) // 256)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing,
      |  CAST(((SUM(tokens) + 255) // 256) * 256 - SUM(tokens) AS BIGINT) AS tail_waste
      |FROM placed GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p03

  /** p03: token-budget mixture sampling — the "data mixing" step that
    * turns per-source weights into an actual training subset: each source
    * keeps documents in a DETERMINISTIC pseudo-random order (a portable
    * multiplicative hash of doc_id — reshuffling the corpus never changes
    * the selection) until the running token count reaches the source's
    * budget (here 50% of its total tokens). A document is kept iff the
    * tokens BEFORE it are still under budget, so every source overshoots
    * by at most one document and never under-fills.
    *
    * Scale note: the per-source cumsum window is fine up to ~10⁸ docs per
    * source; at 100 TB the same selection is computed without any
    * single-partition window by histogramming token counts over hash-
    * prefix buckets and binary-searching the hash threshold whose prefix
    * sum meets the budget (two shuffle-free aggregate passes), then
    * filtering h < threshold. The hash-order definition here is exactly
    * that threshold semantics, so the two implementations agree.
    */
  def p03TokenBudgetMix(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"),
      size(words(col("text"))).cast("long").as("n_tokens"),
      ((col("doc_id") * lit(2654435761L)) % lit(2147483647L)).as("h"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val totals = d.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs_total"),
      sum(col("n_tokens")).as("tokens_total"))
    d.withColumn("before", coalesce(sum(col("n_tokens")).over(wCum), lit(0L)))
      .join(broadcast(totals), "source")
      .withColumn("keep", col("before") < expr("tokens_total div 2"))
      .groupBy(col("source"), col("n_docs_total"), col("tokens_total"))
      .agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
      .select(col("source"), col("n_docs_total"), col("n_docs_kept"),
        col("tokens_total"), col("tokens_kept"))
      .orderBy(col("source"))
  }

  val p03Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |    (doc_id * 2654435761) % 2147483647 AS h
      |  FROM documents),
      |c AS (
      |  SELECT source, n_tokens,
      |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS tokens_total,
      |    COUNT(*) OVER (PARTITION BY source) AS n_docs_total
      |  FROM d)
      |SELECT source,
      |  CAST(n_docs_total AS BIGINT) AS n_docs_total,
      |  CAST(SUM(CASE WHEN before < tokens_total // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
      |  tokens_total,
      |  CAST(SUM(CASE WHEN before < tokens_total // 2 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
      |FROM c GROUP BY source, n_docs_total, tokens_total ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- x13

  /** x13: exact per-source token-length quantiles (p50/p90/p99) — corpus
    * length profiling for curation cutoffs. "Exact" is the point: the
    * quantile is DEFINED as the value at rank ceil(p·n/100) in
    * (n_tokens, doc_id) order, computed with integer arithmetic
    * ((p·n+99) div 100), so both engines select the identical row — no
    * sketch error bars, no builtin-interpolation-semantics drift.
    *
    * Scale note: rank selection per source is a per-source sort window
    * (same caveat as p03); at 100 TB the identical definition is computed
    * by a value-histogram pass + per-source cumulative-count walk (two
    * aggregates, no global sort), converging to the same row.
    */
  def x13ExactQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"),
      size(words(col("text"))).cast("long").as("n_tokens"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_tokens"), col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    def at(p: Int) =
      max(when(col("rn") === expr(s"($p * n + 99) div 100"), col("n_tokens")))
    d.withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        at(50).as("p50"), at(90).as("p90"), at(99).as("p99"))
      .orderBy(col("source"))
  }

  val x13Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |r AS (
      |  SELECT source, n_tokens,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
      |  FROM d)
      |SELECT source, MAX(n) AS n_docs,
      |  MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN n_tokens END) AS p50,
      |  MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN n_tokens END) AS p90,
      |  MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN n_tokens END) AS p99
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- x08

  /** Word-8-shingle hashes (sorted distinct) — the decontamination gram. */
  private def gramHashes(text: Column): Column =
    graft.functions.F.wordShingles(
      expr("transform(split(trim(text), '[ \\\\t\\\\n\\\\f\\\\r]+'), w -> xxhash64(w))"), 8)

  /** x08: benchmark decontamination — the GPT-3/Pile pipeline step: flag
    * training documents sharing any word-8-gram with the benchmark
    * blocklist (stand-in: every 5th doc_id). The blocklist's distinct gram
    * hashes BROADCAST (benchmark suites are tiny next to a 100 TB corpus),
    * so the scan is one map-side semi-join per doc — no corpus shuffle
    * until the per-doc count. Exact, not probabilistic: grams are chained
    * word hashes, collisions are 2⁻⁶⁴-level.
    */
  def x08Decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val shingled = d.select(col("doc_id"), explode(gramHashes(col("text"))).as("g"))
    val blocklist = shingled.filter(col("doc_id") % 5 === 0).select(col("g")).distinct()
    val hits = shingled.filter(col("doc_id") % 5 =!= 0)
      .join(broadcast(blocklist), "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    d.filter(col("doc_id") % 5 =!= 0).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** String-gram recomputation; the short-doc fallback (whole text as one
    * gram) mirrors WordWindowHashes exactly.
    */
  val x08Oracle: String =
    """WITH ws AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')]
      |    ELSE list_distinct([array_to_string(w[i:i+7], ' ')
      |      for i in generate_series(1, len(w) - 7)]) END) AS g
      |  FROM ws),
      |bl AS (SELECT DISTINCT g FROM sh WHERE doc_id % 5 = 0),
      |hits AS (
      |  SELECT s.doc_id, COUNT(*) AS n_shared
      |  FROM sh s JOIN bl ON s.g = bl.g
      |  WHERE s.doc_id % 5 <> 0 GROUP BY s.doc_id)
      |SELECT d.doc_id, COALESCE(h.n_shared, 0) AS n_shared,
      |  COALESCE(h.n_shared, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      |WHERE d.doc_id % 5 <> 0 ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- x09

  /** x09: within-document repetition (a Gopher/MassiveText quality rule):
    * the fraction of a doc's word-3-grams that are duplicates of earlier
    * ones. Pure per-row builtin + one codegen'd shingle pass — shuffle-free
    * except the final sort.
    */
  def x09Repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = words(col("text"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(size(ws) >= 3, size(ws) - 2).otherwise(lit(1)).as("n_grams"),
        size(graft.functions.F.wordShingles(
          expr("transform(split(trim(text), '[ \\\\t\\\\n\\\\f\\\\r]+'), w -> xxhash64(w))"), 3)).as("n_distinct"))
      .withColumn("rep_ratio",
        (col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
      .orderBy(col("doc_id"))
  }

  val x09Oracle: String =
    """WITH ws AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE 1 END AS n_grams,
      |    CASE WHEN len(w) < 3 THEN 1
      |      ELSE len(list_distinct([array_to_string(w[i:i+2], ' ')
      |        for i in generate_series(1, len(w) - 2)])) END AS n_distinct
      |  FROM ws)
      |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
      |  CAST(n_distinct AS INT) AS n_distinct,
      |  CAST(n_grams - n_distinct AS DOUBLE) / n_grams AS rep_ratio
      |FROM g ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x10

  /** x10: deterministic stratified sampling for corpus mixing — The
    * Pile-style source re-weighting: each stratum (here: doc length
    * tercile, standing in for source/domain) keeps a different fraction,
    * selected by a portable multiplicative hash of doc_id so the sample
    * is reproducible row-by-row on any engine and any run (no RNG state,
    * no sort). Per-row arithmetic only — the op is shuffle-free and the
    * same plan samples a 100 TB corpus.
    */
  def x10DataMix(spark: SparkSession, sfDir: String): DataFrame = {
    // Knuth multiplicative hash mod a Mersenne prime; doc_id < 2^31 keeps
    // every intermediate below 2^63 (the cross-engine-portable envelope)
    val bucket = expr("(doc_id * 2654435761) % 2147483647 % 1000")
    val stratum = when(col("n_chars") < 150, lit("short"))
      .when(col("n_chars") < 300, lit("medium")).otherwise(lit("long"))
    val quota = when(col("stratum") === "short", lit(800))
      .when(col("stratum") === "medium", lit(500)).otherwise(lit(200))
    Tables.documents(spark, sfDir)
      .withColumn("stratum", stratum)
      .withColumn("__b", bucket)
      .filter(col("__b") < quota)
      .select(col("doc_id"), col("stratum"))
      .orderBy(col("doc_id"))
  }

  val x10Oracle: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    CASE WHEN length(text) < 150 THEN 'short'
      |         WHEN length(text) < 300 THEN 'medium' ELSE 'long' END AS stratum,
      |    (doc_id * 2654435761) % 2147483647 % 1000 AS b
      |  FROM documents)
      |SELECT doc_id, stratum FROM s
      |WHERE b < CASE stratum WHEN 'short' THEN 800 WHEN 'medium' THEN 500 ELSE 200 END
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x11

  /** PII patterns, written in the common subset of Java regex and RE2 so
    * Spark and DuckDB (and a C4/CCNet-style scrubber on any engine) agree
    * byte-for-byte: plain classes, bounded quantifiers, \b anchors — no
    * lookarounds, no backrefs.
    */
  val piiEmail: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiPhone: String = "\\b555-[0-9]{4}\\b"
  val piiIpv4: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** x11: PII redaction — the pre-training scrub step (C4/CCNet shape):
    * count and replace emails, phone numbers, and IPv4 addresses per
    * document. The testdata corpus is digit-free, so every 7th doc gets a
    * deterministic doc_id-derived PII suffix planted (emails, a 555-line
    * phone, an RFC-1918 address) — mirrored exactly in the oracle, which
    * re-runs the same regexes in DuckDB and must reproduce the REDACTED
    * TEXT string-identically, not just the counts. Per-row regex work
    * only: shuffle-free, codegen'd, the same plan scrubs 100 TB.
    *
    * Replacement order (email → ip → phone) is part of the contract:
    * earlier redactions cannot create or destroy later matches with these
    * patterns, so the composition is order-stable.
    */
  def x11PiiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"),
            lit(" contact u"), col("doc_id"), lit("@ex.com or u"), col("doc_id"),
            lit("@mail.test from 10."), col("doc_id") % 256,
            lit("."), col("doc_id") % 256, lit("."), col("doc_id") % 100,
            lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text")).as("text"))
    planted
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(piiEmail), lit(0))).as("n_email"),
        size(regexp_extract_all(col("text"), lit(piiPhone), lit(0))).as("n_phone"),
        size(regexp_extract_all(col("text"), lit(piiIpv4), lit(0))).as("n_ip"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), piiEmail, "[EMAIL]"),
            piiIpv4, "[IP]"),
          piiPhone, "[PHONE]").as("clean"))
      .orderBy(col("doc_id"))
  }

  val x11Oracle: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text
      |      || ' contact u' || doc_id || '@ex.com or u' || doc_id
      |      || '@mail.test from 10.' || (doc_id % 256)
      |      || '.' || (doc_id % 256) || '.' || (doc_id % 100)
      |      || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    ELSE text END AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
      |  CAST(len(regexp_extract_all(text, '\b555-[0-9]{4}\b')) AS INT) AS n_phone,
      |  CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ip,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'),
      |    '\b555-[0-9]{4}\b', '[PHONE]', 'g') AS clean
      |FROM planted ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x14

  /** x14: approximate distinct counting via the KMV sketch
    * ([[graft.functions.KMinValues]]) — per-event-type distinct users with
    * O(k) state per group and mergeable map-side partials, where exact
    * `count(distinct)` shuffles every (group, user) pair; at 100 TB the
    * sketch is the only affordable per-group cardinality. Hashing stays in
    * the plan (codegen'd `xxhash64`); the Aggregator keeps order
    * statistics only. Gate-exact by the KMV contract: every per-type
    * cardinality here is far below k = 8192, so the sketch holds the full
    * distinct hash set and returns the exact count — DuckDB recomputes it
    * as COUNT(DISTINCT). The estimation path (≥ k, error ≈ 1/√(k−2)) and
    * partition-invariance are spec-asserted in SketchAndSkewSpec.
    */
  def x14KmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val kmv = udaf(new graft.functions.KMinValues(8192),
      org.apache.spark.sql.Encoders.scalaLong)
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(kmv(xxhash64(col("user_id"))).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  val x14Oracle: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS approx_users,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- x15

  /** x15: LINE-level deduplication (the C4 step: drop any line that
    * occurred verbatim earlier in the corpus, keeping documents otherwise
    * intact). The testdata has no newlines, so "lines" are deterministic
    * 10-word chunks — replayable identically in SQL. Scale shape: one
    * shuffle keyed by the line (the global first-occurrence window —
    * exact dedup's cost model, same as d01 but at line granularity), then
    * one shuffle back by doc to reassemble. First occurrence is defined
    * by (doc_id, position) order, so the result is deterministic and the
    * oracle must reproduce every retained document STRING identically.
    * Docs whose every line is a duplicate come back empty, not dropped.
    */
  def x15LineDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val lines = docs.select(col("doc_id"),
        posexplode(expr(
          """transform(sequence(0, cast(ceil(size(split(trim(text), '[ \\t\\n\\f\\r]+')) / 10.0) AS int) - 1),
            |  i -> array_join(slice(split(trim(text), '[ \\t\\n\\f\\r]+'), i * 10 + 1, 10), ' '))""".stripMargin))
          .as(Seq("idx", "line")))
    // The first-occurrence window partitions on the 128-bit line hash,
    // not the line string: the window shuffle's partition/sort key is 16
    // bytes per row instead of the line text (which still rides as a
    // VALUE — it is needed to rebuild the document — but never as the
    // exchange key). Exactness under a hash collision is guarded the same
    // way as Dedup.d01: min/max line over the same partition must agree
    // or the query raises instead of silently merging distinct lines.
    val hw = Window.partitionBy(col("h1"), col("h2"))
    // seed literal FIRST: xxhash64(line, 1) would chain the first hash as
    // the seed of a fixed-input XXH64 step — a bijection of h1, leaving the
    // "pair" only 64 bits wide (see Dedup.withTextKey); seed-first re-hashes
    // the line bytes under a different seed, so h2 is independent of h1
    val firstSeen = lines
      .withColumn("h1", xxhash64(col("line")))
      .withColumn("h2", xxhash64(lit(1L), col("line")))
      .withColumn("rn",
        row_number().over(hw.orderBy(col("doc_id"), col("idx"))))
      .withColumn("l0", min(col("line")).over(hw))
      .withColumn("l1", max(col("line")).over(hw))
      .filter(when(col("l0") <=> col("l1"), lit(true)).otherwise(raise_error(lit(
        "graft: 128-bit line-hash collision — line-dedup invariant violated")).cast("boolean")))
      .filter(col("rn") === 1)
    val rebuilt = firstSeen.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_lines_kept"),
      array_join(transform(array_sort(collect_list(struct(col("idx"), col("line")))),
        x => x.getField("line")), " ").as("text_dedup"))
    docs.select(col("doc_id")).join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
      .orderBy(col("doc_id"))
  }

  val x15Oracle: String =
    """WITH words AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
      |), lines AS (
      |  SELECT doc_id, i.i AS idx,
      |    array_to_string(w[i.i * 10 + 1 : i.i * 10 + 10], ' ') AS line
      |  FROM words,
      |    LATERAL (SELECT UNNEST(generate_series(0,
      |      CAST(CEIL(len(w) / 10.0) AS INT) - 1)) AS i) i
      |), kept AS (
      |  SELECT doc_id, idx, line,
      |    ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
      |  FROM lines
      |), rebuilt AS (
      |  SELECT doc_id, COUNT(*) AS n_lines_kept,
      |    string_agg(line, ' ' ORDER BY idx) AS text_dedup
      |  FROM kept WHERE rn = 1 GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  COALESCE(r.n_lines_kept, 0) AS n_lines_kept,
      |  COALESCE(r.text_dedup, '') AS text_dedup
      |FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- x16

  /** x16: Unicode normalization + control-char cleanup (r8) — the
    * fix-text step web-scale pipelines run BEFORE any hashing: NFC
    * canonical composition (decomposed "e"+U+0301 and composed U+00E9
    * must fingerprint identically or near-dup detection silently
    * misses), C0 control stripping, whitespace collapse. NFC is a
    * codegen'd Catalyst expression ([[graft.functions.NfcNormalize]],
    * `graft_nfc` in SQL); strip/collapse are builtin regexp_replace.
    * The gate plants deterministic decomposed + control-char suffixes on
    * every document so the normalization provably fires; DuckDB's
    * `nfc_normalize` recomputes it.
    */
  def x16Normalize(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // decomposed e + combining acute, a tab run, a C0 control, spaces
    val dirty = concat(col("text"), lit(" Cafe\u0301 \t\u0001  fin"))
    val cleaned = regexp_replace(
      regexp_replace(dirty, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""),
      "\\s+", " ")
    val norm = graft.functions.F.nfc(cleaned)
    docs.select(col("doc_id"), norm.as("norm_text"),
        length(norm).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  val x16Oracle: String =
    """SELECT doc_id,
      |  nfc_normalize(regexp_replace(regexp_replace(
      |    text || ' Cafe' || chr(769) || ' ' || chr(9) || chr(1) || '  fin',
      |    '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'), '\s+', ' ', 'g')) AS norm_text,
      |  CAST(length(nfc_normalize(regexp_replace(regexp_replace(
      |    text || ' Cafe' || chr(769) || ' ' || chr(9) || chr(1) || '  fin',
      |    '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'), '\s+', ' ', 'g'))) AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x17

  /** x17: REAL-tokenizer token accounting (closing x01's "BPE-ish"
    * approximation): greedy longest-match over the shipped subword
    * vocabulary ([[graft.functions.SubwordTokenCount]], codegen'd), the
    * deterministic stand-in for a BPE tokenizer's charge. Budget shapes
    * inherit it: `budget_real` is the running-sum packing key p02 would
    * use. Oracle-checked since r10: the greedy matcher IS expressible in
    * DuckDB as a recursive CTE advancing one token per step (longest
    * matching vocab prefix, else one char), run per DISTINCT word —
    * whitespace separates and no vocab entry contains it, so word-local
    * tokenization is exactly the full-text scan. The oracle's vocabulary
    * VALUES list is generated from [[graft.functions.SubwordVocab]]
    * itself, so the two sides can never drift; the matcher's semantics
    * stay independently pinned in TokenizerSpec.
    */
  def x17SubwordTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.F.subwordTokens(col("text")).as("tokens_real"),
        size(words(col("text"))).cast("long").as("n_words"),
        length(col("text")).cast("long").as("len_chars"))
      .orderBy(col("doc_id"))

  lazy val x17Oracle: String = {
    val vocab = graft.functions.SubwordVocab.entries
      .map(e => "('" + e.replace("'", "''") + "')").mkString(",")
    s"""WITH RECURSIVE
       |docs AS (SELECT doc_id, lower(text) AS t, text FROM documents),
       |words AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(t), '\\s+')) AS w FROM docs),
       |uw AS (SELECT DISTINCT w FROM words WHERE w <> ''),
       |vocab(e) AS (SELECT * FROM (VALUES $vocab) v(e)),
       |tok(w, pos, n) AS (
       |  SELECT w, 1, CAST(0 AS BIGINT) FROM uw
       |  UNION ALL
       |  SELECT t.w,
       |    t.pos + COALESCE((SELECT MAX(len(v.e)) FROM vocab v
       |      WHERE v.e = substr(t.w, t.pos, len(v.e))), 1),
       |    t.n + 1
       |  FROM tok t WHERE t.pos <= len(t.w)),
       |wtok AS (SELECT w, MAX(n) AS n_tok FROM tok GROUP BY w),
       |per_doc AS (
       |  SELECT w2.doc_id, SUM(wt.n_tok) AS tokens_real
       |  FROM (SELECT doc_id, w FROM words WHERE w <> '') w2
       |  JOIN wtok wt USING (w) GROUP BY w2.doc_id)
       |SELECT d.doc_id, CAST(COALESCE(p.tokens_real, 0) AS BIGINT) AS tokens_real,
       |  CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS n_words,
       |  CAST(length(d.text) AS BIGINT) AS len_chars
       |FROM docs d LEFT JOIN per_doc p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- x19

  /** x19: merge-rule BPE token accounting — the real-BPE upgrade over
    * x17's greedy longest-match (VERDICT r13 #5). The shipped rules
    * ([[graft.functions.BpeVocab]], trained on a bounded sample by
    * `graft.BpeTrain`) apply by RANK PRIORITY — repeatedly merge the
    * lowest-ranked adjacent symbol pair, leftmost on ties — as one
    * codegen'd expression; per-row, shuffle-free, memoized per word on
    * each executor. Merges operate on UTF-8 BYTES (GPT-2/tiktoken
    * lineage — byte fallback, no OOV). The oracle replays the identical
    * procedure in a DuckDB recursive CTE per DISTINCT word, in the
    * lowercase-HEX byte representation (`lower(hex(encode(w)))` sliced
    * into 2-char units, so DuckDB's code-point indexing can never
    * diverge from the kernel's byte indexing on non-ASCII text): rank
    * list → `list_min` → leftmost `list_position` → slice-merge, with
    * the merge table GENERATED from BpeVocab itself so the two sides
    * cannot drift; words beyond [[graft.functions.BpeVocab.MaxWordLen]]
    * BYTES are charged one token per byte ON BOTH SIDES (the merge loop
    * is O(L²) — a multi-megabyte unbroken crawl token must not stall an
    * executor); independent-reimplementation + hand-case pins in BpeSpec.
    */
  def x19BpeTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.F.bpeTokens(col("text")).as("tokens_bpe"),
        size(words(col("text"))).cast("long").as("n_words"))
      .orderBy(col("doc_id"))

  // ----------------------------------------------- shared oracle fragments
  //
  // The DuckDB replays of the portable kernels, as ONE definition each:
  // x18/x21/p05 interpolate these instead of carrying their own copies of
  // the hash arithmetic, so a kernel change cannot silently drift one
  // oracle while the others still match.

  /** [[graft.functions.LinearScoreKernel]]'s word hash replayed in DuckDB:
    * 31-polynomial over code points mod 2^31−1, bucketed to 65536.
    */
  private def sqlWordHash(w: String): String =
    s"(list_reduce(list_prepend(CAST(7 AS BIGINT), [CAST(unicode(c) AS BIGINT) " +
      s"FOR c IN regexp_split_to_array($w, '')]), " +
      s"(a, c) -> (a * 31 + c) % 2147483647) % 65536)"

  /** x18's derived classifier weight for a hashed token bucket. */
  private def sqlClsWeight(h: String): String =
    s"(($h * 2654435761) % 2147483647 % 1001 - 500)"

  /** x21's derived bigram log-prob for a pair of hashed token buckets. */
  private def sqlBigramLp(h1: String, h2: String): String =
    s"(((($h1 * 31 + $h2) % 65536) * 2654435761) % 2147483647 % 1000 - 1000)"

  /** The trained BPE merge table as a DuckDB list literal of 'l|r' keys,
    * each symbol in its lowercase-HEX byte form (the resource/oracle
    * representation — see [[graft.functions.BpeVocab]]'s scaladoc) —
    * shared by x19Oracle, p05Oracle and [[packedOracleSql]]. Hex symbols
    * are [0-9a-f] only, so the '|' join separator and SQL quoting are
    * unambiguous by construction.
    */
  private def bpeMergePairsSql: String =
    graft.functions.BpeVocab.merges
      .map { case (l, r) =>
        "'" + graft.functions.BpeVocab.hexOf(l) + "|" +
          graft.functions.BpeVocab.hexOf(r) + "'" }
      .mkString("[", ",", "]")

  /** The trained merge PRODUCTS (l||r per rule, rank order, lowercase-hex
    * byte form) as a DuckDB list literal — p06's token-id arithmetic: a
    * merge product's id is 256 + its FIRST rank (disjoint from the 0-255
    * byte ids), which `list_position` (first match) replays exactly;
    * generated from the same [[graft.functions.BpeVocab]] the Spark
    * kernel reads, so the two sides cannot drift.
    */
  private def bpeProductsSql: String =
    graft.functions.BpeVocab.merges
      .map { case (l, r) => "'" + graft.functions.BpeVocab.hexOf(l + r) + "'" }
      .mkString("[", ",", "]")

  lazy val x19Oracle: String = {
    val pairs = bpeMergePairsSql
    s"""WITH RECURSIVE
       |docs AS (SELECT doc_id, lower(text) AS t, text FROM documents),
       |words AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(t), '\\s+')) AS w FROM docs),
       |uw AS (SELECT DISTINCT w FROM words WHERE w <> ''),
       |hx AS (SELECT w, lower(hex(encode(w))) AS hw FROM uw),
       |enc AS (
       |  SELECT w, [substr(hw, CAST(x AS INT), 2) FOR x IN range(1, length(hw)+1, 2)] AS syms
       |  FROM hx WHERE length(hw) <= 512),
       |steps(w, syms) AS (
       |  SELECT w, syms FROM enc
       |  UNION ALL
       |  SELECT w, syms[1:p-1] || [syms[p] || syms[p+1]] || syms[p+2:len(syms)]
       |  FROM (
       |    SELECT w, syms, list_position(rks, list_min(rks)) AS p, list_min(rks) AS best
       |    FROM (
       |      SELECT w, syms,
       |        [coalesce(nullif(list_position($pairs,
       |           syms[CAST(x AS INT)] || '|' || syms[CAST(x AS INT)+1]), 0), 1000000)
       |         FOR x IN range(1, len(syms))] AS rks
       |      FROM steps WHERE len(syms) > 1)
       |  ) WHERE best < 1000000),
       |wtok AS (
       |  SELECT w, CAST(MIN(len(syms)) AS BIGINT) AS n_tok FROM steps GROUP BY w
       |  UNION ALL
       |  SELECT w, CAST(length(hw) // 2 AS BIGINT) AS n_tok FROM hx WHERE length(hw) > 512),
       |per_doc AS (
       |  SELECT w2.doc_id, SUM(wt.n_tok) AS tokens_bpe
       |  FROM (SELECT doc_id, w FROM words WHERE w <> '') w2
       |  JOIN wtok wt USING (w) GROUP BY w2.doc_id)
       |SELECT d.doc_id, CAST(COALESCE(p.tokens_bpe, 0) AS BIGINT) AS tokens_bpe,
       |  CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS n_words
       |FROM docs d LEFT JOIN per_doc p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- x21

  /** x21: PERPLEXITY filtering — the CCNet/KenLM language-model stage
    * (distinct from x18's hashed-feature classifier): a word-bigram LM
    * scores each document by the integer log-prob sum over adjacent
    * word pairs ([[graft.functions.HashedBigramLogProb]], one codegen'd
    * expression; per-row, shuffle-free); keep/drop compares the sum to
    * the expected mean (−500 per pair) WITHOUT division, so the
    * threshold is exact integer arithmetic. The LM table is derived
    * (deterministic pseudo-random log-probs in [−1000, −1]) so the
    * oracle replays the exact bits in DuckDB list ops — a trained
    * bigram table drops into the kernel without touching the plan.
    */
  def x21PerplexityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    // edge-trim the FULL whitespace class before splitting (plain trim()
    // strips only spaces): a trailing newline would otherwise leave an
    // empty token that inflates n_pairs past what the kernel scores,
    // silently widening the keep threshold
    val ws = "[ \\t\\n\\f\\r]"
    val tokens = split(
      regexp_replace(col("text"), s"^$ws+|$ws+$$", ""), s"$ws+")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.F.bigramLogProb(tokens).as("lp_sum"),
        greatest(size(tokens).cast("long") - 1L, lit(0L)).as("n_pairs"))
      .withColumn("label",
        when(col("lp_sum") >= lit(-500L) * col("n_pairs"), "keep").otherwise("drop"))
      .orderBy(col("doc_id"))
  }

  val x21Oracle: String =
    s"""WITH w0 AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS ws
       |  FROM documents),
       |t AS (
       |  SELECT doc_id,
       |    [${sqlWordHash("w")}
       |     FOR w IN ws IF length(w) > 0] AS hs,
       |    CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_pairs
       |  FROM w0),
       |s AS (
       |  SELECT doc_id, n_pairs,
       |    CAST(COALESCE(list_sum([
       |      ${sqlBigramLp("hs[CAST(i AS INT)]", "hs[CAST(i AS INT) + 1]")}
       |      FOR i IN range(1, len(hs))]), 0) AS BIGINT) AS lp_sum
       |  FROM t)
       |SELECT doc_id, lp_sum, n_pairs,
       |  CASE WHEN lp_sum >= -500 * n_pairs THEN 'keep' ELSE 'drop' END AS label
       |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x23

  /** x23: TRAINED-LM perplexity filtering — x21's trained-table upgrade
    * (the step x19 took over x17 for BPE, applied to the LM family):
    * the bigram table is REAL statistics learned once on the declared
    * bounded sample by [[graft.BigramLmTrain]] and shipped as a resource
    * ([[graft.functions.BigramLm]]); documents score by table lookup
    * over the same portable hash/bucket arithmetic, and keep/drop
    * compares the sum to the training distribution's EXPECTED log-prob
    * per pair (count-weighted table mean, from the resource header) —
    * still division-free exact integers. The
    * oracle joins the GENERATED sparse table (unseen buckets at the
    * -1000 floor), so the resource and the replay cannot drift.
    * Per-row, shuffle-free, whole-stage codegen.
    */
  def x23PerplexityLm(spark: SparkSession, sfDir: String): DataFrame = {
    val tokens = split(
      regexp_replace(col("text"), s"^$wsClass+|$wsClass+$$", ""), s"$wsClass+")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.F.bigramLogProbLm(tokens).as("lp_sum"),
        greatest(size(tokens).cast("long") - 1L, lit(0L)).as("n_pairs"))
      .withColumn("label",
        when(col("lp_sum") >=
          lit(graft.functions.BigramLm.thresholdPerPair) * col("n_pairs"), "keep")
          .otherwise("drop"))
      .orderBy(col("doc_id"))
  }

  lazy val x23Oracle: String = {
    val lm = graft.functions.BigramLm
    val vals = lm.entries.map { case (b, lp) => s"($b,$lp)" }.mkString(",")
    val t = lm.thresholdPerPair
    s"""WITH w0 AS (
       |  SELECT doc_id, regexp_split_to_array(
       |    regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS ws
       |  FROM documents),
       |t AS (
       |  SELECT doc_id,
       |    [${sqlWordHash("w")}
       |     FOR w IN ws IF length(w) > 0] AS hs,
       |    CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_pairs
       |  FROM w0),
       |pr AS (
       |  SELECT doc_id, unnest([
       |    (hs[CAST(i AS INT)] * 31 + hs[CAST(i AS INT) + 1]) % 65536
       |    FOR i IN range(1, len(hs))]) AS b
       |  FROM t),
       |lmt(b, lp) AS (SELECT * FROM (VALUES $vals)),
       |ps AS (
       |  SELECT pr.doc_id, SUM(COALESCE(l.lp, -1000)) AS lp_sum
       |  FROM pr LEFT JOIN lmt l USING (b) GROUP BY pr.doc_id)
       |SELECT t.doc_id, CAST(COALESCE(ps.lp_sum, 0) AS BIGINT) AS lp_sum, t.n_pairs,
       |  CASE WHEN COALESCE(ps.lp_sum, 0) >= ($t) * t.n_pairs
       |       THEN 'keep' ELSE 'drop' END AS label
       |FROM t LEFT JOIN ps USING (doc_id) ORDER BY t.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- x24

  /** x24: DSIR data selection — importance RESAMPLING toward a target
    * domain (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"), the published method behind "make the
    * corpus look more like the domain I care about", distinct from the
    * quality filters (x02/x18/x21/x23 score absolute quality; this
    * scores RELATIVE likelihood): each document's importance weight is
    * log p_target − log p_raw over its hashed bigram features — DSIR's
    * own hashed-n-gram construction — with both models REAL trained
    * tables shipped as resources (`bigram_lm_target.txt`: the `en` docs
    * of the declared sample window; `bigram_lm.txt`: the whole window —
    * same trainer, same slice, differing only by domain). Both lookups
    * are codegen'd table expressions over the same token split, so the
    * weight is exact integer arithmetic the oracle replays bit-for-bit
    * by joining both GENERATED tables. Selection is the resampling
    * step: keep the top ⌈n/4⌉ documents per SOURCE by (weight desc,
    * doc_id) — one window per source partition (the p04 posture, no
    * global sort; at 100 TB the same selection runs as a threshold read
    * off a per-source weight histogram, declared). Per-row scoring,
    * shuffle only for the per-source rank.
    */
  def x24DsirSelect(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = split(
      regexp_replace(col("text"), s"^$wsClass+|$wsClass+$$", ""), s"$wsClass+")
    val scored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        (graft.functions.F.bigramLogProbTarget(tokens) -
          graft.functions.F.bigramLogProbLm(tokens)).as("weight"),
        greatest(size(tokens).cast("long") - 1L, lit(0L)).as("n_pairs"))
    val bySource = Window.partitionBy(col("source"))
    val rank = row_number().over(bySource.orderBy(col("weight").desc, col("doc_id")))
    scored
      .withColumn("rnk", rank.cast("long"))
      .withColumn("n_src", count(lit(1)).over(bySource))
      .withColumn("selected", expr("rnk <= (n_src + 3) div 4"))
      .select(col("doc_id"), col("source"), col("weight"), col("n_pairs"),
        col("selected"))
      .orderBy(col("doc_id"))
  }

  val x24Oracle: String = {
    val lm = graft.functions.BigramLm
    val raw = lm.entries.map { case (b, lp) => s"($b,$lp)" }.mkString(",")
    val tgt = lm.targetEntries.map { case (b, lp) => s"($b,$lp)" }.mkString(",")
    s"""WITH w0 AS (
       |  SELECT doc_id, source, regexp_split_to_array(
       |    regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS ws
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, source,
       |    [${sqlWordHash("w")}
       |     FOR w IN ws IF length(w) > 0] AS hs,
       |    CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_pairs
       |  FROM w0),
       |pr AS (
       |  SELECT doc_id, unnest([
       |    (hs[CAST(i AS INT)] * 31 + hs[CAST(i AS INT) + 1]) % 65536
       |    FOR i IN range(1, len(hs))]) AS b
       |  FROM t),
       |lmt(b, lp) AS (SELECT * FROM (VALUES $raw)),
       |ltt(b, lp) AS (SELECT * FROM (VALUES $tgt)),
       |ps AS (
       |  SELECT pr.doc_id,
       |    SUM(COALESCE(lt.lp, -1000) - COALESCE(lr.lp, -1000)) AS weight
       |  FROM pr LEFT JOIN lmt lr USING (b) LEFT JOIN ltt lt USING (b)
       |  GROUP BY pr.doc_id),
       |sc AS (
       |  SELECT t.doc_id, t.source,
       |    CAST(COALESCE(ps.weight, 0) AS BIGINT) AS weight, t.n_pairs
       |  FROM t LEFT JOIN ps USING (doc_id)),
       |rk AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY weight DESC, doc_id) AS rnk,
       |    COUNT(*) OVER (PARTITION BY source) AS n_src
       |  FROM sc)
       |SELECT doc_id, source, weight, n_pairs,
       |  rnk <= (n_src + 3) // 4 AS selected
       |FROM rk ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- x25

  /** x25: domain-graph ranking — the link-graph quality signal crawl
    * pipelines key on (CommonCrawl publishes exactly this: PageRank /
    * harmonic centrality over the REGISTERED-domain graph, consumed as a
    * per-domain quality prior by the filters upstream). Semantics,
    * declared: INTEGER PageRank — ranks are fixed-point longs (scale
    * 10^12), five iterations of r' = 15%·S + 85%·Σ_in floorDiv(r, outdeg)
    * with floor division at every step, so the result is exact integer
    * arithmetic both engines replay bit-for-bit (float PageRank would
    * drift across engines/partition orders: summation order is not
    * associative in IEEE — the x13/x18 integer discipline applied to
    * graph centrality). Dangling domains (link targets with no page)
    * keep absorbing and leak their mass — the declared variant; the
    * redistribution term is one aggregate away and changes no plumbing.
    *
    * Shape at 100 TB (10^8 domains): edges fold once to (src, dst,
    * multiplicity) — the only corpus-sized pass; each iteration is one
    * join + one groupBy on domain keys (the Graph.connectedComponents
    * posture: work per round is edge-sized, rank lineage cut by
    * localCheckpoint, never an adjacency-list hot row). Fixed iteration
    * count keeps the oracle an unrolled CTE chain.
    *
    * Gate fixture: each document's page lives at domain d(doc_id mod 64)
    * and links to d((doc_id·31+7) mod 64) — a deterministic 64-node
    * multigraph whose URLs run through the REAL x22 expressions
    * (canonicalize → registered domain); the oracle replays the domain
    * strings by the same arithmetic and the whole 5-iteration ladder.
    */
  def x25DomainRank(spark: SparkSession, sfDir: String): DataFrame =
    x25DomainRank(spark, sfDir, 1L << 18)

  /** Below `localEdgeCap` FOLDED edges the ladder runs on the driver
    * (the [[Graph.connectedComponents]] fast-path rationale: each
    * distributed round is join+groupBy fixed job latency, pure overhead
    * on a small graph, and a folded domain graph is (src, dst, m) rows —
    * tens of MB at the cap). Identical integer ranks either way
    * (agreement spec-pinned); a real crawl's 10^8-domain graph takes the
    * distributed rounds untouched. Pass 0 to force them.
    */
  private[graft] def x25DomainRank(spark: SparkSession, sfDir: String,
      localEdgeCap: Long): DataFrame = {
    import graft.functions.F
    val Scale = 1000000000000L
    val Base = Scale * 15L / 100L
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    def domUrl(k: Column): Column =
      concat(lit("http://d"), k, lit(".example/p"))
    val edges = docs.select(
        F.regDomain(F.canonUrl(domUrl(pmod(col("doc_id"), lit(64L))))).as("src"),
        F.regDomain(F.canonUrl(domUrl(pmod(col("doc_id") * 31L + 7L, lit(64L))))).as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("m"))
      .persist()
    val nEdges = edges.count()
    if (nEdges <= localEdgeCap) {
      import spark.implicits._
      val es = edges.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      edges.unpersist()
      val ns = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
      val od = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
      val il = es.groupBy(_._2).map { case (d, g) => d -> g.map(_._3).sum }
      var r = ns.map(_ -> Scale).toMap
      for (_ <- 1 to 5) {
        val s = es.groupBy(_._2).map { case (dst, g) =>
          dst -> g.map { case (src, _, m) => m * Math.floorDiv(r(src), od(src)) }.sum }
        r = ns.map(n => n -> (Base + Math.floorDiv(85L * s.getOrElse(n, 0L), 100L))).toMap
      }
      return ns.map(n => (n, r(n), od.getOrElse(n, 0L), il.getOrElse(n, 0L)))
        .toSeq.toDF("domain", "rank", "out_links", "in_links")
        .orderBy(col("domain"))
    }
    val nodes = edges.select(col("src").as("domain"))
      .union(edges.select(col("dst"))).distinct().persist()
    val outdeg = edges.groupBy(col("src")).agg(sum(col("m")).as("od"))
    val edgesN = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("m"), col("od")).persist()
    var rank = nodes.select(col("domain"), lit(Scale).as("r")).diskCheckpoint()
    for (_ <- 1 to 5) {
      val contrib = edgesN.join(rank, edgesN("src") === rank("domain"))
        .select(col("dst"), (col("m") * expr("r div od")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      rank = nodes.join(contrib, nodes("domain") === contrib("dst"), "left")
        .select(col("domain"),
          (lit(Base) + expr("(85 * coalesce(s, 0)) div 100")).as("r"))
        .diskCheckpoint()
    }
    val inLinks = edges.groupBy(col("dst")).agg(sum(col("m")).as("in_links"))
    val out = nodes
      .join(rank, "domain")
      .join(outdeg.withColumnRenamed("src", "domain"), Seq("domain"), "left")
      .join(inLinks.withColumnRenamed("dst", "domain"), Seq("domain"), "left")
      .select(col("domain"), col("r").as("rank"),
        coalesce(col("od"), lit(0L)).as("out_links"),
        coalesce(col("in_links"), lit(0L)).as("in_links"))
      .orderBy(col("domain"))
      .diskCheckpoint()
    edges.unpersist(); nodes.unpersist(); edgesN.unpersist()
    out
  }

  /** The 5-iteration integer-PageRank ladder unrolled as CTEs — floor
    * division at every step makes each rung exact on both engines.
    */
  val x25Oracle: String = {
    def rung(k: Int): String =
      s"""s$k AS (
         |  SELECT e.dst AS domain, SUM(e.m * (r${k - 1}.r // od.od)) AS s
         |  FROM e JOIN od USING (src) JOIN r${k - 1} ON r${k - 1}.domain = e.src
         |  GROUP BY e.dst),
         |r$k AS (
         |  SELECT n.domain,
         |    CAST(150000000000 + (85 * COALESCE(s$k.s, 0)) // 100 AS BIGINT) AS r
         |  FROM n LEFT JOIN s$k USING (domain))""".stripMargin
    s"""WITH e0 AS (
       |  SELECT 'd' || CAST(doc_id % 64 AS VARCHAR) || '.example' AS src,
       |         'd' || CAST((doc_id * 31 + 7) % 64 AS VARCHAR) || '.example' AS dst
       |  FROM documents),
       |e AS (SELECT src, dst, COUNT(*) AS m FROM e0 GROUP BY src, dst),
       |n AS (SELECT src AS domain FROM e UNION SELECT dst FROM e),
       |od AS (SELECT src, SUM(m) AS od FROM e GROUP BY src),
       |il AS (SELECT dst AS domain, SUM(m) AS in_links FROM e GROUP BY dst),
       |r0 AS (SELECT domain, CAST(1000000000000 AS BIGINT) AS r FROM n),
       |${(1 to 5).map(rung).mkString(",\n")}
       |SELECT n.domain, r5.r AS rank,
       |  CAST(COALESCE(od.od, 0) AS BIGINT) AS out_links,
       |  CAST(COALESCE(il.in_links, 0) AS BIGINT) AS in_links
       |FROM n JOIN r5 USING (domain)
       |  LEFT JOIN od ON od.src = n.domain
       |  LEFT JOIN il USING (domain)
       |ORDER BY domain""".stripMargin
  }

  // ---------------------------------------------------------------- x22

  /** The deterministic URL x22 plants on every document — mixed-case
    * scheme/host, a `www.` label, default and non-default ports, a
    * ccSLD (`co.uk`) registered domain, tracking parameters
    * interleaved with real ones, and a fragment. Same concat in both
    * engines (the x20 planted-markup discipline).
    */
  private def plantedUrl(id: Column): Column = concat(
    when(id % 2 === 0, lit("HTTPS://WWW.News")).otherwise(lit("http://blog")),
    id % 5, lit("."),
    when(id % 3 === 0, lit("example.COM"))
      .when(id % 3 === 1, lit("Sample.co.uk"))
      .otherwise(lit("demo.org")),
    when(id % 2 === 0, lit(":443"))
      .when(id % 5 === 4, lit(":8080")).otherwise(lit(":80")),
    lit("/Articles/"), id,
    lit("/index.html?utm_source=feed&page="), id % 7,
    lit("&fbclid=abc"), id,
    when(id % 4 === 0, lit("&ref=home")).otherwise(lit("&lang=en")),
    lit("#Section-"), id % 9)

  /** x22: URL filtering + normalization — the crawl stage BEFORE even
    * x20's extraction: canonicalize each page's URL (case/port/fragment
    * equivalences + tracking-parameter strip, one codegen'd pass —
    * [[graft.functions.UrlCanonicalize]]), key it to its REGISTERED
    * domain ([[graft.functions.UrlRegisteredDomain]], the mini-PSL
    * rule), then drop blocklisted domains via a BROADCAST join — the
    * blocklist is thousands of rows against a 100 TB corpus, so it
    * ships to every executor and the corpus never shuffles. The gate
    * plants a deterministic URL per document exercising every
    * canonicalization rule; the oracle replays the declared chain with
    * DuckDB string/regex/list functions and must reproduce the
    * canonical URL STRING-identically. Envelope probe + refusal
    * semantics and an independent java.net.URI reimplementation are
    * pinned in UrlSpec.
    */
  def x22UrlFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.F
    val blocklist = broadcast(Seq("sample.co.uk").toDF("bad_domain"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), F.canonUrl(plantedUrl(col("doc_id"))).as("url_canon"))
      .withColumn("domain", F.regDomain(col("url_canon")))
      .join(blocklist, col("domain") === col("bad_domain"), "left")
      .withColumn("label",
        when(col("bad_domain").isNotNull, "drop").otherwise("keep"))
      .select(col("doc_id"), col("url_canon"), col("domain"), col("label"))
      .orderBy(col("doc_id"))
  }

  /** The planted URL as DuckDB SQL over id expression `id` — the same
    * concat as [[plantedUrl]], shared by the x22 and p05 oracles.
    */
  private def sqlPlantedUrl(id: String): String =
    s"""(CASE WHEN ($id) % 2 = 0 THEN 'HTTPS://WWW.News' ELSE 'http://blog' END) ||
       |  CAST(($id) % 5 AS VARCHAR) || '.' ||
       |  (CASE WHEN ($id) % 3 = 0 THEN 'example.COM'
       |        WHEN ($id) % 3 = 1 THEN 'Sample.co.uk' ELSE 'demo.org' END) ||
       |  (CASE WHEN ($id) % 2 = 0 THEN ':443'
       |        WHEN ($id) % 5 = 4 THEN ':8080' ELSE ':80' END) ||
       |  '/Articles/' || CAST($id AS VARCHAR) ||
       |  '/index.html?utm_source=feed&page=' || CAST(($id) % 7 AS VARCHAR) ||
       |  '&fbclid=abc' || CAST($id AS VARCHAR) ||
       |  (CASE WHEN ($id) % 4 = 0 THEN '&ref=home' ELSE '&lang=en' END) ||
       |  '#Section-' || CAST(($id) % 9 AS VARCHAR)""".stripMargin

  /** The x22 canonicalization + registered-domain chain as oracle CTEs
    * over table `src`: plant the URL from id expression `seed`, replay
    * the declared rule chain, and end in `ud(uid, url_canon, domain)`
    * keyed by `uid` — ONE shared fragment, so the x22 gate and the p05
    * pipeline replay cannot drift.
    */
  private def sqlUrlCtes(src: String, uid: String, seed: String): String =
    s"""u1 AS (SELECT $uid AS uid,
       |  regexp_replace(${sqlPlantedUrl(seed)}, '#.*$$', '', 's') AS u FROM $src),
       |up AS (SELECT uid,
       |  lower(regexp_extract(u, '^([^:/?#]+)://', 1)) AS sch,
       |  lower(regexp_extract(u, '^[^:/?#]+://([^/?]*)', 1)) AS auth,
       |  regexp_extract(u, '^[^:/?#]+://[^/?]*([^?]*)', 1) AS pth,
       |  CASE WHEN strpos(u, '?') > 0 THEN substr(u, strpos(u, '?') + 1) END AS qs
       | FROM u1),
       |ua AS (SELECT uid, sch, qs,
       |  regexp_replace(
       |    CASE WHEN sch = 'http' THEN regexp_replace(auth, ':80$$', '')
       |         ELSE regexp_replace(auth, ':443$$', '') END,
       |    '^www\\.', '') AS auth,
       |  CASE WHEN pth = '' THEN '/' ELSE pth END AS pth
       | FROM up),
       |uq AS (SELECT uid, sch, auth, pth,
       |  list_filter(string_split(COALESCE(qs, ''), '&'), s ->
       |    len(s) > 0 AND NOT (
       |      starts_with(split_part(s, '=', 1), 'utm_') OR
       |      split_part(s, '=', 1) IN ('fbclid', 'gclid', 'ref'))) AS ps
       | FROM ua),
       |uc AS (SELECT uid,
       |  sch || '://' || auth || pth ||
       |  CASE WHEN len(ps) = 0 THEN '' ELSE '?' || array_to_string(ps, '&') END AS url_canon,
       |  string_split(split_part(auth, ':', 1), '.') AS ls
       | FROM uq),
       |ud AS (SELECT uid, url_canon,
       |  CASE WHEN len(ls) >= 3 AND len(ls[len(ls)]) = 2
       |        AND ls[len(ls) - 1] IN ('co', 'com', 'net', 'org', 'gov', 'ac', 'edu')
       |       THEN array_to_string(ls[len(ls) - 2 : len(ls)], '.')
       |       WHEN len(ls) >= 2 THEN array_to_string(ls[len(ls) - 1 : len(ls)], '.')
       |       ELSE ls[1] END AS domain
       | FROM uc)""".stripMargin

  val x22Oracle: String =
    s"""WITH ${sqlUrlCtes("documents", "doc_id", "doc_id")}
       |SELECT uid AS doc_id, url_canon, domain,
       |  CASE WHEN domain IN ('sample.co.uk') THEN 'drop' ELSE 'keep' END AS label
       |FROM ud ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- x20

  /** x20: HTML → text extraction + boilerplate-line removal — the
    * CommonCrawl step that runs BEFORE every filter in this section
    * (VERDICT r13 #6). Markup strip, entity decode and line
    * normalization are ONE codegen'd pass per document
    * ([[graft.functions.HtmlTextExtract]]); the C4-style line filter
    * (keep lines with ≥ 5 words) is a second codegen'd expression
    * ([[graft.functions.KeepLinesMinWords]]) — per-row, shuffle-free, no
    * regex cascade in the hot path. The gate PLANTS deterministic
    * markup around every document (nav/script/style/footer boilerplate,
    * comments, all six named entities, a short call-to-action line) with
    * the SAME concat in both engines, and the oracle must reproduce the
    * extracted and filtered text STRING-identically. The oracle
    * implements the FULL declared chain — container-name boundaries
    * (`<header>` is not `<head>`), unterminated-comment/-container
    * removal to end, all six named entities with `&amp;` last — except
    * generic numeric code-point entities, which RE2 cannot compute (no
    * replacement callbacks): the planted `&#39;` is a fixed replace, and
    * general numeric decode is pinned in HtmlSpec; hostile-input
    * equivalence to an independent regex-chain reimplementation is
    * pinned there too.
    */
  /** The deterministic markup x20/p05 plant around every document —
    * nav/style/script/footer boilerplate, a comment, all six named
    * entities, a 4-word call-to-action line the filter must drop.
    */
  private def plantedHtml: Column = concat(
    lit("<html><head><title>doc "), col("doc_id"),
    lit("</title><style>p{color:red}</style></head><body>"),
    lit("<nav><a href=\"#\">home</a> | <a href=\"#\">about</a> | <a href=\"#\">contact</a></nav>"),
    lit("<!-- rendered for doc "), col("doc_id"), lit(" -->"),
    lit("<h1>document "), col("doc_id"), lit(" &amp; friends</h1>"),
    lit("<p>"), col("text"), lit("</p>"),
    lit("<p>click here to subscribe</p>"),
    lit("<script>var t = 1 < 2 && \"x\";</script>"),
    lit("<p>she said &quot;hello&nbsp;world&quot; &#39;today&#39; &apos;z&apos; &lt;em&gt; ok then</p>"),
    lit("<footer>copyright 2026 example corp</footer></body></html>"))

  def x20HtmlExtract(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.F.htmlText(plantedHtml).as("body"))
      .withColumn("kept", graft.functions.F.keepLines(col("body"), 5))
      .select(
        col("doc_id"), col("body"), col("kept"),
        size(split(col("body"), "\n")).cast("long").as("n_lines"),
        size(split(col("kept"), "\n")).cast("long").as("n_kept"))
      .orderBy(col("doc_id"))
  }

  /** The x20 extraction chain as an oracle CTE fragment ending in
    * `k(doc_id, body, kept)` — shared verbatim by the x20 gate and the
    * p05 end-to-end pipeline so the two replays cannot drift.
    */
  private val htmlOracleCtes: String =
    """h AS (
      |  SELECT doc_id,
      |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title><style>p{color:red}</style></head><body>' ||
      |    '<nav><a href="#">home</a> | <a href="#">about</a> | <a href="#">contact</a></nav>' ||
      |    '<!-- rendered for doc ' || CAST(doc_id AS VARCHAR) || ' -->' ||
      |    '<h1>document ' || CAST(doc_id AS VARCHAR) || ' &amp; friends</h1>' ||
      |    '<p>' || text || '</p>' ||
      |    '<p>click here to subscribe</p>' ||
      |    '<script>var t = 1 < 2 && "x";</script>' ||
      |    '<p>she said &quot;hello&nbsp;world&quot; &#39;today&#39; &apos;z&apos; &lt;em&gt; ok then</p>' ||
      |    '<footer>copyright 2026 example corp</footer></body></html>' AS html
      |  FROM src_docs),
      |s1 AS (SELECT doc_id,
      |    regexp_replace(html, '<!--.*?-->|<!--.*$', '', 'gs') AS x FROM h),
      |s2 AS (SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      x, '<script(>|[\s/][^>]*>).*?</script[^>]*>|<script(>|[\s/][^>]*>).*$', '', 'gis'),
      |         '<style(>|[\s/][^>]*>).*?</style[^>]*>|<style(>|[\s/][^>]*>).*$', '', 'gis'),
      |         '<head(>|[\s/][^>]*>).*?</head[^>]*>|<head(>|[\s/][^>]*>).*$', '', 'gis'),
      |         '<nav(>|[\s/][^>]*>).*?</nav[^>]*>|<nav(>|[\s/][^>]*>).*$', '', 'gis'),
      |         '<footer(>|[\s/][^>]*>).*?</footer[^>]*>|<footer(>|[\s/][^>]*>).*$', '', 'gis') AS x FROM s1),
      |s3 AS (SELECT doc_id, regexp_replace(x, '<[^>]*>', chr(10), 'g') AS x FROM s2),
      |s4 AS (SELECT doc_id,
      |    replace(replace(replace(replace(replace(replace(replace(
      |      x, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
      |         '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS x FROM s3),
      |ex AS (SELECT doc_id,
      |    array_to_string(
      |      list_filter([trim(regexp_replace(l, '[ \t\f\r]+', ' ', 'g'))
      |                   FOR l IN string_split(x, chr(10))], l -> l <> ''),
      |      chr(10)) AS body FROM s4),
      |k AS (SELECT doc_id, body,
      |    array_to_string(
      |      list_filter(string_split(body, chr(10)),
      |                  l -> len(string_split(l, ' ')) >= 5),
      |      chr(10)) AS kept FROM ex)""".stripMargin

  val x20Oracle: String =
    s"""WITH src_docs AS (SELECT doc_id, text FROM documents),
       |$htmlOracleCtes
       |SELECT doc_id, body, kept,
       |  CAST(len(string_split(body, chr(10))) AS BIGINT) AS n_lines,
       |  CAST(len(string_split(kept, chr(10))) AS BIGINT) AS n_kept
       |FROM k ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- p05

  /** p05: END-TO-END crawl curation (r14 capstone) — the r14 operators
    * working TOGETHER on one corpus, each stage the real shape it ships
    * as: URL canonicalization + registered-domain blocklist (x22's
    * expressions, broadcast anti join, run FIRST — before any heavy
    * per-row work, exactly as a crawl orders it; the planted URL derives
    * from the original id so twins drop together and dedup still halves)
    * → planted HTML (the x20 markup, over a doubled corpus so dedup
    * has real work) → single-pass extraction + boilerplate-line filter
    * (x20's expressions) → a two-model quality vote (x21 bigram-LM
    * threshold AND x18 classifier sign, both codegen'd over the SAME
    * token split) → exact dedup on the 128-bit hash pair with the d01
    * verified-exactness guard → merge-rule BPE token accounting (x19)
    * over the survivors, folded per source. The heavy per-row work
    * (extraction, both model kernels, the hash pair) runs in ONE pass
    * feeding ONE exchange keyed on (h1, h2, source); per-source totals
    * and the cross-source dedup both fold that one aggregate, so the
    * expensive subplan executes once (ReuseExchange — spec-pinned)
    * instead of once per output branch, and the two downstream shuffles
    * carry only the deduped (text, source) rows. Fixture, key and guard
    * are [[Dedup.doubledCorpus]]/[[Dedup.withTextKey]]/
    * [[Dedup.sameOrFail]] — the d01 invariants by reference, not by
    * copy. The oracle replays every stage: the SHARED x20 CTE fragment,
    * the x21/x18 hash arithmetic (shared fragments), text-keyed dedup
    * (equal to the hash dedup because the guard raises on any
    * collision), and the x19 recursive-CTE BPE over surviving documents.
    */
  def p05CrawlCuration(spark: SparkSession, sfDir: String): DataFrame = {
    val g1 = p05Keyed(spark, sfDir)
    p05Fold(g1)
  }

  /** The p05 chain through the quality vote and the keyed, guarded
    * (h1, h2, source) aggregate — shared VERBATIM by p05 (which folds
    * totals/dedup/BPE from it) and p07 (which packs the survivors), so
    * the two capstones run the same curation code, not copies that can
    * drift.
    */
  private def p05Keyed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.F
    // the doubling fixture, the 128-bit key and the collision guard are
    // the SAME helpers d01 ships — p05 advertises d01's exactness
    // invariant, so it must run d01's code, not a copy that can drift
    val corpus = Dedup.doubledCorpus(spark, sfDir)
    // URL stage (x22) FIRST — the cheap per-row check runs before the
    // heavy extraction, exactly as a crawl orders it: the planted URL
    // derives from the ORIGINAL id (the doubling shift is 2^40), so a
    // twin shares its original's URL and the domain filter drops dup
    // pairs together; the blocklist ships broadcast (anti join), the
    // corpus never shuffles for it. n_docs counts the URL survivors.
    val blocklist = broadcast(Seq("sample.co.uk").toDF("bad_domain"))
    val fetched = corpus
      .withColumn("domain",
        F.regDomain(F.canonUrl(plantedUrl(col("doc_id") % lit(1L << 40)))))
      .join(blocklist, col("domain") === col("bad_domain"), "left_anti")
      .drop("domain")
    val base = fetched.select(col("doc_id"), col("source"),
      F.keepLines(F.htmlText(plantedHtml), 5).as("kept"))
    // kept is edge-clean (trimmed non-empty lines), so the split has no
    // empty tokens and both models see the identical word sequence
    val toks = split(col("kept"), s"$wsClass+")
    val scored = Dedup.withTextKey(base, "kept")
      .withColumn("lp_sum", F.bigramLogProb(toks))
      .withColumn("n_pairs", greatest(size(toks).cast("long") - 1L, lit(0L)))
      .withColumn("cls", F.linearScore(toks))
      .withColumn("q", col("lp_sum") >= lit(-500L) * col("n_pairs") && col("cls") > 0L)
    // ONE heavy pass: extraction, both model kernels and the hash pair
    // run exactly once, folded into a single exchange keyed on
    // (h1, h2, source). Every output column is derived from this one
    // aggregate, so the two consumers below share the SAME exchange
    // subtree and Catalyst's ReuseExchange/AQE stage reuse computes the
    // expensive upstream once (three disjoint-keyed branches — the
    // previous shape — re-ran it three times; spec-pinned in
    // PipelineGatesSpec). The keyed guard below is what MAKES the reuse
    // fire: it references every aggregate output (n included), so column
    // pruning cannot specialize the aggregate list per branch — totals
    // ignores (doc_id, t0, t1) and reps ignores n, and without the guard
    // the two pruned subplans stop being sameResult and the heavy
    // upstream runs twice (observed before this shape landed).
    // q is constant within a group (it depends only on kept, and the
    // group is one exact text per source — the guard verifies), so
    // min(q) is THE group's verdict, not a vote.
    // Witnesses ride the exchange ONLY for quality groups: they exist to
    // verify the texts that flow onward into dedup/BPE, and a crawl-scale
    // corpus is mostly filtered-out docs — shipping their witness strings
    // through the one corpus-scale shuffle would roughly double its bytes
    // for rows no later stage reads. Quality groups keep d01's full
    // verified exactness; the count-only outputs (n_docs, n_quality) are
    // exact by per-group arithmetic under the same 2^-128 key guarantee
    // d02's count_distinct carries, with the quality-group witness (and
    // d01 over the same doubled corpus in the same gate run) as the
    // collision canary.
    val qKept = when(col("q"), col("kept"))
    scored.groupBy(col("h1"), col("h2"), col("source"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("doc_id"),
        min(qKept).as("t0"), max(qKept).as("t1"),
        min(col("q")).as("q"))
      .filter(Dedup.sameOrFailKeyed(col("t0"), col("t1"),
        col("h1"), col("h2"), col("doc_id"), col("n"), col("q")))
  }

  private def p05Fold(g1: DataFrame): DataFrame = {
    import graft.functions.F
    val totals = g1.groupBy(col("source")).agg(
      sum(col("n")).as("n_docs"),
      sum(when(col("q"), col("n")).otherwise(0L)).as("n_quality"))
    // dedup ACROSS sources: the representative is the globally-lowest
    // doc_id's row; its source gets the survivor. The guard spans the
    // whole (h1, h2) group — min/max over the per-source min/max is the
    // corpus-wide min/max — so a cross-source collision raises too.
    val reps = g1.filter(col("q"))
      .groupBy(col("h1"), col("h2"))
      .agg(min_by(col("source"), col("doc_id")).as("source"),
        min(col("t0")).as("t0"), max(col("t1")).as("t1"))
      .filter(Dedup.sameOrFail(col("t0"), col("t1")))
      .select(col("source"), col("t0").as("kept"))
    val uniq = reps.groupBy(col("source")).agg(
      count(lit(1)).as("n_unique"),
      sum(F.bpeTokens(col("kept"))).as("tokens_bpe"))
    totals.join(uniq, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_quality"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("tokens_bpe"), lit(0L)).as("tokens_bpe"))
      .orderBy(col("source"))
  }

  /** The p05 curation chain as oracle CTEs, through `surv` (one row per
    * surviving quality-deduped text: doc_id = the corpus-min
    * representative, source, kept) — ONE definition shared by the p05
    * and p07 oracles, so the two capstones replay the same chain.
    */
  private def p05SurvivorCtes: String =
    s"""all_docs AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL SELECT doc_id + 1099511627776, text, source FROM documents),
       |${sqlUrlCtes("all_docs", "doc_id", "doc_id % 1099511627776")},
       |src_docs AS (
       |  SELECT a.* FROM all_docs a JOIN ud ON a.doc_id = ud.uid
       |  WHERE ud.domain NOT IN ('sample.co.uk')),
       |$htmlOracleCtes,
       |tok AS (
       |  SELECT k.doc_id, sd.source, k.kept,
       |    regexp_split_to_array(k.kept, '\\s+') AS ws
       |  FROM k JOIN src_docs sd USING (doc_id)),
       |lm AS (
       |  SELECT doc_id, source, kept, ws,
       |    [${sqlWordHash("w")}
       |     FOR w IN ws IF length(w) > 0] AS hs,
       |    CAST(greatest(len(ws) - 1, 0) AS BIGINT) AS n_pairs,
       |    CAST(COALESCE(list_sum([
       |      ${sqlClsWeight(sqlWordHash("w"))}
       |      FOR w IN ws IF length(w) > 0]), 0) AS BIGINT) AS cls
       |  FROM tok),
       |lp AS (
       |  SELECT doc_id, source, kept, n_pairs, cls,
       |    CAST(COALESCE(list_sum([
       |      ${sqlBigramLp("hs[CAST(i AS INT)]", "hs[CAST(i AS INT) + 1]")}
       |      FOR i IN range(1, len(hs))]), 0) AS BIGINT) AS lp_sum
       |  FROM lm),
       |good AS (SELECT * FROM lp WHERE lp_sum >= -500 * n_pairs AND cls > 0),
       |reps AS (SELECT MIN(doc_id) AS doc_id FROM good GROUP BY kept),
       |surv AS (SELECT g.* FROM good g JOIN reps USING (doc_id))""".stripMargin

  lazy val p05Oracle: String = {
    val pairs = bpeMergePairsSql
    s"""WITH RECURSIVE
       |$p05SurvivorCtes,
       |words2 AS (
       |  SELECT doc_id, unnest([w FOR w IN
       |    regexp_split_to_array(lower(kept), '\\s+') IF w <> '']) AS w
       |  FROM surv),
       |uw AS (SELECT DISTINCT w FROM words2),
       |hx AS (SELECT w, lower(hex(encode(w))) AS hw FROM uw),
       |enc AS (
       |  SELECT w, [substr(hw, CAST(x AS INT), 2) FOR x IN range(1, length(hw)+1, 2)] AS syms
       |  FROM hx WHERE length(hw) <= 512),
       |steps(w, syms) AS (
       |  SELECT w, syms FROM enc
       |  UNION ALL
       |  SELECT w, syms[1:p-1] || [syms[p] || syms[p+1]] || syms[p+2:len(syms)]
       |  FROM (
       |    SELECT w, syms, list_position(rks, list_min(rks)) AS p, list_min(rks) AS best
       |    FROM (
       |      SELECT w, syms,
       |        [coalesce(nullif(list_position($pairs,
       |           syms[CAST(x AS INT)] || '|' || syms[CAST(x AS INT)+1]), 0), 1000000)
       |         FOR x IN range(1, len(syms))] AS rks
       |      FROM steps WHERE len(syms) > 1)
       |  ) WHERE best < 1000000),
       |wtok AS (
       |  SELECT w, CAST(MIN(len(syms)) AS BIGINT) AS n_tok FROM steps GROUP BY w
       |  UNION ALL
       |  SELECT w, CAST(length(hw) // 2 AS BIGINT) AS n_tok FROM hx WHERE length(hw) > 512),
       |per_doc AS (
       |  SELECT w2.doc_id, SUM(wt.n_tok) AS t
       |  FROM words2 w2 JOIN wtok wt USING (w) GROUP BY w2.doc_id),
       |alln AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM src_docs GROUP BY source),
       |qn AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_quality FROM good GROUP BY source),
       |un AS (
       |  SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_unique,
       |    CAST(SUM(p.t) AS BIGINT) AS tokens_bpe
       |  FROM surv s JOIN per_doc p USING (doc_id) GROUP BY s.source)
       |SELECT a.source, a.n_docs,
       |  COALESCE(q.n_quality, 0) AS n_quality,
       |  COALESCE(u.n_unique, 0) AS n_unique,
       |  COALESCE(u.tokens_bpe, 0) AS tokens_bpe
       |FROM alln a LEFT JOIN qn q USING (source) LEFT JOIN un u USING (source)
       |ORDER BY a.source""".stripMargin
  }

  // ---------------------------------------------------------------- p04

  /** p04: deterministic SHARDED epoch shuffle — the step that turns a
    * curated corpus into per-epoch training order. Each epoch seeds a
    * portable multiplicative hash (the x10 family: doc_id < 2³¹ keeps
    * every intermediate under 2⁶³, so any engine reproduces the bits);
    * a doc's shard is `h % nShards` and its position is the rank of
    * (h, doc_id) WITHIN the (epoch, shard) — so the order is
    * row-reproducible on any engine/run/partitioning, epochs decorrelate
    * (different seed → different permutation), and NOTHING is global:
    * each shard sorts independently, which is exactly how training
    * shards are laid out at 100 TB (a writer per shard, no global sort,
    * no single-partition window — the window partitions by
    * epoch × shard, parallelism nShards × epochs).
    */
  def p04EpochShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nShards = 8
    val d = Tables.documents(spark, sfDir).select(col("doc_id"))
      .crossJoin(broadcast(Seq(1, 2).toDF("epoch")))
      .withColumn("h",
        ((col("doc_id") + col("epoch") * lit(1000003L)) * lit(2654435761L))
          % lit(2147483647L))
      .withColumn("shard", (col("h") % nShards).cast("int"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard")).orderBy(col("h"), col("doc_id"))
    d.withColumn("position", row_number().over(w).cast("long"))
      .select(col("epoch"), col("shard"), col("position"), col("doc_id"))
      .orderBy(col("epoch"), col("shard"), col("position"))
  }

  val p04Oracle: String =
    """WITH d AS (
      |  SELECT e.epoch, doc.doc_id,
      |    ((doc.doc_id + e.epoch * 1000003) * 2654435761) % 2147483647 AS h
      |  FROM documents doc CROSS JOIN (VALUES (1), (2)) e(epoch)),
      |s AS (
      |  SELECT epoch, doc_id, h, CAST(h % 8 AS INT) AS shard FROM d)
      |SELECT epoch, shard,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS position,
      |  doc_id
      |FROM s ORDER BY epoch, shard, position""".stripMargin

  // ---------------------------------------------------------------- x18

  /** x18: quality-classifier INFERENCE (the CCNet/C4 fastText-filter
    * step, distinct from x02's hand-written heuristics): every document
    * is scored by a hashed-feature linear model — token → portable hash
    * → one of 65536 weight buckets → integer weight — in one codegen'd
    * expression ([[graft.functions.LinearScoreKernel]]); keep/drop is
    * the score's sign. Per-row, shuffle-free, whole-stage codegen: the
    * shape of ANY batch model inference over a corpus at 100 TB. The
    * weights here are derived arithmetic (no model file to ship), so the
    * oracle replays the EXACT integer score; a trained model changes one
    * kernel function, not the plan.
    */
  def x18ClassifierScore(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.F.linearScore(words(col("text"))).as("score_sum"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("label", when(col("score_sum") > 0, "keep").otherwise("drop"))
      .orderBy(col("doc_id"))

  val x18Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    [w FOR w IN regexp_split_to_array(trim(text), '\\s+') IF length(w) > 0] AS ws,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(COALESCE(list_sum([
       |      ${sqlClsWeight(sqlWordHash("w"))}
       |      FOR w IN ws]), 0) AS BIGINT) AS score_sum
       |  FROM t)
       |SELECT doc_id, score_sum, n_tokens,
       |  CASE WHEN score_sum > 0 THEN 'keep' ELSE 'drop' END AS label
       |FROM s ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- p06

  /** p06: PACKED training sequences — the step that turns a curated
    * corpus into what a training job actually loads (GPT/LLaMA
    * concatenate-and-chunk, MATERIALIZED — p02 only accounts for it):
    * every document becomes its merge-rule BPE token-ID stream
    * ([[graft.functions.BpeTokenIds]], the materializing sibling of
    * x19's counter: byte ids below 256, merge-product ids at 256 + rank,
    * pure arithmetic so any engine replays them) plus one
    * end-of-document sentinel ([[graft.functions.BpeVocab.EosId]]);
    * streams concatenate per SHARD (doc_id mod 8 here; a production
    * run sizes shards to the cluster) in doc_id order and chunk at a
    * fixed 128-token budget — sequence k of a shard is tokens
    * [128k, 128k+128) of its stream, the last one partial.
    *
    * Shape at 100 TB: tokenization is one codegen'd per-row pass (no
    * shuffle); the running offset is a window cumsum WITHIN each shard
    * (the p04 posture — nothing global, shard count scales with the
    * cluster and each shard sorts independently, exactly the shard-file
    * layout training jobs read); then one exchange on (shard, seq_id)
    * assembles sequences whose size is bounded by the token budget, so
    * no aggregation buffer can outgrow 128 ids. Output sequences ride
    * as space-joined id strings compared STRING-identically — the
    * oracle replays tokenization (x19's recursive CTE extended to keep
    * the SYMBOLS, ids from the shared product fragment), concatenation,
    * offsets and chunking, so a single misplaced token anywhere in the
    * corpus fails the gate.
    */
  def p06PackedSequences(spark: SparkSession, sfDir: String): DataFrame =
    packIdStream(Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(graft.functions.F.bpeTokenIds(col("text")),
          array(lit(graft.functions.BpeVocab.EosId))).as("ids")))

  /** The concat-and-chunk tail shared by p06 (text) and m11 (interleaved
    * image+text): input is (doc_id, ids array<long>); shard, window
    * cumsum, chunk at the 128-token budget — see [[p06PackedSequences]]
    * for the scale argument.
    */
  private[operators] def packIdStream(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sharded = docs.withColumn("shard", pmod(col("doc_id"), lit(8L)))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOff = sharded.withColumn("off",
      coalesce(sum(size(col("ids")).cast("long")).over(w), lit(0L)))
    withOff.select(col("shard"), col("off"),
        posexplode(col("ids")).as(Seq("pos", "id")))
      .select(col("shard"), (col("off") + col("pos")).as("gpos"), col("id"))
      .groupBy(col("shard"), expr("gpos div 128").as("seq_id"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(array_sort(collect_list(struct(col("gpos"), col("id")))),
          x => x.getField("id").cast("string")), " ").as("seq_text"))
      .orderBy(col("shard"), col("seq_id"))
  }

  lazy val p06Oracle: String = packedOracleSql("")

  /** The per-DISTINCT-word byte-level BPE replay in hex space as oracle
    * CTEs — input `uw(w)` (caller-provided), output `wids(w, ids)`: one
    * token-id array per word, byte ids below 256 and merge products at
    * 256 + rank. ONE definition shared by [[packedOracleSql]] (p06/p07/
    * p08/m11/m12/st12) and the p10 oracle, so a kernel change cannot
    * drift one replay while the others still match.
    */
  private def bpeWordIdsCtes: String = {
    val pairs = bpeMergePairsSql
    val prods = bpeProductsSql
    s"""hx AS (SELECT w, lower(hex(encode(w))) AS hw FROM uw),
       |enc AS (
       |  SELECT w, [substr(hw, CAST(x AS INT), 2) FOR x IN range(1, length(hw)+1, 2)] AS syms
       |  FROM hx WHERE length(hw) <= 512),
       |steps(w, syms) AS (
       |  SELECT w, syms FROM enc
       |  UNION ALL
       |  SELECT w, syms[1:p-1] || [syms[p] || syms[p+1]] || syms[p+2:len(syms)]
       |  FROM (
       |    SELECT w, syms, list_position(rks, list_min(rks)) AS p, list_min(rks) AS best
       |    FROM (
       |      SELECT w, syms,
       |        [coalesce(nullif(list_position($pairs,
       |           syms[CAST(x AS INT)] || '|' || syms[CAST(x AS INT)+1]), 0), 1000000)
       |         FOR x IN range(1, len(syms))] AS rks
       |      FROM steps WHERE len(syms) > 1)
       |  ) WHERE best < 1000000),
       |fin AS (
       |  SELECT w, arg_min(syms, len(syms)) AS syms FROM steps GROUP BY w
       |  UNION ALL
       |  SELECT w, [substr(hw, CAST(x AS INT), 2) FOR x IN range(1, length(hw)+1, 2)]
       |  FROM hx WHERE length(hw) > 512),
       |wids AS (
       |  SELECT w, [CASE WHEN length(s) = 2 THEN CAST(
       |       strpos('123456789abcdef', substr(s, 1, 1)) * 16
       |       + strpos('123456789abcdef', substr(s, 2, 1)) AS BIGINT)
       |     ELSE CAST(255 + COALESCE(nullif(list_position($prods, s), 0),
       |       CAST(error('graft oracle: token is not a merge product') AS INT)) AS BIGINT) END
       |     FOR s IN syms] AS ids
       |  FROM fin)""".stripMargin
  }

  /** The packed-sequence replay, parameterized by an optional extra
    * `dtok` UNION branch (m11 injects its image-token rows at widx −1 so
    * they sort before every word token; empty for p06), optional prefix
    * CTEs, and the document source (p07 packs the p05 survivor chain's
    * texts instead of the raw table). One definition — the text-only,
    * interleaved and capstone gates cannot drift.
    */
  private[operators] def packedOracleSql(extraDtok: String,
      prefixCtes: String = "",
      docsSelect: String = "SELECT doc_id, lower(text) AS t FROM documents",
      withMask: Boolean = false): String = {
    require(extraDtok.isEmpty || !withMask,
      "mask packing and extra dtok branches are separate consumers")
    val eos = graft.functions.BpeVocab.EosId
    // the p08 mask leg: a word token trains (mask 1) iff its word sits
    // past the per-doc prompt cut ((len+1)//2); EOS always trains
    val cutCol = if (withMask) ",\n    (len(regexp_split_to_array(trim(t), '\\s+')) + 1) // 2 AS cut" else ""
    val cutSel = if (withMask) ", cut" else ""
    val wMask = if (withMask) ",\n    CASE WHEN p.widx <= p.cut THEN 0 ELSE 1 END AS mask" else ""
    val eosMask = if (withMask) ", 1 AS mask" else ""
    val posMask = if (withMask) ", mask" else ""
    val gMask = if (withMask) ", p.mask" else ""
    val outMask = if (withMask)
      ",\n  CAST(SUM(mask) AS BIGINT) AS n_trained,\n  string_agg(CAST(mask AS VARCHAR), ' ' ORDER BY gpos) AS mask_text"
    else ""
    s"""WITH RECURSIVE
       |${prefixCtes}docs AS ($docsSelect),
       |dw AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ws$cutCol FROM docs),
       |wpos AS (
       |  SELECT doc_id, i.i AS widx, ws[i.i] AS w$cutSel
       |  FROM dw, LATERAL (SELECT UNNEST(generate_series(1, len(ws))) AS i) i
       |  WHERE ws[i.i] <> ''),
       |uw AS (SELECT DISTINCT w FROM wpos),
       |$bpeWordIdsCtes,
       |dtok AS (
       |  SELECT p.doc_id, p.widx, s.tidx, ids[CAST(s.tidx AS INT)] AS id$wMask
       |  FROM wpos p JOIN wids USING (w),
       |    LATERAL (SELECT UNNEST(generate_series(1, len(ids))) AS tidx) s
       |  UNION ALL
       |  SELECT doc_id, 2147483647 AS widx, 1 AS tidx, $eos AS id$eosMask FROM docs$extraDtok),
       |pos AS (
       |  SELECT doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY widx, tidx) - 1 AS pos, id$posMask
       |  FROM dtok),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM dtok GROUP BY doc_id),
       |off AS (
       |  SELECT doc_id, doc_id % 8 AS shard,
       |    COALESCE(SUM(n) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM cnt),
       |g AS (SELECT o.shard, o.off + p.pos AS gpos, p.id$gMask FROM pos p JOIN off o USING (doc_id))
       |SELECT CAST(shard AS BIGINT) AS shard, CAST(gpos // 128 AS BIGINT) AS seq_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_tokens$outMask,
       |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY gpos) AS seq_text
       |FROM g GROUP BY shard, gpos // 128
       |ORDER BY shard, seq_id""".stripMargin
  }

  // ---------------------------------------------------------------- p07

  /** p07: crawl → TRAINING FILE, the whole arc in one gate — p05's
    * curation chain (URL filter → HTML extraction → two-model quality
    * vote → hash-keyed exact dedup, run through the SAME shared
    * [[p05Keyed]] stage, so the two capstones cannot drift) feeding
    * p06's packing tail: each surviving text becomes its BPE token-ID
    * stream + EOS, concatenated per shard in representative-doc_id
    * order and chunked at the 128-token budget. The output IS what a
    * training job loads, derived from raw crawl rows inside one plan.
    * The oracle composes the SAME shared fragments end to end
    * ([[p05SurvivorCtes]] → [[packedOracleSql]] over `surv`), so a
    * single wrong decision anywhere in the arc — a URL kept, a line
    * dropped, a dup surviving, a token misplaced — fails the hash.
    * Scale shape: p05's one heavy corpus pass + one keyed exchange,
    * then p06's per-shard window + bounded-state assembly over the
    * (much smaller) survivor set.
    */
  def p07CurateAndPack(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.F
    val reps = p05Keyed(spark, sfDir).filter(col("q"))
      .groupBy(col("h1"), col("h2"))
      .agg(min(col("doc_id")).as("doc_id"),
        min(col("t0")).as("t0"), max(col("t1")).as("t1"))
      .filter(Dedup.sameOrFail(col("t0"), col("t1")))
      .select(col("doc_id"), col("t0").as("kept"))
    packIdStream(reps.select(col("doc_id"),
      concat(F.bpeTokenIds(col("kept")),
        array(lit(graft.functions.BpeVocab.EosId))).as("ids")))
  }

  lazy val p07Oracle: String = packedOracleSql("",
    prefixCtes = p05SurvivorCtes + ",\n",
    docsSelect = "SELECT doc_id, lower(kept) AS t FROM surv")

  // ---------------------------------------------------------------- p08

  /** p08: SFT loss-mask packing — the supervised-fine-tuning twin of
    * p06: each example is a (prompt, completion) pair, and the packed
    * output carries a parallel LOSS MASK (0 = prompt token, context
    * only; 1 = completion token + EOS, trained) — completions-only loss
    * is how instruction tuning is actually trained, and the mask must
    * survive packing token-for-token or the model silently trains on
    * prompts. [[sftPack]] is the generic operator over (doc_id, prompt,
    * completion) columns; the gate fabricates the pair deterministically
    * (prompt = the first ⌈n/2⌉ words — both engines replay the cut).
    * Token-level soundness rides BPE's whitespace separation:
    * tokenize(prompt) ++ tokenize(completion) ≡ tokenize(text), so the
    * packed ID stream equals p06's and ONLY the mask is new (the fuzz
    * suite pins that additivity). Same plan shape as p06 — one shard
    * exchange serving window + assembly, state bounded by the budget.
    */
  def p08SftPacking(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("ws", split(trim(col("text")), s"$wsClass+"))
      .withColumn("cut", expr("(size(ws) + 1) div 2"))
      .select(col("doc_id"),
        array_join(expr("slice(ws, 1, cut)"), " ").as("prompt"),
        array_join(expr("slice(ws, cut + 1, size(ws) - cut)"), " ").as("completion"))
    sftPack(docs)
  }

  /** Pack (doc_id, prompt, completion) rows into fixed-budget sequences
    * with a parallel loss mask — see [[p08SftPacking]].
    */
  private[operators] def sftPack(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.F
    val idsP = F.bpeTokenIds(col("prompt"))
    val idsC = concat(F.bpeTokenIds(col("completion")),
      array(lit(graft.functions.BpeVocab.EosId)))
    val docs = rows.select(col("doc_id"),
        concat(idsP, idsC).as("ids"),
        concat(transform(idsP, _ => lit(0L)),
          transform(idsC, _ => lit(1L))).as("masks"))
      .withColumn("shard", pmod(col("doc_id"), lit(8L)))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("off",
        coalesce(sum(size(col("ids")).cast("long")).over(w), lit(0L)))
      .select(col("shard"), col("off"),
        posexplode(arrays_zip(col("ids"), col("masks"))).as(Seq("pos", "im")))
      .select(col("shard"), (col("off") + col("pos")).as("gpos"),
        col("im.ids").as("id"), col("im.masks").as("mask"))
      .groupBy(col("shard"), expr("gpos div 128").as("seq_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("mask")).as("n_trained"),
        array_sort(collect_list(struct(col("gpos"), col("id"), col("mask")))).as("toks"))
      .select(col("shard"), col("seq_id"), col("n_tokens"), col("n_trained"),
        array_join(transform(col("toks"),
          x => x.getField("id").cast("string")), " ").as("seq_text"),
        array_join(transform(col("toks"),
          x => x.getField("mask").cast("string")), " ").as("mask_text"))
      .orderBy(col("shard"), col("seq_id"))
  }

  lazy val p08Oracle: String = packedOracleSql("", withMask = true)

  // ---------------------------------------------------------------- p10

  /** p10: DPO/RLHF PREFERENCE-PAIR construction — the data-prep step
    * preference optimization actually trains on: each example is a
    * (prompt, chosen, rejected) triple, and the output carries BOTH
    * response legs as parallel token-id streams sharing the prompt
    * prefix, each with a completions-only loss mask (0 = prompt token,
    * 1 = response token + EOS) — a pair must stay together so the DPO
    * loss can contrast its two legs, which is why this materializes
    * per-example rows rather than riding the p06 cross-example packer.
    * [[dpoPack]] is the generic operator over (doc_id, prompt, chosen,
    * rejected) columns; the gate fabricates the triple deterministically
    * (prompt = the first ⌈n/2⌉ words, chosen = the rest, rejected = the
    * rest REVERSED — same per-word tokens in a different order, so a
    * stream that confuses the legs still differs token-for-token while
    * the counts agree, exactly the bug class a pair builder must not
    * have). Token-level soundness rides BPE's whitespace separation
    * (tokenize(prompt) ++ tokenize(response) ≡ tokenize(text), fuzz-
    * pinned). Scale shape: pure per-row codegen — NO shuffle anywhere;
    * the oracle replays both legs from the shared per-word fragment.
    */
  def p10DpoPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("ws", split(trim(col("text")), s"$wsClass+"))
      .withColumn("cut", expr("(size(ws) + 1) div 2"))
      .select(col("doc_id"),
        array_join(expr("slice(ws, 1, cut)"), " ").as("prompt"),
        array_join(expr("slice(ws, cut + 1, size(ws) - cut)"), " ").as("chosen"),
        array_join(reverse(expr("slice(ws, cut + 1, size(ws) - cut)")), " ")
          .as("rejected"))
    dpoPack(docs)
  }

  /** Build preference-pair rows from (doc_id, prompt, chosen, rejected)
    * columns — see [[p10DpoPairs]].
    */
  private[operators] def dpoPack(rows: DataFrame): DataFrame = {
    import graft.functions.F
    val eos = array(lit(graft.functions.BpeVocab.EosId))
    def strJoin(ids: Column): Column =
      array_join(transform(ids, _.cast("string")), " ")
    def maskOf(p: Column, leg: Column): Column =
      array_join(concat(transform(p, _ => lit("0")),
        transform(leg, _ => lit("1"))), " ")
    rows.select(col("doc_id"),
        F.bpeTokenIds(col("prompt")).as("p"),
        concat(F.bpeTokenIds(col("chosen")), eos).as("c"),
        concat(F.bpeTokenIds(col("rejected")), eos).as("r"))
      .select(col("doc_id"),
        strJoin(concat(col("p"), col("c"))).as("chosen_text"),
        maskOf(col("p"), col("c")).as("chosen_mask"),
        strJoin(concat(col("p"), col("r"))).as("rejected_text"),
        maskOf(col("p"), col("r")).as("rejected_mask"),
        size(col("p")).cast("long").as("n_prompt"),
        size(col("c")).cast("long").as("n_chosen"),
        size(col("r")).cast("long").as("n_rejected"))
      .orderBy(col("doc_id"))
  }

  lazy val p10Oracle: String = {
    val eos = graft.functions.BpeVocab.EosId
    s"""WITH RECURSIVE
       |docs AS (SELECT doc_id, lower(text) AS t FROM documents),
       |dw AS (SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ws,
       |  (len(regexp_split_to_array(trim(t), '\\s+')) + 1) // 2 AS cut FROM docs),
       |wpos AS (
       |  SELECT doc_id, i.i AS widx, ws[i.i] AS w, cut
       |  FROM dw, LATERAL (SELECT UNNEST(generate_series(1, len(ws))) AS i) i
       |  WHERE ws[i.i] <> ''),
       |uw AS (SELECT DISTINCT w FROM wpos),
       |$bpeWordIdsCtes,
       |dtok AS (
       |  SELECT p.doc_id, p.widx, s.tidx, ids[CAST(s.tidx AS INT)] AS id,
       |    CASE WHEN p.widx <= p.cut THEN 0 ELSE 1 END AS mask
       |  FROM wpos p JOIN wids USING (w),
       |    LATERAL (SELECT UNNEST(generate_series(1, len(ids))) AS tidx) s),
       |legs AS (
       |  SELECT doc_id,
       |    string_agg(CAST(id AS VARCHAR), ' ' ORDER BY widx, tidx) AS ch_ids,
       |    string_agg(CAST(mask AS VARCHAR), ' ' ORDER BY widx, tidx) AS ch_mask,
       |    string_agg(CAST(id AS VARCHAR), ' ' ORDER BY
       |      CASE WHEN mask = 0 THEN widx ELSE 2147483647 - widx END, tidx) AS rj_ids,
       |    string_agg(CAST(mask AS VARCHAR), ' ' ORDER BY
       |      CASE WHEN mask = 0 THEN widx ELSE 2147483647 - widx END, tidx) AS rj_mask,
       |    SUM(CASE WHEN mask = 0 THEN 1 ELSE 0 END) AS n_prompt,
       |    SUM(mask) AS n_compl
       |  FROM dtok GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(l.ch_ids || ' ', '') || '$eos' AS chosen_text,
       |  COALESCE(l.ch_mask || ' ', '') || '1' AS chosen_mask,
       |  COALESCE(l.rj_ids || ' ', '') || '$eos' AS rejected_text,
       |  COALESCE(l.rj_mask || ' ', '') || '1' AS rejected_mask,
       |  CAST(COALESCE(l.n_prompt, 0) AS BIGINT) AS n_prompt,
       |  CAST(COALESCE(l.n_compl, 0) + 1 AS BIGINT) AS n_chosen,
       |  CAST(COALESCE(l.n_compl, 0) + 1 AS BIGINT) AS n_rejected
       |FROM docs d LEFT JOIN legs l USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- x26

  /** x26: per-document DISTINCTIVE-TERM extraction — the exact-arithmetic
    * core of TF-IDF, the keyword/topic-labeling pass a curation pipeline
    * runs to tag and mix training data by subject: each document's top
    * term by `tf / df` (its frequency in the doc over its document
    * frequency in the corpus; ties break on the lexicographically
    * smallest term). Deliberately NO logarithms: tf and df are exact
    * integers and IEEE division of the same two integers is correctly
    * rounded on every engine, so the gate hash-compares scores
    * bit-for-bit — where a log-weighted variant would drift in the last
    * ulp between JVM and DuckDB (the same fidelity/portability line the
    * LM and MFCC families draw).
    *
    * Scale shape at 100 TB: one shuffle for per-(doc, term) counts, one
    * for per-term document frequencies; the df table is vocabulary-sized
    * (bounded, zipf-truncated in practice) so the score join broadcasts;
    * the final per-doc argmax is a window over the doc's own terms —
    * partition-local, no global ordering anywhere.
    */
  def x26DocKeywords(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(words(lower(col("text")))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "w")
      .withColumn("score", col("tf").cast("double") / col("df"))
    // per-doc argmax as a HASH aggregate, not a window: min_by over the
    // (-score, w) ordering struct is argmax-score with the lex-min word
    // tie-break, and it needs no per-partition sort — the doc's terms
    // fold in one pass
    scored.groupBy(col("doc_id"))
      .agg(min_by(struct(col("w"), col("tf"), col("df"), col("score")),
        struct((-col("score")).as("ns"), col("w"))).as("b"))
      .select(col("doc_id"), col("b.w").as("keyword"), col("b.tf").as("tf"),
        col("b.df").as("df"), col("b.score").as("score"))
      .orderBy(col("doc_id"))
  }

  val x26Oracle: String =
    """WITH w0 AS (
      |  SELECT doc_id, unnest([w FOR w IN
      |    regexp_split_to_array(trim(lower(text)), '\s+') IF w <> '']) AS w
      |  FROM documents),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w0 GROUP BY doc_id, w),
      |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
      |s AS (
      |  SELECT doc_id, w, tf.tf, df.df,
      |    CAST(tf.tf AS DOUBLE) / df.df AS score
      |  FROM tf JOIN df USING (w)),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, w ASC) AS rk FROM s)
      |SELECT doc_id, w AS keyword, tf, df, score
      |FROM r WHERE rk = 1 ORDER BY doc_id""".stripMargin

  val entries: Map[String, graft.Gate.Entry] = Map(
    "x26_doc_keywords"   -> graft.Gate(x26DocKeywords _, x26Oracle),
    "p10_dpo_pairs"      -> graft.Gate(p10DpoPairs _, p10Oracle),
    "p06_packed_sequences" -> graft.Gate(p06PackedSequences _, p06Oracle),
    "p07_curate_and_pack"  -> graft.Gate(p07CurateAndPack _, p07Oracle),
    "p08_sft_packing"      -> graft.Gate(p08SftPacking _, p08Oracle),
    "x18_classifier_score" -> graft.Gate(x18ClassifierScore _, x18Oracle),
    "p04_epoch_shuffle"  -> graft.Gate(p04EpochShuffle _, p04Oracle),
    "x17_subword_tokens" -> graft.Gate(x17SubwordTokens _, x17Oracle),
    "x19_bpe_tokens"     -> graft.Gate(x19BpeTokens _, x19Oracle),
    "x20_html_extract"   -> graft.Gate(x20HtmlExtract _, x20Oracle),
    "x21_perplexity_filter" -> graft.Gate(x21PerplexityFilter _, x21Oracle),
    "x22_url_filter"     -> graft.Gate(x22UrlFilter _, x22Oracle),
    "x23_perplexity_lm"  -> graft.Gate(x23PerplexityLm _, x23Oracle),
    "x24_dsir_select"    -> graft.Gate(x24DsirSelect _, x24Oracle),
    "x25_domain_rank"    -> graft.Gate(x25DomainRank _, x25Oracle),
    "p05_crawl_curation" -> graft.Gate(p05CrawlCuration _, p05Oracle),
    "x16_normalize"     -> graft.Gate(x16Normalize _, x16Oracle),
    "x15_line_dedup"    -> graft.Gate(x15LineDedup _, x15Oracle),
    "x14_kmv_distinct"  -> graft.Gate(x14KmvDistinct _, x14Oracle),
    "x11_pii_redact"    -> graft.Gate(x11PiiRedact _, x11Oracle),
    "p01_pretrain_pipeline" -> graft.Gate(p01PretrainPipeline _, p01Oracle),
    "p02_seq_packing"       -> graft.Gate(p02SequencePacking _, p02Oracle),
    "p03_token_budget_mix"  -> graft.Gate(p03TokenBudgetMix _, p03Oracle),
    "x13_exact_quantiles"   -> graft.Gate(x13ExactQuantiles _, x13Oracle),
    "x10_data_mix"      -> graft.Gate(x10DataMix _, x10Oracle),
    "x08_decontaminate" -> graft.Gate(x08Decontaminate _, x08Oracle),
    "x09_repetition"    -> graft.Gate(x09Repetition _, x09Oracle),
    "x01_token_count"   -> graft.Gate(x01TokenCount _, x01Oracle),
    "x06_heavy_hitters" -> graft.Gate(x06HeavyHitters _, x06Oracle),
    "x02_quality_score" -> graft.Gate(x02QualityScore _, x02Oracle),
    "x03_langid"        -> graft.Gate(x03LangId _, x03Oracle),
    "x04_fingerprint"   -> graft.Gate(x04FingerprintPortable _, x04Oracle),
    "x05_ngram_stats"   -> graft.Gate(x05NgramStats _, x05Oracle),
  )
}
