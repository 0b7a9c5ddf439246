package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines over
  * (doc_id: long, text: string): language ID, quality scoring, token
  * counting, document fingerprinting. Integer-valued outputs (ppm ratios,
  * modular hashes) so every operator is oracle-exact across engines.
  */
object TextAnalysis {

  /** Marker stopword lists per language (tiny n-gram-free heuristic: count
    * marker hits, predict argmax, ties → language code asc, no hits → "und").
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "is", "to", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "von", "zu"),
    "es" -> Seq("el", "la", "de", "y", "es", "con", "por", "que"),
    "fr" -> Seq("le", "la", "de", "et", "est", "avec", "pour", "que"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"))

  /** Language-ID: per-language marker-hit counts → argmax.
    * Output (doc_id, pred_lang, hits).
    */
  def langId(docs: DataFrame): DataFrame = {
    val hitExprs = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString(", ")
      struct(
        expr(s"size(filter(split(text, ' '), t -> array_contains(array($arr), t)))")
          .cast("long").as("hits"),
        lit(lang).as("lang"))
    }
    docs.select(col("doc_id"), array(hitExprs: _*).as("cand"))
      // argmax: max hits, tie-break lang asc; array_max on structs compares
      // lexicographically (hits first, then lang) — so negate lang ordering
      // via sort + element_at for an explicit deterministic pick
      .withColumn("best",
        expr("element_at(array_sort(cand, (l, r) -> " +
          "case when l.hits > r.hits then -1 when l.hits < r.hits then 1 " +
          "when l.lang < r.lang then -1 when l.lang > r.lang then 1 else 0 end), 1)"))
      .select(col("doc_id"),
        when(col("best.hits") > 0, col("best.lang")).otherwise(lit("und")).as("pred_lang"),
        col("best.hits").as("hits"))
  }

  /** Quality metrics, all integers/ppm:
    * n_tokens, n_chars, avg_token_len_ppm, punct_ppm (non-alnum-space chars),
    * stopword_ppm (English markers), uniq_ppm (type/token ratio).
    * quality = mean of three bounded subscores (stopword presence, length
    * band, uniqueness band) in ppm.
    */
  def quality(docs: DataFrame): DataFrame = {
    val sw = markers("en").map(w => s"'$w'").mkString(", ")
    docs.select(col("doc_id"), col("text"),
      split(col("text"), " ").as("tk"))
      .withColumn("n_tokens", expr("size(filter(tk, t -> length(t) > 0))").cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_punct",
        (length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))).cast("long"))
      .withColumn("n_stop",
        expr(s"size(filter(tk, t -> array_contains(array($sw), t)))").cast("long"))
      .withColumn("n_uniq", expr("size(array_distinct(filter(tk, t -> length(t) > 0)))").cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("n_chars"),
        expr("n_chars * 1000000L div greatest(n_tokens, 1L)").as("avg_token_len_ppm"),
        expr("n_punct * 1000000L div greatest(n_chars, 1L)").as("punct_ppm"),
        expr("n_stop * 1000000L div greatest(n_tokens, 1L)").as("stopword_ppm"),
        expr("n_uniq * 1000000L div greatest(n_tokens, 1L)").as("uniq_ppm"))
  }

  /** Token counting: whitespace tokens + a BPE-ish sub-token count via regex
    * (letter runs, digit runs, single other chars).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr("size(filter(split(text, ' '), t -> length(t) > 0))").cast("long").as("ws_tokens"),
      expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").cast("long")
        .as("bpe_tokens"))

  /** Position-weighted rolling fingerprint:
    * Σ over tokens of (h30(token) mod 1000003) * pos₁, all mod 2^31.
    * Order-sensitive (catches token-shuffled near-dups that a bag-of-words
    * digest misses) and computed as an in-row fold — no shuffle, and integer
    * arithmetic makes it partition-invariant and oracle-exact.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    // empty/whitespace-only docs: sequence(1, 0) would yield a DESCENDING
    // [1, 0] and zip_with would pad with nulls, propagating NULL through the
    // fold — guard the sequence bound and skip null-padded slots so empty
    // docs fingerprint to 0 on both engines (latent bug flagged in ADVICE.md)
    docs.select(col("doc_id"),
      expr(
        """coalesce(aggregate(
          |  zip_with(
          |    filter(split(text, ' '), t -> length(t) > 0),
          |    sequence(1, greatest(size(filter(split(text, ' '), t -> length(t) > 0)), 1)),
          |    (t, p) -> struct(t as t, p as p)),
          |  0L,
          |  (acc, s) -> if(s.t is null, acc,
          |    (acc + (cast(conv(substring(md5(s.t), 1, 15), 16, 10) as bigint) % 1000000007L % 1000003L) * s.p) % 2147483648L)),
          |  0L)
          |""".stripMargin).as("fingerprint"))
}
