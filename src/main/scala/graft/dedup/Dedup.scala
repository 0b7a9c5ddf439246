package graft.dedup

import graft.functions.Portable._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication suite for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard. All stages are declarative DataFrame
  * transforms (codegen'd built-ins, no UDFs) over a corpus
  * (doc_id: long, text: string).
  *
  * Scale notes (100 TB story):
  *  - exact dedup: one hash aggregation on a 60-bit content hash — a single
  *    shuffle keyed by digest, AQE handles skew from boilerplate dups;
  *  - MinHash/LSH: shingling+signatures are narrow (explode stays in-stage);
  *    candidate pairs come from a self-join on (band, band_hash) buckets —
  *    shuffle is proportional to bucket sizes, never all-pairs;
  *  - verification joins only LSH candidates, keeping the quadratic step
  *    bounded to near-duplicate clusters.
  */
object Dedup {

  /** Word n-gram shingles, distinct per doc. Input (doc_id, text). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    toks
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, greatest(size(toks) - $n, 0)), i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
          .as("shingle"))
      .filter(length(col("shingle")) > 0)
      .distinct()
  }

  /** Exact dedup: keep the min doc_id per 60-bit content digest.
    * Output (doc_id, digest, keep).
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5num(col("text")).as("digest"))
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("digest")))
      .select(col("doc_id"), col("digest"), (col("doc_id") === col("keeper")).as("keep"))

  /** MinHash signatures as rows (doc_id, perm, minhash), perms 0..numPerms-1.
    * Row form (not array) keeps the plan a plain hash aggregation.
    */
  def minhash(docs: DataFrame, shingleN: Int = 3, numPerms: Int = 8): DataFrame =
    minhashFromShingles(shingles(docs, shingleN), numPerms)

  /** minhash over an existing shingle table — callers running multiple
    * dedup stages persist `shingles()` ONCE and feed it to
    * minhash/jaccard, instead of re-shingling the corpus per stage.
    */
  def minhashFromShingles(sh: DataFrame, numPerms: Int = 8): DataFrame =
    sh.withColumn("h", h30(col("shingle")))
      .select(col("doc_id"), explode(sequence(lit(0L), lit(numPerms - 1L))).as("perm"), col("h"))
      .withColumn("ph", permute(col("h"), col("perm")))
      .groupBy("doc_id", "perm")
      .agg(min("ph").as("minhash"))

  /** LSH banding: group `rowsPerBand` consecutive perms into a band key;
    * docs sharing any (band, band_hash) become candidate pairs (a < b).
    */
  def lshCandidates(signatures: DataFrame, rowsPerBand: Int = 2): DataFrame = {
    val banded = signatures
      .withColumn("band", (col("perm") / rowsPerBand).cast("long"))
      .groupBy("doc_id", "band")
      // band hash must not depend on row arrival order: sort perm-major
      .agg(md5num(concat_ws(",", array_sort(collect_list(
        concat_ws(":", col("perm"), col("minhash")))))).as("band_hash"))
    val a = banded.select(col("band"), col("band_hash"), col("doc_id").as("a"))
    val b = banded.select(col("band"), col("band_hash"), col("doc_id").as("b"))
    a.join(b, Seq("band", "band_hash")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: |A∩B| and |A∪B| as integers
    * plus jaccard in parts-per-million (integer div — oracle-exact).
    * `pairs` has columns (a, b).
    */
  def jaccard(pairs: DataFrame, docs: DataFrame, shingleN: Int = 3): DataFrame =
    jaccardFromShingles(pairs, shingles(docs, shingleN))

  /** jaccard over an existing (persisted) shingle table — see
    * `minhashFromShingles`.
    */
  def jaccardFromShingles(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("shingle").as("shingle_b")), Seq("b"))
      .filter(col("shingle") === col("shingle_b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("a", "b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("n_a")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("n_b")), Seq("b"))
      .select(col("a"), col("b"), col("n_inter"),
        (col("n_a") + col("n_b") - col("n_inter")).as("n_union"),
        expr("n_inter * 1000000L div (n_a + n_b - n_inter)").as("jaccard_ppm"))
  }

  /** 16-bit SimHash over token multiset: bit j set iff the count-weighted
    * sum of (±1 by bit j of the token hash) is positive.
    * Output (doc_id, simhash).
    *
    * All `bits` per-bit sums run as conditional aggregates in ONE hash
    * aggregation (map-side combined) — the bit dimension never explodes into
    * rows, so the shuffle carries one row per (doc, token), not ×bits.
    */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame =
    simhashImpl(docs, bits, h30(col("token")))

  /** Wide (60-bit) SimHash — the scale variant for near-dup banding. 16 bits
    * band into at most 2^8 buckets (q28 round-2 shape), a GLOBAL constant: at
    * 100× corpus the within-bucket self-join goes quadratic. 60 bits banded
    * as 4×15-bit sub-bands (`WideBands`/`WideBandBits`) give 4×2^15 bucket
    * keys whose occupancy grows with data, and hamming ≤ 3 over 4 bands keeps
    * exact recall (3 differing bits touch ≤ 3 bands, so one band always
    * matches). 60 bits, not 64, because md5num is the engine-portable 60-bit
    * hash the DuckDB oracle can reproduce; `Hamming64` handles it natively.
    */
  def simhashWide(docs: DataFrame): DataFrame =
    simhashImpl(docs, WideBits, md5num(col("token")))

  val WideBits = 60
  val WideBands = 4
  val WideBandBits: Int = WideBits / WideBands // 15

  private def simhashImpl(docs: DataFrame, bits: Int, tokenHash: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("h", tokenHash)
    val bitSums = (0 until bits).map(j =>
      sum(col("cnt") * (expr(s"shiftright(h, $j) & 1") * 2 - 1)).as(s"s$j"))
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Explode a wide simhash into its (band, bv) LSH keys — docs sharing any
    * key are near-dup candidates. One row per (doc, band); the candidate join
    * shuffles on (band, bv), never all-pairs.
    */
  def simhashWideBands(sh: DataFrame): DataFrame = {
    val mask = (1L << WideBandBits) - 1
    sh.select(col("doc_id"), col("simhash"),
      explode(expr(s"sequence(0, ${WideBands - 1})")).as("band"))
      .withColumn("bv", expr(s"shiftright(simhash, band * $WideBandBits)") bitwiseAND lit(mask))
  }
}
