package graft.link

import graft.model.{AliasEntry, Mention}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity linking: alias dictionary build + dictionary join with OOV default.
  *
  * Reference semantics: vocab built by frequency with specials appended
  * (semeval2sdp.py:188-234), lookups via vocab2idx with `<OOV>` fallback
  * (semeval2sdp.py:264-271, data_handler.py:318-324) — relationally a left
  * outer equi-join + coalesce (SURVEY.md J1/P10).
  *
  * Scale design (north rule): the dictionary is orders of magnitude smaller
  * than the mention stream, so the join is a broadcast hash join — zero
  * shuffle of the big side. Zipfian alias frequencies make the *output* of a
  * shuffle join skewed; broadcasting sidesteps reduce-side skew entirely. For
  * dictionaries too big to broadcast, `saltedJoin` spreads hot keys over
  * `buckets` replicas: big side gets a deterministic salt from hash(doc_id),
  * dictionary rows are exploded ×buckets, and the join key becomes
  * (alias, salt) — an explicit skew-aware repartition join.
  */
object Linking {

  val OovEntityId: Long = -1L

  /** Frequency-ranked alias dictionary with deterministic tie-break
    * (freq desc, alias asc — the reference's Counter.most_common order made
    * partition-invariant, SURVEY.md W2 note). `surfaces` is any single-column
    * DataFrame of alias strings.
    */
  def buildAliasDictFromSurfaces(surfaces: DataFrame, minCount: Long = 1): Dataset[AliasEntry] = {
    val counts = surfaces.toDF("alias")
      .groupBy("alias").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
    buildAliasDictFromCounts(counts)
  }

  /** Dictionary build from a pre-aggregated `(alias, freq)` frame. The rank
    * assignment references `counts` several times (range-partition sampling,
    * the broadcast total) — callers on a non-trivial lineage should persist
    * `counts` first so those references hit a dictionary-sized cache instead
    * of re-running the upstream corpus scan.
    */
  def buildAliasDictFromCounts(counts: DataFrame): Dataset[AliasEntry] = {
    val spark = counts.sparkSession
    import spark.implicits._
    // alias count grows with the corpus (Heaps' law), so the id assignment is
    // a range-partitioned global row number, not a single-partition window,
    // and the normalizer is a broadcast scalar, not a driver action. The
    // fused rank+total form pays one broadcast build instead of two — each
    // small job's driver round-trip dominates dictionary-sized stages
    graft.functions.Ranks.globalRowNumberWithTotal(
      counts, Seq(col("freq").desc, col("alias").asc), col("freq"),
      "__rn", "__total")
      .select(col("alias"), (col("__rn") - 1).as("entity_id"), col("freq"),
        (col("freq") / col("__total")).as("prob"))
      .as[AliasEntry]
  }

  def buildAliasDict(mentions: Dataset[Mention], minCount: Long = 1): Dataset[AliasEntry] =
    buildAliasDictFromSurfaces(mentions.select("surface").toDF(), minCount)

  /** Broadcast dictionary join: mention surface → entity_id, misses → OOV
    * (vocab2idx semantics). No shuffle of the mention stream.
    */
  def linkMentions(mentions: Dataset[Mention], dict: Dataset[AliasEntry]): DataFrame =
    mentions
      .join(broadcast(dict.select(col("alias"), col("entity_id"))),
        mentions("surface") === col("alias"), "left")
      .select(mentions("doc_id"), mentions("span_idx"), mentions("head_idx"),
        mentions("surface"),
        coalesce(col("entity_id"), lit(OovEntityId)).as("entity_id"))

  /** Skew-aware salted repartition join for dictionaries beyond broadcast
    * size: each big-side row picks a deterministic salt in [0, buckets) from a
    * hash of `saltCols`; the dictionary side is exploded ×buckets so every
    * (key, salt) bucket joins locally and a single hot key spreads over
    * `buckets` reducers. Result is row-identical to the plain left join —
    * verified by LinkingSpec and the q11 oracle.
    */
  def saltedLeftJoin(
      big: DataFrame,
      dict: DataFrame,
      bigKey: String,
      dictKey: String,
      saltCols: Seq[String],
      buckets: Int): DataFrame = {
    val salted = big.withColumn(
      "__salt", pmod(hash(saltCols.map(col): _*), lit(buckets)))
    val explodedDict = dict
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(explodedDict,
        salted(bigKey) === explodedDict(dictKey) && salted("__salt") === explodedDict("__salt"),
        "left")
      .drop(salted("__salt")).drop(explodedDict("__salt"))
  }

  /** Mention-typed wrapper over saltedLeftJoin with OOV default. */
  def saltedJoin(mentions: Dataset[Mention], dict: Dataset[AliasEntry], buckets: Int): DataFrame =
    saltedLeftJoin(
      mentions.toDF(), dict.select(col("alias"), col("entity_id")).toDF(),
      "surface", "alias", Seq("doc_id", "span_idx", "head_idx"), buckets)
      .select(col("doc_id"), col("span_idx"), col("head_idx"), col("surface"),
        coalesce(col("entity_id"), lit(OovEntityId)).as("entity_id"))
}
