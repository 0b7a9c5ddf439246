package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Brown-clusters "paths" file source (S7 faithful shape).
  *
  * The reference loads Percy Liang's wcluster output — one line per vocabulary
  * word, `bitstring<TAB>word<TAB>count` — and keys cluster-pair pretraining on
  * the bitstring prefix (reference: `RelEmbed Big Clustered Unsupervised.ipynb`
  * cell 16 reading `wikipedia_150k_brown/paths`). This reader reproduces that
  * input shape as a DataFrame source; the q32 cluster-pair join accepts either
  * this table or the corpus-derived deterministic dictionary.
  *
  * Scale note: a Brown paths file is a FIXED vocabulary (the clustering ran
  * over a frozen corpus), so the resulting dictionary is bounded and safe to
  * broadcast — unlike a distinct-token table, which grows with the corpus.
  */
object BrownClusters {

  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false), // bit-string cluster id, e.g. "0111010"
    StructField("word", StringType, nullable = false),
    StructField("count", LongType, nullable = true)))

  /** Read a paths file: (path, word, count, cluster_id) where cluster_id is
    * the bitstring parsed as a binary integer (prefix-truncate upstream for
    * coarser clusterings before calling this).
    */
  def read(spark: SparkSession, location: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .schema(schema)
      .csv(location)
      .filter(col("path").isNotNull && col("word").isNotNull)
      .withColumn("cluster_id", conv(col("path"), 2, 10).cast("long"))

  /** Truncate paths to `prefixBits` and return the (word → cluster) dictionary
    * at that granularity — the reference's cluster-pair label space is the
    * cross product of such prefixes (K² softmax, SURVEY M9).
    */
  def dictionary(paths: DataFrame, prefixBits: Int): DataFrame =
    paths.select(
      col("word"),
      conv(substring(col("path"), 1, prefixBits), 2, 10).cast("long").as("cluster"))
}
