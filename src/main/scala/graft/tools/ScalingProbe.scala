package graft.tools

import graft.corpus.Corpus
import graft.extract.Extract
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: one parallelism level per JVM invocation
  * (args: cores repl [stage]) so measurements never share GC/JIT state.
  * Prints docs, triples, seconds, tps.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val repl = args(1).toInt
    val stage = if (args.length > 2) args(2) else "triples"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(cores * 4, col("doc_id"))
      .withColumn("copy", explode(sequence(lit(0), lit(repl - 1))))
      .select((col("doc_id") * repl + col("copy")).as("doc_id"), col("text"))
      .as[(Long, String)].map { case (id, text) => Corpus.buildDoc(id, text) }

    def rawDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(cores * 4, col("doc_id"))
      .withColumn("copy", explode(sequence(lit(0), lit(repl - 1))))
      .select((col("doc_id") * repl + col("copy")).as("doc_id"), col("text"))
      .as[(Long, String)]

    def runStage(): Long = stage match {
      case "docs"      => docs.count()
      case "sentences" => Extract.docsToSentences(docs).count()
      case "cands"     => Extract.candidates(Extract.docsToSentences(docs)).count()
      case "fused"     => Extract.triplesFused(rawDocs).count()
      case _           => Extract.triples(Extract.candidates(Extract.docsToSentences(docs))).count()
    }

    runStage() // warmup
    val t0 = System.nanoTime()
    val n = runStage()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PROBE cores=$cores repl=$repl stage=$stage n=$n sec=$sec%.2f rate=${n / sec}%.0f/s")
    spark.stop()
  }
}
