package graft

import graft.corpus.Corpus
import graft.extract.Extract
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE JSON line:
  * {"metric","value","unit","queries",...,"kg":{...},"scaling":{...},"sf"}.
  *
  *  - `queries`: wall seconds per registered query at SPARK_GRAFT_CPUS.
  *  - `kg`: end-to-end docs→triples throughput (the BASELINE.md headline).
  *  - `scaling`: the same KG job at local[8] vs local[32] on identical input
  *    (the sandbox stand-in for N vs 4N executor clusters, per BASELINE.md):
  *    triples/sec at both plus efficiency = tps32 / (4 × tps8).
  *
  * The corpus is replicated ×SPARK_GRAFT_BENCH_REPL (default 8) with distinct
  * doc ids so per-core work dominates fixed planning overhead — scaling is
  * meaningless when the job is all scheduler latency.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Replicated corpus: every doc duplicated `repl` times under fresh ids —
    * same text distribution, `repl`× the extraction work.
    */
  private def replicatedDocs(s: SparkSession, sfDir: String, repl: Int): DataFrame =
    s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      // the source is one small parquet file (→ ~1 input split); a real corpus
      // arrives in thousands of files. Spread the BASE rows first (cheap: 5k
      // rows through the shuffle), then replicate narrowly inside each
      // partition — the expensive explode+extract never funnels through one
      // task. 4 waves per core bounds stragglers.
      .repartition(s.sparkContext.defaultParallelism * 4, col("doc_id"))
      .withColumn("copy", explode(sequence(lit(0), lit(repl - 1))))
      .select((col("doc_id") * repl + col("copy")).as("doc_id"), col("text"))

  /** One KG end-to-end pass (docs → sentences → SDP candidates → triples)
    * on the fused single-stage path, returning (docs, triples, seconds).
    * Pure compute, no sinks.
    */
  private def kgRun(s: SparkSession, sfDir: String, repl: Int): (Long, Long, Double) = {
    import s.implicits._
    val docs = replicatedDocs(s, sfDir, repl).as[(Long, String)]
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val nTriples = Extract.triplesFused(docs).count()
    (nDocs, nTriples, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 512× replication ≈ 2.6M docs at sf0.1: enough per-core work that the
    // scaling measurement is compute- not overhead-dominated, while the
    // per-partition working set still fits the young generation
    val repl = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPL", "512").toInt

    val scalingOnly = sys.env.contains("SPARK_GRAFT_BENCH_ONLY_SCALING")

    // ---- KG throughput + scaling evidence ----
    // best-of-N timed runs per level with a GC fence between sessions:
    // successive in-JVM sessions otherwise inherit GC debt from their
    // predecessors and single runs swing wildly.
    case class KgStats(docs: Long, triples: Long, bestSec: Double) {
      def tps: Double = triples / bestSec
    }
    // reps: this VM sees bursty CPU steal from host neighbors (visible in
    // /proc/stat); best-of-4 filters the stolen-quantum runs
    def kgAt(cores: Int, reps: Int = 4): KgStats = {
      System.gc()
      val s = session(cores)
      try {
        kgRun(s, sfDir, 1) // warmup
        val runs = (1 to reps).map { i =>
          val (d, t, sec) = kgRun(s, sfDir, repl)
          System.err.println(f"[bench] p$cores rep$i: $sec%.2fs ${t / sec}%.0f tps")
          (d, t, sec)
        }
        val best = runs.minBy(_._3)
        KgStats(best._1, best._2, best._3)
      } finally s.stop()
    }
    val kg8 = kgAt(8)
    val kg32 = kgAt(32)
    val eff = kg32.tps / (4.0 * kg8.tps)
    // second N/4N pair: 4→16 stays inside the socket's bandwidth envelope,
    // the closer analog of adding executor HOSTS (which don't share a
    // memory bus the way local threads do)
    val kg4 = kgAt(4, reps = 2) // secondary pair: fewer reps, bounded wall time
    val kg16 = kgAt(16, reps = 2)
    val eff416 = kg16.tps / (4.0 * kg4.tps)
    // headline = the run at the requested parallelism
    val headline = if (cpus == 8) kg8 else if (cpus == 16) kg16 else if (cpus == 4) kg4 else kg32
    val (docsN, triplesN, kgSec) = (headline.docs, headline.triples, headline.bestSec)
    val (tps4, tps8, tps16, tps32) = (kg4.tps, kg8.tps, kg16.tps, kg32.tps)

    // ---- registered queries at the requested parallelism ----
    val s1 = session(cpus)
    // warmup: JIT + codegen + parquet footer caches
    s1.read.parquet(s"$sfDir/lineitem.parquet").count()
    // a crashed query must NOT masquerade as a fast one: its seconds are
    // negated and its name lands in "errors" (ADVICE.md round 1)
    val results =
      if (scalingOnly) Seq.empty[(String, Double, Boolean)]
      else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(s1, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
        val sec = (System.nanoTime() - t0) / 1e9
        (name, if (ok) sec else -sec, ok)
      }
    s1.stop()

    val qs = results.map { case (k, v, _) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,""" +
        f""""kg":{"docs":$docsN,"triples":$triplesN,"sec":$kgSec%.3f,"triples_per_sec":${triplesN / kgSec}%.1f},""" +
        f""""scaling":{"tps_p8":$tps8%.1f,"tps_p32":$tps32%.1f,"efficiency":$eff%.3f,""" +
        f""""tps_p4":$tps4%.1f,"tps_p16":$tps16%.1f,"efficiency_4_16":$eff416%.3f},""" +
        s""""sf":"$sfDir"}""")
  }
}
