package graft.tools

import graft.extract.Extract
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One scaling-benchmark level in its own JVM (forked by graft.Bench).
  *
  * Modes:
  *  - `<cores> <repl> <reps>` — one-shot: warmup, N timed reps, print
  *    `LEVEL cores=.. docs=.. triples=.. best=..` (manual probing).
  *  - `<cores> <repl> serve` — protocol mode for Bench's paired scaling
  *    measurement: after warmup prints `READY docs=<n>`, then for each
  *    `run` line on stdin executes ONE timed rep and prints
  *    `REP triples=<t> sec=<s>`; `quit` exits. Bench alternates `run`
  *    commands between the N and 4N JVMs so both levels measure the same
  *    machine conditions (host CPU steal here is bursty on the scale of
  *    minutes — levels timed minutes apart are not comparable).
  *
  * Why a fresh JVM per level: in a single JVM the collector is sized once
  * for the MACHINE — a local[4] session still gets a 32-core GC helping it
  * and inherits heap/JIT state from whatever ran before, which inflates
  * small-N throughput and corrupts the N vs 4N comparison. Real clusters
  * give every executor its own JVM with GC threads matched to its cores;
  * forking per level (with -XX:ParallelGCThreads=<cores>, a
  * cores-proportional pre-touched heap, and a taskset pin to exactly
  * <cores> CPUs) reproduces that.
  */
object BenchLevel {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val repl = args(1).toInt
    val mode = if (args.length > 2) args(2) else "3"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-level-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def docs(r: Int) = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(cores * 4, col("doc_id"))
      .withColumn("copy", explode(sequence(lit(0), lit(r - 1))))
      .select((col("doc_id") * r + col("copy")).as("doc_id"), col("text"))
      .as[(Long, String)]

    // JIT+codegen warmup: one quarter-scale pass then one FULL-scale pass —
    // short levels otherwise spend their first timed reps still compiling
    // (and faulting file-cache pages), which skews the small-N vs large-N
    // comparison: small-N reps are long enough to warm up in-run, big-N
    // reps are not
    Extract.triplesFused(docs(math.max(repl / 4, 1))).count()
    Extract.triplesFused(docs(repl)).count()
    val nDocs = docs(repl).count()

    def rep(): (Long, Double) = {
      val t0 = System.nanoTime()
      val triples = Extract.triplesFused(docs(repl)).count()
      (triples, (System.nanoTime() - t0) / 1e9)
    }

    if (mode == "serve") {
      println(s"READY docs=$nDocs")
      Console.out.flush()
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
      var line = in.readLine()
      while (line != null && line.trim == "run") {
        val (t, sec) = rep()
        println(f"REP triples=$t sec=$sec%.4f")
        Console.out.flush()
        line = in.readLine()
      }
    } else {
      val reps = mode.toInt
      var bestSec = Double.MaxValue
      var triples = 0L
      var i = 0
      while (i < reps) {
        val (t, sec) = rep()
        triples = t
        System.err.println(f"[level $cores] rep${i + 1}: $sec%.2fs ${t / sec}%.0f tps")
        if (sec < bestSec) bestSec = sec
        i += 1
      }
      println(f"LEVEL cores=$cores docs=$nDocs triples=$triples best=$bestSec%.4f")
    }
    spark.stop()
  }
}
