package graft.tools

import graft.extract.Extract
import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary job-level timing probe for the pipeline scaling job: prints each
  * Spark job's wall time plus the DRIVER GAP since the previous job ended —
  * the gap is pure driver-side planning/scheduling, the target of the
  * serial-floor hunt.
  */
object ProbePipeline {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val repl = args(1).toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"probe-pipeline-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
    sys.env.get("PROBE_CONF").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val lastEnd = new java.util.concurrent.atomic.AtomicLong(0L)
    val t00 = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts(j.jobId) = j.time
        val gap = if (lastEnd.get == 0) 0 else j.time - lastEnd.get
        val site = Option(j.properties)
          .map(p => Option(p.getProperty("callSite.short")).getOrElse("") + " | " +
            Option(p.getProperty("spark.job.description")).getOrElse("")).getOrElse("")
        System.err.println(f"  [job ${j.jobId}%3d start] gap=${gap}%5d ms  t=${j.time - t00.get}%6d  ${site.take(90)}")
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        lastEnd.set(j.time)
        val dur = starts.get(j.jobId).map(s => j.time - s).getOrElse(-1L)
        System.err.println(f"  [job ${j.jobId}%3d end  ] dur=${dur}%5d ms  t=${j.time - t00.get}%6d")
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for { s <- si.submissionTime; e <- si.completionTime } yield e - s).getOrElse(-1L)
        if (dur > 200)
          System.err.println(f"      [stage ${si.stageId}%4d] ${dur}%6d ms tasks=${si.numTasks}%4d " +
            f"run=${si.taskMetrics.executorRunTime}%7d cpu=${si.taskMetrics.executorCpuTime / 1000000}%7d " +
            f"gc=${si.taskMetrics.jvmGCTime}%5d " +
            f"in=${si.taskMetrics.inputMetrics.recordsRead}%9d " +
            f"shR=${si.taskMetrics.shuffleReadMetrics.recordsRead}%9d " +
            f"shW=${si.taskMetrics.shuffleWriteMetrics.recordsWritten}%9d " +
            f"out=${si.taskMetrics.outputMetrics.recordsWritten}%7d ${si.name.take(45)}")
      }
    })

    val corpusPath = s"/tmp/graft-pipe-corpus-c$cores-r$repl"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(64, col("doc_id"))
      .withColumn("copy", explode(sequence(lit(0), lit(repl - 1))))
      .withColumn("text",
        regexp_replace(
          regexp_replace(col("text"), lit("\\bspark\\b"),
            concat(lit("spark"), col("copy"))),
          lit("\\btable\\b"),
          concat(lit("table"), (col("copy") / 2).cast("int"),
            when(pmod(col("copy"), lit(2)) === 0, lit("s")).otherwise(lit("")))))
      .select((col("doc_id") * repl + col("copy")).as("doc_id"), col("text"))
      .write.mode("overwrite").parquet(corpusPath)

    def docs(r: Int) = spark.read.parquet(corpusPath).as[(Long, String)]

    val stageSel = sys.env.getOrElse("PROBE_STAGE", "full")
    def job(): Long = stageSel match {
      case "scan" => docs(repl).select(sum(length(col("text")))).first().getLong(0)
      case "kernel" => Extract.triplesFused(docs(repl)).count()
      case _ => KgPipeline.canonicalTriplesInMemory(docs(repl)).count()
    }

    // warmup: full job once
    job()
    spark.sharedState.cacheManager.clearCache(); System.gc()
    System.err.println("=== warm, timed rep follows ===")
    t00.set(System.currentTimeMillis()); lastEnd.set(0L)
    val t0 = System.nanoTime()
    val n = job()
    System.err.println(f"[probe] timed rep ($stageSel): ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    spark.stop()
  }
}
