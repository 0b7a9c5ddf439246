package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("TIMEQ_CORES", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("TIMEQ_CORES", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$c")
      val t1 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"$n (2nd): ${(System.nanoTime()-t1)/1e9}%.2fs")
    }
    spark.stop()
  }
}
