package graft.tools
import graft.corpus.Corpus
import graft.extract.Extract
import org.apache.spark.sql.SparkSession
object FreezeFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = Extract.triples(Extract.candidates(
      Extract.docsToSentences(Corpus.fromDocuments(spark, "/root/testdata/sf0.001"))))
      .map(t => s"${t.doc_id},${t.span_idx},${t.subj},${t.pred},${t.obj}")
      .collect().sorted
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      String.join("\n", t: _*).getBytes)
    println(s"wrote ${t.length} rows")
    spark.stop()
  }
}
