package graft

import graft.corpus.BrownClusters
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** S7 faithful source: wcluster paths-format (bitstring<TAB>word<TAB>count). */
class BrownClustersSpec extends SparkSuite {

  private def writePaths(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("brown_paths")
    Files.write(dir.resolve("paths"), lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("paths file round-trips with binary cluster ids") {
    val loc = writePaths(Seq(
      "0111\tthe\t1093",
      "0110\tof\t677",
      "10\tcat\t42",
      "1011\tdog\t17"))
    val df = BrownClusters.read(spark, loc)
    assert(df.count() === 4)
    val byWord = df.collect().map(r => r.getAs[String]("word") ->
      (r.getAs[String]("path"), r.getAs[Long]("count"), r.getAs[Long]("cluster_id"))).toMap
    assert(byWord("the") === (("0111", 1093L, 7L)))
    assert(byWord("cat") === (("10", 42L, 2L)))
    assert(byWord("dog") === (("1011", 17L, 11L)))
  }

  test("prefix dictionary collapses words sharing a path prefix into one cluster") {
    val loc = writePaths(Seq(
      "0111\tthe\t1093",
      "0110\tof\t677",
      "1011\tdog\t17"))
    val dict = BrownClusters.dictionary(BrownClusters.read(spark, loc), prefixBits = 3)
    val m = dict.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "011" prefix shared by the/of → same cluster (3); dog "101" → 5
    assert(m("the") === 3L && m("of") === 3L && m("dog") === 5L)
  }

  test("dictionary joins as the bounded broadcast side of a token stream") {
    import spark.implicits._
    val loc = writePaths(Seq("01\tspark\t5", "10\tjoin\t3"))
    val dict = BrownClusters.dictionary(BrownClusters.read(spark, loc), prefixBits = 2)
    val toks = Seq("spark", "join", "unseen").toDF("word")
    val joined = toks.join(broadcast(dict), Seq("word"), "left")
      .select(col("word"), coalesce(col("cluster"), lit(-1L)).as("cluster"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(joined === Map("spark" -> 1L, "join" -> 2L, "unseen" -> -1L))
  }
}
