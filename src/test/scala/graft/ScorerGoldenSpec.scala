package graft

import graft.eval.Eval
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** External correctness anchor for the Eval aggregator: replay the OFFICIAL
  * SemEval-2010 Task 8 perl scorer's shipped golden samples —
  * proposed_answer{1,2,3,5}.txt scored against answer_key{1,2,3,5}.txt must
  * reproduce the macro/micro P/R/F1 published in result_scores{1,2,3,5}.txt
  * (the "(9+1)-WAY EVALUATION TAKING DIRECTIONALITY INTO ACCOUNT -- OFFICIAL"
  * section). Pair 4 ships no result file (it is the format-checker's
  * deliberately-broken sample) and is excluded by the scorer's own README.
  *
  * Expected numbers are parsed from the result files at test time, not
  * hard-coded, so the assertion is against the scorer's actual output.
  * The samples exercise the tricky corners: direction-wrong predictions
  * (xDIRx column), skipped gold ids, gold-absent predicted classes (pair 3's
  * Message-Topic), and a single-relation key (pair 5).
  */
class ScorerGoldenSpec extends SparkSuite {

  private val scorerDir = Paths.get(
    "/root/reference/SemEval2010_task8_all_data/SemEval2010_task8_scorer-v1.2")

  private def readPairsFile(name: String): Map[Long, String] =
    Files.readAllLines(scorerDir.resolve(name)).asScala
      .map(_.trim).filter(_.nonEmpty)
      .map { line =>
        val Array(id, label) = line.split("\t", 2)
        id.trim.toLong -> label.trim
      }.toMap

  /** (macroP, macroR, macroF1, microP, microR, microF1) in percent, from the
    * OFFICIAL section of a result_scores file.
    */
  private def publishedOfficial(name: String): (Double, Double, Double, Double, Double, Double) = {
    val lines = Files.readAllLines(scorerDir.resolve(name)).asScala
    val official = lines.dropWhile(!_.contains("-- OFFICIAL")).toSeq
    val pct = """=?\s*(-?\d+\.\d+)%""".r
    def prf(after: String): (Double, Double, Double) = {
      val line = official.dropWhile(!_.startsWith(after)).drop(1).head
      val Seq(p, r, f) = pct.findAllMatchIn(line).map(_.group(1).toDouble).toSeq
      (p, r, f)
    }
    val (mp, mr, mf) = prf("Micro-averaged result")
    val (ap, ar, af) = prf("MACRO-averaged result")
    (ap, ar, af, mp, mr, mf)
  }

  private def checkPair(n: Int): Unit = {
    val key = readPairsFile(s"answer_key$n.txt")
    val prop = readPairsFile(s"proposed_answer$n.txt")
    val strays = prop.keySet -- key.keySet
    assert(strays.isEmpty, s"proposed ids missing from key: $strays")

    // skipped gold ids become (SkipLabel, gold) pairs — R-denominator only
    val pairs = key.toSeq.map { case (id, gold) =>
      (prop.getOrElse(id, Eval.SkipLabel), gold)
    }
    import spark.implicits._
    val stats = Eval.evaluateOfficial(spark.createDataset(pairs))

    val (ap, ar, af, mp, mr, mf) = publishedOfficial(s"result_scores$n.txt")
    def close(got: Double, pub: Double, what: String): Unit =
      assert(math.abs(got * 100 - pub) <= 0.005 + 1e-9,
        f"pair $n $what: got ${got * 100}%.4f%% vs published $pub%.2f%%")
    close(stats.macroP, ap, "macro-P")
    close(stats.macroR, ar, "macro-R")
    close(stats.macroF1, af, "macro-F1 (THE official score)")
    close(stats.microP, mp, "micro-P")
    close(stats.microR, mr, "micro-R")
    close(stats.microF1, mf, "micro-F1")
  }

  test("Eval reproduces the official scorer's published scores on all four shipped golden pairs") {
    assume(Files.isDirectory(scorerDir), "reference scorer samples not present")
    Seq(1, 2, 3, 5).foreach(checkPair)
  }
}
