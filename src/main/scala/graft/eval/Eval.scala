package graft.eval

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Official-scorer-semantics evaluation as a typed Aggregator
  * (SURVEY.md A9/A10; reference: experiment_helper.py:37-88 and the SemEval
  * perl scorer's "(9+1)-way with directionality" metric, which excludes
  * 'Other' from the macro average).
  */
case class EvalStats(
    accuracy: Double,
    microP: Double,
    microR: Double,
    microF1: Double,
    macroP: Double,
    macroR: Double,
    macroF1: Double,
    n: Long)

object Eval {

  /** Confusion counts keyed by (pred, label). */
  type Confusion = Map[(String, String), Long]

  def statsFromConfusion(conf: Confusion, excludeFromMacro: Set[String]): EvalStats = {
    val classes = (conf.keys.map(_._1) ++ conf.keys.map(_._2)).toSeq.distinct.sorted
    val n = conf.values.sum
    val correct = conf.collect { case ((p, l), c) if p == l => c }.sum

    def tp(c: String) = conf.getOrElse((c, c), 0L)
    def predCount(c: String) = conf.collect { case ((p, _), v) if p == c => v }.sum
    def labelCount(c: String) = conf.collect { case ((_, l), v) if l == c => v }.sum

    val scored = classes.filterNot(excludeFromMacro)
    def safeDiv(a: Double, b: Double) = if (b == 0) 0.0 else a / b

    val perP = scored.map(c => safeDiv(tp(c).toDouble, predCount(c).toDouble))
    val perR = scored.map(c => safeDiv(tp(c).toDouble, labelCount(c).toDouble))
    val perF = perP.zip(perR).map { case (p, r) => safeDiv(2 * p * r, p + r) }

    // micro sums over the scored classes (official scorer excludes 'Other'
    // from these sums as well — experiment_helper.py:52-66 skip_other path)
    val microTp = scored.map(tp).sum.toDouble
    val microPred = scored.map(predCount).sum.toDouble
    val microLabel = scored.map(labelCount).sum.toDouble
    val mP = safeDiv(microTp, microPred)
    val mR = safeDiv(microTp, microLabel)

    EvalStats(
      accuracy = safeDiv(correct.toDouble, n.toDouble),
      microP = mP,
      microR = mR,
      microF1 = safeDiv(2 * mP * mR, mP + mR),
      macroP = if (scored.isEmpty) 0 else perP.sum / perP.size,
      macroR = if (scored.isEmpty) 0 else perR.sum / perR.size,
      macroF1 = if (scored.isEmpty) 0 else perF.sum / perF.size,
      n = n)
  }

  /** Typed Aggregator over (pred, label) pairs: partial confusion maps merge
    * associatively (partition-order invariant), stats computed once at the
    * end. One pass, map-side combine for free.
    */
  class PrF1Aggregator(excludeFromMacro: Set[String] = Set("Other"))
      extends Aggregator[(String, String), Confusion, EvalStats] {
    override def zero: Confusion = Map.empty
    override def reduce(b: Confusion, a: (String, String)): Confusion =
      b.updated(a, b.getOrElse(a, 0L) + 1L)
    override def merge(b1: Confusion, b2: Confusion): Confusion =
      b2.foldLeft(b1) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    override def finish(r: Confusion): EvalStats = statsFromConfusion(r, excludeFromMacro)
    override def bufferEncoder: Encoder[Confusion] = Encoders.kryo[Confusion]
    override def outputEncoder: Encoder[EvalStats] = Encoders.product[EvalStats]
  }

  /** Evaluate a Dataset of (pred, label) string pairs. */
  def evaluate(pairs: Dataset[(String, String)],
               excludeFromMacro: Set[String] = Set("Other")): EvalStats =
    pairs.select(new PrF1Aggregator(excludeFromMacro).toColumn).first()
}
