package graft.score

import org.apache.spark.rdd.RDD
import scala.reflect.ClassTag

/** Deterministic DISTRIBUTED reduction of per-partition gradient partials —
  * the cluster-scale replacement for collecting every partial to the driver
  * (round-4 verdict item 3: at 10k partitions the trainers' `.collect()` of
  * ~1 MB partials is ~10 GB to the driver per epoch; the reference's analog
  * is the per-batch `session.run` reduce, relembed.py:659-667, which a
  * data-parallel port would tree-aggregate).
  *
  * Float addition is not associative, so a deterministic result needs a
  * FIXED association shape, independent of task scheduling. The shape here
  * is a depth-2 tree keyed on partition id:
  *  - level 1: partials are grouped by `pid / groupSize` (groupSize =
  *    ⌈√parts⌉), each group sorted by pid and folded LEFT — an executor-side
  *    shuffle stage whose traffic is (model size × parts) spread over
  *    ⌈parts/groupSize⌉ reducers;
  *  - level 2: the ⌈√parts⌉ group sums come to the driver, sorted by group
  *    id, and folded LEFT.
  * Both levels' inputs are explicitly sorted by their id before folding, so
  * the association is a pure function of `parts` — bit-identical across
  * runs, cluster sizes, and scheduling orders. `local` applies the SAME
  * shape to collected partials; TrainerSpec pins tree == local bit-exactly.
  *
  * `merge(a, b)` may mutate and return `a` (both paths only ever hand it
  * freshly-deserialized or caller-owned values, never shared ones).
  */
object DetReduce {

  /** Level-1 group width: ⌈√parts⌉ balances the two levels' fan-in. */
  def groupSize(parts: Int): Int =
    math.max(1, math.ceil(math.sqrt(parts.toDouble)).toInt)

  /** Depth-2 deterministic tree reduce of one partial per partition id.
    * Driver traffic: ⌈parts/⌈√parts⌉⌉ group sums instead of `parts` partials.
    */
  def tree[T: ClassTag](partials: RDD[(Int, T)], parts: Int,
                        merge: (T, T) => T): T = {
    val gs = groupSize(parts)
    val nGroups = (parts + gs - 1) / gs
    val groupSums = partials
      .map { case (pid, t) => (pid / gs, (pid, t)) }
      .groupByKey(numPartitions = math.max(nGroups, 1))
      .mapValues(vs => vs.toArray.sortBy(_._1).map(_._2).reduceLeft(merge))
      .collect()
    require(groupSums.nonEmpty, "no partials to reduce")
    groupSums.sortBy(_._1).map(_._2).reduceLeft(merge)
  }

  /** The same fold shape over already-collected partials — the oracle the
    * determinism spec compares `tree` against (and the shape the driver-side
    * fold must keep so collect-vs-tree stays bit-identical).
    */
  def local[T](partials: Seq[(Int, T)], parts: Int, merge: (T, T) => T): T = {
    val gs = groupSize(parts)
    require(partials.nonEmpty, "no partials to reduce")
    partials.groupBy(_._1 / gs).toSeq.sortBy(_._1)
      .map { case (_, vs) => vs.sortBy(_._1).map(_._2).reduceLeft(merge) }
      .reduceLeft(merge)
  }
}

/** One partition's gradient partial: the flat gradient accumulator plus the
  * epoch-metric sums both trainers report. `merge` sums b into a IN PLACE
  * (a's array is owned by the reduction).
  */
final case class GradPartial(g: Array[Double], loss: Double, correct: Long,
                             n: Long, posSum: Double, negSum: Double,
                             nPos: Long)

object GradPartial {
  def merge(a: GradPartial, b: GradPartial): GradPartial = {
    val g = a.g
    var i = 0
    while (i < g.length) { g(i) += b.g(i); i += 1 }
    GradPartial(g, a.loss + b.loss, a.correct + b.correct, a.n + b.n,
      a.posSum + b.posSum, a.negSum + b.negSum, a.nPos + b.nPos)
  }
}
