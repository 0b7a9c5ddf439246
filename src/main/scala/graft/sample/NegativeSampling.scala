package graft.sample

import graft.model.SdpCandidate
import org.apache.spark.sql.Dataset

/** Negative sampling — the reference's distinctive batch operator
  * (data_handler.py:126-236 `_generate_batch`): per true row emit `negPer`
  * corrupted copies with label 0:
  *  - first negative swaps the targets (x,y)→(y,x) (data_handler.py:172-178);
  *  - other negatives resample one/both endpoints from the target unigram
  *    distribution (:181-188) and corrupt up to `negLevel` interior path
  *    words from the smoothed vocab distribution (:196-205).
  *
  * Spark restatement: flatMap with a per-row keyed RNG — seed mixes the
  * global seed with (doc_id, span_idx, x, y, copy index) so output is
  * deterministic under any partitioning (SURVEY.md §2.9).
  */
object NegativeSampling {

  case class LabeledCandidate(cand: SdpCandidate, label: Int, copy: Int)

  /** Mix a stable 64-bit state from row identity + copy (splitmix64). */
  private def mix(parts: Any*): Long = {
    var h = 0x9e3779b97f4a7c15L
    parts.foreach { p => h = (h ^ p.hashCode.toLong) * 0xbf58476d1ce4e5b9L; h ^= h >>> 27 }
    h
  }

  private final class KeyedRng(seed0: Long) {
    private var s = if (seed0 == 0) 0x1234567887654321L else seed0
    def nextLong(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    def nextInt(bound: Int): Int = math.floorMod(nextLong(), bound.toLong).toInt
  }

  /** Emit (true row, label 1) plus `negPer` corruptions (label 0). `targets`
    * and `vocab` are the sampled-from pools (broadcast; reference's target /
    * smoothed-vocab unigram distributions — uniform stands in here since the
    * distribution itself ships as A6's power-smoothing query).
    */
  def withNegatives(
      cands: Dataset[SdpCandidate],
      targets: IndexedSeq[String],
      vocab: IndexedSeq[String],
      negPer: Int = 3,
      negLevel: Int = 1,
      seed: Long = 42L): Dataset[LabeledCandidate] = {
    val spark = cands.sparkSession
    import spark.implicits._
    val bcT = spark.sparkContext.broadcast(targets)
    val bcV = spark.sparkContext.broadcast(vocab)
    cands.flatMap { c =>
      val ts = bcT.value; val vs = bcV.value
      Iterator.single(LabeledCandidate(c, 1, 0)) ++
        (1 to negPer).iterator.map { k =>
          val rng = new KeyedRng(mix(seed, c.doc_id, c.span_idx, c.x, c.y, k))
          val corrupted =
            if (k == 1) c.copy(x = c.y, y = c.x) // first negative: swap
            else {
              var cc = c.copy(x = ts(rng.nextInt(ts.length)))
              if (rng.nextInt(2) == 1) cc = cc.copy(y = ts(rng.nextInt(ts.length)))
              // corrupt up to negLevel interior path words
              if (cc.path.length > 2) {
                val p = cc.path.clone()
                var n = 0
                while (n < negLevel) {
                  val idx = 1 + rng.nextInt(p.length - 2)
                  p(idx) = p(idx).copy(word = vs(rng.nextInt(vs.length)))
                  n += 1
                }
                cc = cc.copy(path = p)
              }
              cc
            }
          LabeledCandidate(corrupted, 0, k)
        }
    }
  }
}
