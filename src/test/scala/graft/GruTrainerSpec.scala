package graft

import graft.corpus.Corpus
import graft.extract.Extract
import graft.score.GruTrainer
import graft.score.GruTrainer.{Dims, GruExample}

/** Full-model backprop gates.
  *
  * The load-bearing test is the FINITE-DIFFERENCE check: hand-derived
  * backprop-through-time is exactly the kind of code that can be subtly
  * wrong while still "learning" (a dropped term usually leaves a descent
  * direction), so every single parameter's analytic gradient is compared
  * against a central difference of the forward loss. The learning /
  * determinism / resume gates then mirror TrainerSpec's.
  */
class GruTrainerSpec extends SparkSuite {

  private def tinyParams(d: Dims, seed: Long): Array[Double] = {
    var s = seed
    Array.fill(d.size) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s * 2685821657736338717L >>> 11).toDouble / (1L << 53) * 0.4 - 0.2
    }
  }

  test("analytic gradient matches central finite differences on every parameter") {
    val d = Dims(v = 8, e = 4, h = 4)
    val p = tinyParams(d, seed = 7L)
    // three examples: multi-step path (BPTT ≥ 3 steps back), single-step,
    // empty path (h stays 0), aliased x == y (scatter-add aliasing), and a
    // step whose three modality tokens collide into ONE bucket (dx scattered
    // 3× into the same row)
    val exs = Seq(
      GruExample(xB = 1, yB = 2, steps = Array(Array(0, 3, 5), Array(2, 2, 2), Array(4, 6, 7)), label = 1),
      GruExample(xB = 3, yB = 3, steps = Array(Array(1, 4, 6)), label = 0),
      GruExample(xB = 0, yB = 5, steps = Array.empty[Array[Int]], label = 1))
    val grad = new Array[Double](d.size)
    exs.foreach(ex => GruTrainer.forwardBackward(d, p, ex, grad))
    val eps = 1e-6
    var worst = 0.0
    var k = 0
    while (k < d.size) {
      val saved = p(k)
      p(k) = saved + eps
      val up = exs.map(GruTrainer.forwardLoss(d, p, _)).sum
      p(k) = saved - eps
      val dn = exs.map(GruTrainer.forwardLoss(d, p, _)).sum
      p(k) = saved
      val numeric = (up - dn) / (2 * eps)
      val diff = math.abs(grad(k) - numeric) / math.max(1.0, math.abs(numeric))
      if (diff > worst) worst = diff
      assert(diff < 1e-5,
        s"param $k: analytic ${grad(k)} vs numeric $numeric (diff $diff)")
      k += 1
    }
    info(f"max relative gradient error over ${d.size} params: $worst%.2e")
  }

  private lazy val cands =
    Extract.candidates(Extract.docsToSentences(Corpus.fromDocuments(spark, sfDir))).cache()

  test("full-model training: loss falls, margin emerges, deterministic") {
    val epochs = GruTrainer.train(cands, epochs = 8)
      .collect().sortBy(_.getInt(0))
    assert(epochs.length == 8)
    val losses = epochs.map(_.getLong(1))
    val margins = epochs.map(_.getLong(3))
    assert(losses.last < losses.head, s"loss did not fall: ${losses.toSeq}")
    assert(losses.last == losses.min, s"final epoch not best: ${losses.toSeq}")
    assert(margins.last > margins.head, s"margin did not grow: ${margins.toSeq}")
    val again = GruTrainer.train(cands, epochs = 8)
      .collect().sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(3)))
    assert(again.toSeq == epochs.map(r => (r.getLong(1), r.getLong(3))).toSeq)
  }

  test("checkpoint/resume continues bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("gru-ckpt").toString
    val straight = GruTrainer.train(cands, epochs = 6)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    GruTrainer.train(cands, epochs = 3, ckptTable = Some(dir), ckptEvery = 3)
    val resumed = GruTrainer.train(cands, epochs = 6, ckptTable = Some(dir), ckptEvery = 3)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(resumed.map(_._1).toSeq == Seq(3, 4, 5))
    assert(resumed.toSeq == straight.drop(3).toSeq,
      s"resumed=${resumed.toSeq} straight=${straight.drop(3).toSeq}")
  }
}
