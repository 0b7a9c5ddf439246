package graft

import graft.corpus.Corpus
import graft.extract.Extract
import graft.score.Trainer

/** The composed training loop must actually LEARN on the real corpus: the
  * negative-sampling loss must fall and the positive-over-negative ranking
  * margin must emerge, deterministically.
  */
class TrainerSpec extends SparkSuite {

  private lazy val cands =
    Extract.candidates(Extract.docsToSentences(Corpus.fromDocuments(spark, sfDir))).cache()

  test("negative-sampling training: loss falls, ranking margin emerges, deterministic") {
    val epochs = Trainer.trainNegSampling(cands, epochs = 20)
      .collect().sortBy(_.getInt(0))
    assert(epochs.length == 20)
    val losses = epochs.map(_.getLong(1))
    val margins = epochs.map(_.getLong(3))
    // learning signal: final loss strictly below the untrained epoch-0 loss,
    // and the last epoch is the (joint) best of the run
    assert(losses.last < losses.head, s"loss did not fall: ${losses.toSeq}")
    assert(losses.last == losses.min, s"final epoch not best: ${losses.toSeq}")
    // ranking signal: positives end up scored above negatives on average,
    // and the margin GREW during training (epoch 0 = untrained baseline).
    // Threshold accuracy is deliberately not gated: §2.9's k=1 negative is
    // the reversed pair, which a fixed random encoder cannot separate at
    // threshold 0 (the reference separates it by training the embeddings).
    assert(margins.last > margins.head, s"margin did not grow: ${margins.toSeq}")
    assert(margins.last > 0L, s"positives not ranked above negatives: ${margins.last}")
    // determinism: fixed example layout + fixed-order driver reduce ⇒
    // identical epochs on re-run
    val again = Trainer.trainNegSampling(cands, epochs = 20)
      .collect().sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(3)))
    assert(again.toSeq == epochs.map(r => (r.getLong(1), r.getLong(3))).toSeq)
  }

  test("stepsPerEpoch > 1: micro-batch SGD still learns, deterministically") {
    // B = 3 stride micro-batches per epoch (the reference's per-batch Adam
    // granularity, round-4 verdict item 6) — three times the optimizer
    // steps, so fewer epochs reach a learning signal
    val epochs = Trainer.trainNegSampling(cands, epochs = 8, stepsPerEpoch = 3)
      .collect().sortBy(_.getInt(0))
    assert(epochs.length == 8)
    val losses = epochs.map(_.getLong(1))
    val margins = epochs.map(_.getLong(3))
    assert(losses.last < losses.head, s"loss did not fall at B=3: ${losses.toSeq}")
    assert(margins.last > margins.head, s"margin did not grow at B=3: ${margins.toSeq}")
    // the micro-batched trajectory DIFFERS from the one-step-per-epoch one
    // (more Adam steps per epoch) but is itself deterministic
    val b1 = Trainer.trainNegSampling(cands, epochs = 8)
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    assert(losses.toSeq != b1.toSeq, "B=3 unexpectedly identical to B=1")
    val again = Trainer.trainNegSampling(cands, epochs = 8, stepsPerEpoch = 3)
      .collect().sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(3)))
    assert(again.toSeq == epochs.map(r => (r.getLong(1), r.getLong(3))).toSeq)
  }

  test("empty micro-batch fails loudly instead of NaN-poisoning the params") {
    // stepsPerEpoch far beyond the per-partition example count: some stride
    // micro-batch selects nothing anywhere, which would divide the gradient
    // by n=0 and silently continue on NaN params — the trainer must reject it
    val tiny = cands.limit(2)
    val e = intercept[IllegalArgumentException] {
      Trainer.trainNegSampling(tiny, epochs = 1, stepsPerEpoch = 64)
    }
    assert(e.getMessage.contains("stepsPerEpoch"), e.getMessage)
  }

  test("checkpoint/resume: a killed run resumes bit-identically, wOut trains") {
    val dir = java.nio.file.Files.createTempDirectory("trainer-ckpt").toString
    val straight = Trainer.trainNegSampling(cands, epochs = 8)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // "kill" after 4 epochs (optimizer state committed every 2 through TableIO)
    Trainer.trainNegSampling(cands, epochs = 4, ckptTable = Some(dir), ckptEvery = 2)
    // resume to 8: only epochs 4..7 execute, from the restored state
    val resumed = Trainer.trainNegSampling(cands, epochs = 8, ckptTable = Some(dir), ckptEvery = 2)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(resumed.map(_._1).toSeq == Seq(4, 5, 6, 7))
    // bit-identical continuation: the resumed epochs equal the same epochs
    // of an uninterrupted run (parquet doubles round-trip exactly; the
    // deterministic example layout regenerates the same gradient stream)
    assert(resumed.toSeq == straight.drop(4).toSeq,
      s"resumed=${resumed.toSeq} straight=${straight.drop(4).toSeq}")
    // the trained surface includes the output-weight layer: the final
    // committed params' wOut segment (indices [2·hidden, 3·hidden)) moved
    import org.apache.spark.sql.Row
    val p = graft.tableio.TableIO.read(spark, dir).select("param")
      .head().getAs[scala.collection.Seq[Double]](0)
    val hidden = (p.length - 1) / 3
    assert(p.slice(2 * hidden, 3 * hidden).exists(_ != 0.0), "wOut never updated")
  }
}
