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
    // determinism: fixed-order driver reduce ⇒ identical epochs on re-run
    val again = Trainer.trainNegSampling(cands, epochs = 20)
      .collect().sortBy(_.getInt(0)).map(r => (r.getLong(1), r.getLong(3)))
    assert(again.toSeq == epochs.map(r => (r.getLong(1), r.getLong(3))).toSeq)
  }
}
