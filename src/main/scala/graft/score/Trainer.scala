package graft.score

import graft.model.SdpCandidate
import graft.sample.NegativeSampling
import org.apache.spark.sql.{DataFrame, Dataset}

/** The reference's UNSUPERVISED TRAINING LOOP shape (relembed.py:449-471:
  * negative-sampling sigmoid-xent minimized with clipped Adam), composed
  * from the engine's own operators into a distributed parameter-server
  * step — §2.9 sampling → M4 loss → analytic gradient → M7 Adam update.
  *
  * Model: logit(c) = d · f(c) + b over the FIXED composed feature
  * f(c) = [embed(x) ⊙ h(c) ; embed(y) ⊙ h(c)] (seeded embeddings + GRU
  * state — the pretrained-encoder fine-tuning shape; the two halves keep
  * the feature DIRECTION-AWARE, since §2.9's first negative is the
  * reversed pair and a symmetric feature could never separate it);
  * trained parameters are the scoring vector d and bias b, whose
  * sigmoid-xent gradient is exact and linear: ∂L/∂d = (σ(logit) − y)·f,
  * ∂L/∂b = σ(logit) − y.
  *
  * Distribution shape (the part that must survive 100 TB):
  *  - params are BROADCAST per epoch (dictionary-sized, like the dict joins);
  *  - the gradient is a per-partition partial sum (one narrow pass over the
  *    labeled stream — map-side combine, nothing row-scale leaves executors);
  *  - partials are summed ON THE DRIVER in partition order (gradient dim ×
  *    partition count floats — bounded by config, not data — and the fixed
  *    order keeps float addition deterministic across runs/cluster sizes);
  *  - the driver applies `Losses.adamStep` (per-tensor clip_by_norm 3,
  *    lr .001 — the reference's hyperparameters) and rebroadcasts.
  * This is exactly the data-parallel SGD topology (compute grads where the
  * data lives, update where the params live).
  */
object Trainer {

  case class Epoch(epoch: Int, loss_upm: Long, accuracy_ppm: Long,
                   margin_upm: Long)

  /** Train for `epochs` over candidates + sampled negatives; returns one row
    * per epoch with the floor-scaled mean loss, threshold accuracy and the
    * ranking margin (mean positive logit − mean negative logit), all
    * computed with the PRE-update params of that epoch, so epoch 0 is the
    * untrained baseline. The margin is the primary learning signal: §2.9's
    * k=1 negative is the REVERSED pair, which this fixed encoder can barely
    * separate at threshold 0 (by design — the reference separates it by
    * training the embeddings themselves), but ranking positives above the
    * pooled negatives is squarely learnable by the linear head.
    */
  def trainNegSampling(cands: Dataset[SdpCandidate], epochs: Int = 20,
                       negPer: Int = 2, seed: Long = 42L): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._

    val w = NeuralScorer.seededWeights(seed)
    val dim = 2 * w.hidden
    val bcW = spark.sparkContext.broadcast(w)

    // labeled stream: positives + keyed-RNG negatives (§2.9), features
    // composed ONCE and cached — at scale this is the materialized
    // training-example table every epoch re-scans
    val pool = cands.select(cands("x")).distinct()
    val labeled = NegativeSampling
      .withNegativesDistributed(cands, pool, negPer = negPer, seed = seed)
    val examples = labeled.select("doc_id", "span_idx", "x", "y", "path", "source", "label")
      .as[LabeledRow]
      .mapPartitions { it =>
        val ww = bcW.value
        it.map { r =>
          val c = SdpCandidate(r.doc_id, r.span_idx, r.x, r.y, r.path, r.source)
          (r.label, ExampleEncoder.feature(ww, c))
        }
      }
      .toDF("label", "f")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var d = new Array[Double](dim)
    var b = 0.0
    var m = new Array[Double](dim + 1) // Adam first moment (d ++ b)
    var v = new Array[Double](dim + 1)
    val out = Vector.newBuilder[Epoch]

    for (ep <- 0 until epochs) {
      val bcP = spark.sparkContext.broadcast((d, b))
      // one narrow pass: per-partition (grad[dim+1], lossSum, correct, n)
      val partials = examples.select("label", "f").as[(Int, Array[Float])]
        .rdd.mapPartitionsWithIndex { (pid, it) =>
          val (dd, bb) = bcP.value
          val g = new Array[Double](dim + 1)
          var loss = 0.0; var correct = 0L; var n = 0L
          var posSum = 0.0; var negSum = 0.0; var nPos = 0L
          it.foreach { case (label, f) =>
            var logit = bb
            var i = 0
            while (i < dim) { logit += dd(i) * f(i); i += 1 }
            val y = label.toDouble
            loss += Losses.sigmoidXent(logit, y)
            if ((logit >= 0.0) == (label == 1)) correct += 1
            if (label == 1) { posSum += logit; nPos += 1 } else negSum += logit
            n += 1
            val err = 1.0 / (1.0 + math.exp(-logit)) - y // σ(logit) − y
            i = 0
            while (i < dim) { g(i) += err * f(i); i += 1 }
            g(dim) += err
          }
          Iterator.single((pid, g, loss, correct, n, posSum, negSum, nPos))
        }.collect()
      bcP.destroy()

      // fixed-order driver reduce (deterministic float sums)
      val sorted = partials.sortBy(_._1)
      val grad = new Array[Double](dim + 1)
      var loss = 0.0; var correct = 0L; var n = 0L
      var posSum = 0.0; var negSum = 0.0; var nPos = 0L
      sorted.foreach { case (_, g, l, c, cnt, ps, ns, np) =>
        var i = 0
        while (i <= dim) { grad(i) += g(i); i += 1 }
        loss += l; correct += c; n += cnt
        posSum += ps; negSum += ns; nPos += np
      }
      val margin = posSum / nPos - negSum / (n - nPos)
      out += Epoch(ep, math.floor(loss / n * 1e6).toLong,
        correct * 1000000L / n, math.floor(margin * 1e6).toLong)

      // mean gradient → clipped Adam step on (d ++ b) as one tensor
      var i = 0
      while (i <= dim) { grad(i) /= n; i += 1 }
      val (pN, mN, vN) = Losses.adamStep(d :+ b, grad, m, v, t = ep + 1,
        lr = 0.05 /* lr scaled up: few epochs on a tiny feature head */)
      d = pN.take(dim); b = pN(dim); m = mN; v = vN
    }
    examples.unpersist(blocking = false)
    out.result().toDF()
  }
}

/** Row shape + feature composer for the trainer (kept out of the loop so the
  * closure captures only the broadcast).
  */
private[score] object ExampleEncoder {

  /** f(c) = [embed(x) ⊙ h(c) ; embed(y) ⊙ h(c)]: fixed, direction-aware. */
  def feature(w: NeuralScorer.Weights, c: SdpCandidate): Array[Float] = {
    val h = NeuralScorer.encode(w, c)
    val ex = NeuralScorer.embedOf(w, c.x)
    val ey = NeuralScorer.embedOf(w, c.y)
    val d = w.hidden
    val f = new Array[Float](2 * d)
    var i = 0
    while (i < d) { f(i) = ex(i) * h(i); f(d + i) = ey(i) * h(i); i += 1 }
    // L2-normalize: the raw products are O(1e-3), which leaves the logit
    // bias-dominated for any reasonable step count; unit-norm features put
    // the linear head's reachable logits at O(‖d‖)
    var s = 0.0
    i = 0
    while (i < 2 * d) { s += f(i).toDouble * f(i); i += 1 }
    val inv = if (s > 0) (1.0 / math.sqrt(s)).toFloat else 0f
    i = 0
    while (i < 2 * d) { f(i) *= inv; i += 1 }
    f
  }
}

private[score] case class LabeledRow(
    doc_id: String, span_idx: Int, x: String, y: String,
    path: Array[graft.model.PathStep], source: String, label: Int)
