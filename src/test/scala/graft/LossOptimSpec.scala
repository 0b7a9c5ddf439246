package graft

import graft.model.Token
import graft.score.{Losses, Prototypes}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the training-side ops (M4/M6/M7/M12) and the
  * prototype heads (M13/M14/M15). Expected values are derived independently
  * of the implementation (closed forms / reordered loops) so transcription
  * errors cannot self-verify.
  */
class LossOptimSpec extends SparkSuite {
  import spark.implicits._

  private val eps = 1e-9

  test("M4 sigmoid xent: stable identity matches -ln σ / -ln(1-σ)") {
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    assert(math.abs(Losses.sigmoidXent(2.0, 1.0) - -math.log(sig(2.0))) < eps)
    assert(math.abs(Losses.sigmoidXent(2.0, 0.0) - -math.log(1 - sig(2.0))) < eps)
    assert(math.abs(Losses.sigmoidXent(-3.0, 1.0) - -math.log(sig(-3.0))) < eps)
    assert(Losses.sigmoidXent(0.0, 1.0) === math.log(2.0))
  }

  test("M6 softmax xent: hand-computed 3-logit case + shift invariance") {
    val l = Array(1.0, 2.0, 3.0)
    val expected = math.log(math.exp(1.0) + math.exp(2.0) + math.exp(3.0)) - 3.0
    assert(math.abs(Losses.softmaxXent(l, 2) - expected) < eps)
    // shifting all logits must not change the loss
    assert(math.abs(Losses.softmaxXent(l.map(_ + 100), 2) - expected) < 1e-7)
  }

  test("M12 margin ranking: hinge at both sides of the margin") {
    assert(Losses.marginRank(1.0, 3.0, 1.0) === 0.0)    // true wins by > margin
    assert(Losses.marginRank(1.0, 1.0, 0.5) === 0.5)    // inside the margin
    assert(Losses.marginRank(1.0, 0.0, 2.0) === 3.0)    // wrong order
  }

  test("M7 clip_by_norm + Adam step: 3-4-5 clip and first-step magnitude") {
    Losses.clipByNorm(Array(3.0, 4.0), 3.0).zip(Seq(1.8, 2.4))
      .foreach { case (a, b) => assert(math.abs(a - b) < eps) }
    assert(Losses.clipByNorm(Array(1.0, 1.0), 3.0).toSeq == Seq(1.0, 1.0)) // untouched
    // t=1, zero moments, g clipped 10→3: m=0.3, v=0.009,
    // corr = lr·√(1−β₂)/(1−β₁), update = corr·m/(√v+ε) ≈ lr (Adam's
    // signature property: the first step is ≈ lr regardless of |g|)
    val (p, m, v) = Losses.adamStep(Array(1.0), Array(10.0), Array(0.0), Array(0.0), t = 1)
    assert(math.abs(m(0) - 0.3) < eps && math.abs(v(0) - 0.009) < eps)
    assert(math.abs((1.0 - p(0)) - 0.001) < 1e-6)
    assert(p(0) < 1.0) // moved against the gradient
  }

  test("M7 column form equals the scalar step at t=1 (incl. the clip factor)") {
    val rows = Seq((0.5, 2.0), (0.1, -4.0), (0.9, 0.5)).toDF("param", "grad")
    val norm = math.sqrt(Seq(2.0, -4.0, 0.5).map(g => g * g).sum)
    val clip = math.min(1.0, 3.0 / norm)
    val got = rows.select(Losses.adamFirstStepCol(col("param"), col("grad"), lit(clip))
      .as("p")).as[Double].collect()
    val want = Seq((0.5, 2.0), (0.1, -4.0), (0.9, 0.5)).map { case (p, g) =>
      Losses.adamStep(Array(p), Array(g * clip), Array(0.0), Array(0.0), t = 1,
        maxGradNorm = Double.MaxValue)._1(0)
    }
    got.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  private def protoFixture(dim: Int): Prototypes.ProtoWeights = {
    // deterministic small weights, NOT from the seeded generator
    val w3 = Array.tabulate(dim * dim * dim)(i => (i % 5 - 2) * 0.1f)
    Prototypes.ProtoWeights(dim, w3,
      zVec = Array.tabulate(dim)(i => 0.5f - i * 0.25f),
      bias = 0.125f,
      wIn = Array.tabulate(dim, dim)((i, j) => if (i == j) 1f else 0f),
      wState = Array.tabulate(dim, dim)((i, j) => if (i == j) 1f else 0f),
      bState = new Array[Float](dim))
  }

  test("M13 triple inner: matches an independently-ordered naive loop") {
    val w = protoFixture(3)
    val x = Array(1f, 2f, 3f); val y = Array(0.5f, -1f, 2f); val z = Array(2f, 0f, -1f)
    var want = 0.0 // k-major order, opposite of the implementation's i-major
    for (k <- 0 until 3; j <- 0 until 3; i <- 0 until 3)
      want += w.w3((i * 3 + j) * 3 + k) * x(i) * y(j) * z(k)
    assert(math.abs(Prototypes.tripleInner(w, x, y, z) - want) < 1e-6)
  }

  test("M14 keras bilinear layer: x^T diag(z) y + b") {
    val w = protoFixture(2) // z = (0.5, 0.25), b = 0.125
    // 0.5·1·3 + 0.25·2·4 + 0.125 = 1.5 + 2 + 0.125
    assert(math.abs(Prototypes.bilinearLayer(w, Array(1f, 2f), Array(3f, 4f)) - 3.625) < 1e-6)
  }

  test("M15 TreeRNN child-sum: 3-node tree with identity weights") {
    val w = protoFixture(2) // wIn = wState = I, b = 0 ⇒ h(v)=tanh(x(v)+Σh(c))
    def tok(i: Int, head: Int) = Token(s"t$i", s"t$i", "NOUN", "dep", head, false, false)
    val tokens = Array(tok(0, 1), tok(1, 1), tok(2, 1)) // 1 is root, 0 and 2 leaves
    val embeds = Map("t0" -> Array(0.1f, 0.2f), "t1" -> Array(0.3f, -0.1f),
      "t2" -> Array(-0.2f, 0.4f))
    val got = Prototypes.treeCompose(w, tokens, t => embeds(t.text))
    def tanh(a: Array[Double]) = a.map(math.tanh)
    val h0 = tanh(Array(0.1, 0.2)); val h2 = tanh(Array(-0.2, 0.4))
    val want = tanh(Array(0.3 + h0(0) + h2(0), -0.1 + h0(1) + h2(1)))
    got.zip(want).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6) }
  }

  test("q49 prototype scores: non-empty, deterministic, tree state shared per sentence") {
    val sents = graft.extract.Extract.docsToSentences(
      graft.corpus.Corpus.fromDocuments(spark, sfDir))
    val a = Prototypes.prototypeScores(sents).collect()
    val b = Prototypes.prototypeScores(sents).collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    // all candidates of one sentence share the tree-root L2 value
    val bySent = a.groupBy(r => (r.getString(0), r.getInt(1)))
    bySent.values.foreach(rows => assert(rows.map(_.getLong(6)).distinct.length == 1))
  }
}
