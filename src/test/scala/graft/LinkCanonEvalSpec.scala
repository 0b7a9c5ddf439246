package graft

import graft.canon.ConnectedComponents
import graft.corpus.Corpus
import graft.eval.Eval
import graft.extract.Extract
import graft.link.Linking

class LinkCanonEvalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val mentions =
    Extract.mentions(Extract.docsToSentences(Corpus.fromDocuments(spark, sfDir))).cache()

  test("alias dictionary: ids dense, frequency-ordered, deterministic tie-break") {
    val dict = Linking.buildAliasDict(mentions).collect().sortBy(_.entity_id)
    assert(dict.nonEmpty)
    assert(dict.map(_.entity_id).toSeq == dict.indices.map(_.toLong))
    // non-increasing freq; ties broken by alias asc
    dict.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.freq > b.freq || (a.freq == b.freq && a.alias < b.alias))
      case _ =>
    }
    assert(math.abs(dict.map(_.prob).sum - 1.0) < 1e-9)
  }

  test("broadcast link join == salted join, with OOV default for misses") {
    // top-10 dictionary so rarer surfaces genuinely miss → OOV
    val dict = Linking.buildAliasDict(mentions).filter(_.entity_id < 10).cache()
    val plain = Linking.linkMentions(mentions, dict)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(4))).toSet
    val salted = Linking.saltedJoin(mentions, dict, buckets = 7)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(4))).toSet
    assert(plain == salted, "salting must not change join semantics")
    val linked = Linking.linkMentions(mentions, dict).cache()
    assert(linked.count() == mentions.count(), "left join must preserve all mentions")
    assert(linked.filter($"entity_id" === Linking.OovEntityId).count() > 0,
      "rare surfaces must fall back to OOV")
  }

  test("connected components: chain, clique, singletons, two components") {
    // chain 1-2-3-4, clique 10-11-12, isolated self-loop 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 20L)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges, checkpointEvery = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("connected components: adversarial 3000-node chain converges in O(log d) rounds") {
    // Plain hash-min needs Θ(diameter) = 3000 rounds here and would silently
    // return unconverged labels at any practical maxIter. The fused pointer
    // shortcut doubles label-pointer depth per round, so a tight 24-round
    // budget (≈2·log₂ 3000) both converges AND pins the complexity class —
    // if a regression drops the shortcut, this test fails, not just slows.
    val n = 3000
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges, maxIter = 24, checkpointEvery = 6)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("P/R/F1 aggregator matches hand-computed official-scorer semantics") {
    // confusion: A: tp=2, pred A 3 times, label A 2 times; B: tp=1 of 2 labels;
    // Other excluded from macro/micro
    val pairs = Seq(
      ("A", "A"), ("A", "A"), ("A", "B"),      // A predicted 3x, correct 2x
      ("B", "B"),                              // B correct once
      ("Other", "B"),                          // B missed
      ("Other", "Other"), ("A", "Other")).toDS()
    val stats = Eval.evaluate(pairs)
    // A: P=2/4? no — pred A count = 4 (includes ("A","Other")); recompute:
    // predA=4, labelA=2, tpA=2 → P_A=0.5, R_A=1.0, F_A=2/3
    // predB=1, labelB=3, tpB=1 → P_B=1.0, R_B=1/3, F_B=0.5
    assert(math.abs(stats.macroP - (0.5 + 1.0) / 2) < 1e-9)
    assert(math.abs(stats.macroR - (1.0 + 1.0 / 3) / 2) < 1e-9)
    assert(math.abs(stats.macroF1 - (2.0 / 3 + 0.5) / 2) < 1e-9)
    // micro over A,B: tp=3, pred=5, label=5
    assert(math.abs(stats.microP - 3.0 / 5) < 1e-9)
    assert(math.abs(stats.microR - 3.0 / 5) < 1e-9)
    assert(math.abs(stats.accuracy - 4.0 / 7) < 1e-9)
    assert(stats.n == 7)
  }

  test("aggregator is partition-order invariant") {
    val pairs = (1 to 200).map(i =>
      (if (i % 3 == 0) "A" else "B", if (i % 2 == 0) "A" else "B"))
    val s1 = Eval.evaluate(pairs.toDS().repartition(1))
    val s8 = Eval.evaluate(pairs.toDS().repartition(8))
    assert(s1 == s8)
  }
}
