package graft

import graft.corpus.Corpus
import graft.extract.Extract
import scala.io.Source

/** P/R ≥ 0.95 gate against FROZEN golden triples (north rule: "matching the
  * reference's emitted (subj, pred, obj) triples, P/R ≥ 0.95").
  *
  * The fixture (src/test/resources/expected_triples_sf0001.csv) is the
  * reference-semantics extraction over the sf0.001 corpus, frozen at round 1
  * after hand-verification of the SDP golden cases (SdpSpec) and validated by
  * the independent single-node differential (ExtractPipelineSpec). Any future
  * semantic drift in annotator/SDP/scorer shows up here as a P/R drop.
  */
class GoldenFixtureSpec extends SparkSuite {

  test("emitted triples match frozen golden fixture with P/R >= 0.95") {
    val src = Source.fromResource("expected_triples_sf0001.csv")
    val expected = try src.getLines().filter(_.nonEmpty).toSet finally src.close()
    assert(expected.size > 6000, s"fixture missing/truncated: ${expected.size}")

    val got = Extract.triples(Extract.candidates(
      Extract.docsToSentences(Corpus.fromDocuments(spark, sfDir))))
      .collect()
      .map(t => s"${t.doc_id},${t.span_idx},${t.subj},${t.pred},${t.obj}")
      .toSet

    val inter = (expected & got).size
    val p = inter.toDouble / got.size
    val r = inter.toDouble / expected.size
    assert(p >= 0.95 && r >= 0.95, f"P=$p%.4f R=$r%.4f vs frozen fixture")
  }
}
