package graft

import graft.annotate.Annotator
import graft.corpus.Corpus
import graft.extract.{Extract, Sdp}
import graft.score.SignatureScorer

/** End-to-end extraction over the sf0.001 corpus:
  *  - span-sequence invariant (input_hint): explode→process must not disturb
  *    the per-doc (kind, text, media_ref, order) sequence;
  *  - differential P/R gate: the distributed pipeline must reproduce the
  *    single-node reference-semantics extraction exactly (P/R ≥ 0.95 required;
  *    we assert equality), independent of partitioning.
  */
class ExtractPipelineSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Corpus.fromDocuments(spark, sfDir)

  test("corpus has interleaved text+media spans with strictly increasing offsets") {
    val ds = docs.collect()
    assert(ds.nonEmpty)
    assert(ds.exists(_.spans.exists(_.kind != "text")))
    ds.foreach { d =>
      assert(d.spans.map(_.offset).toSeq == d.spans.indices.toSeq)
      d.spans.foreach { s =>
        if (s.kind == "text") assert(s.media_ref.isEmpty)
        else assert(s.text.isEmpty && s.media_ref.startsWith("m://"))
      }
    }
  }

  test("span-sequence invariant survives explode → reassemble") {
    val exploded = docs.flatMap(d =>
      d.spans.zipWithIndex.map { case (s, i) => (d.doc_id, i, s.kind, s.text, s.media_ref) })
    val reassembled = exploded
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val spans = it.toArray.sortBy(_._2).map(r => (r._3, r._4, r._5))
        (id, spans)
      }
      .collect()
      .toMap
    docs.collect().foreach { d =>
      val expect = d.spans.map(s => (s.kind, s.text, s.media_ref)).toSeq
      assert(reassembled(d.doc_id).toSeq == expect, s"span sequence broken for ${d.doc_id}")
    }
  }

  test("distributed pipeline == single-node reference semantics (P/R gate)") {
    // single-node: the same pure row logic applied sequentially
    val expected = docs.collect().flatMap { d =>
      d.spans.zipWithIndex.collect { case (s, idx) if s.kind == "text" && s.text.nonEmpty =>
        val (toks, chunks) = Annotator.annotate(Annotator.tokenize(s.text))
        Sdp.sentenceToSdps(toks, chunks).map { case (x, y, p) =>
          val path = Sdp.postProcess(p)
          (d.doc_id, idx, toks(x).text.toLowerCase, toks(y).text.toLowerCase,
            path.map(st => (st.word, st.dep, st.pos)).toSeq)
        }.filter(_._5.nonEmpty)
      }.flatten
    }.toSet

    val got = Extract.candidates(Extract.docsToSentences(docs).repartition(7))
      .collect()
      .map(c => (c.doc_id, c.span_idx, c.x, c.y,
        c.path.map(st => (st.word, st.dep, st.pos)).toSeq))
      .toSet

    assert(expected.nonEmpty, "no candidates extracted at all")
    val inter = (expected & got).size
    val p = inter.toDouble / got.size
    val r = inter.toDouble / expected.size
    assert(p >= 0.95 && r >= 0.95, s"P=$p R=$r")
    assert(got == expected, "expected exact distributed/single-node agreement")
  }

  test("fused single-stage path == composed pipeline (with and without whitelist)") {
    import org.apache.spark.sql.functions.col
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
    val composed = Extract.triples(Extract.candidates(Extract.docsToSentences(docs)))
      .collect().toSet
    val fused = Extract.triplesFused(raw).collect().toSet
    assert(fused == composed)

    val cands = Extract.candidates(Extract.docsToSentences(docs))
    val wl = Extract.signatureWhitelist(cands, 3)
      .select("sig").as[String].collect().toSet
    val composedWl = Extract.triples(Extract.filterByWhitelist(cands, wl)).collect().toSet
    val fusedWl = Extract.triplesFused(raw, wl).collect().toSet
    assert(fusedWl == composedWl)
  }

  test("in-memory pipeline: salted degradation path is row-equal to broadcast") {
    // the 100 TB story: when the dictionary outgrows a driver-safe
    // broadcast, the gate+link+canonicalize joins degrade to
    // Linking.saltedLeftJoin — the two configurations must emit identical
    // canonical triples (the broadcast form is the benchmarked default)
    import org.apache.spark.sql.functions.col
    import graft.pipeline.KgPipeline
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
    val viaBroadcast =
      KgPipeline.canonicalTriplesInMemory(raw).collect().toSet
    val viaSalted =
      KgPipeline.canonicalTriplesInMemory(raw, broadcastDict = false).collect().toSet
    assert(viaSalted == viaBroadcast)
    assert(viaBroadcast.nonEmpty)
  }

  test("whitelist gate + scorer emit deterministic triples") {
    val cands = Extract.candidates(Extract.docsToSentences(docs)).cache()
    val wl = Extract.signatureWhitelist(cands, minCount = 3)
      .as[(String, Long)].collect().map(_._1).toSet
    assert(wl.nonEmpty)
    val kept = Extract.filterByWhitelist(cands, wl)
    val t1 = Extract.triples(kept).collect().toSet
    val t2 = Extract.triples(kept.repartition(5)).collect().toSet
    assert(t1 == t2, "triples must be partitioning-invariant")
    assert(t1.nonEmpty)
    assert(t1.forall(t => t.pred.nonEmpty && t.score >= 0.5 && t.score <= 1.0))
    // whitelisted structures only — signature of every emitted triple's source
    // candidate was frequent enough
    val sigCounts = cands
      .map(c => SignatureScorer.signatureKey(c.path)).groupByKey(identity)
      .count().collect().toMap
    kept.collect().foreach(c =>
      assert(sigCounts(SignatureScorer.signatureKey(c.path)) >= 3))
    cands.unpersist()
  }
}
