package graft

import graft.annotate.Annotator
import graft.extract.Sdp
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties promised in SURVEY.md §5: structural invariants of
  * the annotator and SDP assembly over arbitrary token streams.
  */
object SdpProperties extends Properties("Sdp") {

  private val word: Gen[String] = Gen.oneOf(
    "the", "a", "fast", "small", "dog", "farmer", "table", "scan", "join",
    "chases", "runs", "of", "with", "and", ",", ".", "42", "3.14", "query",
    "data", "row", "merge", "filter", "spark")

  private val sentence: Gen[Array[String]] =
    Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, word).map(_.toArray))

  property("annotate: exactly one ROOT, all heads in range, deterministic") =
    forAll(sentence) { words =>
      val (t1, c1) = Annotator.annotate(words)
      val (t2, c2) = Annotator.annotate(words)
      val sameRun = t1.toSeq == t2.toSeq && c1.toSeq == c2.toSeq
      val rootCount = t1.indices.count(i => t1(i).head == i)
      val headsOk = t1.forall(t => t.head >= 0 && t.head < t1.length)
      val chunksOk = c1.forall(c => c.start >= 0 && c.end <= t1.length && c.start < c.end)
      sameRun && rootCount == 1 && headsOk && chunksOk
    }

  property("rootPath terminates at the root, inclusive, acyclic") =
    forAll(sentence) { words =>
      val (toks, _) = Annotator.annotate(words)
      toks.indices.forall { i =>
        val p = Sdp.rootPath(toks, i)
        p.head == i && p.distinct.length == p.length &&
          toks(p.last).head == p.last
      }
    }

  property("every SDP starts with <X> and ends with <Y>, length within bounds") =
    forAll(sentence) { words =>
      val (toks, chunks) = Annotator.annotate(words)
      Sdp.sentenceToSdps(toks, chunks, minLen = 1, maxLen = 7).forall {
        case (_, _, path) =>
          path.head.word == "<X>" && path.last.word == "<Y>" &&
            path.length >= 1 && path.length <= 7
      }
    }

  property("postProcess removes punct steps but never the placeholders") =
    forAll(sentence) { words =>
      val (toks, chunks) = Annotator.annotate(words)
      Sdp.sentenceToSdps(toks, chunks).forall { case (_, _, path) =>
        val clean = Sdp.postProcess(path)
        clean.forall(_.word != "<PUNCT>") &&
          (clean.isEmpty || (clean.head.word == "<X>" && clean.last.word == "<Y>"))
      }
    }

  property("chunk pairs are ordered i<j in document order") =
    forAll(sentence) { words =>
      val (toks, chunks) = Annotator.annotate(words)
      Sdp.chunkPairs(toks, chunks).forall { case (x, y) => x < y }
    }

  property("path reversal is an involution") =
    forAll(sentence) { words =>
      val (toks, chunks) = Annotator.annotate(words)
      Sdp.sentenceToSdps(toks, chunks).forall { case (_, _, path) =>
        path.reverse.reverse.toSeq == path.toSeq
      }
    }

  property("whitelist filtering is a subset of the length-filtered domain") =
    forAll(sentence) { words =>
      val (toks, chunks) = Annotator.annotate(words)
      val all = Sdp.sentenceToSdps(toks, chunks).map(_._3)
      val sigs = all.map(Sdp.depSignature).toSet
      // any whitelist drawn from observed signatures selects a subset
      val wl = sigs.take(sigs.size / 2 + 1)
      val kept = all.filter(p => wl.contains(Sdp.depSignature(p)))
      kept.size <= all.size && kept.forall(p => wl.contains(Sdp.depSignature(p)))
    }

  // arbitrary strings (not just the curated lexicon): signs, separators,
  // unicode letters, empties — the kernel's regex-free ports must agree
  // with the Annotator on all of them
  private val anyToken: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr, Gen.asciiPrintableStr.map(_.take(8)),
    Gen.oneOf("", "+", "-", "+1", "-3.14", "1,000", "1..2", "12.", ".5",
      "³", "①", "naïve", "ING", "ed", "+-", "9", "the", "müller"))

  property("FusedKernel.posId equals Annotator.posOf for arbitrary tokens") =
    forAll(anyToken) { raw =>
      import graft.extract.FusedKernel
      FusedKernel.posName(FusedKernel.posId(raw, raw.toLowerCase)) == Annotator.posOf(raw)
    }

  property("smartText: placeholder substitution is idempotent on specials") =
    forAll(word) { w =>
      val p = Annotator.isPunct(w); val n = Annotator.likeNum(w)
      val once = Annotator.smartText(w, p, n)
      val twice = Annotator.smartText(once,
        Annotator.isPunct(once), Annotator.likeNum(once))
      // specials are stable; plain words stay lowercase
      if (p || n) Prop(once == "<NUM>" || once == "<PUNCT>")
      else Prop(twice == once && once == w.toLowerCase)
    }

  property("nominalSequence endpoints carry role placeholders either direction") =
    forAll(sentence.suchThat(_.length >= 2)) { words =>
      val (toks, _) = Annotator.annotate(words)
      val x = 0; val y = toks.length - 1
      val fwd = Sdp.nominalSequence(toks, x, y)
      val rev = Sdp.nominalSequence(toks, y, x)
      fwd.head.word == "<X>" && fwd.last.word == "<Y>" &&
        rev.head.word == "<Y>" && rev.last.word == "<X>"
    }
}
