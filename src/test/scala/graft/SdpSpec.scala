package graft

import graft.annotate.Annotator
import graft.extract.Sdp
import graft.model.{Chunk, PathStep, Token}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the 3-case SDP assembly (semeval2sdp.py:105-139 semantics)
  * on hand-constructed dependency trees (FIXTURES.md §2).
  */
class SdpSpec extends AnyFunSuite {

  private def tok(text: String, pos: String, dep: String, head: Int,
                  punct: Boolean = false, num: Boolean = false): Token =
    Token(text, Annotator.smartText(text, punct, num), pos, dep, head, punct, num)

  // "cats chase mice" — cats(nsubj→1) chase(ROOT) mice(dobj→1)
  private val simple = Array(
    tok("cats", "NOUN", "nsubj", 1),
    tok("chase", "VERB", "ROOT", 1),
    tok("mice", "NOUN", "dobj", 1))

  test("rootPath walks heads inclusively") {
    assert(Sdp.rootPath(simple, 0).toSeq == Seq(0, 1))
    assert(Sdp.rootPath(simple, 1).toSeq == Seq(1))
  }

  test("case 3: common ancestor Z — X-path through Z plus reversed Y-path") {
    val p = Sdp.assemble(simple, 0, 2).get
    // X(cats) -> chase -> Y(mice); endpoints replaced by placeholders
    assert(p.toSeq == Seq(
      PathStep("<X>", "nsubj", "NOUN"),
      PathStep("chase", "ROOT", "VERB"),
      PathStep("<Y>", "dobj", "NOUN")))
  }

  // "dog of farmer barks" — dog(nsubj→3) of(prep→0) farmer(pobj→1) barks(ROOT)
  private val nested = Array(
    tok("dog", "NOUN", "nsubj", 3),
    tok("of", "ADP", "prep", 0),
    tok("farmer", "NOUN", "pobj", 1),
    tok("barks", "VERB", "ROOT", 3))

  test("case 2a: X is ancestor of Y — reversed Y-path up to X") {
    // X=dog(0), Y=farmer(2); farmer→of→dog so dog is the ancestor
    val p = Sdp.assemble(nested, 0, 2).get
    assert(p.toSeq == Seq(
      PathStep("<X>", "nsubj", "NOUN"),
      PathStep("of", "prep", "ADP"),
      PathStep("<Y>", "pobj", "NOUN")))
  }

  test("case 2b: Y is ancestor of X — X-path up to Y") {
    // X=farmer(2), Y=dog(0)
    val p = Sdp.assemble(nested, 2, 0).get
    assert(p.toSeq == Seq(
      PathStep("<X>", "pobj", "NOUN"),
      PathStep("of", "prep", "ADP"),
      PathStep("<Y>", "nsubj", "NOUN")))
  }

  test("case 1: disjoint trees (broken parse) yields None") {
    // two self-rooted tokens — no common ancestor
    val broken = Array(
      tok("a", "NOUN", "ROOT", 0),
      tok("b", "NOUN", "ROOT", 1))
    assert(Sdp.assemble(broken, 0, 1).isEmpty)
  }

  test("punct steps removed by postProcess, placeholders survive") {
    val withPunct = Array(
      PathStep("<X>", "nsubj", "NOUN"),
      PathStep("<PUNCT>", "punct", "PUNCT"),
      PathStep("<Y>", "dobj", "NOUN"))
    assert(Sdp.postProcess(withPunct).toSeq ==
      Seq(PathStep("<X>", "nsubj", "NOUN"), PathStep("<Y>", "dobj", "NOUN")))
  }

  test("length bounds filter full-path length (semeval2sdp.py:184-185)") {
    val chunks = Array(Chunk(0, 1), Chunk(2, 3))
    val sdps = Sdp.sentenceToSdps(simple, chunks, minLen = 1, maxLen = 7)
    assert(sdps.size == 1 && sdps.head._3.length == 3)
    assert(Sdp.sentenceToSdps(simple, chunks, minLen = 4, maxLen = 7).isEmpty)
    assert(Sdp.sentenceToSdps(simple, chunks, minLen = 1, maxLen = 2).isEmpty)
  }

  test("chunk head = token whose head is outside the chunk") {
    // "the big dog" as a chunk attached to a verb at index 3
    val toks = Array(
      tok("the", "DET", "det", 2),
      tok("big", "ADJ", "amod", 2),
      tok("dog", "NOUN", "nsubj", 3),
      tok("barks", "VERB", "ROOT", 3))
    assert(Sdp.chunkHead(toks, Chunk(0, 3)).contains(2))
    // chunk containing its own root has no head
    assert(Sdp.chunkHead(Array(tok("x", "NOUN", "ROOT", 0)), Chunk(0, 1)).isEmpty)
  }

  test("chunk pairs are ordered n-choose-2 in document order") {
    val toks = Array(
      tok("a", "NOUN", "nsubj", 1),
      tok("v", "VERB", "ROOT", 1),
      tok("b", "NOUN", "dobj", 1),
      tok("c", "NOUN", "conj", 1))
    val pairs = Sdp.chunkPairs(toks, Array(Chunk(0, 1), Chunk(2, 3), Chunk(3, 4)))
    assert(pairs == Seq((0, 2), (0, 3), (2, 3)))
  }

  test("annotator is deterministic and yields parseable sentences") {
    val words = Annotator.tokenize("the fast key order sort table scan merge part window")
    val (t1, c1) = Annotator.annotate(words)
    val (t2, c2) = Annotator.annotate(words)
    assert(t1.toSeq == t2.toSeq && c1.toSeq == c2.toSeq)
    // exactly one root, all heads in range
    assert(t1.count(t => t.head == t1.indexOf(t) && t.dep == "ROOT") >= 1)
    assert(t1.forall(t => t.head >= 0 && t.head < t1.length))
  }

  test("isOkSdp: OOV targets rejected, OOV-heavy paths rejected (75% rule)") {
    val vocab = Set("a", "b", "chase", "<X>", "<Y>")
    val path = Array(
      PathStep("<X>", "nsubj", "NOUN"),
      PathStep("chase", "ROOT", "VERB"),
      PathStep("<Y>", "dobj", "NOUN"))
    assert(Sdp.isOkSdp(path, xInVocab = true, yInVocab = true, vocab.contains))
    assert(!Sdp.isOkSdp(path, xInVocab = false, yInVocab = true, vocab.contains))
    // 3 of 3 steps OOV > 75%·3 = 2 (int) → reject; 2 of 3 (= boundary) passes
    val oovPath = Array(
      PathStep("zz", "nsubj", "NOUN"), PathStep("yy", "ROOT", "VERB"),
      PathStep("xx", "dobj", "NOUN"))
    assert(!Sdp.isOkSdp(oovPath, xInVocab = true, yInVocab = true, vocab.contains))
    val twoOov = Array(
      PathStep("zz", "nsubj", "NOUN"), PathStep("yy", "ROOT", "VERB"),
      PathStep("chase", "dobj", "NOUN"))
    assert(Sdp.isOkSdp(twoOov, xInVocab = true, yInVocab = true, vocab.contains))
    assert(!Sdp.isOkSdp(Array.empty, xInVocab = true, yInVocab = true, vocab.contains))
  }

  test("label space: 19 ids, inverse flips direction, collapse strips it") {
    import graft.score.Labels
    assert(Labels.all.length == 19 && Labels.all.last == "Other")
    assert(Labels.inverse("Cause-Effect(e1,e2)") == "Cause-Effect(e2,e1)")
    assert(Labels.inverse("Cause-Effect(e2,e1)") == "Cause-Effect(e1,e2)")
    assert(Labels.inverse("Other") == "Other")
    assert(Labels.all.forall(l => Labels.inverse(Labels.inverse(l)) == l))
    assert(Labels.collapse("Member-Collection(e2,e1)") == "Member-Collection")
    assert(Labels.collapse("Other") == "Other")
    assert(Labels.id("Other") == 18)
  }

  test("nominalSequence: surface run between endpoints with placeholders") {
    val toks = Array(
      tok("cats", "NOUN", "nsubj", 1),
      tok("really", "ADV", "advmod", 2),
      tok("chase", "VERB", "ROOT", 2),
      tok("mice", "NOUN", "dobj", 2))
    val seq = Sdp.nominalSequence(toks, 0, 3)
    assert(seq.map(_.word).toSeq == Seq("<X>", "really", "chase", "<Y>"))
    // reversed endpoints: placeholders follow endpoint roles, not positions
    val rev = Sdp.nominalSequence(toks, 3, 0)
    assert(rev.map(_.word).toSeq == Seq("<Y>", "really", "chase", "<X>"))
  }

  test("smartText: num wins over punct; lowercase otherwise") {
    assert(Annotator.smartText("Dog", punct = false, num = false) == "dog")
    assert(Annotator.smartText(",", punct = true, num = false) == "<PUNCT>")
    assert(Annotator.smartText("3.14", punct = false, num = true) == "<NUM>")
  }
}
