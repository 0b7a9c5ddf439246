package graft.annotate

import graft.model.{Chunk, Token}

/** Deterministic rule-based sentence annotator.
  *
  * Stands in for the reference's spaCy `nlp(line)` call (wiki2sdp.py:302,
  * semeval_data_helper.py:35,45) which produced per-token
  * (text, dep_, pos_, head, is_punct, like_num) plus noun_chunks. No model is
  * available offline, so this is a fully deterministic lexicon+heuristic
  * annotator: same input tokens ⇒ same parse, on any partitioning, any JVM
  * (only String.hashCode — spec-fixed — and closed word lists are used).
  *
  * The produced structures are real dependency trees (root verb, nsubj/dobj,
  * prep→pobj chains, det/amod attachments) so all three SDP cases of
  * semeval2sdp.py:105-136 arise naturally.
  */
object Annotator {

  // private[graft]: the allocation-lean FusedKernel reuses the SAME lexicons
  // so the two implementations cannot drift apart silently
  private[graft] val determiners = Set("the", "a", "an", "this", "that", "these", "those")
  private[graft] val adpositions = Set(
    "of", "in", "on", "at", "by", "with", "from", "to", "for",
    "over", "under", "into", "through", "between", "across")
  private[graft] val conjunctions = Set("and", "or", "but")
  private[graft] val pronouns = Set("he", "she", "it", "they", "we", "i", "you", "who", "which")
  private[graft] val auxVerbs = Set(
    "is", "are", "was", "were", "be", "been", "being",
    "has", "have", "had", "do", "does", "did", "will", "can", "must")
  private[graft] val numberWords = Set(
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "hundred", "thousand", "million", "billion")

  private val digitRe = "^[+-]?[0-9]+([.,][0-9]+)*$".r

  def isPunct(t: String): Boolean =
    t.nonEmpty && t.forall(c => !Character.isLetterOrDigit(c))

  def likeNum(t: String): Boolean =
    digitRe.matches(t) || numberWords.contains(t.toLowerCase)

  /** Reference smart_token_to_text (semeval2sdp.py:48-55): lowercase, then
    * punct→"<PUNCT>", then numlike→"<NUM>" (num test runs last and wins).
    */
  def smartText(text: String, punct: Boolean, num: Boolean): String = {
    var out = text.toLowerCase
    if (punct) out = "<PUNCT>"
    if (num) out = "<NUM>"
    out
  }

  def posOf(raw: String): String = {
    val t = raw.toLowerCase
    if (isPunct(raw)) "PUNCT"
    else if (likeNum(raw)) "NUM"
    else if (determiners.contains(t)) "DET"
    else if (adpositions.contains(t)) "ADP"
    else if (conjunctions.contains(t)) "CCONJ"
    else if (pronouns.contains(t)) "PRON"
    else if (auxVerbs.contains(t)) "VERB"
    else if (t.endsWith("ing") || t.endsWith("ed") || t.endsWith("ize") || t.endsWith("ifies")) "VERB"
    else if (t.endsWith("ous") || t.endsWith("ful") || t.endsWith("ive") || t.endsWith("able")) "ADJ"
    else {
      // deterministic content-word fallback: stable across JVMs/partitions
      math.floorMod(t.hashCode, 10) match {
        case 0 | 1 | 2 | 3 | 4 | 5 => "NOUN"
        case 6 | 7 | 8             => "VERB"
        case _                     => "ADJ"
      }
    }
  }

  private def isNominal(pos: String): Boolean = pos == "NOUN" || pos == "PRON"
  private def isChunkable(pos: String): Boolean =
    pos == "DET" || pos == "ADJ" || pos == "NUM" || isNominal(pos)

  /** Annotate a pre-tokenized sentence: POS, dependency heads, noun chunks. */
  def annotate(words: Array[String]): (Array[Token], Array[Chunk]) = {
    val n = words.length
    if (n == 0) return (Array.empty, Array.empty)
    val pos = words.map(posOf)

    // root = first main VERB, else first token
    val root = {
      val v = pos.indexOf("VERB")
      if (v >= 0) v else 0
    }

    val head = new Array[Int](n)
    val dep = new Array[String](n)

    def nextNominal(i: Int): Int = {
      var j = i + 1
      while (j < n && isChunkable(pos(j))) {
        if (isNominal(pos(j))) return j
        j += 1
      }
      -1
    }
    def prevAdpWithoutNominal(i: Int): Int = {
      var j = i - 1
      while (j >= 0) {
        if (isNominal(pos(j))) return -1
        if (pos(j) == "ADP") return j
        j -= 1
      }
      -1
    }
    def prevVerbOrNominal(i: Int): Int = {
      var j = i - 1
      while (j >= 0) {
        if (pos(j) == "VERB" || isNominal(pos(j))) return j
        j -= 1
      }
      -1
    }

    var firstNominalAfterRootSeen = false
    var i = 0
    while (i < n) {
      if (i == root) { head(i) = i; dep(i) = "ROOT" }
      else pos(i) match {
        case "DET" | "ADJ" | "NUM" =>
          val nn = nextNominal(i)
          if (nn >= 0) {
            head(i) = nn
            dep(i) = pos(i) match {
              case "DET" => "det"; case "NUM" => "nummod"; case _ => "amod"
            }
          } else { head(i) = root; dep(i) = "dep" }
        case "NOUN" | "PRON" =>
          if (i < root) { head(i) = root; dep(i) = "nsubj" }
          else {
            val adp = prevAdpWithoutNominal(i)
            if (adp >= 0) { head(i) = adp; dep(i) = "pobj" }
            else if (!firstNominalAfterRootSeen) {
              head(i) = root; dep(i) = "dobj"; firstNominalAfterRootSeen = true
            } else { head(i) = root; dep(i) = "conj" }
          }
        case "ADP" =>
          val h = prevVerbOrNominal(i)
          head(i) = if (h >= 0) h else root
          dep(i) = "prep"
        case "VERB" =>
          head(i) = root; dep(i) = "conj"
        case "CCONJ" =>
          head(i) = root; dep(i) = "cc"
        case _ => // PUNCT and anything else
          head(i) = root; dep(i) = "punct"
      }
      i += 1
    }

    val tokens = Array.tabulate(n) { k =>
      val p = isPunct(words(k)); val num = likeNum(words(k))
      Token(words(k), smartText(words(k), p, num), pos(k), dep(k), head(k), p, num)
    }

    // noun chunks: maximal runs of chunkable POS, trimmed to the last nominal;
    // mirror of spaCy noun_chunks as consumed by semeval2sdp.py:33-46
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var s = 0
    while (s < n) {
      if (isChunkable(pos(s))) {
        var e = s
        while (e < n && isChunkable(pos(e))) e += 1
        var last = e - 1
        while (last >= s && !isNominal(pos(last))) last -= 1
        if (last >= s) chunks += Chunk(s, last + 1)
        s = e
      } else s += 1
    }
    (tokens, chunks.toArray)
  }

  /** Simple whitespace pre-tokenizer (corpus text is pre-tokenized, like the
    * reference's wiki `en.tok.txt` — wiki2sdp.py:298-302).
    */
  def tokenize(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)
}
