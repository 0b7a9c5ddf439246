package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 + P1 as FIRST-CLASS operators: the reference's SemEval file format is
  * a 4-line STRIDE (semeval_data_helper.py:253-259 — `text[4*cursor]` the
  * quoted sentence line, `+1` the relation label, `+2` the comment, `+3`
  * blank), and its `convert_raw_x` (semeval_data_helper.py:8-48) strips the
  * `id<TAB>"..."` wrapper, rewrites `<e1>/<e2>` tags into `e1>`-prefixed
  * tokens (with the corner case where the tag touches its word without
  * whitespace), and recovers the two entity token INDICES after
  * re-tokenization.
  *
  * Scale shape: line numbers come from RDD `zipWithIndex` (deterministic,
  * one extra count-per-partition pass — the standard distributed
  * line-number assignment; `monotonically_increasing_id` is NOT contiguous
  * across partitions and would mis-stride records), then one shuffle keyed
  * by `line/4` with a PIVOT on `line%4` assembles records. Record assembly
  * is thus a single hash aggregation — no window over a global sort, no
  * single-partition stage, and the pivot values are the statically-known
  * offsets 0-2.
  */
object Semeval {

  /** Stride-4 record assembly (S2): one row per record with the raw text
    * line, the label line, and the comment line.
    */
  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.textFile(path)
      .zipWithIndex()
      .toDF("line", "idx")
      .groupBy((col("idx") / 4).cast("long").as("record_id"))
      .pivot(pmod(col("idx"), lit(4)), Seq(0, 1, 2))
      .agg(first(col("line")))
      .select(col("record_id"), col("0").as("raw"),
        col("1").as("label"), col("2").as("comment"))
  }

  /** P1 `convert_raw_x`, pure: returns (space-joined clean tokens, e1 token
    * index, e2 token index), or None when either tag is missing (the
    * reference prints "Skipping this one..." and drops the record —
    * semeval_data_helper.py:268-270). Tokenization is the engine's
    * whitespace tokenizer (the deterministic stand-in for the reference's
    * spaCy call, SURVEY §7.0).
    */
  def convertRawX(line: String): Option[(String, Int, Int)] = {
    val s0 = line.trim
    val q1 = s0.indexOf('"'); val q2 = s0.lastIndexOf('"')
    if (q1 < 0 || q2 <= q1) return None
    var s = s0.substring(q1 + 1, q2)
    // properly-whitespaced tags first (keeps spacing exact), then the
    // no-whitespace corner cases pad with a space — same two-phase order as
    // the reference, which matters: running the corner-case replace first
    // would double-space the common case
    s = s.replace(" <e1>", " e1>").replace("</e1> ", " ")
    s = s.replace(" <e2>", " e2>").replace("</e2> ", " ")
    s = s.replace("<e1>", " e1>").replace("</e1>", " ")
    s = s.replace("<e2>", " e2>").replace("</e2>", " ")
    val toks = s.split("\\s+").filter(_.nonEmpty)
    var e1 = -1; var e2 = -1
    var i = 0
    while (i < toks.length) {
      if (toks(i).startsWith("e1>")) { toks(i) = toks(i).substring(3); e1 = i }
      else if (toks(i).startsWith("e2>")) { toks(i) = toks(i).substring(3); e2 = i }
      i += 1
    }
    if (e1 < 0 || e2 < 0) None else Some((toks.mkString(" "), e1, e2))
  }

  /** records ∘ convert_raw_x as one DataFrame pass: record_id, label,
    * comment, clean sentence, recovered e1/e2 token indices and surfaces.
    * Tag-less records are dropped with the reference's skip semantics (F9).
    */
  def converted(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    records(spark, path)
      .as[(Long, String, String, String)]
      .flatMap { case (id, raw, label, comment) =>
        convertRawX(raw).map { case (sent, e1, e2) =>
          val toks = sent.split(" ")
          (id, label, comment, sent, e1, e2, toks(e1), toks(e2))
        }
      }
      .toDF("record_id", "label", "comment", "sent", "e1_idx", "e2_idx",
        "e1", "e2")
  }

  /** Deterministic SemEval-format fixture content (no external data): the
    * driver's corpus tables carry no 4-line-stride files, so the registry
    * query synthesizes the reference's own file shape — including a
    * no-whitespace tag corner case and a skip-worthy tagless record.
    */
  def fixtureLines(records: Int): Seq[String] =
    (0 until records).flatMap { i =>
      val (text, label) = (i % 4) match {
        case 0 => (s"""The <e1>company$i</e1> fabricates plastic <e2>chairs$i</e2> .""",
          "Product-Producer(e2,e1)")
        case 1 => (s"""A <e1>virus$i</e1>was moved into the <e2>cell$i</e2> nucleus .""",
          "Entity-Destination(e1,e2)") // missing space after </e1> → corner case
        case 2 => (s"""<e1>Rain$i</e1> caused the <e2>flood$i</e2> damage .""",
          "Cause-Effect(e1,e2)") // tag at line start → corner case
        case _ => (s"""No tagged entities in record $i .""", "Other") // skipped
      }
      Seq(s"""${8001 + i}\t"$text"""", label, s"Comment: fixture $i", "")
    }

  /** The registry fixture's fixed path — shared by the q53 query AND its
    * DuckDB oracle SQL, so both engines read the same bytes.
    */
  val fixturePath: java.nio.file.Path = java.nio.file.Paths.get(
    System.getProperty("java.io.tmpdir"), "graft-semeval-fixture", "train.txt")

  /** Materializes the 64-record fixture at `fixturePath` ATOMICALLY: skip
    * when the expected content is already in place, otherwise write to a
    * temp file and ATOMIC_MOVE it over — two concurrent graft processes
    * (bench + verify) must never read a half-written fixture (ADVICE
    * round 4: the previous in-place Files.write raced).
    */
  def ensureFixture(): String = {
    import java.nio.file.{Files, StandardCopyOption}
    val bytes = fixtureLines(64).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // compare CONTENT, not just length: a stale /tmp fixture from an older
    // build with a coincidentally equal byte count must not be reused (the
    // file is ~20 KB, so a full read is free)
    val upToDate = Files.exists(fixturePath) &&
      Files.size(fixturePath) == bytes.length &&
      java.util.Arrays.equals(Files.readAllBytes(fixturePath), bytes)
    if (!upToDate) {
      Files.createDirectories(fixturePath.getParent)
      val tmp = Files.createTempFile(fixturePath.getParent, "train", ".tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, fixturePath,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    fixturePath.toString
  }
}
