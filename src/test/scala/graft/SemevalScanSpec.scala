package graft

import graft.corpus.Semeval

/** S2 (stride-4 record scan) + P1 (convert_raw_x) golden gates: exact
  * record assembly, tag rewrite including both no-whitespace corner cases,
  * entity index recovery, and the reference's skip-on-missing-tag behavior
  * (semeval_data_helper.py:8-48, 253-270).
  */
class SemevalScanSpec extends SparkSuite {

  test("convert_raw_x: wrapper strip, tag rewrite, index recovery") {
    // proper whitespace on every tag
    assert(Semeval.convertRawX("""8001	"The <e1>company</e1> fabricates plastic <e2>chairs</e2> ."""")
      == Some(("The company fabricates plastic chairs .", 1, 4)))
    // corner case: no space AFTER </e1> (tag glued to the next word)
    assert(Semeval.convertRawX("""8002	"A <e1>virus</e1>was moved into the <e2>cell</e2> nucleus ."""")
      == Some(("A virus was moved into the cell nucleus .", 1, 6)))
    // corner case: tag at line start (no space before <e1>)
    assert(Semeval.convertRawX("""8003	"<e1>Rain</e1> caused the <e2>flood</e2> damage ."""")
      == Some(("Rain caused the flood damage .", 0, 3)))
    // e2 before e1 in surface order still recovers both indices
    assert(Semeval.convertRawX("""8004	"The <e2>noise</e2> from the <e1>drill</e1> hurt ."""")
      == Some(("The noise from the drill hurt .", 4, 1)))
    // missing tags → reference skips the record
    assert(Semeval.convertRawX("""8005	"No tagged entities here ."""").isEmpty)
    // no quoted payload at all
    assert(Semeval.convertRawX("8006\tmalformed line").isEmpty)
  }

  test("stride-4 records + converted: assembly, skip semantics, determinism") {
    val tmp = java.nio.file.Files.createTempDirectory("semeval-spec")
    val f = tmp.resolve("train.txt")
    java.nio.file.Files.write(f,
      Semeval.fixtureLines(8).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val recs = Semeval.records(spark, f.toString)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(recs.length == 8)
    assert(recs.head._1 == 0L)
    assert(recs.head._2 == "8001\t\"The <e1>company0</e1> fabricates plastic <e2>chairs0</e2> .\"")
    assert(recs.head._3 == "Product-Producer(e2,e1)")
    assert(recs.head._4 == "Comment: fixture 0")

    val conv = Semeval.converted(spark, f.toString)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3),
        r.getInt(4), r.getInt(5), r.getString(6), r.getString(7)))
      .sortBy(_._1)
    // records 3 and 7 are the tagless fixtures → skipped
    assert(conv.map(_._1).toSeq == Seq(0L, 1L, 2L, 4L, 5L, 6L))
    val r0 = conv.head
    assert(r0._3 == "The company0 fabricates plastic chairs0 .")
    assert((r0._4, r0._5, r0._6, r0._7) == ((1, 4, "company0", "chairs0")))
    // the glued-tag corner case recovered the right surfaces
    val r1 = conv(1)
    assert((r1._6, r1._7) == (("virus1", "cell1")))
    // deterministic re-read
    val again = Semeval.converted(spark, f.toString)
      .collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    assert(again.toSeq == conv.map(c => (c._1, c._3)).toSeq)
  }
}
