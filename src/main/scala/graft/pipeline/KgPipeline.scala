package graft.pipeline

import graft.canon.ConnectedComponents
import graft.ckpt.StageLog
import graft.corpus.Corpus
import graft.extract.Extract
import graft.link.Linking
import graft.model.AliasEntry
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The full KG-construction run, wired through the stage commit log:
  *
  *   docs → sentences/candidates (narrow) → triples (whitelist+score)
  *        → alias dictionary → entity linking (broadcast join, OOV default)
  *        → canonicalization (CC over alias-variant edges)
  *        → canonical triple + entity tables (partitioned by predicate)
  *
  * Every stage materializes via TableIO (atomic snapshot + per-partition
  * lineage), so a killed run resumes after its last committed stage with
  * byte-identical results (ResumeSpec).
  */
object KgPipeline {

  val stages: Seq[String] = Seq(
    "candidates", "triples", "alias_dict", "linked_triples", "entity_canon", "canonical_triples")

  /** Plural/variant stem for canonicalization edges: aliases whose stem
    * matches collapse into one entity (e.g. "tables" ↔ "table"). A stand-in
    * for the reference's trained-similarity canonicalization, fully
    * deterministic.
    */
  def stem(c: org.apache.spark.sql.Column) =
    when(length(c) > 3 && c.endsWith("s"), c.substr(lit(1), length(c) - 1)).otherwise(c)

  def run(spark: SparkSession, sfDir: String, runDir: String,
          whitelistMinCount: Long = 3): DataFrame = {
    import spark.implicits._
    val log = new StageLog(spark, runDir)

    val candidates = log.runStage("candidates") {
      Extract.candidates(Extract.docsToSentences(Corpus.fromDocuments(spark, sfDir))).toDF()
    }

    val triples = log.runStage("triples") {
      import graft.model.SdpCandidate
      val cands = candidates.as[SdpCandidate]
      // whitelist + vocab gates stay DataFrames end-to-end: no corpus-derived
      // dictionary is ever collected to the driver (its size grows with the
      // corpus — the classic driver-heap bottleneck at 100×). AQE turns these
      // semi-joins into broadcast joins while the dictionaries are small.
      val wl = Extract.signatureWhitelist(cands, whitelistMinCount).select("sig")
      // is_ok_sdp rule 1 (semeval2sdp.py:245-262): drop candidates whose
      // target surfaces are out-of-vocabulary (< 2 occurrences corpus-wide)
      val vocab = candidates.select(col("x").as("surface"))
        .union(candidates.select(col("y").as("surface")))
        .groupBy("surface").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .select("surface")
      val gated = Extract.filterByWhitelistDF(cands, wl)
        .join(vocab.withColumnRenamed("surface", "__xs"),
          col("x") === col("__xs"), "left_semi")
        .join(vocab.withColumnRenamed("surface", "__ys"),
          col("y") === col("__ys"), "left_semi")
        .as[SdpCandidate]
      Extract.triples(gated).toDF()
    }

    val aliasDict = log.runStage("alias_dict") {
      Linking.buildAliasDictFromSurfaces(
        triples.select(col("subj")).union(triples.select(col("obj")))).toDF()
    }

    val linked = log.runStage("linked_triples") {
      val dict = broadcast(aliasDict.select(col("alias"), col("entity_id")))
      triples
        .join(dict.withColumnRenamed("alias", "s_alias")
          .withColumnRenamed("entity_id", "subj_id"), col("subj") === col("s_alias"), "left")
        .join(dict.withColumnRenamed("alias", "o_alias")
          .withColumnRenamed("entity_id", "obj_id"), col("obj") === col("o_alias"), "left")
        .select(col("doc_id"), col("span_idx"), col("pred"), col("score"),
          col("subj"), coalesce(col("subj_id"), lit(Linking.OovEntityId)).as("subj_id"),
          col("obj"), coalesce(col("obj_id"), lit(Linking.OovEntityId)).as("obj_id"))
    }

    val canon = log.runStage("entity_canon") {
      // edges: entity ↔ entity of its stemmed alias (when both exist), plus
      // self-loops so every entity appears in the CC vertex set
      val d = aliasDict.select(col("alias"), col("entity_id"))
      val stemmed = d.select(col("entity_id").as("src_id"), stem(col("alias")).as("stem"))
      val byStem = d.select(col("alias").as("stem_alias"), col("entity_id").as("dst_id"))
      val variantEdges = stemmed
        .join(byStem, col("stem") === col("stem_alias"))
        .select(col("src_id").as("src"), col("dst_id").as("dst"))
      val selfEdges = d.select(col("entity_id").as("src"), col("entity_id").as("dst"))
      // CC rounds checkpoint durably inside the run dir: a mid-CC kill
      // resumes from the last committed labels instead of restarting
      ConnectedComponents.run(variantEdges.union(selfEdges),
        ckptDir = Some(s"$runDir/cc"))
        .select(col("id").as("entity_id"), col("component").as("canonical_id"))
    }

    log.runStage("canonical_triples", partitionBy = Seq("pred")) {
      val c = broadcast(canon)
      linked
        .join(c.withColumnRenamed("entity_id", "s_ent")
          .withColumnRenamed("canonical_id", "subj_canon"),
          col("subj_id") === col("s_ent"), "left")
        .join(c.withColumnRenamed("entity_id", "o_ent")
          .withColumnRenamed("canonical_id", "obj_canon"),
          col("obj_id") === col("o_ent"), "left")
        .select(
          coalesce(col("subj_canon"), col("subj_id")).as("subj_id"),
          col("pred"),
          coalesce(col("obj_canon"), col("obj_id")).as("obj_id"),
          col("subj"), col("obj"), col("doc_id"), col("span_idx"), col("score"))
    }
  }

  /** Entity table for the emitted graph: canonical id per alias. */
  def entityTable(spark: SparkSession, runDir: String): DataFrame = {
    val log = new StageLog(spark, runDir)
    val dict = log.runStage("alias_dict")(sys.error("alias_dict must be committed"))
    val canon = log.runStage("entity_canon")(sys.error("entity_canon must be committed"))
    dict.join(canon, Seq("entity_id"), "left")
      .select(col("alias"), col("entity_id"),
        coalesce(col("canonical_id"), col("entity_id")).as("canonical_id"),
        col("freq"))
  }
}
