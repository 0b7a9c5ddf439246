package graft.ckpt

import graft.tableio.TableIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage checkpoint/commit log with per-partition lineage + counter
  * metrics (north rule: "resumable from checkpoint with per-partition
  * lineage + metrics"; reference analogs: interval model checkpointing
  * relembed.py:745-757 and the GOOD/BAD `_records` audit counters
  * wiki_and_semeval2sdp.py:391-449,470-472).
  *
  * A stage = a named DataFrame computation materialized as a TableIO
  * snapshot under `<runDir>/<stage>`. `runStage` skips recomputation when the
  * stage already has a committed snapshot — so a killed job rerun resumes
  * after the last committed stage, idempotently (TableIO commits are atomic).
  * Each committed stage also writes `<runDir>/<stage>__lineage` rows
  * (stage, part_id, rows) — the per-partition audit trail — and appends a
  * metrics row (stage, rows, committed_version) to the run's metrics table.
  */
class StageLog(spark: SparkSession, runDir: String) {

  def stagePath(stage: String) = s"$runDir/$stage"

  def isCommitted(stage: String): Boolean =
    TableIO.currentVersion(stagePath(stage)).isDefined

  /** Run (or resume) a stage. Returns the stage output read back from its
    * committed snapshot, so downstream stages always consume the durable
    * artifact — lineage is truncated at every stage boundary, the iterative-
    * job killer at scale.
    */
  def runStage(stage: String, partitionBy: Seq[String] = Nil)(compute: => DataFrame): DataFrame = {
    val path = stagePath(stage)
    if (!isCommitted(stage)) {
      val out = compute
      val snap = TableIO.commit(out, path, partitionBy)
      val lineage = TableIO.read(spark, path)
        .groupBy(spark_partition_id().as("part_id"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("stage", lit(stage))
        .select("stage", "part_id", "rows")
      TableIO.commit(lineage, s"${path}__lineage")
      val metric = spark.createDataFrame(Seq((stage, snap.rows, snap.version)))
        .toDF("stage", "rows", "version")
      TableIO.commit(metric, s"$runDir/__metrics/$stage")
    }
    TableIO.read(spark, path)
  }

  /** All per-partition lineage rows of the run. */
  def lineage(stages: Seq[String]): DataFrame =
    stages.map(s => TableIO.read(spark, s"${stagePath(s)}__lineage"))
      .reduce(_ unionByName _)

  /** Stage-level metrics (rows per committed stage). */
  def metrics(stages: Seq[String]): DataFrame =
    stages.map(s => TableIO.read(spark, s"$runDir/__metrics/$s"))
      .reduce(_ unionByName _)
}
