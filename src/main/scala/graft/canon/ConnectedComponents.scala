package graft.canon

import graft.tableio.TableIO
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative connected-components canonicalizer (north rule:
  * "connected-components-style iterative DataFrame self-join with checkpointed
  * convergence"). No GraphX dependency — pure DataFrame hash-min propagation:
  *
  *   label(v) ← min(label(v), min over neighbors u of label(u))
  *
  * repeated until a fixpoint. Converges in O(graph diameter) rounds; entity-
  * synonym / near-dup graphs are unions of small-diameter clusters, so rounds
  * stay low even at 10^12 nodes.
  *
  * Round cost (round-2 rework): ONE action per round — the count of changed
  * labels is observed (`Dataset.observe`) on the very plan that materializes
  * the round, so convergence detection no longer re-executes the round the
  * way the old Σ-label probe did. Each round is one shuffle-join (edges ⋈
  * labels) plus one aggregation plus a labels-side merge join, all keyed by
  * the vertex id.
  *
  * Checkpointing: with `ckptDir` set, every `checkpointEvery`-th round
  * commits the labels through TableIO — a DURABLE parquet snapshot that both
  * truncates lineage and survives executor/driver loss; a rerun with the same
  * `ckptDir` resumes from the last committed labels (hash-min is monotone and
  * idempotent, so resuming from any intermediate labeling is exact). Without
  * `ckptDir` (unit-test / demo mode) lineage is truncated in-memory via
  * `localCheckpoint`, which is NOT fault-tolerant — production callers (the
  * KG pipeline) always pass a directory.
  */
object ConnectedComponents {

  /** @param edges DataFrame with two long columns `src`, `dst` (undirected).
    * @param ckptDir durable checkpoint/resume directory (TableIO table root).
    * @return DataFrame (id: long, component: long) — component = min reachable id.
    */
  def run(edges: DataFrame, maxIter: Int = 50, checkpointEvery: Int = 5,
          ckptDir: Option[String] = None): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val table = ckptDir.map(d => s"$d/cc_labels")
    var labels = table.filter(t => TableIO.currentVersion(t).isDefined) match {
      case Some(t) =>
        // resume from the last committed round's labels
        TableIO.read(edges.sparkSession, t)
      case None =>
        sym.select(col("src").as("id")).distinct()
          .withColumn("component", col("id"))
          .persist(StorageLevel.MEMORY_AND_DISK)
    }

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // push each vertex's current label to its neighbors, keep the min
      val pushed = sym
        .join(labels, sym("src") === labels("id"))
        .groupBy(sym("dst").as("id"))
        .agg(min("component").as("cand"))
      val obs = Observation(s"cc-round-$iter-${System.identityHashCode(sym)}")
      val next = labels
        .join(pushed, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("cand"), col("component"))).as("component"),
          (coalesce(col("cand"), col("component")) < col("component"))
            .cast("long").as("__chg"))
        .observe(obs, sum("__chg").as("changed"))
        .select("id", "component")

      val durable = table.isDefined && (iter + 1) % checkpointEvery == 0
      val materialized =
        if (durable) {
          // the TableIO write is the round's single action; re-reading the
          // snapshot gives a lineage-free, fault-tolerant labels frame
          TableIO.commit(next, table.get)
          TableIO.read(edges.sparkSession, table.get)
        } else if ((iter + 1) % checkpointEvery == 0) {
          next.localCheckpoint(eager = true)
        } else {
          val p = next.persist(StorageLevel.MEMORY_AND_DISK)
          p.count() // the round's single action (metrics observed on it)
          p
        }
      labels.unpersist(blocking = false)
      labels = materialized
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
