package graft.canon

import org.apache.spark.sql.DataFrame
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
  * stay low even at 10^12 nodes. Each round is one shuffle-join plus one
  * hash aggregation, both on the vertex id — AQE coalesces/splits partitions
  * between rounds. `localCheckpoint` every `checkpointEvery` rounds truncates
  * the lineage chain that would otherwise grow linearly and blow up the
  * driver at scale (SURVEY.md §4.2 risk 4).
  */
object ConnectedComponents {

  /** @param edges DataFrame with two long columns `src`, `dst` (undirected).
    * @return DataFrame (id: long, component: long) — component = min reachable id.
    */
  def run(edges: DataFrame, maxIter: Int = 50, checkpointEvery: Int = 5): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // convergence detection: min-propagation only ever decreases labels, so
    // Σ component is strictly decreasing until the fixpoint — one cheap scalar
    // aggregation per round instead of a join against the previous labels
    // decimal sum: a long sum overflows at 10^12 vertices × 10^12 ids
    def sumOf(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).first().getDecimal(0)
    var labelSum = sumOf(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // push each vertex's current label to its neighbors, keep the min
      val pushed = sym
        .join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.select("id", "component").union(pushed)
        .groupBy("id").agg(min("component").as("component"))

      val materialized =
        if ((iter + 1) % checkpointEvery == 0) next.localCheckpoint(eager = true)
        else next.persist(StorageLevel.MEMORY_AND_DISK)

      val nextSum = sumOf(materialized)
      labels.unpersist(blocking = false)
      labels = materialized
      converged = nextSum.compareTo(labelSum) == 0
      labelSum = nextSum
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
