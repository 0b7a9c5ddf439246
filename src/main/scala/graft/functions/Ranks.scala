package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ordering primitives.
  *
  * `Window.orderBy(...)` with no partition moves EVERY row through ONE task —
  * fine on a 60k-row test table, a guaranteed straggler on the vocabulary of
  * a 100 TB corpus (distinct-token count grows with corpus size, Heaps' law).
  * These helpers compute the same values with a range repartition:
  *
  *   1. range-partition the rows on the sort key (parallel sample + shuffle);
  *   2. rank / running-sum WITHIN each partition in parallel;
  *   3. add per-partition offsets derived from per-partition totals — a
  *      dataset bounded by the PARTITION COUNT (a config), not the data.
  *
  * The two references to the ranged child are one physical subtree, so
  * Spark's exchange reuse (spark.sql.exchange.reuse, on by default) runs the
  * range shuffle once. Results are deterministic iff `order` is a total order
  * (callers must include a unique tie-break column — the same requirement
  * oracle hash parity already imposes).
  */
object Ranks {

  /** Inclusive global running sum of `value` in `order`, as column `out`
    * (long). Equivalent to `sum(value).over(Window.orderBy(order))` without
    * the single-partition funnel.
    */
  def globalCumSum(df: DataFrame, order: Seq[Column], value: Column, out: String,
                   parts: Int = 0): DataFrame = {
    val n =
      if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, order: _*).withColumn("__pid", spark_partition_id())
    // per-partition totals → exclusive prefix offsets via a triangular
    // self-join over ≤ n×n partition-count rows (bounded by config, never by
    // data volume; and no unpartitioned window, so the plan carries zero
    // single-partition WindowExec stages)
    val cnts = ranged.groupBy("__pid").agg(sum(value).as("__tot"))
    val offs = cnts.alias("a")
      .join(cnts.alias("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
    ranged.join(broadcast(offs), Seq("__pid"))
      .withColumn(out,
        sum(value).over(Window.partitionBy("__pid").orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) + col("__off"))
      .drop("__pid", "__off")
  }

  /** Global 1-based row number in `order`, as column `out` (long). Equivalent
    * to `row_number().over(Window.orderBy(order))` without the funnel.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String,
                      parts: Int = 0): DataFrame =
    globalCumSum(df, order, lit(1L), out, parts)

  /** Scalar aggregate of the whole input joined onto every row as `out` — the
    * replacement for `agg.over(Window.partitionBy())`, which is the same
    * single-partition funnel. The broadcast side is one row.
    */
  def withTotal(df: DataFrame, agg: Column, out: String): DataFrame =
    df.crossJoin(broadcast(df.agg(agg.as(out))))

  /** Global 1-based row number in `order` (column `rnOut`, long) PLUS the
    * whole-frame sum of `value` on every row (column `totOut`) — the fused
    * form of `withTotal(globalRowNumber(df, order, rn), sum(value), tot)`.
    *
    * The per-partition stats aggregation already sees every partition's row
    * count, so ONE triangular pass over the ≤ n partition-count rows yields
    * BOTH the exclusive row-number offsets and the global value total, and
    * the plan carries ONE broadcast build instead of two. For
    * dictionary-sized inputs the dominant cost of these stages is the
    * per-job driver round-trip, not the data (BENCH.md serial-floor audit),
    * so halving the broadcast builds is a direct cut to the scaling
    * benchmark's fixed serial term.
    */
  def globalRowNumberWithTotal(df: DataFrame, order: Seq[Column], value: Column,
                               rnOut: String, totOut: String,
                               parts: Int = 0): DataFrame = {
    val n =
      if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // the ranged table is referenced by the stats aggregation AND the final
    // compose join; exchange reuse cannot dedupe range exchanges whose child
    // is a checkpoint leaf (LogicalRDD partitioning metadata defeats
    // canonical equality — measured: the range shuffle and its sampling job
    // each ran twice), so materialize it once. Storage cost = the input
    // frame, same class as the caller's own dictionary checkpoints.
    val ranged = df.repartitionByRange(n, order: _*).withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true)
    val cnts = ranged.groupBy("__pid")
      .agg(count(lit(1L)).as("__n"), sum(value).as("__v"))
    val offs = cnts.alias("a")
      .join(cnts.alias("b"), lit(true), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(
        coalesce(sum(when(col("b.__pid") < col("a.__pid"), col("b.__n"))), lit(0L))
          .as("__off"),
        sum(col("b.__v")).as(totOut))
    ranged.join(broadcast(offs), Seq("__pid"))
      .withColumn(rnOut,
        row_number().over(Window.partitionBy("__pid").orderBy(order: _*))
          .cast("long") + col("__off"))
      .drop("__pid", "__off")
  }
}
