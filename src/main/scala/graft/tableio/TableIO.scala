package graft.tableio

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Iceberg-style table layer: partitioned Parquet data files + a JSON
  * snapshot commit log with atomic-rename commits (SURVEY.md §7.0 — no
  * Iceberg runtime jar ships offline, so this emulates the snapshot/manifest
  * behavior behind a small API that a real Iceberg catalog could replace).
  *
  * Layout:
  *   table/
  *     data/snap-<v>/...          partitioned parquet for snapshot v
  *     snapshots/v<v>.json        manifest: data dir, row count, schema
  *     snapshots/CURRENT          file containing the committed version
  *
  * Commit protocol: data is written fully, the manifest is written to a temp
  * file, then CURRENT is replaced by atomic move — readers see either the old
  * or the new snapshot, never a partial one. Re-running a failed job never
  * corrupts a committed snapshot (idempotent writes, north-star
  * resumability).
  */
object TableIO {

  case class Snapshot(version: Long, dataDir: String, rows: Long, schemaJson: String)

  private def snapDir(table: String): Path = Paths.get(table, "snapshots")

  def currentVersion(table: String): Option[Long] = {
    val cur = snapDir(table).resolve("CURRENT")
    if (Files.exists(cur)) Some(Files.readString(cur).trim.toLong) else None
  }

  def readSnapshot(table: String, version: Long): Snapshot = {
    val txt = Files.readString(snapDir(table).resolve(s"v$version.json"))
    // minimal JSON codec (fields are under our control, no nesting)
    def field(name: String): String = {
      val m = ("\"" + name + "\"\\s*:\\s*(\"(?:[^\"\\\\]|\\\\.)*\"|\\d+)").r
        .findFirstMatchIn(txt).getOrElse(sys.error(s"manifest field $name missing"))
      val v = m.group(1)
      if (v.startsWith("\"")) v.substring(1, v.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
      else v
    }
    Snapshot(field("version").toLong, field("dataDir"), field("rows").toLong, field("schema"))
  }

  /** Commit `df` as the next snapshot of `table`. Returns the snapshot.
    *
    * Crash-idempotency: a job that died after writing v<N>.json but before
    * updating CURRENT leaves an orphaned manifest; the next version is
    * therefore max(all manifests, CURRENT) + 1 so a rerun skips the orphan
    * instead of colliding with it, and the manifest move itself is
    * REPLACE_EXISTING (contents are regenerated deterministically) so even a
    * same-version retry can never wedge the table (ADVICE.md round 1).
    */
  def commit(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Snapshot = {
    val version =
      (currentVersion(table).toSeq ++ versions(table)).reduceOption(_ max _).map(_ + 1).getOrElse(0L)
    val dataDir = s"$table/data/snap-$version"
    // row count observed during the write itself (one pass over the data) —
    // re-reading the freshly written parquet just to count would double the
    // I/O of every stage commit. Observation metrics can over-count under
    // speculative execution (both task attempts feed the accumulator), so
    // the cheap path is only valid with speculation off — with it on, fall
    // back to counting the committed files (ADVICE round 2).
    val speculative = df.sparkSession.sparkContext.getConf
      .getBoolean("spark.speculation", defaultValue = false)
    val obs = org.apache.spark.sql.Observation(s"tableio-rows-$version")
    val writer = df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows")).write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(dataDir)
    val rows =
      if (speculative) df.sparkSession.read.parquet(dataDir).count()
      else obs.get("rows").asInstanceOf[Long]
    Files.createDirectories(snapDir(table))
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val manifest =
      s"""{"version": $version, "dataDir": "${esc(dataDir)}", "rows": $rows, "schema": "${esc(df.schema.json)}"}"""
    val tmp = Files.createTempFile(snapDir(table), "manifest", ".tmp")
    Files.writeString(tmp, manifest)
    Files.move(tmp, snapDir(table).resolve(s"v$version.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val curTmp = Files.createTempFile(snapDir(table), "current", ".tmp")
    Files.writeString(curTmp, version.toString)
    Files.move(curTmp, snapDir(table).resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Snapshot(version, dataDir, rows, df.schema.json)
  }

  /** S9: prediction TSV sink — the reference emits its prediction files as
    * tab-separated text (test_pred_* outputs, relembed.py:616-625 era
    * tooling); distributed writers emit one shard per partition like any
    * text sink.
    */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(path)

  /** Read the current committed snapshot (partition pruning + pushdown apply
    * as with any parquet scan; partition columns come back from dir layout).
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(sys.error(s"no committed snapshot in $table"))
    spark.read.parquet(readSnapshot(table, v).dataDir)
  }

  /** List all snapshot versions (time travel). */
  def versions(table: String): Seq[Long] =
    if (!Files.exists(snapDir(table))) Nil
    else Files.list(snapDir(table)).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong }
      .toSeq.sorted

  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame =
    spark.read.parquet(readSnapshot(table, version).dataDir)
}
