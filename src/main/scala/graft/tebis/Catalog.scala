package graft.tebis

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series catalog metadata (reference TimeSeries create,
  * csv_extractor.py:107-112). */
case class TimeSeriesMeta(externalId: String, name: String, description: String)

/** Catalog operations (S12/S13, csv_extractor.py:53-75,151-153).
  *
  * The reference snapshots the whole catalog into a driver dict once and
  * mutates it per created series. Spark-native shape: the catalog is a
  * small dimension table; "which incoming series are missing?" is a
  * broadcast LEFT ANTI join (no shuffle of the big side), and the upsert is
  * a union of the newly created rows back into the dimension. At 100 TB the
  * fact side (headers extracted from files) stays distributed; only the
  * catalog — bounded by #series, not #datapoints — is broadcast.
  */
object Catalog {
  val AutoDescription = "Auto-generated time series, external ID not found"

  def load(spark: SparkSession, path: String): Dataset[TimeSeriesMeta] = {
    import spark.implicits._
    spark.read.parquet(path).as[TimeSeriesMeta]
  }

  /** The upserted catalog's plan usually still READS `path` (union with
    * the existing snapshot) — Spark refuses overwrite-while-reading, so
    * materialize first (localCheckpoint: the snapshot is tiny, single-use,
    * and trivially recomputable — no need for a reliable checkpoint). The
    * pinned blocks are released once the write completes. */
  def save(catalog: Dataset[TimeSeriesMeta], path: String): Unit = {
    val sc = catalog.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val snap = catalog.localCheckpoint()
    try snap.coalesce(1).write.mode("overwrite").parquet(path)
    finally sc.getPersistentRDDs
      .collect { case (id, rdd) if !before.contains(id) => rdd }
      .foreach(_.unpersist(blocking = false))
  }

  /** Headers not present in the catalog, deduplicated to the FIRST
    * occurrence per externalId (the reference creates a series on first
    * sight and skips later columns with the same id,
    * csv_extractor.py:151-153). `headers` columns: fileOrd (the file's
    * DISCOVERY order — numeric filename-token rank, not lexicographic
    * path), externalId, name, colIndex.
    */
  def missing(headers: DataFrame, catalog: Dataset[TimeSeriesMeta]): Dataset[TimeSeriesMeta] = {
    val spark = headers.sparkSession
    import spark.implicits._
    headers
      .groupBy($"externalId")
      .agg(min_by(struct($"name"), struct($"fileOrd", $"colIndex")).getField("name").as("name"))
      .join(broadcast(catalog.select($"externalId")), Seq("externalId"), "left_anti")
      .select($"externalId", $"name", lit(AutoDescription).as("description"))
      .as[TimeSeriesMeta]
  }

  /** Catalog after creating the missing series (upsert-by-union; existing
    * rows win, matching the reference's `if external_id not in existing`).
    */
  def upsert(catalog: Dataset[TimeSeriesMeta], created: Dataset[TimeSeriesMeta]): Dataset[TimeSeriesMeta] = {
    val spark = catalog.sparkSession
    import spark.implicits._
    catalog.unionByName(
      created.join(broadcast(catalog.select("externalId")), Seq("externalId"), "left_anti")
        .select($"externalId", $"name", $"description").as[TimeSeriesMeta])
  }
}
