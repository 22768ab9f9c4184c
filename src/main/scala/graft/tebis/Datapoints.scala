package graft.tebis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative (Catalyst-optimizable) form of the TEBIS transform chain for
  * data already loaded as a wide DataFrame: header split (S4), value-row
  * filter (S5/S6), locale cast (S7), epoch s→ms (S8), unpivot (S9).
  * Reference: csv_extractor.py:92-160. The canonical byte-exact path is
  * TebisCsv.parseContent; this path exists so wide tabular data that is
  * ALREADY columnar (e.g. re-ingested parquet) flows through built-in,
  * codegen'd operators — Expand for unpivot, no UDFs.
  */
object Datapoints {

  /** externalId = text before the LAST colon, trimmed; "" when no colon
    * (Python rpartition parity, csv_extractor.py:149). */
  def externalIdExpr(header: Column): Column =
    trim(regexp_extract(header, "^(.*):[^:]*$", 1))

  /** name = text after the LAST colon, trimmed; whole cell when no colon
    * (csv_extractor.py:148). */
  def seriesNameExpr(header: Column): Column =
    trim(substring_index(header, ":", -1))

  /** Comma-decimal string → double; NULL when empty/unparsable (S6+S7).
    * Uses Spark's cast parser, which accepts the same core grammar
    * ("1e5", "Infinity", "NaN"); exact Python-float parity lives in
    * TebisCsv.parsePythonFloat. */
  def valueExpr(raw: Column): Column =
    regexp_replace(raw, ",", ".").try_cast("double")

  /** Epoch-seconds string → epoch millis (S8, csv_extractor.py:103). */
  def timestampMsExpr(rawTs: Column): Column =
    rawTs.try_cast("long") * lit(1000L)

  /** Wide (ts + one string column per series header) → long
    * `(externalId, seriesName, timestampMs, value)`.
    *
    * Scale: `unpivot` plans as a single Expand (no shuffle, no UDF). For
    * files with thousands of series columns the unpivot is chunked into
    * groups of `chunk` columns unioned together, bounding per-operator
    * expression size (SURVEY §7.5#4); the union is a no-shuffle narrow op.
    */
  def unpivotWide(wide: DataFrame, tsCol: String, chunk: Int = 256): DataFrame = {
    val valueCols = wide.columns.filterNot(_ == tsCol)
    val chunks = valueCols.grouped(chunk).map { group =>
      wide.unpivot(
        Array(col(tsCol)),
        group.map(col),
        "hdr", "rawValue")
    }
    val long = chunks.reduce(_ unionByName _)
    long
      .withColumn("value", valueExpr(col("rawValue")))
      .filter(col("rawValue").isNotNull && length(col("rawValue")) > 0 && col("value").isNotNull)
      .select(
        externalIdExpr(col("hdr")).as("externalId"),
        seriesNameExpr(col("hdr")).as("seriesName"),
        timestampMsExpr(col(tsCol)).as("timestampMs"),
        col("value"))
  }

  /** Per-series stats (S10/S11 analogs): one shuffle, partial aggregation
    * map-side; holds at scale because cardinality = #series, not #points. */
  def seriesStats(datapoints: DataFrame): DataFrame =
    datapoints.groupBy("externalId").agg(
      count(lit(1)).as("n_points"),
      min("timestampMs").as("min_ts"),
      max("timestampMs").as("max_ts"),
      min("value").as("min_value"),
      max("value").as("max_value"))
}
