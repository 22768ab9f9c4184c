package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus ingestion — the de-facto interchange format for
  * pre-training corpora (one JSON object per line, typically
  * `{"text": ..., "source": ..., meta...}`). Spark's native json reader
  * does the heavy lifting; this wrapper pins the two decisions a
  * pipeline must not leave to inference at 100 TB:
  *
  *  - **No schema inference.** Inference is a FULL extra pass over the
  *    corpus before the real read, and a heterogeneous shard (one file
  *    with an extra field) silently widens the schema for everything.
  *    Callers pass the expected schema; unknown fields are dropped by
  *    the reader, missing ones surface as nulls.
  *  - **Malformed lines are quarantined, not fatal, not silent.**
  *    PERMISSIVE mode with an explicit corrupt-record column: a torn
  *    line (truncated upload, encoding accident) lands with every data
  *    field null and the raw line preserved in `_corrupt_record` for a
  *    dead-letter audit — mirroring the reference's skip-and-log file
  *    handling (csv_extractor.py:135-142) at line granularity.
  *
  * Reading is one codegen'd scan — splittable, predicate/projection
  * pruning applies to the parsed columns; the parquet-vs-jsonl cost gap
  * is the parse itself, which is why [[graft.ops.Pipeline]] lands
  * parquet shards and JSONL stays an INGEST format. */
object JsonlCorpus {

  val CorruptCol = "_corrupt_record"

  /** Write `docs` as JSONL (one object per line, UTF-8). */
  def write(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").json(path)

  /** Read a JSONL tree with a pinned schema; malformed lines carry the
    * raw text in `_corrupt_record` and null data fields. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else schema.add(CorruptCol, StringType, nullable = true)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Streaming twin of [[read]]: a drop-folder of JSONL shards as a
    * Structured Streaming source, same pinned schema + corrupt-line
    * column. Split with [[quarantine]] INSIDE a `foreachBatch` (the
    * split needs a batch frame: it materializes once and the
    * corrupt-only pruned scan Spark refuses cannot occur on the
    * checkpointed copy) — landing parsed shards and a dead-letter
    * table per micro-batch, the reference's failed-file routing at
    * line granularity. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 20): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else schema.add(CorruptCol, StringType, nullable = true)
    spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)
  }

  /** Split a read frame into (parsed rows, quarantined raw lines).
    * The parse is materialized ONCE (localCheckpoint) and both halves
    * read the materialization: the two consumers would otherwise scan
    * and parse the JSONL twice, and Spark outright refuses a query
    * whose pruned scan touches ONLY the corrupt column
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the quarantine side alone is
    * exactly that query. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val m = df.localCheckpoint()
    (m.filter(col(CorruptCol).isNull).drop(CorruptCol),
      m.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")))
  }
}
