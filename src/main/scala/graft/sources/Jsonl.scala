package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (one JSON document per line) interchange — THE wire format of
  * LLM training corpora (every public dataset release, every tokenizer
  * intake ships as .jsonl / .jsonl.gz shards). Spark's native json
  * source/sink does the heavy lifting; this wrapper pins the contract a
  * corpus pipeline needs:
  *
  *  - **Explicit schema on read** — schema inference is a full extra
  *    pass over 100 TB and silently widens types on dirty data; corpus
  *    readers always know their schema.
  *  - **Malformed-line quarantine, not job failure** — a crawl shard
  *    with a few torn lines must not kill a pipeline. PERMISSIVE mode
  *    with `columnNameOfCorruptRecord` splits the read into a clean
  *    relation and a quarantine relation carrying the raw offending
  *    line (same posture as the log parser's malformed-row side
  *    channel, `graft.parse.LogParser`).
  *  - **Sharded write** — `repartition(shards)` sizes output files for
  *    the consumer (tokenizer workers read one shard each); compression
  *    is the codec Spark ships (gzip per part file when asked).
  *
  * Scale shape: read and write are both narrow scans — no shuffle
  * except the explicit shard sizing on write. */
object Jsonl {

  /** Write `df` as `shards` JSONL part files under `path`. */
  def write(df: DataFrame, path: String, shards: Int = 1,
      gzip: Boolean = false): Unit = {
    require(shards > 0, "shards must be positive")
    val w = df.repartition(shards).write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** Read JSONL under `path` with the given schema; malformed lines land
    * in the quarantine relation (raw line + nothing else) instead of
    * failing the read or silently nulling. Returns (clean, quarantine).
    *
    * One json scan feeds both relations — localCheckpoint'ed so the two
    * consumers don't re-read the files. */
  def read(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val withCorrupt = StructType(schema.fields :+
      StructField(corrupt, StringType, nullable = true))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path)
      .localCheckpoint(false)
    val clean = raw.filter(col(corrupt).isNull)
      .select(schema.fieldNames.map(col): _*)
    val quarantine = raw.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw_line"))
    (clean, quarantine)
  }
}
