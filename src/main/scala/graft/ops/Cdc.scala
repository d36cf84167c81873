package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One change-log mutation: key, (ts, seq) version vector, tombstone
  * flag, payload. The streaming mirror of [[Cdc.latestSnapshot]]'s
  * column contract. */
case class CdcRecord(key: Long, ts: Long, seq: Long, deleted: Boolean,
  payload: String)

/** Change-log materialization operators: the two standard shapes for
  * turning an append-only mutation log (CDC feed, crawl-snapshot diff
  * stream, label-correction log) into servable state.
  *
  *  - [[latestSnapshot]]: the CURRENT state — last writer wins per key,
  *    tombstones delete.
  *  - [[scd2History]]: the FULL history — one validity interval per
  *    version (slowly-changing-dimension type 2), the layout that lets
  *    an as-of join ([[AsOf]]) answer "what was this row worth when the
  *    training example was sampled".
  *
  * Both are one shuffle on the key followed by a key-partitioned window
  * — never a global window — so they scale with the widest single key's
  * version count, not with the log. Ordering within a key is
  * (ts, seqCol) with an explicit unique tie-breaker, making the result
  * deterministic under any partitioning (a bare ts tie would make
  * "latest" partition-order-dependent).
  */
object Cdc {

  /** Last-writer-wins compaction of a change log: one row per key —
    * its latest version by (tsCol, seqCol) — with tombstoned keys
    * (latest version satisfies `isDelete`) removed entirely.
    *
    * This is the Delta/Hudi/Iceberg "merge-on-read compaction" kernel
    * expressed relationally: at 100 TB the log is hash-partitioned by
    * key, each partition resolves its winners independently, and AQE
    * coalesces the post-filter output. No driver state, no sort beyond
    * the per-key window. */
  def latestSnapshot(log: DataFrame, keyCols: Seq[String], tsCol: String,
      seqCol: String, isDelete: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(seqCol).desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !isDelete)
      .drop("__rn")
  }

  /** Slowly-changing-dimension type-2 history: every log row becomes a
    * validity interval [valid_from, valid_to) per key, closed by the
    * key's next version (lead over the key-partitioned window); the
    * current version carries a NULL valid_to and is_current = true.
    *
    * The output is exactly the relation a bounded-staleness as-of join
    * probes ([[AsOf.asOfJoin]] on valid_from with valid_to as the
    * exclusion bound), so log → scd2History → as-of is the full
    * point-in-time-correct feature-serving path. */
  def scd2History(log: DataFrame, keyCols: Seq[String], tsCol: String,
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    log.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Streaming last-writer-wins state: the incremental mirror of
    * [[latestSnapshot]] — each micro-batch emits, per touched key, the
    * key's new winning version by (ts, seq). Tombstones STAY IN STATE
    * (and are emitted with `deleted = true`, the downstream delete
    * marker): forgetting them would let a late out-of-order update
    * resurrect a deleted key, which is the classic streaming-CDC bug.
    * Late updates older than the stored winner are absorbed silently
    * (the state re-emits unchanged) — same total order, so batch
    * replay and streaming state always agree.
    *
    * State per key is ONE version (not the log), so state size is the
    * live key space; `mapGroupsWithState` emits exactly one row per
    * touched key per batch (Update mode). */
  def streamingLatestState(log: Dataset[CdcRecord]): Dataset[CdcRecord] = {
    val spark = log.sparkSession
    import spark.implicits._
    log.groupByKey(_.key)
      .mapGroupsWithState[CdcRecord, CdcRecord](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[CdcRecord], state: GroupState[CdcRecord]) =>
          val winner = (state.getOption.iterator ++ rows)
            .maxBy(r => (r.ts, r.seq))
          state.update(winner)
          winner.copy(key = key)
      }
  }

}
