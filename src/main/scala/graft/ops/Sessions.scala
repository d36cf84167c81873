package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — gap-based event grouping per key (SURVEY §2.8 ST5
  * extension / §2.10 event-time analytics).
  *
  * Batch form: the classic lag + cumulative-sum formulation — one shuffle
  * on the key, sessions assigned with two window passes over the same
  * (key, ts) sort order (Spark reuses the sort between them). Scales as a
  * sort-merge: no state, no driver involvement, any key cardinality.
  *
  * Streaming form: `flatMapGroupsWithState` with processing-time timeout —
  * the idiomatic custom-state path when sessions must close mid-stream.
  */
object Sessions {

  /** Assign gap-based sessions: a new session starts when the key's
    * previous event is more than `gapSeconds` older. Adds `session_id`
    * (0-based per key) to the input rows. */
  def assign(events: DataFrame, key: String, ts: String, gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts))
    events
      .withColumn("__prev_ts", lag(col(ts), 1).over(byKey))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col(ts)) - unix_timestamp(col("__prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session summary: bounds, event count, duration. */
  def summarize(events: DataFrame, key: String, ts: String, gapSeconds: Long): DataFrame =
    assign(events, key, ts, gapSeconds)
      .groupBy(col(key), col("session_id"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(ts))) - unix_timestamp(min(col(ts))))
          .as("duration_secs"))

  /** One closed session emitted by the streaming form. */
  case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Long)

  /** Streaming state buffer (public: the state Encoder's generated code
    * instantiates it reflectively). */
  case class SessionState(start: Long, last: Long, n: Long)

  /** Streaming sessionization with explicit state: sessions close when the
    * *watermark* passes last-event + gap (event-time timeout — deterministic
    * and replayable, unlike a wall-clock timeout, which in as-fast-as-
    * possible triggers also degenerates into a no-data-batch busy loop).
    * Exercises the `KeyValueGroupedDataset.flatMapGroupsWithState` path
    * (ST5). */
  def streamingSessions(spark: SparkSession, events: Dataset[(Long, java.sql.Timestamp)],
      gapSeconds: Long): Dataset[Session] = {
    import spark.implicits._
    events.toDF("user_id", "ts")
      .withWatermark("ts", s"$gapSeconds seconds")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(key,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n))
          } else {
            val sorted = rows.map(_._2.getTime).toList.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(key,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
