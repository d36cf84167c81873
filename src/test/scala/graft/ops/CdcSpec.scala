package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  // (key, ts-seconds, seq, op, payload)
  private def log(rows: (Long, Long, Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("k", "sec", "seq", "op", "payload")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
  }

  test("latestSnapshot: last writer wins, ties broken by seq") {
    val l = log(
      (1L, 10L, 1L, "upsert", "a"),
      (1L, 20L, 2L, "upsert", "b"),
      (2L, 10L, 3L, "upsert", "x"),
      (2L, 10L, 4L, "upsert", "y")) // same ts — seq 4 must win
    val snap = Cdc.latestSnapshot(l, Seq("k"), "ts", "seq",
        col("op") === "delete")
      .select("k", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap == Map(1L -> "b", 2L -> "y"))
  }

  test("latestSnapshot: tombstoned key vanishes; earlier delete is overwritten") {
    val l = log(
      (1L, 10L, 1L, "upsert", "a"),
      (1L, 20L, 2L, "delete", ""),   // key 1 latest = tombstone -> gone
      (2L, 10L, 3L, "delete", ""),
      (2L, 20L, 4L, "upsert", "z")) // delete then re-insert -> alive
    val snap = Cdc.latestSnapshot(l, Seq("k"), "ts", "seq",
        col("op") === "delete")
      .select("k", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap == Map(2L -> "z"))
  }

  test("scd2History: intervals chain per key, current row open-ended") {
    val l = log(
      (1L, 10L, 1L, "upsert", "a"),
      (1L, 20L, 2L, "upsert", "b"),
      (1L, 30L, 3L, "upsert", "c"),
      (2L, 15L, 4L, "upsert", "x"))
    val h = Cdc.scd2History(l, Seq("k"), "ts", "seq")
      .select(col("k"), col("version"), col("payload"),
        unix_timestamp(col("valid_from")).as("f"),
        unix_timestamp(col("valid_to")).as("t"), col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5))).toSet
    assert(h == Set(
      (1L, 1, "a", 10L, 20L, false),
      (1L, 2, "b", 20L, 30L, false),
      (1L, 3, "c", 30L, -1L, true),
      (2L, 1, "x", 15L, -1L, true)))
  }

  test("streamingLatestState: LWW across batches; tombstones block resurrection") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcRecord]
    val q = Cdc.streamingLatestState(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_state_out").start()
    def latest(): Map[Long, (Long, Boolean, String)] = {
      // Update sink appends one row per touched key per batch; the
      // per-key winner is the max (ts, seq) emission.
      spark.table("cdc_state_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3), r.getString(4)))
        .groupBy(_._1)
        .map { case (k, rows) =>
          val w = rows.maxBy(t => (t._2, t._3))
          k -> ((w._2, w._4, w._5))
        }
    }
    try {
      input.addData(CdcRecord(1L, 10L, 1L, false, "a"),
        CdcRecord(1L, 20L, 2L, false, "b"), CdcRecord(2L, 5L, 3L, false, "x"))
      q.processAllAvailable()
      assert(latest() == Map(1L -> ((20L, false, "b")), 2L -> ((5L, false, "x"))))
      // late out-of-order update (ts 15 < stored 20) is absorbed
      input.addData(CdcRecord(1L, 15L, 4L, false, "stale"))
      q.processAllAvailable()
      assert(latest()(1L) == ((20L, false, "b")))
      // tombstone wins and STAYS: a later-arriving older update cannot
      // resurrect the key
      input.addData(CdcRecord(2L, 30L, 5L, true, ""))
      q.processAllAvailable()
      input.addData(CdcRecord(2L, 25L, 6L, false, "zombie"))
      q.processAllAvailable()
      assert(latest()(2L) == ((30L, true, "")))
    } finally q.stop()
  }

  test("scd2History then as-of probe is point-in-time correct") {
    val l = log(
      (1L, 10L, 1L, "upsert", "a"),
      (1L, 20L, 2L, "upsert", "b"))
    val h = Cdc.scd2History(l, Seq("k"), "ts", "seq")
    // probe at t=15: version valid at 15 is [10,20) -> "a"
    val at15 = h.filter(col("valid_from") <= timestamp_seconds(lit(15)) &&
        (col("valid_to").isNull ||
          col("valid_to") > timestamp_seconds(lit(15))))
      .select("payload").collect().map(_.getString(0)).toSeq
    assert(at15 == Seq("a"))
  }
}
