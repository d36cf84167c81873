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
