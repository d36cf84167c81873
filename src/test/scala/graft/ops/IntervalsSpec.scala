package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IntervalsSpec extends SparkSpec {

  private def iv(name: String, rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF(s"${name}_id", s"${name}_s", s"${name}_e")
  }

  test("overlap join: exact pairs, each counted once despite shared buckets") {
    // a1=[0,100] overlaps b1=[50,60] (many shared buckets at width 10),
    // b2=[100,110] (touching endpoint), not b3=[101,200]
    val a = iv("a", (1L, 0L, 100L))
    val b = iv("b", (1L, 50L, 60L), (2L, 100L, 110L), (3L, 101L, 200L))
    val out = Intervals.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e",
        bucketWidth = 10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // a1 and b1 share buckets 5 and 6 — the first-shared-bucket filter
    // must emit the pair exactly ONCE
    assert(out.sorted.toSeq == Seq((1L, 1L), (1L, 2L)), s"got ${out.toSeq}")
  }

  test("overlap join preserves input multiplicities (no distinct)") {
    val a = iv("a", (1L, 0L, 10L), (1L, 0L, 10L)) // duplicate row
    val b = iv("b", (7L, 5L, 6L))
    val out = Intervals.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 4)
    assert(out.count() == 2, "duplicate input rows must produce duplicate pairs")
  }

  test("overlap join matches the naive predicate on random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val mk = (n: Int) => Seq.tabulate(n) { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(80))
    }
    val a = mk(120).toDF("a_id", "a_s", "a_e")
    val b = mk(120).toDF("b_id", "b_s", "b_e")
    val fast = Intervals.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 50)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.sorted.toSeq == naive.sorted.toSeq)
  }

  test("plan is a hash equi-join on the bucket, not a nested loop") {
    val a = iv("a", (1L, 0L, 10L))
    val b = iv("b", (2L, 5L, 15L))
    val p = Intervals.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"expected bucket equi-join:\n$p")
  }

  test("pathological span fails loudly via the in-plan guard") {
    val a = iv("a", (1L, 0L, 1000000L))
    val b = iv("b", (2L, 5L, 15L))
    val e = intercept[Exception] {
      Intervals.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e",
        bucketWidth = 10, maxBucketsPerInterval = 100).count()
    }
    assert(e.getMessage != null)
  }

  test("mergeOverlaps: chains merge, touching merges, gaps split, per-key") {
    import spark.implicits._
    val iv = Seq(
      // key A: [0,10] u [5,20] u [20,30] chain-merges; [40,50] stands alone
      ("A", 0L, 10L), ("A", 5L, 20L), ("A", 20L, 30L), ("A", 40L, 50L),
      // key B: nested interval absorbs
      ("B", 0L, 100L), ("B", 10L, 20L)).toDF("k", "s", "e")
    val got = Intervals.mergeOverlaps(iv, "k", "s", "e")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("A", 0L, 30L, 3L), ("A", 40L, 50L, 1L), ("B", 0L, 100L, 2L)), got.toSeq)
    // partition invariance
    val again = Intervals.mergeOverlaps(iv.repartition(5), "k", "s", "e")
      .collect().map(_.toSeq).toSet
    assert(again ==
      Intervals.mergeOverlaps(iv, "k", "s", "e").collect().map(_.toSeq).toSet)
  }
}
