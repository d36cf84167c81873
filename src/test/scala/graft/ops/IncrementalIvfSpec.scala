package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Similarity._

/** Incremental IVF index maintenance (VERDICT r11 item 7):
  * [[Similarity.ivfIndexState]] / [[Similarity.extendIvfIndexState]] /
  * [[Similarity.ivfRetrainAdvice]]. */
class IncrementalIvfSpec extends SparkSpec {

  private lazy val emb =
    graft.T.t(spark, "/root/testdata/sf0.001", "embeddings")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("cell", "dim_idx").collect().map(_.toSeq).toSeq

  test("extend over any split equals the one-shot state bit-for-bit") {
    val cents = quantizeMicro(ivfCentroids(emb.filter(col("vec_id") < 400), 50))
    val oneShot = ivfIndexState(emb, cents)
    // split 1: base < 400, extension >= 400 (the registry shape)
    val s1 = extendIvfIndexState(
      ivfIndexState(emb.filter(col("vec_id") < 400), cents),
      emb.filter(col("vec_id") >= 400), cents)
    assert(rows(s1) == rows(oneShot))
    // split 2: an arbitrary interleaved split — associativity, not luck
    val s2 = extendIvfIndexState(
      ivfIndexState(emb.filter(col("vec_id") % 3 =!= 0), cents),
      emb.filter(col("vec_id") % 3 === 0), cents)
    assert(rows(s2) == rows(oneShot))
    // and a second extension on top (three-way merge)
    val s3 = extendIvfIndexState(
      extendIvfIndexState(
        ivfIndexState(emb.filter(col("vec_id") < 200), cents),
        emb.filter(col("vec_id") >= 200 && col("vec_id") < 400), cents),
      emb.filter(col("vec_id") >= 400), cents)
    assert(rows(s3) == rows(oneShot))
  }

  test("an extension can introduce a previously-empty cell") {
    import spark.implicits._
    // 2-dim toy: centroids along x (cell 0) and y (cell 1); base only
    // populates cell 0, the extension lands in cell 1
    val cents = Array(0L -> Array(1000000L, 0L), 1L -> Array(0L, 1000000L))
    val base = Seq((1L, Seq(1f, 0.1f)), (2L, Seq(0.9f, 0f)))
      .toDF("vec_id", "embedding")
    val ext = Seq((3L, Seq(0.05f, 1f))).toDF("vec_id", "embedding")
    val st = ivfIndexState(base, cents)
    assert(st.select("cell").distinct().collect().map(_.getLong(0)).toSet
      == Set(0L))
    val merged = extendIvfIndexState(st, ext, cents)
    assert(merged.select("cell").distinct().collect().map(_.getLong(0)).toSet
      == Set(0L, 1L))
    // the new cell's state is exactly the extension's quantized sums
    val c1 = merged.filter(col("cell") === 1 && col("dim_idx") === 1)
      .head()
    assert(c1.getAs[Long]("n_vecs") == 1L)
    assert(c1.getAs[Long]("sum_micro") ==
      math.floor(1f.toDouble * 1000000.0).toLong)
    assert(c1.getAs[Long]("centroid_micro") == c1.getAs[Long]("sum_micro"))
  }

  test("centroid_micro is the floored integer mean, negatives included") {
    import spark.implicits._
    val cents = Array(0L -> Array(1000000L, 0L))
    // two vectors in one cell with a NEGATIVE second coordinate: mean of
    // floor(-0.35e6) = -350000 and floor(0.1e6) = 100000 -> floor(-125000)
    val d = Seq((1L, Seq(1f, -0.35f)), (2L, Seq(1f, 0.1f)))
      .toDF("vec_id", "embedding")
    val r = ivfIndexState(d, cents).filter(col("dim_idx") === 1).head()
    assert(r.getAs[Long]("sum_micro") == -250000L)
    assert(r.getAs[Long]("centroid_micro") == -125000L)
  }

  test("retrain advice flags cells above the skew bound") {
    import spark.implicits._
    // hand-built state: dim_idx 0 rows carry the member counts
    // cells: 10 members, 2, 2, 2 -> mean 4, loads 2.5e6/0.5e6/0.5e6/0.5e6
    val st = Seq(
      (0L, 0L, 10L, 0L), (1L, 0L, 2L, 0L),
      (2L, 0L, 2L, 0L), (3L, 0L, 2L, 0L),
      (0L, 1L, 10L, 0L), // other dims must not double-count
    ).toDF("cell", "dim_idx", "n_vecs", "sum_micro")
      .withColumn("centroid_micro", lit(0L))
    val r = ivfRetrainAdvice(st, skewBoundMicro = 2000000L)
      .orderBy("cell").collect()
    assert(r.map(_.getAs[Long]("load_micro")).toSeq ==
      Seq(2500000L, 500000L, 500000L, 500000L))
    assert(r.map(_.getAs[Boolean]("needs_retrain")).toSeq ==
      Seq(true, false, false, false))
  }
}
