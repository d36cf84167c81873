package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("binary attach: schema carries BinaryType media + mime metadata") {
    val m = Multimodal.attachBinary(docs(1L -> "abc"), mime = "image/fake")
    assert(m.schema("media").dataType == org.apache.spark.sql.types.BinaryType)
    assert(m.head().getAs[String]("mime") == "image/fake")
  }

  test("feature extraction over bytes via mapPartitions") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.attachBinary(docs(1L -> "abcd", 2L -> ""))).collect()
    val f1 = feats.find(_.doc_id == 1L).get
    assert(f1.byte_len == 4L)
    assert(f1.first_byte == 'a'.toInt)
    assert(f1.checksum == "abcd".map(_.toLong).sum)
    assert(f1.n_frames == 1L)
    assert(f1.width == 16 + ('a' & 0x0f) && f1.height == 16 + ('b' & 0x0f))
    val f2 = feats.find(_.doc_id == 2L).get
    assert(f2.byte_len == 0L && f2.first_byte == -1 && f2.n_frames == 0L)
  }

  test("frame sampling: one row per stride offset (generator shape)") {
    val frames = Multimodal.sampleFrames(spark,
      Multimodal.attachBinary(docs(1L -> ("x" * 40))), stride = 16)
      .collect()
    assert(frames.length == 3) // offsets 0, 16, 32
    assert(frames.map(_.getAs[Int]("frame_idx")).toSet == Set(0, 1, 2))
    assert(frames.forall(_.getAs[Int]("frame_byte") == 'x'.toInt))
  }

  test("features survive a shuffle without carrying media bytes") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.attachBinary(docs((1L to 20L).map(i => i -> s"text number $i"): _*)))
    // aggregating features is fine — media column is gone by this stage
    assert(!feats.columns.contains("media"))
    val agg = feats.groupBy().agg(sum("byte_len")).head().getLong(0)
    assert(agg > 0)
  }
}
