package graft.multimodal

import graft.SparkSuite

/** Multimodal plumbing: binary schema, stub decode determinism,
  * frame-sample shapes. */
class MultimodalSpec extends SparkSuite {
  import Multimodal._

  test("extractFeatures: schema, batch shape, determinism") {
    val s = spark
    import s.implicits._
    val media = Seq(
      MediaRow(1L, "hello world, this is binary payload one".getBytes, "image/png"),
      MediaRow(2L, Array[Byte](0, 1, 2, 3, 4, 5), "audio/wav"),
      MediaRow(3L, Array.emptyByteArray, "video/mp4")
    ).toDS()
    val feats = extractFeatures(media).collect().sortBy(_.id)
    assert(feats.map(_.id).toSeq == Seq(1L, 2L, 3L))
    assert(feats.forall(_.features.length == FeatureDim))
    assert(feats(0).n_bytes == 39)
    assert(feats(1).header == "00010203")
    assert(feats(2).n_bytes == 0)
    // determinism: same bytes → same features on a second run
    val again = extractFeatures(media).collect().sortBy(_.id)
    assert(feats.zip(again).forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("frameSample windows the payload without a shuffle") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a" * 1000), (2L, "b" * 100), (3L, ""))
      .toDF("id", "txt")
      .selectExpr("id", "CAST(txt AS BINARY) AS media")
    val out = Multimodal.frameSample(df, "media", frameLen = 256, stride = 256)
      .select("id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == 4) // 1000 bytes → 4 windows of ≤256
    assert(out(2L) == 1)
    assert(out(3L) == 1) // empty payload still yields one (empty) frame
    // no exchange in the plan: it's a per-row expression
    val plan = Multimodal.frameSample(df, "media", 256, 256)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
