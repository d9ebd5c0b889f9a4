package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** L2 normalization and int8 quantization invariants. */
class EmbeddingsSpec extends SparkSuite {

  private def vecs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(3f, 4f, 0f)),
      (2L, Array(-0.5f, 0.25f, 0.125f)),
      (3L, Array(0f, 0f, 0f)) // zero vector: normalize/quantize → null
    ).toDF("vec_id", "embedding")
  }

  test("L2 normalization yields unit vectors; zero vectors become null") {
    val out = Embeddings.withL2Normalized(vecs, "embedding")
      .select(col("vec_id"), col("unit"),
        Similarity.norm(col("unit")).as("n"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(math.abs(out(1L).getAs[Double]("n") - 1.0) < 1e-12)
    assert(out(1L).getAs[scala.collection.Seq[Double]]("unit").toSeq == Seq(0.6, 0.8, 0.0))
    assert(math.abs(out(2L).getAs[Double]("n") - 1.0) < 1e-12)
    assert(out(3L).isNullAt(out(3L).fieldIndex("unit")))
  }

  test("native L2 normalization is bit-identical to the composed HOF form") {
    // Denormal-ish, negative, and irrational-norm components so the
    // division results exercise real mantissa bits, not round values.
    val s = spark
    import s.implicits._
    val tricky = Seq(
      (1L, Array(3f, 4f, 0f)),
      (2L, Array(-0.5f, 0.25f, 0.125f)),
      (3L, Array(0f, 0f, 0f)),
      (4L, Array(1f, 1f, 1f)),
      (5L, Array(1.0000001f, -2.0000002f, 3.0000003f))
    ).toDF("vec_id", "embedding")
    val native = Embeddings.withL2Normalized(tricky, "embedding")
      .select("vec_id", "unit").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1).toList)).toMap
    val composed = Embeddings.withL2NormalizedComposed(tricky, "embedding")
      .select("vec_id", "unit").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1).toList)).toMap
    assert(native === composed) // exact ==, not tolerance
  }

  test("native int8 quantization is identical to the composed HOF form") {
    val s = spark
    import s.implicits._
    val tricky = Seq(
      (1L, Array(3f, 4f, 0f)),
      (2L, Array(-0.5f, 0.25f, 0.125f)),
      (3L, Array(0f, 0f, 0f)), // zero: both forms null q and scale
      (4L, Array(1e-30f, -1e-30f, 5e-31f)), // denormal-ish magnitudes
      (5L, Array(-1f, -2f, -3f)) // all negative: floor(x·s + .5) rounding
    ).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "q", "q_scale").collect()
        .map(r => r.getLong(0) -> (
          (if (r.isNullAt(1)) null else r.getSeq[Int](1).toList),
          (if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)))))
        .toMap
    assert(rows(Embeddings.withInt8Quantized(tricky, "embedding")) ===
      rows(Embeddings.withInt8QuantizedComposed(tricky, "embedding")))
  }

  test("NaN vectors: kernels null the row where the composed forms emit garbage") {
    // Spark's SQL ordering ranks NaN above every value, so the
    // composed `when(maxabs > 0.0, ...)` predicate PASSES on a NaN
    // maxabs and the pipeline emits q = [0,0,0] with scale = NaN — a
    // silent corruption. The kernels deliberately diverge: a NaN
    // component nulls the whole vector (pinned here, documented in
    // NativeVector).
    val s = spark
    import s.implicits._
    val nan = Seq((6L, Array(Float.NaN, 1f, 2f))).toDF("vec_id", "embedding")
    val kq = Embeddings.withInt8Quantized(nan, "embedding").head()
    assert(kq.isNullAt(kq.fieldIndex("q")) && kq.isNullAt(kq.fieldIndex("q_scale")))
    val cq = Embeddings.withInt8QuantizedComposed(nan, "embedding").head()
    assert(!cq.isNullAt(cq.fieldIndex("q")), "composed emits the garbage this pins")
    assert(cq.getDouble(cq.fieldIndex("q_scale")).isNaN)
    // Same contrast for normalize: composed emits an all-NaN unit.
    val ku = Embeddings.withL2Normalized(nan, "embedding").head()
    assert(ku.isNullAt(ku.fieldIndex("unit")))
    val cu = Embeddings.withL2NormalizedComposed(nan, "embedding").head()
    assert(!cu.isNullAt(cu.fieldIndex("unit")) &&
      cu.getSeq[Double](cu.fieldIndex("unit")).forall(_.isNaN))
  }

  test("int8 quantization bounds, max-component saturation, dequant error") {
    val out = Embeddings.withInt8Quantized(vecs, "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    val q1 = out(1L).getAs[scala.collection.Seq[Int]]("q").toSeq
    val s1 = out(1L).getAs[Double]("q_scale")
    assert(q1.map(math.abs).max == 127, "max-magnitude dim must hit 127")
    assert(q1.forall(v => v >= -127 && v <= 127))
    // dequantized values land within half a quantization step
    vecs.collect().find(_.getLong(0) == 1L).get.getSeq[Float](1)
      .zip(q1).foreach { case (orig, q) =>
        assert(math.abs(q / s1 - orig) <= 0.5 / s1 + 1e-9)
      }
    val q2 = out(2L).getAs[scala.collection.Seq[Int]]("q").toSeq
    assert(q2 == Seq(-127, 64, 32)) // floor(x*scale + 0.5), scale = 254
    assert(out(3L).isNullAt(out(3L).fieldIndex("q")))
  }
}
