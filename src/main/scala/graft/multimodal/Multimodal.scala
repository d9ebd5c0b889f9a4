package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample stages a training pipeline hangs off them.
  *
  * The decode step is a clearly-marked STUB — media codecs are not in
  * this container — producing a *deterministic* fake feature vector
  * derived from the bytes. Everything around it is real Spark plumbing:
  * the binary schema, the typed `mapPartitions` batch shape (the Scala
  * analogue of an Arrow-batched pandas UDF: one iterator per partition,
  * constant memory, no driver collect), and the frame-sampling
  * expression path.
  */
object Multimodal {

  /** One media asset: payload + typed metadata. */
  final case class MediaRow(id: Long, media: Array[Byte], mime: String)

  /** Stub decode output: per-asset fixed-width feature vector. */
  final case class MediaFeatures(
      id: Long, n_bytes: Int, header: String, features: Array[Float])

  val FeatureDim = 16

  /** STUB decoder: stands in for a real image/audio decode + model
    * forward pass. Deterministic in the bytes (rolling polynomial hash
    * per stripe) so tests and re-runs are stable. Swap the body for a
    * real codec + encoder when available; the partition-iterator shape
    * — the part that matters for Spark — stays identical. */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      val j = i % FeatureDim
      acc(j) = acc(j) * 31 + (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => (v % 1000003L).toFloat / 1000003f)
  }

  /** Feature extraction over the media column: one `mapPartitions` pass,
    * batch-shaped like an Arrow UDF (iterator in, iterator out — no
    * materialization of the partition). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val header = r.media.take(4).map(b => f"${b & 0xff}%02x").mkString
        MediaFeatures(r.id, r.media.length, header, stubDecode(r.media))
      }
    }
  }

  /** Frame sampling as a pure expression: split the payload into
    * fixed-size byte windows every `stride` bytes (the binary analogue
    * of video frame extraction). No UDF, no shuffle. */
  def frameSample(df: DataFrame, mediaCol: String, frameLen: Int,
                  stride: Int): DataFrame = {
    val nFrames = ceil(octet_length(col(mediaCol)).cast("double") / stride).cast("int")
    df.withColumn("frames",
      transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => col(mediaCol).substr(lit(1) + i * stride, lit(frameLen))))
      .withColumn("n_frames", size(col("frames")))
  }
}
