package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — treat image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extract / frame-sample as partition-local batch
  * transforms.
  *
  * The actual codecs are NOT in this container, so [[StubDecoder]] is a
  * clearly-marked deterministic fake; everything Spark-side — schema,
  * batch shape, partitioning, the mapPartitions plumbing — is real and
  * tested, and a production decoder drops in by replacing one function.
  */
object Multimodal {

  /** Typed metadata carried beside every blob. */
  val metadataType: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image/jpeg, audio/wav, ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("source", StringType, nullable = false)))

  /** Output of the decode/feature stage, per blob. */
  val featureType: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("content_md5", StringType),
    StructField("frame_count", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decoder — deterministic fake standing in for the real
    * image/audio codec (not available in this container). Derives a
    * fixed-length pseudo-feature from the bytes so tests can pin exact
    * values. Replace with a real decoder in production; the signature
    * (bytes in, features out, one call per row, no Spark types) is the
    * whole contract. */
  object StubDecoder {
    val FeatureDim = 8
    def decode(bytes: Array[Byte]): (Long, String, Int, Array[Float]) = {
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      val frames = 1 + (if (bytes.isEmpty) 0 else bytes.length / 64)
      val feature = Array.tabulate(FeatureDim) { i =>
        if (bytes.isEmpty) 0.0f
        else bytes.iterator.zipWithIndex
          .filter(_._2 % FeatureDim == i).map(_._1.toInt & 0xff).sum.toFloat /
          (255.0f * (bytes.length / FeatureDim + 1))
      }
      (bytes.length.toLong, md5, frames, feature)
    }
  }

  /** Wrap raw payloads: (id, blob, metadata struct). `binary` stays
    * opaque through shuffles/storage; metadata is columnar-prunable. */
  def pack(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String, source: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(source).as("source")).as("metadata"))

  /** Decode/feature-extract via mapPartitions: the decoder is called
    * once per row inside the executor, rows stream through in batches,
    * and nothing ever collects to the driver. At 100 TB this is the
    * shape of every GPU/codec stage: partition-local, stateless,
    * schema-stable. */
  def extractFeatures(packed: DataFrame): DataFrame = {
    val outSchema = StructType(packed.schema.fields ++ featureType.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val (len, md5, frames, feat) = StubDecoder.decode(
          if (bytes == null) Array.emptyByteArray else bytes)
        Row.fromSeq(r.toSeq ++ Seq(len, md5, frames, feat.toSeq))
      }
    }(enc)
  }

  /** Frame/segment sampling: take a deterministic byte-slice per
    * "frame" — the stand-in for video frame extraction. Pure SQL
    * (substring on binary), no decoder needed. The frame index explodes
    * IN PLACE beside the payload — zero joins, zero shuffles: a narrow
    * nFrames× fan-out of the scan, which is the shape that matters when
    * the blob column is terabytes. */
  def sampleFrames(packed: DataFrame, frameBytes: Int, nFrames: Int): DataFrame =
    packed.select(
      col("media_id"),
      explode(sequence(lit(0), lit(nFrames - 1))).as("frame_no"),
      col("payload"))
      .select(
        col("media_id"), col("frame_no"),
        expr(s"substring(payload, frame_no * $frameBytes + 1, $frameBytes)")
          .as("frame_bytes"))
}
