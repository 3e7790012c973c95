package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — treat image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extract / frame-sample as partition-local batch
  * transforms.
  *
  * Three decoders share the same contract (bytes in, plain values out,
  * one call per row, no Spark types):
  *   - [[ImageDecoder]] — REAL, pure-JVM `javax.imageio` decode
  *     (PNG/BMP/GIF/JPEG ship in every JDK), exercised end-to-end by
  *     the `multimodal_decode` / `multimodal_resize` differential
  *     queries;
  *   - [[AudioDecoder]] — REAL, pure-JVM `javax.sound.sampled` WAV/PCM
  *     decode, exercised end-to-end by `multimodal_audio`;
  *   - [[StubDecoder]] — a clearly-marked deterministic fake standing
  *     in for codecs that do NOT ship in a bare JVM (video, compressed
  *     audio); it keeps that feature pipeline testable byte-exactly.
  * Everything Spark-side — schema, batch shape, partitioning, the
  * mapPartitions plumbing — is identical for both; a GPU/production
  * codec drops in by replacing one function.
  */
object Multimodal {

  // ImageIO's default stream cache spills EVERY read/write through a
  // temp file — per-call disk I/O that dominates small-image codec work
  // (measured ~2× on the 4×4 differential fixtures, worse on real lakes
  // where executor tmp is network-backed). The blobs here are already
  // in-memory byte arrays; heap-backed streams are strictly better.
  // JVM-global, set once per executor at class load.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** REAL image decoder — pure JVM, no external dependency: the
    * PNG/BMP/GIF/JPEG readers of `javax.imageio` ship in every JDK.
    * Same shape of contract as [[StubDecoder]] (bytes in, plain values
    * out, one call per row, no Spark types); returns None when the
    * payload is not a decodable image so callers can degrade per row
    * instead of failing the partition. The feature is an 8-bin
    * luminance histogram normalized by pixel count — deterministic,
    * so specs pin exact values on golden images. */
  object ImageDecoder {
    val FeatureDim = 8
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      if (bytes == null || bytes.isEmpty) return None
      val img =
        // NonFatal, not just IOException: the JDK readers throw
        // RuntimeExceptions (AIOOBE, IllegalArgument) on malformed
        // headers, and one bad blob must degrade per row, not fail
        // the partition
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Float](FeatureDim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum * FeatureDim / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        var i = 0
        while (i < FeatureDim) { hist(i) /= n; i += 1 }
        Some((w, h, hist))
      }
    }
  }

  /** Output of the REAL image-decode stage, per blob. */
  val imageFeatureType: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("content_md5", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType))))

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

  /** Deterministic 4×4 synthetic PNG: the first `k % 17` of the 16
    * pixels (row-major) are white, the rest black. Exists so the REAL
    * decode path can be differentially verified — the decoded luminance
    * histogram of this image is pure arithmetic on k (white → bin 7,
    * black → bin 0), which a SQL oracle computes without any codec. */
  def syntheticImage(k: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val white = (k % 17).toInt
    var i = 0
    while (i < 16) {
      img.setRGB(i % 4, i / 4, if (i < white) 0xffffff else 0x000000)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode/feature-extract: same mapPartitions shape as
    * [[extractFeatures]] but through [[ImageDecoder]]. Hash and length
    * are computed for every row; width/height/feature are null for
    * payloads that aren't decodable images (a mixed-media lake is the
    * normal case, not an error). Partition-local, stateless, no
    * collects — swap the decoder body for a GPU codec and nothing else
    * changes at 100 TB. */
  def decodeImages(packed: DataFrame): DataFrame = {
    val outSchema = StructType(packed.schema.fields ++ imageFeatureType.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.mapPartitions { rows =>
      rows.map { r =>
        val raw = r.getAs[Array[Byte]]("payload")
        val bytes = if (raw == null) Array.emptyByteArray else raw
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString
        ImageDecoder.decode(bytes) match {
          case Some((w, h, feat)) =>
            Row.fromSeq(r.toSeq ++ Seq(bytes.length.toLong, md5, w, h, feat.toSeq))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(bytes.length.toLong, md5, null, null, null))
        }
      }
    }(enc)
  }

  /** REAL audio decoder — pure JVM: the WAV/PCM readers of
    * `javax.sound.sampled` ship in every JDK, so the audio half of the
    * multimodal surface needs no stub either. Decodes the payload,
    * walks channel-0 16-bit samples, and returns
    * `(sampleRate, nFrames, meanAbs)` where meanAbs is the average
    * absolute amplitude normalized to [0,1] — accumulated in DOUBLE so
    * synthetic fixtures with power-of-two amplitudes verify bit-exactly.
    * None when the payload isn't decodable audio (mixed-media lake =
    * normal case) or isn't 16-bit PCM. */
  object AudioDecoder {
    def decode(bytes: Array[Byte]): Option[(Int, Long, Double)] = {
      if (bytes == null || bytes.isEmpty) return None
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (in == null) return None
      try {
        val fmt = in.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16
        if (!ok) None
        else {
          val frameSize = fmt.getFrameSize
          val data = in.readAllBytes()
          val nFrames = data.length / frameSize
          var sum = 0.0
          var i = 0
          val le = !fmt.isBigEndian
          while (i < nFrames) {
            val base = i * frameSize // channel 0 leads each frame
            val s =
              if (le) ((data(base) & 0xff) | (data(base + 1) << 8)).toShort
              else ((data(base + 1) & 0xff) | (data(base) << 8)).toShort
            sum += math.abs(s / 32768.0)
            i += 1
          }
          Some((fmt.getSampleRate.toInt, nFrames.toLong,
            if (nFrames == 0) 0.0 else sum / nFrames))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally in.close()
    }
  }

  /** Output of the REAL audio-decode stage, per blob. */
  val audioFeatureType: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("content_md5", StringType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("mean_abs", DoubleType)))

  /** Deterministic synthetic WAV: 16 segments of 10 frames each,
    * PCM16 mono 8 kHz; the first `k % 17` segments hold +0x4000
    * (amplitude exactly 0.5), the rest silence — so the decoded mean
    * absolute amplitude is `(k % 17) / 32`, pure arithmetic a SQL
    * oracle computes with no codec (the audio analog of
    * [[syntheticImage]]). */
  def syntheticWav(k: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val loud = (k % 17).toInt
    val pcm = new Array[Byte](16 * 10 * 2)
    var s = 0
    while (s < 160) {
      val v = if (s / 10 < loud) 0x4000 else 0
      pcm(2 * s) = (v & 0xff).toByte
      pcm(2 * s + 1) = ((v >> 8) & 0xff).toByte
      s += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 160)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode: same mapPartitions shape as [[decodeImages]],
    * through [[AudioDecoder]]. Hash and length for every row; rate/
    * samples/amplitude null for payloads that aren't decodable PCM. */
  def decodeAudio(packed: DataFrame): DataFrame = {
    val outSchema = StructType(packed.schema.fields ++ audioFeatureType.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.mapPartitions { rows =>
      rows.map { r =>
        val raw = r.getAs[Array[Byte]]("payload")
        val bytes = if (raw == null) Array.emptyByteArray else raw
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString
        AudioDecoder.decode(bytes) match {
          case Some((rate, n, mean)) =>
            Row.fromSeq(r.toSeq ++ Seq(bytes.length.toLong, md5, rate, n, mean))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(bytes.length.toLong, md5, null, null, null))
        }
      }
    }(enc)
  }

  /** REAL nearest-neighbor resize of one image payload: decode, remap
    * pixels with the engine's OWN `src = (dst · srcDim) / dstDim`
    * sampling (Graphics2D's scalers are implementation-dependent; this
    * is deterministic everywhere), re-encode as PNG. None when the
    * payload doesn't decode. */
  def resizeImage(bytes: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] = {
    require(dstW > 0 && dstH > 0, s"resize target must be positive: ${dstW}x$dstH")
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val out = new java.awt.image.BufferedImage(
        dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < dstH) {
        val sy = y * img.getHeight / dstH
        var x = 0
        while (x < dstW) {
          out.setRGB(x, y, img.getRGB(x * img.getWidth / dstW, sy))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** Output of the resize stage, per blob. */
  val resizeType: StructType = StructType(Seq(
    StructField("resized_payload", BinaryType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType)))

  /** REAL batch resize — the thumbnail/normalize-resolution stage of an
    * image-training pipeline, same mapPartitions shape as
    * [[decodeImages]]: partition-local, stateless, no collects.
    * Undecodable payloads pass through with null resize columns (mixed
    * media is the normal case, not an error). */
  def resizeImages(packed: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    val outSchema = StructType(packed.schema.fields ++ resizeType.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.mapPartitions { rows =>
      rows.map { r =>
        val raw = r.getAs[Array[Byte]]("payload")
        resizeImage(if (raw == null) Array.emptyByteArray else raw, dstW, dstH) match {
          case Some(png) => Row.fromSeq(r.toSeq ++ Seq(png, dstW, dstH))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
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

  /** Perceptual average-hash (aHash) of one image payload: decode,
    * nearest-neighbor-sample a `gridW×gridH` luminance grid with the
    * engine's OWN deterministic `src = dst·srcDim/dstDim` mapping (the
    * same sampling [[resizeImage]] uses), then threshold each cell at
    * the integer mean — bit set iff `lum ≥ mean`, MSB-first row-major.
    * All-integer, so identical on every JVM; tolerant of re-encoding
    * and resizing (the property dedup wants), unlike the exact content
    * md5 [[decodeImages]] also emits. None when the payload doesn't
    * decode; grids up to 8×8 fit the LONG. */
  def perceptualHash(bytes: Array[Byte], gridW: Int = 8, gridH: Int = 8): Option[Long] = {
    require(gridW > 0 && gridH > 0 && gridW * gridH <= 64,
      s"aHash grid must fit 64 bits: ${gridW}x$gridH")
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val n = gridW * gridH
      val lum = new Array[Int](n)
      var sum = 0L
      var y = 0
      while (y < gridH) {
        val sy = y * img.getHeight / gridH
        var x = 0
        while (x < gridW) {
          val rgb = img.getRGB(x * img.getWidth / gridW, sy)
          val l = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          lum(y * gridW + x) = l
          sum += l
          x += 1
        }
        y += 1
      }
      val mean = sum / n // integer mean: exact, codec-independent
      var hash = 0L
      var i = 0
      while (i < n) {
        if (lum(i) >= mean) hash |= 1L << (n - 1 - i)
        i += 1
      }
      Some(hash)
    }
  }

  /** Output of the perceptual-hash stage, per blob. */
  val phashType: StructType = StructType(Seq(
    StructField("phash", LongType),
    StructField("phash_bits", IntegerType)))

  /** Batch perceptual hashing — the near-duplicate-image screen of a
    * multimodal training pipeline (exact-md5 dedup misses re-encoded /
    * resized copies; matching aHashes, or hashes within a small
    * Hamming radius via a banded self-join on hash prefixes, catch
    * them). Same mapPartitions shape as [[decodeImages]]:
    * partition-local, stateless, no collects. Undecodable payloads
    * pass through with null hash columns. */
  def hashImages(packed: DataFrame, gridW: Int = 8, gridH: Int = 8): DataFrame = {
    val outSchema = StructType(packed.schema.fields ++ phashType.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.mapPartitions { rows =>
      rows.map { r =>
        val raw = r.getAs[Array[Byte]]("payload")
        perceptualHash(if (raw == null) Array.emptyByteArray else raw, gridW, gridH) match {
          case Some(h) =>
            // Seq[Any]: a plain Seq(Long, Int) would unify to Seq[Long]
            // and silently widen the bit count past the INT field type
            Row.fromSeq(r.toSeq ++ Seq[Any](h, java.lang.Long.bitCount(h)))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null))
        }
      }
    }(enc)
  }
}
