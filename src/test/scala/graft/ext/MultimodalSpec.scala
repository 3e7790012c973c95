package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Multimodal plumbing: schema shape, stub decode determinism, frame
  * sampling — the Spark-side contract a real codec drops into. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def packed() = {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "hello world"), (2L, ""), (3L, "x" * 200))
      .toDF("id", "text")
      .withColumn("payload", to_binary(col("text"), lit("utf-8")))
    Multimodal.pack(df, "id", "payload", "image/jpeg", "unit-test")
  }

  test("pack produces (media_id, payload, metadata) with typed metadata") {
    val df = packed()
    assert(df.columns.toSeq == Seq("media_id", "payload", "metadata"))
    val meta = df.schema("metadata").dataType
    assert(meta == Multimodal.metadataType)
    val r = df.filter(col("media_id") === 1).select("metadata.media_type", "metadata.source")
      .head()
    assert(r.getString(0) == "image/jpeg" && r.getString(1) == "unit-test")
  }

  test("extractFeatures appends decoder columns; md5/len/frames are exact") {
    val out = Multimodal.extractFeatures(packed())
    val r = out.filter(col("media_id") === 1)
      .select("byte_len", "content_md5", "frame_count").head()
    assert(r.getLong(0) == 11L)
    assert(r.getString(1) == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(r.getInt(2) == 1)
    val big = out.filter(col("media_id") === 3).select("frame_count").head().getInt(0)
    assert(big == 1 + 200 / 64)
    val dim = out.filter(col("media_id") === 2).select(size(col("feature"))).head().getInt(0)
    assert(dim == Multimodal.StubDecoder.FeatureDim)
  }

  test("StubDecoder is deterministic and empty-safe") {
    val a = Multimodal.StubDecoder.decode("abc".getBytes("UTF-8"))
    val b = Multimodal.StubDecoder.decode("abc".getBytes("UTF-8"))
    assert(a._2 == b._2 && a._4.toSeq == b._4.toSeq)
    val e = Multimodal.StubDecoder.decode(Array.emptyByteArray)
    assert(e._1 == 0L && e._3 == 1 && e._4.toSeq.forall(_ == 0.0f))
  }

  /** A golden w×h image: left half black, right half white — its 8-bin
    * luminance histogram must be exactly [0.5, 0, 0, 0, 0, 0, 0, 0.5]. */
  private def goldenImage(format: String, w: Int = 4, h: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  test("ImageDecoder decodes golden PNG and BMP bit-exactly") {
    for (fmt <- Seq("png", "bmp")) {
      val Some((w, h, feat)) = Multimodal.ImageDecoder.decode(goldenImage(fmt))
      assert(w == 4 && h == 4, s"$fmt dimensions")
      assert(feat.toSeq == Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f),
        s"$fmt luminance histogram")
    }
  }

  test("ImageDecoder degrades to None on non-image and empty payloads") {
    assert(Multimodal.ImageDecoder.decode("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.ImageDecoder.decode(Array.emptyByteArray).isEmpty)
    assert(Multimodal.ImageDecoder.decode(null).isEmpty)
  }

  test("decodeImages: real decode per row, nulls for undecodable payloads") {
    val spark0 = spark
    import spark0.implicits._
    val png = goldenImage("png")
    val df = Seq((1L, png), (2L, "plain text".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.decodeImages(
      Multimodal.pack(df, "id", "payload", "image/png", "unit-test"))
    val ok = out.filter(col("media_id") === 1)
      .select("width", "height", "byte_len", "feature").head()
    assert(ok.getInt(0) == 4 && ok.getInt(1) == 4)
    assert(ok.getLong(2) == png.length.toLong)
    assert(ok.getSeq[Float](3) == Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f))
    val miss = out.filter(col("media_id") === 2)
      .select("width", "height", "feature", "content_md5").head()
    assert(miss.isNullAt(0) && miss.isNullAt(1) && miss.isNullAt(2))
    assert(miss.getString(3).length == 32) // hash still computed for every row
  }

  test("sampleFrames slices deterministic byte windows per frame") {
    val out = Multimodal.sampleFrames(packed().filter(col("media_id") === 3),
      frameBytes = 50, nFrames = 3)
    val rows = out.orderBy("frame_no").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(rows.forall(_.getAs[Array[Byte]]("frame_bytes").length == 50))
  }

  test("resizeImage: exact nearest-neighbor pixel mapping, None on junk") {
    // synth(5): pixels 0..4 white of 16 (4x4 row-major). NN 2x2 samples
    // linear indices 0,2,8,10 → white, white, black, black.
    val png = Multimodal.resizeImage(Multimodal.syntheticImage(5L), 2, 2).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 2 && img.getHeight == 2)
    def white(x: Int, y: Int) = (img.getRGB(x, y) & 0xffffff) == 0xffffff
    assert(white(0, 0) && white(1, 0) && !white(0, 1) && !white(1, 1))
    // upscale hits every source pixel at least once and stays decodable
    val up = Multimodal.resizeImage(Multimodal.syntheticImage(5L), 8, 8).get
    val upImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(up))
    assert(upImg.getWidth == 8 && upImg.getHeight == 8)
    assert(Multimodal.resizeImage("not an image".getBytes, 2, 2).isEmpty)
    assert(Multimodal.resizeImage(Array.emptyByteArray, 2, 2).isEmpty)
  }

  test("AudioDecoder: exact PCM walk on golden WAV, None on junk") {
    // synth(5): 5 of 16 segments at amplitude exactly 0.5 → mean 5/32
    val Some((rate, n, mean)) =
      Multimodal.AudioDecoder.decode(Multimodal.syntheticWav(5L))
    assert(rate == 8000 && n == 160L)
    assert(mean == 5.0 / 32)
    // silence decodes to exactly zero
    assert(Multimodal.AudioDecoder.decode(Multimodal.syntheticWav(0L))
      .contains((8000, 160L, 0.0)))
    assert(Multimodal.AudioDecoder.decode("not audio".getBytes).isEmpty)
    assert(Multimodal.AudioDecoder.decode(Array.emptyByteArray).isEmpty)
    // an image is not audio, and vice versa — the decoders don't cross
    assert(Multimodal.AudioDecoder.decode(Multimodal.syntheticImage(3L)).isEmpty)
    assert(Multimodal.ImageDecoder.decode(Multimodal.syntheticWav(3L)).isEmpty)
  }

  test("perceptualHash: exact bits on goldens; survives re-encode/resize") {
    // synth(5) at 4x4 grid = identity sampling: mean ⌊255·5/16⌋, white
    // cells ≥ mean, black below → first 5 bits set MSB-first
    val h5 = Multimodal.perceptualHash(Multimodal.syntheticImage(5L), 4, 4)
    assert(h5.contains((0xffffL << (16 - 5)) & 0xffffL))
    // flat image (w=0): integer mean 0, every cell passes ≥ 0 → all set
    assert(Multimodal.perceptualHash(Multimodal.syntheticImage(0L), 4, 4)
      .contains(0xffffL))
    // THE aHash property: a 2x resize + PNG re-encode changes the
    // content md5 but must keep the perceptual hash
    val up = Multimodal.resizeImage(Multimodal.syntheticImage(5L), 8, 8).get
    assert(Multimodal.perceptualHash(up, 4, 4) == h5)
    assert(!java.util.Arrays.equals(up, Multimodal.syntheticImage(5L)))
    // junk and empty degrade to None, oversized grids are rejected
    assert(Multimodal.perceptualHash("not an image".getBytes, 4, 4).isEmpty)
    assert(Multimodal.perceptualHash(Array.emptyByteArray).isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.perceptualHash(Multimodal.syntheticImage(1L), 9, 9)
    }
  }

  test("hashImages appends (phash, phash_bits); nulls for undecodable rows") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (1L, Multimodal.syntheticImage(5L)),
      (2L, "junk".getBytes),
      (3L, Multimodal.syntheticImage(0L)))
      .toDF("id", "payload")
    val packed = Multimodal.pack(rows, "id", "payload", "image/png", "unit-test")
    val got = Multimodal.hashImages(packed, 4, 4)
      .select("media_id", "phash", "phash_bits")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getInt(2))))).toMap
    assert(got(1L) == Some((0xf800L, 5)))
    assert(got(2L) == None)
    assert(got(3L) == Some((0xffffL, 16)))
  }
}
