package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("featurize: schema contract, determinism across partitionings, no binary in output") {
    val media = Multimodal.syntheticMedia(spark, 50)
    val f1 = Multimodal.featurize(media, dim = 8)
    assert(f1.schema.fieldNames.toSeq === Seq("media_id", "format", "features"))
    assert(!f1.schema.fieldNames.contains("content"))
    val a = f1.orderBy("media_id").collect().map(r => (r.getLong(0), r.getSeq[Float](2)))
    // different physical partitioning must not change features (stub is
    // content-deterministic, the plumbing adds no nondeterminism)
    val b = Multimodal.featurize(media.repartition(7), dim = 8)
      .orderBy("media_id").collect().map(r => (r.getLong(0), r.getSeq[Float](2)))
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_._2.length === 8))
  }

  test("frame sampling emits strided fixed-size slices per media row") {
    val media = Multimodal.syntheticMedia(spark, 5)
    val frames = Multimodal.sampleFrames(media, frameSize = 64, stride = 4)
    val perDoc = frames.groupBy("media_id").agg(count(lit(1)).as("n"), max(length(col("frame_bytes"))).as("sz"))
      .collect()
    assert(perDoc.nonEmpty)
    assert(perDoc.forall(_.getInt(2) <= 64))
    // content is 17 md5 hex strings = 544 bytes -> 8 full slices, stride 4 -> ceil(8/4)=2
    assert(perDoc.forall(_.getLong(1) === 2))
  }

  test("byte-weighted repartition sizes by payload, not row count") {
    val media = Multimodal.syntheticMedia(spark, 100)
    // 100 rows x 544B = ~54KB -> at 8KB/partition target: ~7 partitions
    val rp = Multimodal.repartitionForMedia(media, targetBytesPerPartition = 8192)
    assert(rp.rdd.getNumPartitions === 7)
  }

  test("resize stub truncates/pads to the pixel budget and updates metadata") {
    val media = Multimodal.syntheticMedia(spark, 4)
    val resized = Multimodal.resizeStub(media, 16, 16) // 256-byte budget
    val rows = resized.collect()
    assert(rows.forall(_.getAs[Array[Byte]]("content").length === 256))
    val meta = resized.select("meta.width", "meta.height").distinct().collect().head
    assert((meta.getInt(0), meta.getInt(1)) === ((16, 16)))
    // schema contract preserved: still (media_id, content, meta)
    assert(resized.schema.fieldNames.toSeq === Seq("media_id", "content", "meta"))
  }

  /** A drop-in codec: proves the operators run against the trait, not the
    * stub — what plugging a real JPEG/WAV library in looks like. */
  private object TestCodec extends Multimodal.MediaCodec {
    override def decodeToFeatures(bytes: Array[Byte], format: String, dim: Int): Array[Float] = {
      // format-sensitive on purpose: asserts the operator threads the
      // typed metadata through to the codec
      val base = if (format == "jpeg") 1.0f else 2.0f
      Array.tabulate(dim)(i => base + (if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff))
    }
    override def resize(bytes: Array[Byte], format: String,
                        targetW: Int, targetH: Int, bytesPerPixel: Int): Array[Byte] =
      bytes.reverse.take(targetW * targetH * bytesPerPixel)
  }

  test("a custom MediaCodec is a drop-in for featurize and resize") {
    val media = Multimodal.syntheticMedia(spark, 10)
    val feats = Multimodal.featurize(media, dim = 4, codec = TestCodec)
      .orderBy("media_id").collect()
    assert(feats.length === 10 && feats.forall(_.getSeq[Float](2).length === 4))
    // the codec saw the format from the typed metadata (jpeg=even ids)
    feats.foreach { r =>
      val base = if (r.getLong(0) % 2 == 0) 1.0f else 2.0f
      assert(r.getSeq[Float](2).forall(f => f >= base && (f - base) % 1.0f === 0.0f),
        s"codec did not receive the row's format: $r")
    }
    val resized = Multimodal.resize(media, 4, 4, codec = TestCodec).collect()
    val original = media.orderBy("media_id").collect()
    assert(resized.forall(_.getAs[Array[Byte]]("content").length === 16))
    // TestCodec reverses: first resized byte == last original byte
    val lastOrig = original.head.getAs[Array[Byte]]("content").last
    assert(resized.minBy(_.getLong(0)).getAs[Array[Byte]]("content").head === lastOrig)
  }

  // ---- BmpCodec: a REAL pure-JVM decoder through the same boundary ----

  /** 4x4 24-bit BMP: left half black, right half white. */
  private def halfAndHalfBmp: Array[Byte] = {
    val rows = Array.tabulate(4, 12) { (_, i) =>
      if (i / 3 < 2) 0.toByte else 0xff.toByte
    }
    graft.operators.BmpCodec.encode(4, 4, rows)
  }

  test("BmpCodec: encode -> decode pools exact grid luminance; resize is nearest-neighbor") {
    import graft.operators.BmpCodec
    val bmp = halfAndHalfBmp
    // dim=4 -> 2x2 grid: (black, white, black, white) exactly
    assert(BmpCodec.decodeToFeatures(bmp, "bmp", 4).toSeq ===
      Seq(0.0f, 1.0f, 0.0f, 1.0f))
    // nearest-neighbor downscale to 2x2 keeps the halves, and the
    // re-encoded payload decodes to the same grid
    val small = BmpCodec.resize(bmp, "bmp", 2, 2, bytesPerPixel = 3)
    assert(BmpCodec.decodeToFeatures(small, "bmp", 4).toSeq ===
      Seq(0.0f, 1.0f, 0.0f, 1.0f))
    // malformed input fails loudly, not silently
    intercept[IllegalArgumentException] {
      BmpCodec.decodeToFeatures(Array.fill[Byte](100)(7), "bmp", 4)
    }
  }

  test("WavCodec: RMS pooling is exact on square waves; resample keeps amplitude") {
    import graft.operators.WavCodec
    // 400 samples: first half silent, second half full-scale square wave
    val samples = Array.tabulate(400)(i =>
      if (i < 200) 0.toShort
      else if (i % 2 == 0) 32767.toShort else (-32767).toShort)
    val wav = WavCodec.encode(8000, samples)
    val f = WavCodec.decodeToFeatures(wav, "wav", 2)
    assert(f(0) === 0.0f, s"silent half must pool to 0: ${f.toSeq}")
    // RMS of a +/-32767 square wave is 32767/32768
    assert(math.abs(f(1) - 32767.0f / 32768.0f) < 1e-6f, s"got ${f.toSeq}")
    // nearest-neighbor resample to a 100-sample budget (50x1x2 bytes)
    val small = WavCodec.resize(wav, "wav", 50, 1, 2)
    val f2 = WavCodec.decodeToFeatures(small, "wav", 2)
    assert(f2(0) === 0.0f && math.abs(f2(1) - 32767.0f / 32768.0f) < 1e-6f,
      s"resample lost the halves: ${f2.toSeq}")
    intercept[IllegalArgumentException] {
      WavCodec.decodeToFeatures(Array.fill[Byte](100)(3), "wav", 2)
    }
  }

  test("BmpCodec drives the distributed featurize operator end to end") {
    import org.apache.spark.sql.Row
    val rows = java.util.Arrays.asList(
      Row(1L, halfAndHalfBmp, Row("bmp", 4, 4, null)),
      Row(2L, graft.operators.BmpCodec.encode(2, 2,
        Array.tabulate(2, 6)((_, _) => 0xff.toByte)), Row("bmp", 2, 2, null)),
      // a NULL blob must featurize to NULL, not reach the codec (a real
      // decoder throws on empty input — one null row must not kill the job)
      Row(3L, null, Row("bmp", 0, 0, null)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val feats = Multimodal.featurize(media, dim = 4, codec = graft.operators.BmpCodec)
      .orderBy("media_id").collect()
    assert(feats(0).getSeq[Float](2) === Seq(0.0f, 1.0f, 0.0f, 1.0f))
    assert(feats(1).getSeq[Float](2) === Seq(1.0f, 1.0f, 1.0f, 1.0f),
      "an all-white 2x2 image must pool to all-ones")
    assert(feats(2).isNullAt(2), "null content must yield null features")
  }

  // ---- ImageIoCodec: JPEG/PNG via the JDK's own javax.imageio ----

  test("ImageIoCodec: PNG round-trip pools exact grid luminance; resize is nearest-neighbor") {
    import graft.operators.ImageIoCodec
    // 4x4 left-black right-white, PNG (lossless -> exact features)
    val rgb = Array.tabulate(16)(i => if (i % 4 < 2) 0x000000 else 0xffffff)
    val png = ImageIoCodec.encode(4, 4, rgb, "png")
    assert(ImageIoCodec.decodeToFeatures(png, "png", 4).toSeq ===
      Seq(0.0f, 1.0f, 0.0f, 1.0f))
    val small = ImageIoCodec.resize(png, "png", 2, 2, bytesPerPixel = 3)
    assert(ImageIoCodec.dimensions(small) === ((2, 2)))
    assert(ImageIoCodec.decodeToFeatures(small, "png", 4).toSeq ===
      Seq(0.0f, 1.0f, 0.0f, 1.0f))
    // garbage fails loudly (ImageIO returns null readers, codec throws)
    intercept[IllegalArgumentException] {
      ImageIoCodec.decodeToFeatures(Array.fill[Byte](64)(9), "png", 4)
    }
  }

  test("ImageIoCodec: a REAL JPEG decodes and resizes through the boundary") {
    import graft.operators.ImageIoCodec
    // solid mid-gray: JPEG is lossy but a flat field survives the DCT
    // almost exactly, so the pooled luminance is pinned within tolerance
    val gray = Array.fill(64)(0x808080)
    val jpeg = ImageIoCodec.encode(8, 8, gray, "jpeg")
    // JFIF magic: this really is a JPEG, not a renamed bitmap
    assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8,
      "missing JPEG SOI marker")
    val f = ImageIoCodec.decodeToFeatures(jpeg, "jpeg", 4)
    val want = (0x80 * 3) / 765.0f
    assert(f.forall(v => math.abs(v - want) < 0.05), s"gray pooled to ${f.toSeq}")
    val small = ImageIoCodec.resize(jpeg, "jpeg", 4, 4, bytesPerPixel = 3)
    assert((small(0) & 0xff) === 0xff && (small(1) & 0xff) === 0xd8,
      "resize must re-encode as JPEG")
    assert(ImageIoCodec.dimensions(small) === ((4, 4)))
    val f2 = ImageIoCodec.decodeToFeatures(small, "jpeg", 4)
    assert(f2.forall(v => math.abs(v - want) < 0.05), s"resized gray: ${f2.toSeq}")
  }

  test("ImageIoCodec and BmpCodec agree bit-for-bit on the same BMP bytes") {
    import graft.operators.{BmpCodec, ImageIoCodec}
    val bmp = halfAndHalfBmp
    assert(ImageIoCodec.decodeToFeatures(bmp, "bmp", 4).toSeq ===
      BmpCodec.decodeToFeatures(bmp, "bmp", 4).toSeq,
      "the two decoders pool the same pixels with the same arithmetic")
  }

  test("ImageIoCodec drives the distributed featurize operator on real JPEGs") {
    import org.apache.spark.sql.Row
    import graft.operators.ImageIoCodec
    val jpeg = ImageIoCodec.encode(8, 8, Array.fill(64)(0x808080), "jpeg")
    val png = ImageIoCodec.encode(4, 4,
      Array.tabulate(16)(i => if (i % 4 < 2) 0x000000 else 0xffffff), "png")
    val rows = java.util.Arrays.asList(
      Row(1L, jpeg, Row("jpeg", 8, 8, null)),
      Row(2L, png, Row("png", 4, 4, null)),
      Row(3L, null, Row("jpeg", 0, 0, null)))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val feats = Multimodal.featurize(media, dim = 4, codec = ImageIoCodec)
      .orderBy("media_id").collect()
    val want = (0x80 * 3) / 765.0f
    assert(feats(0).getSeq[Float](2).forall(v => math.abs(v - want) < 0.05))
    assert(feats(1).getSeq[Float](2) === Seq(0.0f, 1.0f, 0.0f, 1.0f))
    assert(feats(2).isNullAt(2), "null content must yield null features")
  }

  test("codec header validation: bad BMP pixel offset and short WAV fmt chunk fail loudly") {
    import java.nio.{ByteBuffer, ByteOrder}
    // valid BMP, then corrupt the pixel-array offset to point INSIDE the
    // headers — silent acceptance would pool header bytes as pixels
    val bmp = halfAndHalfBmp
    ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN).putInt(10, 0)
    intercept[IllegalArgumentException] {
      graft.operators.BmpCodec.decodeToFeatures(bmp, "bmp", 4)
    }
    // valid WAV, then shrink the fmt chunk below the 16 bytes its fields
    // occupy — reads past it would misparse the next chunk as fields
    val wav = graft.operators.WavCodec.encode(8000, Array[Short](1, 2, 3, 4))
    ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN).putInt(16, 8)
    intercept[IllegalArgumentException] {
      graft.operators.WavCodec.decodeToFeatures(wav, "wav", 2)
    }
  }
}
