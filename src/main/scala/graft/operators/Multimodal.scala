package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and
  * decode/featurize/frame-sample run as partition-wise batch operators.
  *
  * The DEFAULT decode is a STUB (a clearly-marked deterministic fake,
  * kept for plumbing tests and for the formats the JDK cannot decode —
  * MP3/video), but the boundary is proven real by three codecs through
  * the same [[MediaCodec]] trait and the same operators: [[BmpCodec]]
  * (from-scratch 24-bit BMP), [[WavCodec]] (PCM16 WAV), and
  * [[ImageIoCodec]] (JPEG/PNG/GIF/BMP via the JDK's own
  * `javax.imageio` — real compressed-image decode with no external
  * library). MultimodalSpec drives all of them. The Spark-side plumbing is real and
  * tested: schema contract, partition-wise iterator batching (the Scala
  * analogue of `mapInPandas` — one buffer per partition, no per-row
  * JNI/process round-trips), partition sizing, and zero-copy
  * pass-through of rows that don't need decoding.
  *
  * At 100 TB: binaries dominate row size, so operators here avoid shuffling
  * the binary column (featurize projects it away as early as possible) and
  * `repartitionForMedia` right-sizes partitions by estimated byte weight,
  * not row count.
  */
object Multimodal {

  /** Typed metadata carried beside every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", mediaMetaType)))

  /** The pluggable decode boundary: everything that needs an actual media
    * library lives behind this trait, so dropping a real JPEG/WAV decoder
    * into the pipeline is implementing an interface, not editing the
    * operators. Implementations are shipped to executors inside the task
    * closure — hold any heavy native context in a `@transient lazy val`
    * so it is (re)created once per executor JVM, never serialized, and
    * amortized across the partition-wise batch loops in [[featurize]] /
    * [[resize]]. */
  trait MediaCodec extends Serializable {
    /** Decode one blob into a fixed-dim feature vector (e.g. decode +
      * pooled embedding). `bytes` is never null or empty — [[featurize]]
      * emits NULL features for null/empty blobs without calling the
      * codec, so implementations are free to reject malformed input
      * loudly. */
    def decodeToFeatures(bytes: Array[Byte], format: String, dim: Int): Array[Float]
    /** Decode, scale to targetW x targetH, re-encode. Returns the new
      * payload bytes. */
    def resize(bytes: Array[Byte], format: String,
               targetW: Int, targetH: Int, bytesPerPixel: Int): Array[Byte]
  }

  /** STUB codec — deterministic fakes so the distributed plumbing around
    * the codec (schema contract, batching, partition sizing, metadata
    * updates) is testable independently of any real decode, and the
    * stand-in for formats with no JDK decoder (MP3, video). For actual
    * images use [[ImageIoCodec]] (JPEG/PNG/GIF/BMP, JDK-only); for a
    * from-scratch reference, [[BmpCodec]]/[[WavCodec]]. */
  object StubMediaCodec extends MediaCodec {
    // ??? <- real MP3/video codec goes here (needs a library the JDK lacks)
    override def decodeToFeatures(bytes: Array[Byte], format: String, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // deterministic FNV-ish fold over the bytes
      var i = 0
      while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
      var j = 0
      while (j < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(j) = ((h >>> 33).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
    // ??? <- real codec resize goes here; the stub truncates/pads to the
    // byte budget implied by the target dimensions
    override def resize(bytes: Array[Byte], format: String,
                        targetW: Int, targetH: Int, bytesPerPixel: Int): Array[Byte] = {
      val budget = targetW * targetH * bytesPerPixel
      java.util.Arrays.copyOf(bytes, budget)
    }
  }

  /** Featurize media partition-wise (mapPartitions = the batch shape of
    * mapInPandas): one iterator pass per partition, binary column consumed
    * and NOT carried into the output (keeps the shuffle-facing row thin).
    * The decode itself is `codec`'s job — swap in a real implementation
    * without touching the operator. Null/empty blobs never reach the
    * codec: they featurize to NULL (real decoders have nothing to decode
    * and must be free to reject empty input loudly — one null row must
    * not kill a 100 TB featurize job). */
  def featurize(media: DataFrame, dim: Int = 16,
                codec: MediaCodec = StubMediaCodec): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("format", StringType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val out: Dataset[Row] = media
      .select(col("media_id"), col("content"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        // batch loop: the codec's per-executor decode context (transient
        // lazy in the implementation) is amortized over the partition
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val fmt = r.getAs[String]("format")
          val feats =
            if (bytes == null || bytes.isEmpty) null
            else codec.decodeToFeatures(bytes, fmt, dim).toSeq
          Row(r.getAs[Long]("media_id"), fmt, feats)
        }
      }(enc)
    out.toDF()
  }

  /** STUB frame sampling: every `stride`-th FULL fixed-size slice of the
    * blob stands in for a decoded video frame; emits (media_id, frame_no,
    * frame_bytes) where frame_no is the SOURCE frame index (not the sample
    * ordinal). Blobs shorter than one frame yield zero frames, and the
    * partial tail of longer blobs is dropped — every emitted frame is
    * exactly `frameSize` bytes, which is what a downstream decoder
    * expects. */
  def sampleFrames(media: DataFrame, frameSize: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = (length(col("content")) / frameSize).cast("int")
    val frames = when(nFrames >= 1,
        filter(
          transform(sequence(lit(0), nFrames - 1),
            i => when(i % stride === 0,
              struct(i.as("frame_no"),
                substring(col("content"), i * frameSize + 1, lit(frameSize)).as("frame_bytes")))),
          f => f.isNotNull))
      .otherwise(array().cast("array<struct<frame_no:int,frame_bytes:binary>>"))
    media.select(col("media_id"), explode(frames).as("f"))
      .select(col("media_id"), col("f.frame_no"), col("f.frame_bytes"))
  }

  /** Resize every blob to targetW x targetH via the codec, updating the
    * typed metadata to match. The operator owns the distributed shape
    * (partition-wise batch loop, null pass-through, metadata rewrite);
    * the pixel work is `codec.resize` — [[StubMediaCodec]] by default
    * (deterministic truncate/pad to the implied byte budget), a real
    * decoder as a drop-in. */
  def resize(media: DataFrame, targetW: Int, targetH: Int,
             bytesPerPixel: Int = 1,
             codec: MediaCodec = StubMediaCodec): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val out: Dataset[Row] = media
      .select(col("media_id"), col("content"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val meta = r.getAs[Row]("meta")
          val fmt = if (meta == null) null else meta.getAs[String]("format")
          val resized =
            if (bytes == null) null
            else codec.resize(bytes, fmt, targetW, targetH, bytesPerPixel)
          val durationMs: Any = if (meta == null) null else meta.get(3)
          Row(r.getAs[Long]("media_id"), resized,
            Row(fmt, targetW, targetH, durationMs))
        }
      }(enc)
    out.toDF()
  }

  /** Back-compat alias for [[resize]] with the stub codec. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int,
                 bytesPerPixel: Int = 1): DataFrame =
    resize(media, targetW, targetH, bytesPerPixel)

  /** Right-size partitions by payload bytes, not row count: media rows are
    * wildly skewed in size, so a fixed rows-per-partition split makes some
    * tasks 100x heavier than others at scale. */
  def repartitionForMedia(media: DataFrame, targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    // coalesce(sum, 0): sum over zero rows is null, and an empty media
    // table should pass through rather than NPE
    val totalBytes = media
      .select(coalesce(sum(coalesce(length(col("content")), lit(0))), lit(0L)))
      .head().getLong(0)
    if (totalBytes == 0L) media
    else {
      val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerPartition).toInt)
      media.repartition(parts)
    }
  }

  /** Perceptual average-hash (aHash) per media row — the image-dedup
    * fingerprint: decode to the codec's 8x8 mean-luminance grid (the
    * SAME `decodeToFeatures(dim=64)` path every codec already
    * implements), threshold each cell against the image's own mean, and
    * pack the 64 bits MSB-first into one long. Robust to re-encoding,
    * resizing, and small edits — the things that defeat exact byte
    * hashing on a scraped image corpus. Null/empty blobs drop out (no
    * pixels, no hash). The threshold+pack is a pure HOF fold — the
    * binary column dies at featurize, and only (id, format, one long)
    * ride onward. */
  def perceptualHash(media: DataFrame, codec: MediaCodec = StubMediaCodec): DataFrame = {
    val feats = featurize(media, dim = 64, codec)
    feats.filter(col("features").isNotNull)
      .withColumn("__m", expr(
        "aggregate(features, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)) / 64.0"))
      // shiftleft, not acc * 2: the 64th fold wraps into the sign bit by
      // DESIGN, and ANSI mode (the session default) rejects a wrapping
      // multiply; the bitwise shift wraps silently and the +1 lands on a
      // cleared low bit, so no checked op can overflow
      .withColumn("phash", expr(
        "aggregate(features, 0L, (acc, x) -> shiftleft(acc, 1) + " +
          "(CASE WHEN CAST(x AS DOUBLE) > __m THEN 1L ELSE 0L END))"))
      .select(col("media_id"), col("format"), col("phash"))
  }

  /** Near-duplicate image pairs from a [[perceptualHash]] relation: the
    * 64-bit twin of [[Dedup.simhashNearDups]]' PIECE-SUBSET pigeonhole
    * blocking. Two hashes within `maxHamming` bits differ in at most
    * `maxHamming` of the `bands` equal pieces, so they agree in full on
    * some (bands − maxHamming)-piece subset whenever maxHamming < bands
    * (default 6 < 8) — blocking on all C(bands, s) subsets of size
    * s = bands − maxHamming is a candidate generator with NO false
    * negatives, and the exact `bit_count(xor)` verify runs only on
    * collisions. At the default geometry that is 28 two-piece 16-bit
    * keys per image instead of 8 one-piece 8-bit bands: 256× more
    * selective per key — the same candidate-collapse the text simhash
    * tier measured (−89 % at sf3). Keys pack into one long (subset
    * index, then the selected pieces); pieces mask with bitwiseAND, not
    * `%`: a 64-bit hash goes negative when cell 0 is above the mean,
    * and an arithmetic modulo would split equal piece bits across sign
    * classes. */
  def phashNearDups(hashes: DataFrame, maxHamming: Int = 6,
                    bands: Int = 8): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands, got $maxHamming >= $bands")
    val width = 64 / bands
    val s = bands - maxHamming
    val subsets = (0 until bands).combinations(s).toIndexedSeq
    require(subsets.size <= 256,
      s"phashNearDups: C($bands, $s) = ${subsets.size} subset keys per image " +
        "is past the fan-out budget — lower bands or raise maxHamming")
    // the packed key is (subset index << s·width) | piece bits, built by
    // shiftleft-then-add below — enforce the JOINT bit budget directly:
    // index bits + s·width must fit the 63 non-sign bits (a fan-out
    // guard of 256 subsets alone would let i >= 128 at s·width = 56
    // overflow the sign bit — round-12 ADVICE: the two separate requires
    // did not jointly guarantee the invariant, only today's geometries did)
    val idxBits =
      if (subsets.size <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros((subsets.size - 1).toLong)
    require(idxBits + s * width <= 63,
      s"phashNearDups: packed subset key needs $idxBits index bits + " +
        s"${s * width} piece bits > 63 — raise maxHamming or lower bands")
    val mask = (1L << width) - 1L
    val keyArr = array(subsets.zipWithIndex.map { case (ss, i) =>
      ss.foldLeft(lit(i.toLong): org.apache.spark.sql.Column) { (acc, piece) =>
        // shiftleft then add: acc * 2^width on a 56-bit prefix would pass
        // 2^63 under ANSI's checked multiply at extreme geometries
        shiftleft(acc, width) +
          shiftright(col("phash"), piece * width).bitwiseAND(lit(mask))
      }
    }: _*)
    val banded = hashes
      .select(col("media_id"), col("phash"))
      .repartition(col("media_id"))
      .select(col("media_id"), col("phash"), explode(keyArr).as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic synthetic media table for tests/demos. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      // deterministic pseudo-binary payload of varying size
      encode(concat_ws("", (0 to 16).map(i => md5(concat(col("id"), lit(i)))): _*), "UTF-8").as("content"),
      struct(
        when(col("id") % 2 === 0, "jpeg").otherwise("wav").as("format"),
        lit(640).as("width"), lit(480).as("height"),
        (col("id") * 1000).as("duration_ms")).as("meta"))
}
