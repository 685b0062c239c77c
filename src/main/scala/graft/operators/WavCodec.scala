package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL [[Multimodal.MediaCodec]] for PCM16 WAV — the AUDIO sibling of
  * [[BmpCodec]], again pure JVM arithmetic: together they prove the
  * codec boundary spans modalities (image grid pooling there, time-
  * bucket energy pooling here) without editing a single operator.
  *
  * Supported input: RIFF/WAVE with a PCM (`audioFormat = 1`) 16-bit
  * `fmt ` chunk and a `data` chunk; mono or interleaved multi-channel
  * (channels average into one stream before pooling). Anything else
  * throws `IllegalArgumentException` naming the offending field.
  *
  * `decodeToFeatures` pools root-mean-square amplitude over `dim` equal
  * time buckets, normalized to [0,1]: per-bucket integer accumulation of
  * squared samples, ONE division and one IEEE `sqrt` (correctly rounded,
  * so bit-deterministic) per bucket. `resize` maps the image-shaped
  * signature onto audio exactly as the stub documents: the target
  * byte budget `targetW * targetH * bytesPerPixel` becomes the output
  * sample count, filled by nearest-neighbor resampling and re-encoded
  * as mono PCM16 at the source rate. */
object WavCodec extends Multimodal.MediaCodec {

  /** (sampleRate, channels, dataOffset, dataBytes). */
  private def parseHeader(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 44, s"WavCodec: ${bytes.length} bytes is shorter than a WAV header")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.getInt(0) == 0x46464952, "WavCodec: missing RIFF magic") // "RIFF"
    require(b.getInt(8) == 0x45564157, "WavCodec: missing WAVE magic") // "WAVE"
    var pos = 12
    var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = b.getInt(pos)
      val len = b.getInt(pos + 4)
      require(len >= 0 && pos + 8 + len <= bytes.length,
        s"WavCodec: chunk at $pos overruns the buffer (len $len)")
      if (id == 0x20746d66) { // "fmt "
        require(len >= 16, s"WavCodec: fmt chunk too short ($len bytes, want >= 16)")
        val audioFormat = b.getShort(pos + 8).toInt
        val channels = b.getShort(pos + 10).toInt
        val rate = b.getInt(pos + 12)
        val bits = b.getShort(pos + 22).toInt
        require(audioFormat == 1, s"WavCodec: unsupported audio format $audioFormat (want PCM=1)")
        require(bits == 16, s"WavCodec: unsupported bit depth $bits (want 16)")
        require(channels >= 1, s"WavCodec: bad channel count $channels")
        fmt = Some((rate, channels))
      } else if (id == 0x61746164) { // "data"
        data = Some((pos + 8, len))
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    val (rate, channels) = fmt.getOrElse(
      throw new IllegalArgumentException("WavCodec: no fmt chunk"))
    val (off, len) = data.getOrElse(
      throw new IllegalArgumentException("WavCodec: no data chunk"))
    (rate, channels, off, len)
  }

  /** Channel-averaged sample at frame `i` (exact integer mean). */
  @inline private def frameAvg(b: ByteBuffer, off: Int, channels: Int, i: Int): Int = {
    var s = 0
    var c = 0
    while (c < channels) { s += b.getShort(off + (i * channels + c) * 2); c += 1 }
    s / channels
  }

  override def decodeToFeatures(bytes: Array[Byte], format: String, dim: Int): Array[Float] = {
    val (_, channels, off, len) = parseHeader(bytes)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val frames = len / (2 * channels)
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      // Long intermediate: j * frames overflows Int past ~1.4 GB of PCM
      val (i0, i1) = ((j.toLong * frames / dim).toInt,
        ((j + 1).toLong * frames / dim).toInt)
      var sumSq = 0L
      var i = i0
      while (i < i1) {
        val v = frameAvg(b, off, channels, i).toLong
        sumSq += v * v
        i += 1
      }
      // RMS normalized by full scale: one division + one IEEE sqrt
      out(j) =
        if (i1 == i0) 0.0f
        else (math.sqrt(sumSq / ((i1 - i0).toDouble)) / 32768.0).toFloat
      j += 1
    }
    out
  }

  override def resize(bytes: Array[Byte], format: String,
                      targetW: Int, targetH: Int, bytesPerPixel: Int): Array[Byte] = {
    val budget = targetW * targetH * bytesPerPixel
    require(budget >= 2, s"WavCodec: byte budget $budget below one PCM16 sample")
    val (rate, channels, off, len) = parseHeader(bytes)
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val srcFrames = len / (2 * channels)
    val outFrames = budget / 2
    val samples = new Array[Short](outFrames)
    var i = 0
    while (i < outFrames) {
      // nearest-neighbor resample of the channel-averaged stream
      samples(i) =
        if (srcFrames == 0) 0
        else frameAvg(b, off, channels, (i.toLong * srcFrames / outFrames).toInt).toShort
      i += 1
    }
    encode(rate, samples)
  }

  /** Build a mono PCM16 WAV from raw samples (also the spec's input
    * synthesizer). */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157)
    b.putInt(0x20746d66).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    b.putInt(0x61746164).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }
}
