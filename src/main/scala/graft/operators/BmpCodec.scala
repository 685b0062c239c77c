package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL [[Multimodal.MediaCodec]] for uncompressed 24-bit BMP — pure
  * JVM arithmetic, no native libraries, so it runs in this container and
  * proves the codec boundary is an interface, not a promise: the same
  * operators that run the stub run an actual decode with this object
  * passed in (MultimodalSpec drives both).
  *
  * Supported input: BITMAPINFOHEADER (40-byte DIB), 24 bpp, BI_RGB
  * (uncompressed), bottom-up row order with 4-byte row padding — the
  * plain `.bmp` every encoder can emit. Anything else throws
  * `IllegalArgumentException` with the offending field; a production
  * pipeline wraps codec calls with its error-routing layer (the A14
  * pattern) rather than letting a malformed blob poison a partition.
  *
  * `decodeToFeatures` pools mean luminance over a near-square grid of
  * `dim` cells (row-major), each cell averaging its pixel block —
  * integer accumulation, ONE double division per cell, bit-deterministic
  * across partitionings. `resize` is nearest-neighbor resampling
  * re-encoded as the same 24-bit BMP. `encode` builds a BMP from raw
  * RGB rows (also what the spec uses to synthesize inputs). */
object BmpCodec extends Multimodal.MediaCodec {

  private val FileHeaderSize = 14
  private val DibHeaderSize = 40

  private def rowSize(width: Int): Int = ((width * 3) + 3) / 4 * 4

  /** (width, height, pixel-data offset); throws on anything this codec
    * does not decode. */
  private def parseHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= FileHeaderSize + DibHeaderSize,
      s"BmpCodec: ${bytes.length} bytes is shorter than the BMP headers")
    require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "BmpCodec: missing BM magic")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val offset = b.getInt(10)
    val dibSize = b.getInt(14)
    require(dibSize == DibHeaderSize,
      s"BmpCodec: unsupported DIB header size $dibSize (want $DibHeaderSize)")
    val width = b.getInt(18)
    val height = b.getInt(22)
    val bpp = b.getShort(28).toInt
    val compression = b.getInt(30)
    require(width > 0 && height > 0,
      s"BmpCodec: unsupported dimensions ${width}x$height (top-down BMPs not handled)")
    require(bpp == 24, s"BmpCodec: unsupported bit depth $bpp (want 24)")
    require(compression == 0, s"BmpCodec: unsupported compression $compression (want BI_RGB)")
    require(offset >= FileHeaderSize + DibHeaderSize && offset <= bytes.length,
      s"BmpCodec: pixel-array offset $offset outside [headers, file end]")
    // Long arithmetic: a crafted width near 2^31/3 overflows rowSize and
    // would make an Int-typed truncation check trivially pass
    val needed = offset.toLong + ((width.toLong * 3 + 3) / 4 * 4) * height
    require(bytes.length >= needed,
      s"BmpCodec: pixel array truncated (${bytes.length} bytes, need $needed)")
    (width, height, offset)
  }

  /** Luminance numerator r+g+b of pixel (x, y-from-top) — callers divide
    * once at the end, so accumulation stays in exact Long arithmetic. */
  @inline private def lum(bytes: Array[Byte], offset: Int, width: Int,
                          height: Int, x: Int, y: Int): Int = {
    val p = offset + (height - 1 - y) * rowSize(width) + x * 3
    (bytes(p) & 0xff) + (bytes(p + 1) & 0xff) + (bytes(p + 2) & 0xff)
  }

  override def decodeToFeatures(bytes: Array[Byte], format: String, dim: Int): Array[Float] = {
    val (width, height, offset) = parseHeader(bytes)
    val gw = math.ceil(math.sqrt(dim.toDouble)).toInt
    val gh = (dim + gw - 1) / gw
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val (cx, cy) = (j % gw, j / gw)
      val (x0, x1) = (cx * width / gw, (cx + 1) * width / gw)
      val (y0, y1) = (cy * height / gh, (cy + 1) * height / gh)
      var sum = 0L
      var n = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { sum += lum(bytes, offset, width, height, x, y); n += 1; x += 1 }
        y += 1
      }
      // mean luminance in [0,1]: one division per cell (765 = 3*255)
      out(j) = if (n == 0L) 0.0f else (sum / (n * 765.0)).toFloat
      j += 1
    }
    out
  }

  override def resize(bytes: Array[Byte], format: String,
                      targetW: Int, targetH: Int, bytesPerPixel: Int): Array[Byte] = {
    require(bytesPerPixel == 3, s"BmpCodec resizes 24-bit (3 B/px), got $bytesPerPixel")
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    val (width, height, offset) = parseHeader(bytes)
    val rows = Array.tabulate(targetH, targetW * 3) { (ty, i) =>
      val (tx, c) = (i / 3, i % 3)
      // nearest neighbor: integer source index, no interpolation
      val sx = tx * width / targetW
      val sy = ty * height / targetH
      bytes(offset + (height - 1 - sy) * rowSize(width) + sx * 3 + c)
    }
    encode(targetW, targetH, rows)
  }

  /** Build an uncompressed 24-bit BMP from top-down rows of B,G,R bytes
    * (each row exactly width*3 long). */
  def encode(width: Int, height: Int, topDownRows: Array[Array[Byte]]): Array[Byte] = {
    require(topDownRows.length == height && topDownRows.forall(_.length == width * 3),
      s"encode wants $height rows of ${width * 3} bytes")
    val rs = rowSize(width)
    val size = FileHeaderSize + DibHeaderSize + rs * height
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0)
      .putInt(FileHeaderSize + DibHeaderSize)
    b.putInt(DibHeaderSize).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(rs * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // bottom-up pixel array
      b.put(topDownRows(y))
      var pad = rs - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }
}
