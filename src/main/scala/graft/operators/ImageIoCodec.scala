package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** A REAL [[Multimodal.MediaCodec]] for JPEG/PNG/GIF/BMP via the JDK's
  * own `javax.imageio` — no external library, so compressed-image decode
  * runs in this container too (the round-6 stub claimed otherwise; only
  * MP3/video genuinely lack JDK codecs). [[BmpCodec]] remains the
  * from-scratch reference implementation; this codec covers the formats
  * a real corpus actually ships.
  *
  * `decodeToFeatures` uses the SAME near-square mean-luminance grid as
  * [[BmpCodec]] (integer r+g+b accumulation per cell, one double
  * division) — on the same uncompressed BMP bytes the two codecs emit
  * bit-identical features, which MultimodalSpec pins as a cross-check.
  * `resize` is the same nearest-neighbor rule, re-encoded to the blob's
  * own format (JPEG re-encode is lossy but deterministic within a JVM).
  *
  * Thread-safety: `ImageIO.read`/`write` construct fresh reader/writer
  * instances per call, so 32 concurrent tasks decode safely; there is no
  * native context to amortize, hence no transient-lazy state. */
object ImageIoCodec extends Multimodal.MediaCodec {

  /** Formats the JDK ships writers for (read support is a superset). */
  private val Writable = Set("jpeg", "jpg", "png", "gif", "bmp")

  private def read(bytes: Array[Byte]): BufferedImage = {
    // ImageIO.read signals "no registered reader matched" with null, not
    // an exception — normalize to the codec contract (throw loudly; the
    // A14 error-routing layer is the place to quarantine bad blobs)
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null,
      s"ImageIoCodec: no JDK reader decoded the ${bytes.length}-byte blob")
    img
  }

  private def writerFormat(format: String): String = {
    val f = if (format == null) "png" else format.toLowerCase
    require(Writable.contains(f),
      s"ImageIoCodec: no JDK writer for format '$format' (have $Writable)")
    f
  }

  @inline private def lum(img: BufferedImage, x: Int, y: Int): Int = {
    val rgb = img.getRGB(x, y)
    ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
  }

  override def decodeToFeatures(bytes: Array[Byte], format: String, dim: Int): Array[Float] = {
    val img = read(bytes)
    val (width, height) = (img.getWidth, img.getHeight)
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
        while (x < x1) { sum += lum(img, x, y); n += 1; x += 1 }
        y += 1
      }
      // mean luminance in [0,1]: one division per cell (765 = 3*255),
      // the exact BmpCodec arithmetic — same bytes, same features
      out(j) = if (n == 0L) 0.0f else (sum / (n * 765.0)).toFloat
      j += 1
    }
    out
  }

  override def resize(bytes: Array[Byte], format: String,
                      targetW: Int, targetH: Int, bytesPerPixel: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    val src = read(bytes)
    val (width, height) = (src.getWidth, src.getHeight)
    // nearest neighbor by hand (BmpCodec's rule) rather than Graphics2D
    // rendering hints: the integer source-index arithmetic is pinned and
    // identical across JVMs, a rendering pipeline's filtering is not
    val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
    var ty = 0
    while (ty < targetH) {
      var tx = 0
      while (tx < targetW) {
        dst.setRGB(tx, ty, src.getRGB(tx * width / targetW, ty * height / targetH))
        tx += 1
      }
      ty += 1
    }
    val out = new ByteArrayOutputStream()
    val ok = ImageIO.write(dst, writerFormat(format), out)
    require(ok, s"ImageIoCodec: ImageIO declined to write format '$format'")
    out.toByteArray
  }

  /** Encode top-down packed RGB ints (row-major, width*height long) to
    * `format` — the test-side synthesizer, the ImageIO sibling of
    * [[BmpCodec.encode]]. */
  def encode(width: Int, height: Int, rgbTopDown: Array[Int], format: String): Array[Byte] = {
    require(rgbTopDown.length == width * height,
      s"encode wants ${width * height} pixels, got ${rgbTopDown.length}")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgbTopDown, 0, width)
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, writerFormat(format), out),
      s"ImageIoCodec: ImageIO declined to write format '$format'")
    out.toByteArray
  }

  /** (width, height) of an encoded image — test-side verification hook. */
  def dimensions(bytes: Array[Byte]): (Int, Int) = {
    val img = read(bytes)
    (img.getWidth, img.getHeight)
  }
}
