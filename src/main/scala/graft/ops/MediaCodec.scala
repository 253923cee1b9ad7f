package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real JDK-only media codec for the multimodal path: PNG/BMP via
  * `javax.imageio`, WAV (PCM16 mono) via `javax.sound.sampled`. No external
  * dependencies — both ship with Java 17 and run headless.
  *
  * The ENCODE side is the test fixture: it synthesizes deterministic media
  * bytes from (doc_id, geometry) so the corpus can carry genuine
  * decodable payloads without external data. The DECODE side is the
  * product path: it sees only the bytes, exactly as it would for media
  * ingested from a lakehouse table, and recovers geometry + pixel/sample
  * statistics by actually decoding them.
  *
  * Codecs are stateless JDK singletons, so there is no per-partition
  * constructor to amortize — but the call sites keep the
  * `mapPartitions`-batch shape so a stateful codec (JNI, javacv) drops in
  * without replumbing.
  */
object MediaCodec {

  // ImageIO defaults to a disk-backed stream cache — a temp FILE per
  // encode/decode call. All payloads here are in-memory byte arrays;
  // memory-only streams are ~an order of magnitude faster per call.
  ImageIO.setUseCache(false)

  /** SplitMix64 finalizer — deterministic, well-mixed synthetic content. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic RGB value for pixel (x, y) of document `docId`. */
  def pixel(docId: Long, x: Int, y: Int): Int =
    (mix(docId * 131071L + y.toLong * 8191L + x.toLong) & 0xFFFFFF).toInt

  /** Encode a deterministic w×h RGB image as `fmt` ("png" | "bmp"). */
  def encodeImage(fmt: String, docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(docId, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  /** Deterministic PCM16 sample i of document `docId`, full-range. */
  def sample(docId: Long, i: Int): Short =
    (mix(docId * 524287L + i) % 32768).toShort

  /** Encode `nFrames` deterministic PCM16 mono 8 kHz frames as a WAV
    * container (RIFF header written by the JDK, not by hand). */
  def encodeWav(docId: Long, nFrames: Int): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) { // little-endian PCM16
      val s = sample(docId, i)
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode media bytes and extract features. Images: real pixel decode
    * (ImageIO), luma brightness (ITU-R BT.601), 8-bucket luma entropy,
    * decoded-geometry fit-within-224 resize. WAV: real container parse
    * (AudioSystem), amplitude mean/entropy over |sample| normalized to the
    * byte range, geometry = (frames, 1).
    *
    * Only the bytes in `r.payload` are trusted — metadata width/height are
    * NOT read here, so a decoded-vs-declared geometry mismatch is
    * detectable downstream (MultimodalSpec asserts they agree for this
    * fixture corpus). */
  def decodeFeatures(r: MediaRec): MediaFeat = {
    val (w, h, brightness, entropy) = r.fmt match {
      case "wav" =>
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.payload))
        val raw = in.readAllBytes()
        in.close()
        val n = raw.length / 2
        val hist = new Array[Long](8)
        var sum = 0.0
        var i = 0
        while (i < n) { // little-endian PCM16 |amplitude| → 0..255
          val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)).toShort
          val a = math.min(255.0, math.abs(s.toDouble) / 32767.0 * 255.0)
          sum += a
          hist(a.toInt >> 5) += 1
          i += 1
        }
        (n, 1, if (n == 0) 0.0 else sum / n, entropy8(hist, n))
      case _ =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable ${r.fmt} payload for doc ${r.doc_id}")
        val (iw, ih) = (img.getWidth, img.getHeight)
        val hist = new Array[Long](8)
        var sum = 0.0
        var y = 0
        while (y < ih) {
          var x = 0
          while (x < iw) {
            val rgb = img.getRGB(x, y)
            val luma = 0.299 * ((rgb >> 16) & 0xFF) +
              0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
            sum += luma
            hist(math.min(255, luma.toInt) >> 5) += 1
            x += 1
          }
          y += 1
        }
        val n = iw.toLong * ih
        (iw, ih, if (n == 0) 0.0 else sum / n, entropy8(hist, n))
    }
    val scale = math.min(1.0, 224.0 / math.max(1, math.max(w, h)))
    MediaFeat(r.doc_id, r.fmt, r.payload.length,
      math.rint(brightness * 1e6) / 1e6, math.rint(entropy * 1e6) / 1e6,
      math.max(1, math.rint(w * scale).toInt),
      math.max(1, math.rint(h * scale).toInt))
  }

  /** 64-bit average-hash (aHash) of an image payload: real decode, luma
    * plane average-pooled onto an 8×8 grid, bit (gy·8+gx) set when the
    * cell mean exceeds the global mean of cell means. Format-invariant
    * for lossless codecs — the same pixels encoded as PNG or BMP decode
    * to the same ARGB values and hash identically, which is the entire
    * point of perceptual dedup (byte-level md5 can't see through a
    * re-encode). Deterministic: plain double sums over a fixed pixel
    * walk. Requires ≥8×8 geometry so every grid cell is populated. */
  def aHash(payload: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val (iw, ih) = (img.getWidth, img.getHeight)
    require(iw >= 8 && ih >= 8, s"aHash needs >=8x8, got ${iw}x$ih")
    val sums = new Array[Double](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < ih) {
      val gy = y * 8 / ih
      var x = 0
      while (x < iw) {
        val gx = x * 8 / iw
        val rgb = img.getRGB(x, y)
        val luma = 0.299 * ((rgb >> 16) & 0xFF) +
          0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
        sums(gy * 8 + gx) += luma
        cnts(gy * 8 + gx) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(g => sums(g) / cnts(g))
    val mean = means.sum / 64
    var bits = 0L
    var g = 0
    while (g < 64) { if (means(g) > mean) bits |= (1L << g); g += 1 }
    bits
  }

  private def entropy8(hist: Array[Long], n: Long): Double =
    if (n == 0) 0.0
    else -hist.filter(_ > 0).map { c =>
      val p = c.toDouble / n; p * math.log(p) / math.log(2)
    }.sum
}
