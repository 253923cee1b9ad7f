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
  * bytes from (key, geometry) so the corpus can carry genuine decodable
  * payloads without external data. The DECODE side is the product path: it
  * sees only the bytes, exactly as it would for media ingested from a
  * lakehouse table, and recovers geometry + pixel/sample statistics by
  * actually decoding them.
  *
  * CONTRACT-ORACLE DESIGN (round 20): the synthetic content functions
  * [[grayValue]] / [[sample]] are pure modular-integer formulas chosen to
  * be replayable in ANSI SQL without 64-bit wraparound (every intermediate
  * product < 2^63), and the decoder accumulates EXACT INTEGER statistics
  * (quantized 8-bit luma sums, 8-bucket histograms, grid-cell sums). The
  * DuckDB oracle replays the same formulas from the raw `documents` table,
  * so the whole decode(encode(x)) round trip — container parse included —
  * is hash-gated: a decoder that misreads even one pixel/sample produces a
  * different integer sum and fails the driver gate. Only the deflate length
  * of the PNG container remains outside the oracle (it depends on the JDK's
  * zlib); WAV (44-byte RIFF header + 2 bytes/frame) and BMP (54-byte header
  * + rows padded to 4 bytes) byte lengths are exact laws and ARE gated.
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

  /** Deterministic 8-bit gray value for pixel (x, y) of content key `k`.
    * SQL replay (DuckDB): `t = ((k % 65536)*2654435761 + x*40503 +
    * y*12289) % 65536; v = ((t*(t+3)) // 7) % 256`. The key is bounded to
    * 16 bits FIRST so the largest product (65535 × 2654435761 ≈ 1.7e14)
    * stays far under 2^63 in both engines at any corpus size; the
    * quadratic term gives enough mixing that luma histograms spread over
    * all 8 buckets. */
  def grayValue(k: Long, x: Int, y: Int): Int = {
    val t = ((k % 65536L) * 2654435761L + x.toLong * 40503L +
      y.toLong * 12289L) % 65536L
    (((t * (t + 3L)) / 7L) % 256L).toInt
  }

  /** Deterministic RGB value for pixel (x, y): the gray value replicated
    * across channels, so 8-bit luma quantization recovers it EXACTLY
    * (rint(0.299v + 0.587v + 0.114v) == v for all v in 0..255 — verified
    * exhaustively; see MultimodalSpec's round-trip test). */
  def pixel(k: Long, x: Int, y: Int): Int = grayValue(k, x, y) * 0x010101

  /** Encode a deterministic w×h gray image as `fmt` ("png" | "bmp"). */
  def encodeImage(fmt: String, k: Long, w: Int, h: Int): Array[Byte] =
    encodeImageNear(fmt, k, w, h, 0)

  /** Encode the NEAR-DUPLICATE variant of content key `k`: identical
    * pixels except the top-left 8×8-grid cell, whose gray values get a
    * saturating +`delta` (SQL replay: `least(255, v + delta)` where
    * `gy = 0 AND gx = 0`). The edit perturbs one pooled cell plus the
    * global mean slightly, so the variant's aHash sits a FEW bits from
    * the base's (measured 0–4 at delta=96 over the fixture's 49 content
    * classes) — exactly the near-miss a Hamming-banded perceptual dedup
    * exists to catch and exact-hash grouping misses. */
  def encodeImageNear(fmt: String, k: Long, w: Int, h: Int,
                      delta: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 8 / w
        val v =
          if (gy == 0 && gx == 0) math.min(255, grayValue(k, x, y) + delta)
          else grayValue(k, x, y)
        img.setRGB(x, y, v * 0x010101)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  /** Deterministic PCM16 sample i of content key `k`, full 16-bit range.
    * SQL replay: `((k % 65536)*48271 + i*16807) % 65536 - 32768`. */
  def sample(k: Long, i: Int): Short =
    ((((k % 65536L) * 48271L + i.toLong * 16807L) % 65536L) - 32768L).toShort

  /** Encode `nFrames` deterministic PCM16 mono 8 kHz frames as a WAV
    * container (RIFF header written by the JDK, not by hand). */
  def encodeWav(k: Long, nFrames: Int): Array[Byte] = {
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) { // little-endian PCM16
      val s = sample(k, i)
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

  /** Quantized 8-bit luma of an ARGB pixel: ITU-R BT.601 weights, rounded
    * to the nearest integer (half-even, like every 8-bit luma plane). For
    * gray pixels this recovers the channel value exactly. */
  @inline private def luma8(rgb: Int): Int = {
    val l = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
      0.114 * (rgb & 0xFF)
    math.rint(l).toInt
  }

  /** Integer amplitude (0..255) of a PCM16 sample: |s| scaled to the byte
    * range with INTEGER division, so sums over samples are exact in both
    * engines. SQL replay: `least(255, abs(s) * 255 // 32767)`. */
  @inline private def amp8(s: Short): Int =
    math.min(255L, math.abs(s.toLong) * 255L / 32767L).toInt

  /** Shannon entropy (NATS) of an 8-bucket histogram, folded bucket
    * 0→7 with 0.0 for empty buckets — the exact term order the oracle's
    * `t0+t1+…+t7` chain adds, so both engines add identical doubles in
    * identical order (`x + 0.0 == x` in IEEE for x ≥ 0). NATS because
    * Spark/Java `log` ≡ DuckDB `ln` is the proven cross-engine libm pair
    * (text_entropy, green since r6); a log2 variant would divide by an
    * unproven constant. */
  private def entropyNats(hist: Array[Long], n: Long): Double = {
    var acc = 0.0
    var b = 0
    while (b < 8) {
      if (hist(b) > 0) {
        val p = hist(b).toDouble / n
        acc += -(p * math.log(p))
      } else acc += 0.0
      b += 1
    }
    acc
  }

  /** Decode media bytes and extract features. Images: real pixel decode
    * (ImageIO), per-pixel 8-bit luma quantization, exact integer luma sum
    * + 8-bucket histogram, decoded-geometry fit-within-224 resize. WAV:
    * real container parse (AudioSystem), integer amplitude sum/histogram,
    * geometry = (frames, 1).
    *
    * Only the bytes in `r.payload` are trusted for the statistics — the
    * metadata width/height are read ONLY to emit the `geom_ok` law column
    * (decoded geometry == declared metadata), which the declared query
    * pins constant-TRUE so a decode/metadata divergence fails the driver
    * gate. brightness = exact-integer sum / count (ONE IEEE division —
    * bitwise replayable); entropy is the NATS fold above. */
  def decodeFeatures(r: MediaRec): MediaFeat = {
    val hist = new Array[Long](8)
    var sum = 0L
    val (w, h) = r.fmt match {
      case "wav" =>
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.payload))
        val raw = in.readAllBytes()
        in.close()
        val n = raw.length / 2
        var i = 0
        while (i < n) { // little-endian PCM16
          val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)).toShort
          val a = amp8(s)
          sum += a
          hist(a >> 5) += 1
          i += 1
        }
        (n, 1)
      case _ =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable ${r.fmt} payload for doc ${r.doc_id}")
        val (iw, ih) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < ih) {
          var x = 0
          while (x < iw) {
            val l = luma8(img.getRGB(x, y))
            sum += l
            hist(math.min(255, l) >> 5) += 1
            x += 1
          }
          y += 1
        }
        (iw, ih)
    }
    val n = w.toLong * h
    val scale = math.min(1.0, 224.0 / math.max(1, math.max(w, h)))
    MediaFeat(r.doc_id, r.fmt, r.payload.length, n,
      if (n == 0) 0.0 else sum.toDouble / n,
      entropyNats(hist, n),
      math.max(1, math.rint(w * scale).toInt),
      math.max(1, math.rint(h * scale).toInt),
      w == r.width && h == r.height)
  }

  /** Frame-windowed audio features from a WAV payload: REAL container
    * parse, then per non-overlapping 256-sample window the EXACT integer
    * statistics a voice-activity / energy-gating stage consumes —
    * sample count, Σ|s|, Σs², and the zero-crossing count (adjacent
    * pairs WITHIN the window where the sign bit flips; the window's
    * first sample pairs with nothing, matching the oracle's
    * lag-within-partition replay). Σs² ≤ 256·32768² ≈ 2.7e11 per
    * window — exact in Long and in DuckDB's HUGEINT sum. */
  def wavFrames(payload: Array[Byte], win: Int): Seq[AudioFrame] = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val raw = in.readAllBytes()
    in.close()
    val n = raw.length / 2
    val out = scala.collection.mutable.ArrayBuffer.empty[AudioFrame]
    var w0 = 0
    while (w0 < n) {
      val end = math.min(n, w0 + win)
      var i = w0
      var sumAbs = 0L
      var sumSq = 0L
      var zcr = 0L
      var prevNeg = false
      while (i < end) {
        val s = ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)).toShort
        val neg = s < 0
        if (i > w0 && neg != prevNeg) zcr += 1
        prevNeg = neg
        sumAbs += math.abs(s.toLong)
        sumSq += s.toLong * s.toLong
        i += 1
      }
      out += AudioFrame(w0 / win, end - w0, sumAbs, sumSq, zcr)
      w0 += win
    }
    out.toSeq
  }

  /** 64-bit average-hash (aHash) of an image payload as a 64-char '0'/'1'
    * bitstring: real decode, quantized 8-bit luma plane average-pooled
    * onto an 8×8 grid, bit (gy·8+gx) set when the cell's mean luma
    * exceeds the GLOBAL pixel mean — compared by integer
    * cross-multiplication (cellSum·nTotal > totalSum·cellCount), so the
    * hash involves no floating point at all and replays bit-exactly in
    * SQL. Format-invariant for lossless codecs — the same pixels encoded
    * as PNG or BMP decode to the same ARGB values and hash identically,
    * which is the entire point of perceptual dedup (byte-level md5 can't
    * see through a re-encode). Requires ≥8×8 geometry so every grid cell
    * is populated. Bit order: index g ascending, left to right. */
  def aHashBits(payload: Array[Byte]): String = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val (iw, ih) = (img.getWidth, img.getHeight)
    require(iw >= 8 && ih >= 8, s"aHash needs >=8x8, got ${iw}x$ih")
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < ih) {
      val gy = y * 8 / ih
      var x = 0
      while (x < iw) {
        val gx = x * 8 / iw
        val l = luma8(img.getRGB(x, y))
        sums(gy * 8 + gx) += l
        cnts(gy * 8 + gx) += 1
        total += l
        x += 1
      }
      y += 1
    }
    val n = iw.toLong * ih
    val sb = new java.lang.StringBuilder(64)
    var g = 0
    while (g < 64) {
      sb.append(if (sums(g) * n > total * cnts(g)) '1' else '0')
      g += 1
    }
    sb.toString
  }
}
