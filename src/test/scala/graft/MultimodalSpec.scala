package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tests for the multimodal binary-column path (ops/Multimodal.scala +
  * ops/MediaCodec.scala): real JDK codecs (ImageIO for PNG/BMP,
  * AudioSystem for WAV) behind the distributed mapPartitions batch shape.
  * Known-content tests pin exact feature values; corpus tests pin the
  * schema, partition-of-corpus property, and determinism. Since round 20
  * the corpus-level outputs are ALSO hash-gated against the DuckDB
  * oracle's formula replay (see Multimodal.oracles) — these specs keep
  * the known-content decode values pinned independently of the fixture.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val media = ops.Multimodal.mediaTable(spark, sf).cache()
  private lazy val feats =
    SparkEntry.queries("mm_media_features")(spark, sf).cache()

  test("media table schema: binary payload + typed metadata") {
    val f = media.schema.fields.map(x => x.name -> x.dataType.typeName).toMap
    assert(f("payload") === "binary")
    assert(f("fmt") === "string")
    assert(f("width") === "integer" && f("height") === "integer")
  }

  test("feature output: one row per format, counts partition the corpus") {
    val total = Tables.table(spark, sf, "documents").count()
    assert(feats.count() === 3)
    assert(feats.agg(sum("n")).head().getLong(0) === total)
  }

  test("decoded geometry equals declared metadata across the corpus") {
    // The decoder reads ONLY the payload bytes for its statistics;
    // agreement with the table's width/height columns (the geom_ok law
    // flag) proves the codec round-trip is lossless on geometry for
    // every row (images: pixel dims; wav: frame count) — and the
    // declared geometry_ok column must pin it corpus-wide.
    import spark.implicits._
    val bad = ops.Multimodal.mediaBytesTable(spark, sf)
      .map { r =>
        val f = ops.MediaCodec.decodeFeatures(r)
        val scale = math.min(1.0, 224.0 / math.max(1, math.max(r.width, r.height)))
        val expW = math.max(1, math.rint(r.width * scale).toInt)
        val expH = math.max(1, math.rint(r.height * scale).toInt)
        if (f.geom_ok && f.out_w == expW && f.out_h == expH) 0 else 1
      }.reduce(_ + _)
    assert(bad === 0, "decoded geometry diverged from declared metadata")
    assert(feats.where(!col("geometry_ok") || !col("bytes_ok")).count() === 0)
  }

  test("features are deterministic and in-range") {
    assert(rowSet(feats.toDF()) ===
      rowSet(SparkEntry.queries("mm_media_features")(spark, sf)))
    // brightness is an 8-bit luma/amplitude mean; entropy is 8-bucket
    // Shannon entropy in NATS, bounded by ln 8 ≈ 2.0794.
    val bad = feats.where(
      col("avg_brightness") < 0 || col("avg_brightness") > 255 ||
        col("avg_entropy") < 0 || col("avg_entropy") > 2.0795).count()
    assert(bad === 0, "brightness must be a luma mean, entropy8 in [0, ln 8]")
  }

  test("8-bit luma quantization recovers gray channel values exactly") {
    // The contract-oracle replay relies on rint(.299v+.587v+.114v) == v
    // for every 8-bit v — pinned exhaustively here.
    for (v <- 0 to 255) {
      val l = 0.299 * v + 0.587 * v + 0.114 * v
      assert(math.rint(l).toInt === v, s"luma quantization broke at $v")
    }
  }

  test("solid-color PNG decodes to its exact quantized luma, zero entropy") {
    // 3×2 all-(200,100,50): luma = .299*200 + .587*100 + .114*50 = 124.2
    // → quantized 124; one occupied bucket → entropy 0.
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, (200 << 16) | (100 << 8) | 50)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = ops.MediaCodec.decodeFeatures(
      ops.MediaRec(1L, "png", 3, 2, bos.toByteArray))
    assert(f.brightness === 124.0)
    assert(f.entropy_nats === 0.0)
    assert(f.n_units === 6L)
    assert(f.out_w === 3 && f.out_h === 2, "no upscale below 224")
  }

  test("two-luma-bucket checkerboard BMP has exactly ln 2 nats of entropy") {
    // Half the pixels black (bucket 0), half white (bucket 7) → p=.5/.5.
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val f = ops.MediaCodec.decodeFeatures(
      ops.MediaRec(2L, "bmp", 4, 4, bos.toByteArray))
    assert(f.entropy_nats === math.log(2.0))
    assert(f.brightness === 127.5)
  }

  test("constant-amplitude WAV decodes to that integer amplitude, zero entropy") {
    // 100 frames of PCM16 value 16384 → amp8 = 16384*255/32767 = 127 (int div).
    val data = new Array[Byte](200)
    for (i <- 0 until 100) { data(2 * i) = 0x00; data(2 * i + 1) = 0x40 }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 100L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val f = ops.MediaCodec.decodeFeatures(
      ops.MediaRec(3L, "wav", 100, 1, bos.toByteArray))
    assert(f.brightness === 127.0)
    assert(f.entropy_nats === 0.0)
    assert(f.out_w === 100 && f.out_h === 1)
  }

  test("wavFrames: constant tone has rms = amplitude and zero crossings") {
    // 300 frames of PCM16 value 12345 → two windows (256 + 44): every
    // window's rms and mean_abs equal the amplitude exactly, zcr = 0.
    val data = new Array[Byte](600)
    for (i <- 0 until 300) {
      data(2 * i) = (12345 & 0xFF).toByte
      data(2 * i + 1) = ((12345 >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 300L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val fr = ops.MediaCodec.wavFrames(bos.toByteArray, 256)
    assert(fr.map(f => (f.win_idx, f.n_samples)) === Seq((0, 256), (1, 44)))
    assert(fr.forall(f => f.zcr === 0L))
    assert(fr.forall(f => f.sum_abs === 12345L * f.n_samples))
    assert(fr.forall(f => f.sum_sq === 12345L * 12345L * f.n_samples))
  }

  test("wavFrames: sign-alternating tone crosses zero at every step") {
    // +1000/-1000 alternating: each window's crossings = n_samples - 1
    // (the first sample pairs with nothing — the within-window law).
    val data = new Array[Byte](520)
    for (i <- 0 until 260) {
      val s = if (i % 2 == 0) 1000 else -1000
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 260L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val fr = ops.MediaCodec.wavFrames(bos.toByteArray, 256)
    assert(fr.map(f => (f.n_samples.toLong, f.zcr)) ===
      Seq((256L, 255L), (4L, 3L)))
  }

  test("container byte-size laws: WAV = 44 + 2n, BMP = 54 + h*rowpad") {
    // The sum_bytes oracle column replays exactly these.
    val wav = ops.MediaCodec.encodeWav(7L, 333)
    assert(wav.length === 44 + 2 * 333)
    val bmp = ops.MediaCodec.encodeImage("bmp", 7L, 21, 9)
    assert(bmp.length === 54 + 9 * (((3 * 21 + 3) / 4) * 4))
  }

  test("resize geometry: fit-within-224 preserves aspect ratio") {
    val f = ops.MediaCodec.decodeFeatures(
      ops.MediaRec(4L, "png", 448, 224,
        ops.MediaCodec.encodeImage("png", 4L, 448, 224)))
    assert(f.out_w === 224 && f.out_h === 112)
  }

  test("codec round-trip: encoded pixels decode bit-exactly (PNG lossless)") {
    val bytes = ops.MediaCodec.encodeImage("png", 9L, 5, 4)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 4; x <- 0 until 5)
      assert((img.getRGB(x, y) & 0xFFFFFF) === ops.MediaCodec.pixel(9L, x, y))
  }

  test("aHash is format-invariant and discriminates content") {
    // Same pixels, different containers → identical hash; different
    // content keys → (for this corpus) distinct hashes.
    val hashes = (0L until 8L).map { ck =>
      val w = (ck % 17 + 8).toInt; val h = (ck % 13 + 8).toInt
      val hp = ops.MediaCodec.aHashBits(ops.MediaCodec.encodeImage("png", ck, w, h))
      val hb = ops.MediaCodec.aHashBits(ops.MediaCodec.encodeImage("bmp", ck, w, h))
      assert(hp === hb, s"ck $ck: png/bmp aHash diverged")
      assert(hp.length === 64 && hp.forall(c => c == '0' || c == '1'))
      hp
    }
    assert(hashes.distinct.size === hashes.size, "content collision")
  }

  test("mm_phash_near equals a driver-side banded-Hamming replay") {
    // Replay: hash every doc's variant (base for even ids, +96 cell edit
    // for odd) from the codec, group to distinct hashes, band 4×16,
    // pair on shared bands with hamming <= 3 — the exact key contract.
    val ids = Tables.table(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val hash = ids.map { id =>
      val ck = id % 49
      val w = (ck % 17 + 8).toInt; val h = (ck % 13 + 8).toInt
      val fmt = if (id % 2 == 0) "png" else "bmp"
      val delta = if (id % 2 == 1) 96 else 0
      id -> ops.MediaCodec.aHashBits(
        ops.MediaCodec.encodeImageNear(fmt, ck, w, h, delta))
    }
    val groups = hash.groupBy(_._2).map { case (bits, ds) =>
      (bits, ds.map(_._1).min, ds.length.toLong) }.toSeq
    val want = (for {
      (ba, ra, na) <- groups
      (bb, rb, nb) <- groups
      if ba < bb
      if (0 until 4).exists(b => ba.substring(b * 16, b * 16 + 16) ==
        bb.substring(b * 16, b * 16 + 16))
      ham = ba.zip(bb).count { case (x, y) => x != y }
      if ham <= 3
    } yield (ra, rb, ham.toLong, na, nb)).toSet
    val got = SparkEntry.queries("mm_phash_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === want)
    assert(want.nonEmpty && want.forall(p => p._3 >= 1 && p._3 <= 3),
      "near pairs must be a strict Hamming neighborhood, not exact dups")
  }

  test("mm_phash_dedup equals a driver-side clustering replay") {
    // Replay: every doc with the same doc_id % 49 content key carries
    // identical pixels, so clusters are exactly the ≥2-member content
    // classes (unless two classes' hashes collide — the replay computes
    // real hashes, so a merge would be replayed too).
    val ids = Tables.table(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val byHash = ids.groupBy { id =>
      val ck = id % 49
      val w = (ck % 17 + 8).toInt; val h = (ck % 13 + 8).toInt
      ops.MediaCodec.aHashBits(ops.MediaCodec.encodeImage("png", ck, w, h))
    }
    val want = byHash.collect { case (hash, ds) if ds.length >= 2 =>
      (hash, ds.length.toLong, ds.map(_ % 2).distinct.length.toLong, ds.min)
    }.toSet
    val got = SparkEntry.queries("mm_phash_dedup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
    assert(want.exists(_._3 == 2),
      "no cross-format cluster — the perceptual claim is untested")
  }
}
