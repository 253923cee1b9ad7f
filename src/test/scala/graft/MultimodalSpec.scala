package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tests for the multimodal binary-column plumbing (ops/Multimodal.scala):
  * the decode stub is a deterministic fake, but the schema, partition
  * batch shape, and aggregation are the real contract under test.
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

  test("payload bytes survive the decode path (ASCII text: bytes == chars)") {
    val expected = Tables.table(spark, sf, "documents")
      .agg(sum("n_chars")).head().getLong(0)
    assert(feats.agg(sum("sum_bytes")).head().getLong(0) === expected)
  }

  test("stub features are deterministic and in-range") {
    assert(rowSet(feats.toDF()) ===
      rowSet(SparkEntry.queries("mm_media_features")(spark, sf)))
    val bad = feats.where(
      col("avg_brightness") < 0 || col("avg_brightness") > 255 ||
        col("avg_entropy") < 0 || col("avg_entropy") > 3.0).count()
    assert(bad === 0, "brightness must be a byte mean, entropy8 in [0,3]")
  }

  test("decode stub: known bytes give the expected feature values") {
    // 4 bytes, all distinct top-3 bits => histogram 4 x 1/4 => entropy 2.
    val rec = ops.MediaRec(1L, "png", 1, 1,
      Array[Byte](0, 32, 64, 96))
    val f = ops.Multimodal.decodeStub(rec)
    assert(f.n_bytes === 4)
    assert(f.brightness === 48.0)
    assert(f.entropy8 === 2.0)
    assert(f.out_w === 1 && f.out_h === 1, "no upscale below 224")
  }

  test("resize stub: fit-within-224 preserves aspect ratio") {
    val f = ops.Multimodal.decodeStub(
      ops.MediaRec(2L, "jpeg", 448, 224, Array[Byte](1)))
    assert(f.out_w === 224 && f.out_h === 112)
  }
}
