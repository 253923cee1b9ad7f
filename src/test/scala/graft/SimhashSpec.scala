package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the no-oracle dedup_simhash key (ops/Dedup.scala).
  *
  * Ground truth is exact token-set Jaccard computed independently from the
  * raw text — the SimHash pipeline under test never sees it.
  */
class SimhashSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val pairs =
    SparkEntry.queries("dedup_simhash")(spark, sf).cache()

  private lazy val toks = Tables.table(spark, sf, "documents")
    .select(col("doc_id"),
      array_distinct(split(lower(col("text")), " ")).as("toks"))

  test("deterministic: two runs produce identical pairs") {
    val again = SparkEntry.queries("dedup_simhash")(spark, sf)
    assert(rowSet(pairs.toDF()) === rowSet(again))
  }

  test("identical token sets are always caught at hamming 0") {
    val truth = toks
      .select(col("doc_id").as("doc_a"),
        array_sort(col("toks")).as("t1"))
      .join(toks.select(col("doc_id").as("doc_b"),
        array_sort(col("toks")).as("t2")),
        col("doc_a") < col("doc_b") && col("t1") === col("t2"))
      .select("doc_a", "doc_b")
    val nTruth = truth.count()
    assert(nTruth > 0, "sf0.001 should contain exact-duplicate token sets")
    val caught = truth.join(pairs, Seq("doc_a", "doc_b"), "inner")
    assert(caught.count() === nTruth)
    assert(caught.where(col("hamming") =!= 0).count() === 0,
      "identical sets must fingerprint identically")
  }

  test("reported pairs are genuinely similar (mean exact Jaccard high)") {
    val jac = pairs
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("tb")), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
    val row = jac.agg(avg("jac"), count(lit(1))).head()
    assert(row.getLong(1) > 0, "no pairs reported at all")
    assert(row.getDouble(0) >= 0.7, s"mean true jac=${row.getDouble(0)}")
  }

  test("banding is exhaustive: every hamming<=3 pair is reported") {
    // Pigeonhole: hamming <= 3 over 4 disjoint 16-bit bands forces at least
    // one identical band, so LSH candidate generation must be lossless.
    val fps = ops.Dedup.simhashed(spark, sf)
    val all = fps.select(col("doc_id").as("doc_a"), col("fp").as("fa"))
      .crossJoin(fps.select(col("doc_id").as("doc_b"), col("fp").as("fb")))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
    assert(rowSet(all) === rowSet(pairs.toDF()))
  }
}
