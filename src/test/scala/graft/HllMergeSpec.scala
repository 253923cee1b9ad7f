package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.4: agg_hll_merge is declared no-oracle (Datasketches binary
  * sketches have no DuckDB twin), so its correctness contract lives here:
  * the merged two-level estimate must track the exact per-type distinct
  * count within HLL tolerance, and re-merging per-day sketches must agree
  * with sketching the whole fact in one pass (union is register-wise max;
  * only the HIP estimator's merge history differs, so the two estimates
  * are close but not bit-equal).
  */
class HllMergeSpec extends AnyFunSuite {
  import TestSpark._

  // default lgConfigK=12 → rse ≈ 1.04/sqrt(2^12) ≈ 1.6%; 5% is generous
  private val Tol = 0.05

  test("two-level sketch rollup tracks exact distinct users per type") {
    val est = SparkEntry.queries("agg_hll_merge")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet === exact.keySet)
    for ((t, e) <- exact)
      assert(math.abs(est(t) - e) <= Tol * e,
        s"$t: merged estimate ${est(t)} vs exact $e off by more than $Tol")
  }

  test("merged per-day sketches agree with the single-pass sketch") {
    val merged = SparkEntry.queries("agg_hll_merge")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val single = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    for ((t, s1) <- single)
      assert(math.abs(merged(t) - s1) <= Tol * math.max(s1, 1.0),
        s"$t: two-level ${merged(t)} diverged from single-pass $s1")
  }
}
