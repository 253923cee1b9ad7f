package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.4: agg_hll_merge is ORACLED since r15 via the
  * agg_approx_distinct contract pattern (exact count + constant-TRUE
  * within_5pct). This spec keeps the value-level teeth the contract
  * column compresses away: the merged two-level ESTIMATE itself tracks
  * the exact count, and re-merging per-day sketches agrees with
  * sketching the whole fact in one pass (union is register-wise max;
  * only the HIP estimator's merge history differs, so the two estimates
  * are close but not bit-equal).
  */
class HllMergeSpec extends AnyFunSuite {
  import TestSpark._

  // default lgConfigK=12 → rse ≈ 1.04/sqrt(2^12) ≈ 1.6%; 5% is ~3σ
  private val Tol = 0.05

  private def twoLevelEstimate: Map[String, Double] =
    Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap

  test("declared key: contract column TRUE everywhere, exact counts exact") {
    val got = SparkEntry.queries("agg_hll_merge")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === exact.keySet)
    for ((t, (n, ok)) <- got) {
      assert(n === exact(t), s"$t: exact side drifted")
      assert(ok, s"$t: merged estimate outside ±5% of exact")
    }
  }

  test("hll intersect: bounds honest, overlap laws hold") {
    val out = SparkEntry.queries("agg_hll_intersect")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.nonEmpty)
    // the Spark-side bound column must be TRUE everywhere or the
    // constant-TRUE oracle is dishonest
    out.foreach { case (a, b, _, ok) => assert(ok, s"($a,$b) out of bound") }
    // set laws: overlap ≤ each side's exact distinct; pair coverage is
    // the full unordered type square
    val perType = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (a, b, n, _) =>
      assert(a < b, "pairs must be unordered-canonical")
      assert(n <= math.min(perType(a), perType(b)), s"($a,$b) overlap law")
    }
    // pairs with zero common users legitimately drop out of the inner
    // join (both engines), so coverage is asserted as an upper bound +
    // positivity, not full-square presence (r17 review: full presence
    // was a corpus-distribution assumption)
    val types = perType.keySet
    assert(out.length <= types.size * (types.size - 1) / 2)
    out.foreach { case (a, b, n, _) =>
      assert(n >= 1L, s"($a,$b) emitted with zero overlap") }
  }

  test("two-level sketch rollup tracks exact distinct users per type") {
    val est = twoLevelEstimate
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet === exact.keySet)
    for ((t, e) <- exact)
      assert(math.abs(est(t) - e) <= Tol * e,
        s"$t: merged estimate ${est(t)} vs exact $e off by more than $Tol")
  }

  test("merged per-day sketches agree with the single-pass sketch") {
    val merged = twoLevelEstimate
    val single = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    for ((t, s1) <- single)
      assert(math.abs(merged(t) - s1) <= Tol * math.max(s1, 1.0),
        s"$t: two-level ${merged(t)} diverged from single-pass $s1")
  }
}
