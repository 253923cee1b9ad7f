package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.4: agg_approx_quantile is declared no-oracle (quantile-summary
  * compression is engine-specific), so its correctness contract lives here.
  * Two teeth: (1) the DECLARED key's accuracy (10000) exceeds the per-group
  * cardinality at test SF, so the summary never compresses and the output
  * must EQUAL the exact percentile; (2) the real approximation path
  * (accuracy 100, summaries genuinely compressed+merged) must satisfy the
  * Greenwald-Khanna rank guarantee: the returned value's rank is within
  * n/accuracy of the target rank.
  */
class ApproxQuantileSpec extends AnyFunSuite {
  import TestSpark._

  test("declared key (uncompressed summary) equals exact percentiles") {
    val approx = SparkEntry.queries("agg_approx_quantile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = Tables.table(spark, sf, "orders")
      .groupBy("o_orderstatus")
      .agg(D.r2(percentile(col("o_totalprice"), lit(0.5))).as("q50"),
           D.r2(percentile(col("o_totalprice"), lit(0.9))).as("q90"),
           D.r2(percentile(col("o_totalprice"), lit(0.99))).as("q99"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet === exact.keySet)
    // percentile() interpolates between the two straddling values while the
    // GK summary returns an OBSERVED value — on an uncompressed summary the
    // approx answer is one of the two values percentile interpolates
    // between, so it matches the exact answer to within one observed gap.
    // Per-group spreads here make that gap < 1% of the value.
    for ((st, (a50, a90, a99)) <- approx; (e50, e90, e99) = exact(st)) {
      assert(math.abs(a50 - e50) <= 0.01 * e50, s"$st q50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= 0.01 * e90, s"$st q90: $a90 vs $e90")
      assert(math.abs(a99 - e99) <= 0.01 * e99, s"$st q99: $a99 vs $e99")
    }
  }

  test("compressed summaries (accuracy 100) meet the GK rank guarantee") {
    val acc = 100
    val approx = Tables.table(spark, sf, "orders")
      .groupBy("o_orderstatus")
      .agg(percentile_approx(col("o_totalprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(acc)).as("q"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val rows = Tables.table(spark, sf, "orders")
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((st, qs) <- approx; (p, v) <- Seq(0.5, 0.9, 0.99).zip(qs)) {
      val xs = rows(st); val n = xs.length
      val rank = xs.count(_ <= v)
      val target = p * n
      assert(math.abs(rank - target) <= n.toDouble / acc + 1,
        s"$st p=$p: value $v has rank $rank, target $target, n=$n")
    }
  }
}
