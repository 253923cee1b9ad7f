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

  // same HALF_UP-on-shortest-repr rounding as Spark's round(x, 2)
  private def r2d(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("declared key (uncompressed summary) returns a rank-exact observed value") {
    val approx = SparkEntry.queries("agg_approx_quantile")(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val rows = Tables.table(spark, sf, "orders")
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet === rows.keySet)
    // percentile() interpolates between the two observed values straddling
    // the target rank, while the GK summary returns an OBSERVED value — on
    // an uncompressed summary the approx answer must be one of those two
    // straddling values exactly (no data-dependent tolerance: the gap
    // between them can be arbitrarily wide in a regenerated corpus). The
    // declared output is r2-rounded, so compare at 2dp.
    for ((st, qs) <- approx; (p, v) <- Seq(0.5, 0.9, 0.99).zip(qs)) {
      val xs = rows(st)
      val lo = r2d(xs(math.floor(p * (xs.length - 1)).toInt))
      val hi = r2d(xs(math.ceil(p * (xs.length - 1)).toInt))
      assert(v == lo || v == hi,
        s"$st p=$p: approx $v is neither straddling value ($lo, $hi)")
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
