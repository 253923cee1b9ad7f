package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.4: agg_approx_quantile is ORACLED since r15 — the declared
  * key runs REAL compression (accuracy 100) and emits GK's deterministic
  * rank guarantee as constant-TRUE contract columns the driver gate pins.
  * This spec keeps the direct, value-level teeth the contract columns
  * compress away: (1) an UNCOMPRESSED summary (accuracy > per-group n)
  * must return an exactly rank-correct observed value; (2) the compressed
  * path's returned VALUES (not just the key's booleans) satisfy the GK
  * rank bound against a driver-side sort; (3) the declared key's contract
  * columns are all TRUE with the right group sizes.
  */
class ApproxQuantileSpec extends AnyFunSuite {
  import TestSpark._

  // same HALF_UP-on-shortest-repr rounding as Spark's round(x, 2)
  private def r2d(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def sortedByStatus: Map[String, Array[Double]] =
    Tables.table(spark, sf, "orders")
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

  test("declared key: every GK rank contract is TRUE, group sizes exact") {
    val got = SparkEntry.queries("agg_approx_quantile")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    val rows = sortedByStatus
    assert(got.keySet === rows.keySet)
    for ((st, (n, a, b, c)) <- got) {
      assert(n === rows(st).length, s"$st: group size drifted")
      assert(a && b && c, s"$st: a rank contract came back FALSE — the " +
        "GK guarantee is deterministic, so this is a real sketch defect")
    }
  }

  test("uncompressed summary returns a rank-exact observed value") {
    val acc = 10000 // > per-group n at test SF → summary never compresses
    val approx = Tables.table(spark, sf, "orders")
      .groupBy("o_orderstatus")
      .agg(percentile_approx(col("o_totalprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(acc)).as("q"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).map(r2d)).toMap
    val rows = sortedByStatus
    assert(approx.keySet === rows.keySet)
    // percentile() interpolates between the two observed values straddling
    // the target rank, while the GK summary returns an OBSERVED value — on
    // an uncompressed summary the approx answer must be one of those two
    // straddling values exactly (no data-dependent tolerance: the gap
    // between them can be arbitrarily wide in a regenerated corpus).
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
    val rows = sortedByStatus
    for ((st, qs) <- approx; (p, v) <- Seq(0.5, 0.9, 0.99).zip(qs)) {
      val xs = rows(st); val n = xs.length
      val rank = xs.count(_ <= v)
      val target = p * n
      assert(math.abs(rank - target) <= n.toDouble / acc + 1,
        s"$st p=$p: value $v has rank $rank, target $target, n=$n")
    }
  }
}
