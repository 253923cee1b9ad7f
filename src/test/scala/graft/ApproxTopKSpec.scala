package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** agg_approx_topk's EVICTION regime (r15 verdict item 7): the declared
  * key runs under its exactness condition (capacity ≥ distinct), which
  * the DuckDB oracle pins; this spec runs the same sketch UNDER capacity
  * on a planted-frequency corpus — the one path that was documented but
  * unexercised — and asserts the frequent-items error contract.
  *
  * Bound used: Spark's approx_top_k wraps the DataSketches frequent-items
  * sketch with maxMapSize = 2^ceil(log2(ceil(maxItemsTracked / 0.75)))
  * (ApproxTopK.calMaxMapSize), whose published guarantee is
  * |est − true| ≤ 3.5·n / maxMapSize — the Misra-Gries bound family with
  * the purge-strategy constant. The planted corpus separates the heavy
  * hitters from the bound by >2×, so rank order must also survive.
  */
class ApproxTopKSpec extends AnyFunSuite {
  import TestSpark._

  // 5 hot items at 2000·j occurrences + 5000 singleton tail items:
  // n = 30000 + 5000, distinct = 5005 — far over the sketch capacity,
  // so purges MUST happen. Single partition keeps insertion order (and
  // therefore the purge schedule) reproducible run-to-run.
  private lazy val plantedN: Int = {
    val sess = spark
    import sess.implicits._
    val hot = (1 to 5).flatMap(j => Seq.fill(2000 * j)(s"hot_$j"))
    val tail = (0 until 5000).map(i => s"tail_$i")
    (hot ++ tail).toDF("item").repartition(1)
      .createOrReplaceTempView("planted_items")
    hot.size + tail.size
  }

  test("under capacity: heavy hitters survive eviction within the " +
    "Misra-Gries error bound") {
    val n = plantedN
    val maxTracked = 64
    val maxMapSize = math.pow(2,
      math.ceil(math.log(math.ceil(maxTracked / 0.75)) / math.log(2))).toInt
    assert(maxMapSize === 128)
    assert(5005 > maxMapSize, "corpus no longer exceeds sketch capacity")
    val bound = 3.5 * n / maxMapSize // ≈ 957 < the 2000 inter-hot gap
    val got = spark.sql(
      s"""SELECT t.item, t.count AS n FROM (
         |  SELECT explode(approx_top_k(item, 5, $maxTracked)) AS t
         |  FROM planted_items)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length === 5)
    // rank order: counts are gap-separated by > 2× the bound, so the
    // sketch must return exactly the planted hots, heaviest first
    assert(got.map(_._1).toSeq ===
      (5 to 1 by -1).map(j => s"hot_$j"),
      s"top-5 ranking broke under eviction: ${got.toSeq}")
    for ((item, est) <- got) {
      val truth = 2000L * item.stripPrefix("hot_").toInt
      assert(math.abs(est - truth) <= bound,
        s"$item estimated $est vs true $truth — outside ±$bound " +
          "(3.5·n/maxMapSize), the sketch's published error contract")
    }
  }

  test("exactness condition still holds at capacity >= distinct") {
    // the declared key's regime on the same planted corpus: capacity
    // 8192 > 5005 distinct ⇒ no eviction ⇒ every count exact
    plantedN
    val got = spark.sql(
      """SELECT t.item, t.count AS n FROM (
        |  SELECT explode(approx_top_k(item, 5, 8192)) AS t
        |  FROM planted_items)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = (1 to 5).map(j => s"hot_$j" -> 2000L * j).toMap
    assert(got === want)
  }
}
