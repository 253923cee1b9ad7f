package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.4: agg_approx_distinct is declared no-oracle, so its
  * correctness contract lives here — HLL++ estimate within ±5% of the
  * exact distinct count (the rsd the query requests). */
class ApproxDistinctSpec extends AnyFunSuite {
  import TestSpark._

  for ((table, column) <- Seq("orders" -> "o_custkey",
                              "lineitem" -> "l_partkey",
                              "events" -> "user_id"))
    test(s"approx_count_distinct($table.$column) within 5% of exact") {
      val row = Tables.table(spark, sf, table)
        .agg(approx_count_distinct(col(column), 0.05).as("approx"),
             countDistinct(col(column)).as("exact"))
        .head()
      val (approx, exact) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
      assert(math.abs(approx - exact) <= 0.05 * exact,
        s"approx=$approx exact=$exact off by more than 5%")
    }

  test("declared agg_approx_distinct query runs and is plausible") {
    val out = SparkEntry.queries("agg_approx_distinct")(spark, sf).collect()
    assert(out.nonEmpty)
  }

  test("tolerance holds at sf0.1 too (bench-scale cardinalities)") {
    // sf0.001's cardinalities are small enough that HLL++ runs in its
    // exact sparse mode; sf0.1 pushes it into genuine estimation, so the
    // rsd contract is asserted where it actually bites.
    val row = Tables.table(spark, "/root/testdata/sf0.1", "lineitem")
      .agg(approx_count_distinct(col("l_partkey"), 0.05).as("approx"),
           countDistinct(col("l_partkey")).as("exact"))
      .head()
    val (approx, exact) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) <= 0.05 * exact,
      s"approx=$approx exact=$exact off by more than 5% at sf0.1")
  }
}
