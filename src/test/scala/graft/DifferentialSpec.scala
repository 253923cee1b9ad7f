package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5: DataFrame-vs-SQL differential tests run entirely inside
  * Spark — the declared DataFrame query against the ANSI-compatible
  * subset of its own oracle SQL executed by spark.sql over temp views.
  * A second, independent evaluation path for the same semantics (the
  * DuckDB side of the oracle is exercised by the driver's t2 gate).
  */
class DifferentialSpec extends AnyFunSuite {
  import TestSpark._

  // oracle SQL that is both valid DuckDB and valid Spark SQL
  private val ansiKeys = Seq("udf_scalar", "udaf_aggregator", "dedup_exact",
                             "stream_dedup", "stream_stateful_count")

  private lazy val views = { Tables.registerAll(spark, sf); true }

  for (key <- ansiKeys)
    test(s"$key: DataFrame plan equals spark.sql(oracle)") {
      assert(views)
      val df = SparkEntry.queries(key)(spark, sf)
      val sql = spark.sql(SparkEntry.oracleSql(key))
      assert(rowSet(df) === rowSet(sql))
    }

  test("determinism: repeated runs under different shuffle widths agree") {
    val keys = Seq("agg_pricing_summary", "win_row_number_topk",
                   "join_asof", "text_tfidf")
    for (key <- keys) {
      val a = rowSet(SparkEntry.queries(key)(spark, sf))
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val b = rowSet(SparkEntry.queries(key)(spark, sf))
        assert(a === b, s"$key differs across shuffle widths")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
