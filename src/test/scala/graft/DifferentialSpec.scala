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
                             "stream_dedup", "stream_stateful_count",
                             "sample_stratified")

  private lazy val views = { Tables.registerAll(spark, sf); true }

  for (key <- ansiKeys)
    test(s"$key: DataFrame plan equals spark.sql(oracle)") {
      assert(views)
      val df = SparkEntry.queries(key)(spark, sf)
      val sql = spark.sql(SparkEntry.oracleSql(key))
      assert(rowSet(df) === rowSet(sql))
    }

  test("sweep: every Spark-parseable oracle SQL agrees with its DataFrame") {
    assert(views)
    // DuckDB-dialect oracles (list_*, string_split, LATERAL, ASOF …) fail
    // Spark's parser/analyzer and are skipped — but a skip is only allowed
    // for that reason; an SQL that RUNS and disagrees fails the suite.
    var compared = 0
    val skipped = scala.collection.mutable.ListBuffer[String]()
    for ((key, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
         if !ansiKeys.contains(key)) {
      val parsed =
        try Some(spark.sql(sql))
        catch { case _: Exception => skipped += key; None }
      parsed.foreach { sdf =>
        val rows =
          try Some(rowSet(sdf))
          catch { case _: Exception => skipped += key; None } // runtime dialect gap
        rows.foreach { r =>
          assert(r === rowSet(SparkEntry.queries(key)(spark, sf)),
            s"$key: spark.sql(oracle) disagrees with the DataFrame query")
          compared += 1
        }
      }
    }
    info(s"compared $compared, dialect-skipped ${skipped.size}: ${skipped.mkString(", ")}")
    assert(compared >= 25, s"sweep degenerated: only $compared oracle SQLs ran in Spark")
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
