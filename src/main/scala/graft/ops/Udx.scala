package graft.ops

import graft.{D, Tables}
import graft.QueryDefs.Q
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Buffer for the weighted-average Aggregator: running numerator/denominator. */
case class WAvgBuf(num: Double, den: Double)

/** The `documents` row as a typed record (typed_dataset_agg). Top-level so
  * Encoder codegen can instantiate it (the MediaMeta lesson). */
case class Doc(doc_id: Long, text: String, lang: String, source: String,
               n_chars: Long)

/** Typed UDAF (§2.9): weighted average of discount with quantity as the
  * weight. Partial aggregation comes for free — `reduce` runs map-side per
  * partition, `merge` combines the per-partition buffers, so one tiny
  * buffer per group crosses the shuffle exactly like a built-in agg.
  */
object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
  def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf =
    WAvgBuf(b.num + in._1 * in._2, b.den + in._2)
  def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
    WAvgBuf(a.num + b.num, a.den + b.den)
  def finish(b: WAvgBuf): Double = b.num / b.den
  def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** SURVEY.md §2.9 user-defined function surface: scalar UDF, typed
  * Aggregator UDAF, and the one-to-many generator (UDTF) shape.
  *
  * These deliberately use the extension APIs rather than built-ins — the
  * point of the keys is the extension mechanism. Scale note: a Scala UDF
  * breaks whole-stage codegen at the call site but still runs fully
  * distributed; the Aggregator keeps map-side partial aggregation; the
  * flatMap generator is a narrow transformation (no shuffle until the
  * downstream groupBy).
  */
object Udx {

  /** Customer tier from account balance — the scalar UDF under test. */
  private val tierUdf = udf((bal: Double) =>
    if (bal < 0) "debt"
    else if (bal < 3000) "low"
    else if (bal < 7000) "mid"
    else "high")

  val queries: Map[String, Q] = Map(

    "udf_scalar" -> ((s, dir) => {
      Tables.table(s, dir, "customer")
        .select(col("c_custkey"), tierUdf(col("c_acctbal")).as("tier"))
        .orderBy("c_custkey")
    }),

    // SQL-defined function (round 18) — Spark 4's `CREATE FUNCTION ...
    // RETURN <expr>`, the UDx path a SQL-first user reaches for FIRST
    // (no Scala involved). Unlike udf_scalar's black-box closure, the
    // analyzer INLINES the SQL body into the calling plan, so the tier
    // expression stays inside whole-stage codegen, constant-foldable
    // and pushdown-eligible — at 100 TB a SQL UDF is free where a Scala
    // UDF costs a codegen break at every call site. The declared query
    // rolls customers up per tier (count + 2dp balance sum); the oracle
    // is the hand-inlined CASE — which is exactly what the analyzer
    // produces, so a semantics drift in the inliner fails the hash.
    // CREATE OR REPLACE + a namespaced function name keep the DDL
    // idempotent on a shared session.
    "sql_udf" -> ((s, dir) => {
      Tables.table(s, dir, "customer")
        .createOrReplaceTempView("graft_sql_udf_customer")
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION graft_acct_tier(bal DOUBLE)
          |RETURNS STRING
          |RETURN CASE WHEN bal < 0 THEN 'debt'
          |            WHEN bal < 3000 THEN 'low'
          |            WHEN bal < 7000 THEN 'mid'
          |            ELSE 'high' END""".stripMargin)
      // balances sum as exact integer cents (SURVEY §7.3 money posture,
      // r18 ADVICE): a raw-double sum's partition order can differ from
      // DuckDB's near a 2dp rounding boundary — the tier FUNCTION stays
      // the feature under test, the rollup arithmetic is associative.
      s.sql(
        """SELECT graft_acct_tier(c_acctbal) AS tier, count(*) AS n,
          |       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
          |            AS DOUBLE) / 100.0 AS sum_bal
          |FROM graft_sql_udf_customer GROUP BY tier ORDER BY tier""".stripMargin)
    }),

    // Weighted-average discount (weight = quantity) per return flag via the
    // typed Aggregator, registered through functions.udaf.
    "udaf_aggregator" -> ((s, dir) => {
      val wavg = udaf(WeightedAvg)
      Tables.table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(D.r6(wavg(col("l_discount"), col("l_quantity")))
          .as("wavg_disc"))
        .orderBy("l_returnflag")
    }),

    // Generator/UDTF shape: one row in → many rows out via Dataset.flatMap
    // (the typed flatMap lowers to the same Generate/SerializeFromObject
    // plan family a custom Catalyst Generator would produce). Char 3-grams
    // over document text, top-20 by frequency with the gram as tie-break.
    "udtf_generator" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (_, t) =>
          val x = t.toLowerCase
          (0 to x.length - 3).map(i => x.substring(i, i + 3))
        }
        .toDF("gram")
        .groupBy("gram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram"))
        .limit(20)
    }),

    // The TYPED Dataset entry point as a declared key: case-class
    // Encoder → compile-time-checked lambda filter → groupByKey →
    // TypedColumn aggregates. The lambdas cost codegen at their call
    // sites (deserialization to Doc), but the AGGREGATION half stays
    // fully Catalyst: .as[T] TypedColumns are ordinary expressions, so
    // partial aggregation and the single groupByKey shuffle survive —
    // the shape a Dataset-first codebase actually runs.
    "typed_dataset_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents").as[Doc]
        .filter((d: Doc) => d.n_chars >= 120 && d.lang.nonEmpty)
        .groupByKey((d: Doc) => d.lang)
        .agg(count(lit(1)).as("n_docs").as[Long],
          sum(col("n_chars")).as("sum_chars").as[Long],
          countDistinct(col("source")).as("n_sources").as[Long])
        .toDF("lang", "n_docs", "sum_chars", "n_sources")
        .orderBy("lang")
    })
  )

  val oracles: Map[String, String] = Map(
    "sql_udf" ->
      // the hand-inlined body — identical to what Spark's analyzer
      // substitutes at the call site
      """SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
        |            WHEN c_acctbal < 3000 THEN 'low'
        |            WHEN c_acctbal < 7000 THEN 'mid'
        |            ELSE 'high' END AS tier,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
        |            AS DOUBLE) / 100.0 AS sum_bal
        |FROM customer GROUP BY tier ORDER BY tier""".stripMargin,
    "udf_scalar" ->
      """SELECT c_custkey,
        |       CASE WHEN c_acctbal < 0 THEN 'debt'
        |            WHEN c_acctbal < 3000 THEN 'low'
        |            WHEN c_acctbal < 7000 THEN 'mid'
        |            ELSE 'high' END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "udaf_aggregator" ->
      """SELECT l_returnflag,
        |       round(sum(l_discount * l_quantity) / sum(l_quantity), 6)
        |         AS wavg_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udtf_generator" ->
      """WITH g AS (
        |  SELECT substring(lower(text), CAST(t.i AS INTEGER), 3) AS gram
        |  FROM documents, unnest(generate_series(1, length(text) - 2)) AS t(i))
        |SELECT gram, count(*) AS n FROM g
        |GROUP BY gram ORDER BY n DESC, gram LIMIT 20""".stripMargin,
    "typed_dataset_agg" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       count(DISTINCT source) AS n_sources
        |FROM documents WHERE n_chars >= 120 AND length(lang) > 0
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
