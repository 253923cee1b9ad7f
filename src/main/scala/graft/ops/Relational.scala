package graft.ops

import graft.{D, Tables}
import graft.QueryDefs.Q
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 scans/sources, §2.2 projection/filter, §2.6 sort/limit/set
  * ops. All stock DataFrame API — Catalyst handles pushdown/pruning; every
  * query ends in a total order (§7.3).
  */
object Relational {

  val queries: Map[String, Q] = Map(
    // §2.1 ------------------------------------------------------------
    "scan_project" -> ((s, dir) =>
      Tables.table(s, dir, "nation").orderBy("n_nationkey")),

    "scan_pushdown" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("2001-06-01").cast("timestamp") &&
               col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // output TIMESTAMP (not DATE) on both sides — avoids date/timestamp
    // representation drift in the driver's hash compare
    "scan_events_ns" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("day")),

    "source_json_lines" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("int").as("k"))
        .where(col("k") < 10)
        .orderBy("event_id")),

    // (round 15) AGGREGATE pushdown: MIN/MAX/COUNT answered from parquet
    // FOOTER statistics, no row ever decoded — the 100 TB "how big is
    // this table / what's its key range" query that should cost one
    // metadata read per file, not a scan. Needs the V2 parquet path
    // (spark.sql.sources.useV1SourceList excludes parquet) +
    // spark.sql.parquet.aggregatePushdown, both on a Scoped child
    // session: V1 is the engine's default read path everywhere else and
    // must stay so. PlanAuditSpec asserts the scan says
    // `PushedAggregation: [COUNT(*), MIN(...), ...]` with an
    // aggregate-shaped ReadSchema. Pushdown contract caveats (probed on
    // this Spark): timestamps are not pushable (footer min/max of int96/
    // NTZ is untrusted), and any non-pushable aggregate or filter in the
    // query demotes the WHOLE pushdown — so this key keeps to long/double
    // columns, no filter, global group. Values are selections of stored
    // values (no arithmetic) → bitwise-stable unrounded.
    "scan_agg_pushdown" -> ((s, dir) => {
      val v2 = graft.Scoped.session(s, "aggpush", Seq(
        "spark.sql.parquet.aggregatePushdown" -> "true",
        "spark.sql.sources.useV1SourceList" -> ""))
      v2.read.parquet(Tables.path(dir, "lineitem"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    // §2.2 ------------------------------------------------------------
    // Per-row double arithmetic is IEEE-identical across engines when the
    // expression tree matches, so emit it UNROUNDED: rounding a per-row
    // double actually introduces cross-engine drift (Spark rounds the
    // shortest decimal repr, DuckDB the exact binary value) while the raw
    // product is bitwise equal. Round only aggregates (§7.3).
    "project_expr" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                (col("l_extendedprice") * (lit(1) - col("l_discount")) *
                 (lit(1) + col("l_tax"))).as("net_price"))
        .orderBy("l_orderkey", "l_linenumber")),

    "filter_compound" -> ((s, dir) =>
      Tables.table(s, dir, "orders")
        .where(col("o_orderstatus") === "F" &&
               col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
               col("o_totalprice").between(1000, 200000) &&
               !col("o_orderpriority").like("3%"))
        .select(col("o_orderkey"), col("o_orderpriority"),
                col("o_totalprice").as("total"))
        .orderBy("o_orderkey")),

    "filter_null_semantics" -> ((s, dir) =>
      Tables.table(s, dir, "orders")
        .select(col("o_orderkey"),
                expr("nullif(o_orderstatus, 'P')").as("st"))
        .select(col("o_orderkey"), col("st"),
                col("st").isNull.as("st_is_null"),
                col("st").eqNullSafe(lit("F")).as("st_eq_f"))
        .orderBy("o_orderkey")),

    "case_when_coalesce" -> ((s, dir) =>
      Tables.table(s, dir, "orders")
        .select(col("o_orderkey"),
                when(col("o_totalprice") < 50000, "small")
                  .when(col("o_totalprice") < 150000, "medium")
                  .otherwise("large").as("bucket"),
                coalesce(expr("nullif(o_orderstatus, 'P')"), lit("none"))
                  .as("st"))
        .orderBy("o_orderkey")),

    // §2.6 ------------------------------------------------------------
    "sort_multikey" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("l_returnflag"), col("l_extendedprice").as("price"),
                col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_returnflag").asc, col("price").desc,
                 col("l_orderkey").asc, col("l_linenumber").asc)),

    "limit_global" -> ((s, dir) =>
      Tables.table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice").as("total"))),

    "set_union_all" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .unionAll(o.where(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    "set_union_distinct" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .union(o.where(col("o_orderstatus") === "O").select("o_custkey"))
        .distinct()
        .orderBy("o_custkey")
    }),

    "set_intersect" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.where(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    "set_except" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.where(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    "set_intersect_all" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .intersectAll(o.where(col("o_orderstatus") === "O")
          .select("o_custkey"))
        .orderBy("o_custkey")
    }),

    "set_except_all" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .exceptAll(o.where(col("o_orderstatus") === "O")
          .select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // The SQL-text entry point (SURVEY §3 EP2) as a declared key, built
    // to exercise the subquery machinery Catalyst must decorrelate: a
    // CTE, an UNCORRELATED scalar subquery (the avg threshold), a
    // CORRELATED scalar subquery (per-customer count — rewritten to an
    // aggregate + outer join), and a correlated EXISTS (rewritten to a
    // semi join). The oracle is the IDENTICAL SQL text — both engines
    // speak it unchanged, which is itself the portability claim.
    "sql_subquery_cte" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(SubqueryCteSql)
    }),

    // Recursive CTE (new in Spark 4's parser) — the hierarchy-walk class
    // (BOM explosion, org chart, ancestry). Each user's ancestor chain in
    // a binary-tree hierarchy (parent(u) = ⌊u/2⌋, roots at u ≤ 1): the
    // recursion is LINEAR — every level is a projection of the previous
    // one, no join — so the iteration count is the tree DEPTH (log N) and
    // each level is one users-dim-sized map stage; state never exceeds
    // one level. floor(x/2) is spelled portably (both engines' `/` on
    // this operand pair would differ: Spark int DIV vs DuckDB float).
    // The oracle is the IDENTICAL SQL text, like sql_subquery_cte.
    "sql_recursive_cte" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(RecursiveCteSql)
    })
  )

  private val RecursiveCteSql =
    """WITH RECURSIVE anc AS (
      |  SELECT user_id, user_id AS cur, 0 AS depth
      |  FROM (SELECT DISTINCT user_id FROM events)
      |  UNION ALL
      |  SELECT user_id, CAST(floor(cur / 2.0) AS BIGINT), depth + 1
      |  FROM anc WHERE cur > 1)
      |SELECT user_id, CAST(max(depth) AS BIGINT) AS depth,
      |       CAST(count(*) AS BIGINT) AS n_nodes,
      |       CAST(sum(cur) AS BIGINT) AS path_sum
      |FROM anc GROUP BY user_id ORDER BY user_id""".stripMargin

  private val SubqueryCteSql =
    """WITH big AS (
      |  SELECT o_custkey FROM orders
      |  WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders))
      |SELECT c_custkey, c_name,
      |       (SELECT count(*) FROM big b
      |        WHERE b.o_custkey = c.c_custkey) AS n_big
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM big b WHERE b.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  val oracles: Map[String, String] = Map(
    "scan_project" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "scan_agg_pushdown" ->
      // same stored-value selections; the Spark side answers them from
      // parquet footers, DuckDB from its own scan — equality proves the
      // footer stats tell the truth about the rows
      ("SELECT count(*) AS n_rows, " +
       "min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey, " +
       "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, " +
       "max(l_extendedprice) AS max_price FROM lineitem"),
    "scan_pushdown" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '2001-06-01' AND l_quantity < 10 " +
       "ORDER BY l_orderkey, l_linenumber"),
    "scan_events_ns" ->
      ("SELECT date_trunc('day', ts) AS day, count(*) AS cnt " +
       "FROM events GROUP BY 1 ORDER BY 1"),
    "source_json_lines" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
       "FROM events WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) < 10 " +
       "ORDER BY event_id"),
    "project_expr" ->
      ("SELECT l_orderkey, l_linenumber, " +
       "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price " +
       "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "filter_compound" ->
      ("SELECT o_orderkey, o_orderpriority, o_totalprice AS total " +
       "FROM orders WHERE o_orderstatus = 'F' " +
       "AND o_orderpriority IN ('1-URGENT', '2-HIGH') " +
       "AND o_totalprice BETWEEN 1000 AND 200000 " +
       "AND o_orderpriority NOT LIKE '3%' ORDER BY o_orderkey"),
    "filter_null_semantics" ->
      ("SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, " +
       "(nullif(o_orderstatus, 'P') IS NULL) AS st_is_null, " +
       "(nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F') AS st_eq_f " +
       "FROM orders ORDER BY o_orderkey"),
    "case_when_coalesce" ->
      ("SELECT o_orderkey, " +
       "CASE WHEN o_totalprice < 50000 THEN 'small' " +
       "WHEN o_totalprice < 150000 THEN 'medium' ELSE 'large' END AS bucket, " +
       "coalesce(nullif(o_orderstatus, 'P'), 'none') AS st " +
       "FROM orders ORDER BY o_orderkey"),
    "sort_multikey" ->
      ("SELECT l_returnflag, l_extendedprice AS price, " +
       "l_orderkey, l_linenumber FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '2001-01-01' " +
       "ORDER BY l_returnflag, price DESC, l_orderkey, l_linenumber"),
    "limit_global" ->
      ("SELECT o_orderkey, o_totalprice AS total FROM orders " +
       "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
    "set_union_all" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' UNION ALL " +
       "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
       "ORDER BY o_custkey"),
    "set_union_distinct" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' UNION " +
       "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
       "ORDER BY o_custkey"),
    "set_intersect" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' INTERSECT " +
       "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
       "ORDER BY o_custkey"),
    "set_except" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' EXCEPT " +
       "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
       "ORDER BY o_custkey"),
    "set_intersect_all" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' INTERSECT ALL " +
       "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
       "ORDER BY o_custkey"),
    "set_except_all" ->
      ("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' EXCEPT ALL " +
       "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
       "ORDER BY o_custkey"),
    "sql_subquery_cte" -> SubqueryCteSql,
    "sql_recursive_cte" -> RecursiveCteSql
  )
}
