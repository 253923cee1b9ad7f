package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 design probe (throwaway, never shipped as a key): nails down
  * (A) whether ANALYZE over an external table on the read-only single-file
  * testdata parquet works and what stats it yields, (B) what CostBasedJoinReorder
  * actually does to a hint-free 3-way join with/without stats, and (C) the
  * exact plan shape of an injected runtime bloom filter at test SF. */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- A. external table over a read-only single parquet FILE + ANALYZE
    for (t <- Seq("customer", "orders", "lineitem")) {
      val schema = Tables.table(spark, dir, t).schema.toDDL
      spark.sql(s"DROP TABLE IF EXISTS probe_$t")
      spark.sql(s"CREATE TABLE probe_$t ($schema) USING parquet " +
        s"LOCATION '${Tables.path(dir, t)}'")
      spark.sql(s"ANALYZE TABLE probe_$t COMPUTE STATISTICS FOR ALL COLUMNS")
      println(s"--- probe_$t count: " + spark.table(s"probe_$t").count())
    }
    spark.sql("DESC EXTENDED probe_orders").show(50, false)

    def joinPlan(s: SparkSession): DataFrame = {
      val l = s.table("probe_lineitem")
      val o = s.table("probe_orders")
      val c = s.table("probe_customer").where(col("c_mktsegment") === "BUILDING")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("o_orderpriority")
    }

    // ---- B. CBO reorder flip
    val cboOn = spark.newSession()
    cboOn.conf.set("spark.sql.cbo.enabled", "true")
    cboOn.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    println("=== default cbo.enabled: " +
      spark.conf.get("spark.sql.cbo.enabled") + " joinReorder: " +
      spark.conf.get("spark.sql.cbo.joinReorder.enabled"))
    println("=== CBO OFF optimized plan ===")
    println(joinPlan(spark).queryExecution.optimizedPlan.treeString.take(4000))
    println("=== CBO ON optimized plan ===")
    println(joinPlan(cboOn).queryExecution.optimizedPlan.treeString.take(4000))
    println("=== CBO ON stats of filtered customer ===")
    val fc = cboOn.table("probe_customer").where(col("c_mktsegment") === "BUILDING")
    println(fc.queryExecution.optimizedPlan.stats)
    println("=== CBO OFF stats of filtered customer ===")
    val fc2 = spark.table("probe_customer").where(col("c_mktsegment") === "BUILDING")
    println(fc2.queryExecution.optimizedPlan.stats)

    // ---- C. runtime bloom filter
    val bf = spark.newSession()
    bf.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    bf.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // At test SF the filtered dim fits the broadcast threshold, so
    // InjectRuntimeFilter sees a probably-broadcast join and skips (no
    // shuffle to save). Disabling auto-broadcast on the scoped session
    // recreates the at-scale shape where the rule fires.
    bf.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    println("=== default bloom enabled: " +
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    val ordSel = Tables.table(bf, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
    val li = Tables.table(bf, dir, "lineitem")
    val j = li.hint("merge").join(ordSel, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sp"))
      .orderBy("o_orderstatus")
    println("=== bloom optimized plan ===")
    println(j.queryExecution.optimizedPlan.treeString.take(6000))
    j.collect().foreach(println)
    println("=== bloom executed plan ===")
    println(j.queryExecution.executedPlan.treeString.take(6000))

    // ---- C2. CBO broadcast decision: with stats+CBO the FILTERED dim's
    // estimate shrinks below a threshold the raw size estimate exceeds
    val cbo2 = spark.newSession()
    cbo2.conf.set("spark.sql.cbo.enabled", "true")
    cbo2.conf.set("spark.sql.cbo.planStats.enabled", "true")
    cbo2.conf.set("spark.sql.adaptive.enabled", "false")
    val noCbo = spark.newSession()
    noCbo.conf.set("spark.sql.cbo.enabled", "false")
    noCbo.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sql("DESC EXTENDED probe_customer c_mktsegment").show(20, false)
    for (sess <- Seq(("cbo", cbo2), ("nocbo", noCbo))) {
      val (tag, ss) = sess
      org.apache.spark.sql.classic.SparkSession.setActiveSession(
        ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      val fcs = ss.table("probe_customer")
        .where(col("c_mktsegment") === "BUILDING" && col("c_acctbal") < 1000)
        .select("c_custkey")
        .queryExecution.optimizedPlan.stats
      println(s"=== $tag filtered2 stats (active session): $fcs")
      for (thr <- Seq("6144", "4096", "2048")) {
        // conf BEFORE construction; queryExecution is cached per frame,
        // so a fresh frame per threshold
        ss.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        val fc = ss.table("probe_customer")
          .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val joined = ss.table("probe_orders")
          .join(fc, col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        println(s"=== $tag thr=$thr: " +
          joined.queryExecution.executedPlan.toString
            .linesIterator.filter(_.contains("Join")).map(_.trim).mkString(" | "))
        ss.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }

    // ---- D. parquet aggregate pushdown (V2 path, footer-stats answers)
    val ap = spark.newSession()
    ap.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    ap.conf.set("spark.sql.sources.useV1SourceList", "")
    val agg = ap.read.parquet(Tables.path(dir, "lineitem"))
      .agg(count(lit(1)).as("n"), min("l_orderkey").as("mn"),
        max("l_extendedprice").as("mx"))
    println("=== agg pushdown plan ===")
    println(agg.queryExecution.executedPlan.treeString.take(3000))
    agg.collect().foreach(println)
    val agg2 = ap.read.parquet(Tables.path(dir, "lineitem"))
      .agg(min("l_shipdate").as("mn_ts"))
    println("=== agg pushdown TS plan ===")
    println(agg2.queryExecution.executedPlan.treeString.take(1500))
    // grouped variant: pushdown only works group-free or on partition cols
    spark.stop()
  }
}
