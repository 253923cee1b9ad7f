package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join auto-handling (r16 verdict item 4): `join_skew_salted`
  * proves the MANUAL mitigation; this spec proves the engine's own
  * runtime split fires on a planted hot key and changes nothing about
  * the result — the stats_cbo_broadcast causality pattern: the skew
  * marker appears WITH the feature, disappears WITHOUT it, and both
  * plans agree row-for-row.
  *
  * The skew is planted deterministically (event_id % 10 < 9 → key 0:
  * ~90% of the fact side in one join key) and the thresholds are scoped
  * DOWN (a Scoped child session, never s.conf.set — the r13 lesson) so
  * the toy corpus crosses them: skewedPartitionFactor 1 + 1 kB
  * threshold + 1 kB advisory target make the hot partition "skewed"
  * at test SF exactly the way a 100 TB hot key is at defaults.
  * Broadcast is disabled so the join actually plans as SMJ — the only
  * shape OptimizeSkewedJoin rewrites.
  */
class AqeSkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def shape(s: SparkSession) = {
    // The upstream repartition(8) exists for the WITNESS, not the data:
    // a skewed reduce partition is split at MAPPER boundaries, and the
    // single-row-group test parquet yields one mapper no matter the
    // split-size confs — nothing to split at. Eight upstream tasks give
    // the hot partition eight mapper chunks, the shape a real corpus's
    // thousands of input splits give it for free.
    val e = Tables.events(s, sf)
      .select(when(col("event_id") % 10 < 9, lit(0L))
        .otherwise(col("event_id") % 1000).as("k"), col("value"))
      .repartition(8, col("value"))
    // range, not events.distinct(): a post-shuffle aggregate between the
    // dim's Sort and its ShuffleQueryStage breaks the canonical
    // SMJ(Sort(stage), Sort(stage)) shape OptimizeSkewedJoin pattern-
    // matches, and the rule silently skips (verified)
    val d = s.range(0, 1000)
      .select(col("id").as("k"), (col("id") * 2).as("w"))
    // GLOBAL aggregate downstream, deliberately: a groupBy on the join
    // key would REQUIRE the join's hash partitioning and AQE refuses a
    // skew split that forces an extra shuffle (verified: no skew=true
    // with groupBy(k)); the global agg leaves the join's output
    // partitioning unconstrained, which is the shape the optimization
    // is legal in without forceOptimizeSkewedJoin.
    e.join(d, "k")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"),
        sum(col("k") * col("w")).as("kw"))
  }

  /** Final adaptive plan string after execution (AQE only finalizes on
    * run), plus the collected rows it produced. */
  private def run(s: SparkSession): (String, Set[Seq[String]]) = {
    val df = shape(s)
    val rows = df.collect().map(_.toSeq.map(String.valueOf)).toSet
    val exec = df.queryExecution.executedPlan
    val fin = exec.collectFirst { case a: AdaptiveSparkPlanExec =>
      a.executedPlan.toString }.getOrElse(exec.toString)
    (fin, rows)
  }

  test("AQE splits the planted hot key (skew=true in the final SMJ) and " +
    "the result equals the unsplit join") {
    val base = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // scoped-down thresholds: the hot partition must qualify at toy SF
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1k",
      // coalescing would merge the tiny dim partitions below the skew
      // reader and muddy the witness; the skew split works either way
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // a skewed reduce partition is split at MAPPER boundaries — one
      // map task (one small parquet split) leaves nothing to split at.
      // Splitting the scan gives the hot partition multiple mapper
      // chunks, the same shape a real corpus's thousands of input
      // splits give it for free.
      "spark.sql.files.maxPartitionBytes" -> "4k",
      "spark.sql.files.openCostInBytes" -> "1k")
    val on = Scoped.session(spark, "aqe_skew_on",
      base :+ ("spark.sql.adaptive.skewJoin.enabled" -> "true"))
    val off = Scoped.session(spark, "aqe_skew_off",
      base :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"))
    val (pOn, rOn) = run(on)
    val (pOff, rOff) = run(off)
    assert(pOn.contains("skew=true"),
      s"skew split did not fire; final plan:\n${pOn.take(2000)}")
    assert(!pOff.contains("skew=true"),
      "skew marker present with skewJoin disabled — witness is not causal")
    assert(rOn === rOff, "skew split changed the join result")
    assert(rOn.nonEmpty)
  }

  test("the declared join_skew_aqe key fires the skew split in ITS plan") {
    // The key's own scoped session carries the scoped-down thresholds;
    // the driver gate pins its rows — this pins the WITNESS, so the key
    // can never silently degrade into a plain SMJ that no longer
    // exercises OptimizeSkewedJoin.
    val df = SparkEntry.queries("join_skew_aqe")(spark, sf)
    val rows = df.collect()
    assert(rows.length === 1 && rows(0).getLong(0) > 0)
    val fin = df.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
    }.getOrElse(df.queryExecution.executedPlan.toString)
    assert(fin.contains("skew=true"),
      s"declared key lost its skew split; final plan:\n${fin.take(2000)}")
  }
}
