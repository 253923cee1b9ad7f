package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the events NTZ question (r9 verdict item 5): the
  * adaptive reader casts TimestampNTZ `ts` to session-TZ TimestampType
  * (`Tables.normalizeTs`) — metadata-only under UTC, but a filter ON the
  * cast column can no longer push to the parquet scan. This prints the
  * pushed-filter line for a raw-ts range predicate against (a) the raw
  * NTZ scan and (b) the normalized surface, so the cost of the cast is
  * measured, not guessed. Not part of the driver contract.
  */
object NtzProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = graft.Tables.path(sfDir, "events")

    val raw = spark.read.parquet(path)
    println(s"[ntz] physical ts type: ${raw.schema("ts").dataType}")
    def pushed(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val line = plan.linesIterator.find(_.contains("PushedFilters"))
        .getOrElse("<no scan node?>")
      val pf = line.indexOf("PushedFilters")
      println(s"[ntz] $label: ${line.substring(pf.max(0)).take(200)}")
    }
    // (a) raw scan, NTZ-typed predicate — the pushdown-eligible shape
    pushed(raw.where(col("ts") >= to_timestamp_ntz(lit("2025-06-01")))
      .select("event_id", "ts"), "raw NTZ filter   ")
    // (b) normalized surface, the same wall-clock predicate on cast ts
    pushed(graft.Tables.events(spark, sfDir)
      .where(col("ts") >= to_timestamp(lit("2025-06-01")))
      .select("event_id", "ts"), "normalized filter")
    spark.stop()
  }
}
