package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke gate: entry(spark) must return
  * at least one row on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = SparkEntry.entry(spark).collect()
    println(s"[smoke] entry returned ${rows.length} rows")
    rows.take(3).foreach(r => println(s"[smoke] $r"))
    assert(rows.nonEmpty, "entry returned 0 rows")
    spark.stop()
  }
}
