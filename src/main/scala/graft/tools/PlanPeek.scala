package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch: print the executed plan of the given keys (args(0) = sfDir,
  * rest = key names) so pushdown/exchange shapes can be eyeballed without
  * a test cycle. Not part of the driver contract. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props("graft.staging") = "false"
    args.drop(1).foreach { k =>
      println(s"===== $k =====")
      println(SparkEntry.queries(k)(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
