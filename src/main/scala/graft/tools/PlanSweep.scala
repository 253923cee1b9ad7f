package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (r14): sweep every non-streaming declared key's executed plan
  * for silent degradations — SortAggregate where a hash agg was intended,
  * CartesianProduct, and codegen fallback markers. Prints one line per
  * finding; exits clean if none. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props("graft.staging") = "false"
    val skip = graft.streaming.Streams.drainKeys ++
      graft.ops.Pipeline.loopKeys
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (k <- (graft.SparkEntry.queries.keySet -- skip).toSeq.sorted) {
      try {
        val p = graft.SparkEntry.queries(k)(spark, dir)
          .queryExecution.executedPlan.toString
        val flags = Seq(
          "SortAggregate" -> p.contains("SortAggregate"),
          "Cartesian" -> p.contains("CartesianProduct"),
          "codegen-id-missing" -> !p.contains("WholeStageCodegen"))
          .collect { case (f, true) => f }
        if (flags.nonEmpty) println(s"[sweep] $k: ${flags.mkString(", ")}")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"[sweep] $k: PLAN FAILED ${e.getClass.getSimpleName}")
      }
    }
    println("[sweep] done")
    spark.stop()
  }
}
