package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of one declared key
  * (staging bypassed, so the real computation subtree shows instead of a
  * staged-file scan — the same view PlanAuditSpec audits). Usage:
  * `runMain graft.tools.PlanPeek <key> [sfDir]`. Round-14 provenance:
  * found join_fuzzy_blocked's min(struct) argmin silently planning as
  * SortAggregate, which led to the packed-long form. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props("graft.staging") = "false"
    val operands = args.filterNot(_.startsWith("--"))
    val key = operands.headOption.getOrElse(
      sys.error("usage: PlanPeek <key> [sfDir] [--run|--codegen]"))
    val dir = operands.lift(1).getOrElse("/root/testdata/sf0.001")
    // `--codegen` prints per-subtree generated-code sizes instead of the
    // plan (AQE is disabled for that view — codegenStringSeq cannot see
    // through an AdaptiveSparkPlanExec root).
    if (args.contains("--codegen"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = graft.SparkEntry.queries(key)(spark, dir)
    // `--run` executes first so the printed plan is the FINAL adaptive
    // plan (AQE exchange reuse, runtime join demotions) instead of the
    // initial one.
    if (args.contains("--run")) df.count()
    if (args.contains("--codegen"))
      org.apache.spark.sql.execution.debug
        .codegenStringSeq(df.queryExecution.executedPlan)
        .zipWithIndex.foreach { case ((sub, code, st), i) =>
          println(s"=== subtree $i: maxMethod=${st.maxMethodCodeSize}B " +
            s"codeLines=${code.linesIterator.length} ===")
          println(sub.linesIterator.take(12).mkString("\n"))
        }
    else println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
