package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** R21 optimization-round plan capture: write `.explain("formatted")`
  * output for declared keys to `<outDir>/<key>_<suffix>.txt`
  * (plans/r21/ — the judge checks plan claims against these files).
  * Executes each query first so the printed plan is the FINAL adaptive
  * plan (AQE reuse, runtime join demotions), matching what the bench
  * actually runs; pass --initial to skip execution.
  *
  * Usage: runMain graft.tools.R21Plan <key1,key2,...> <outDir> <suffix>
  *        [sfDir] [--initial]
  */
object R21Plan {
  def main(args: Array[String]): Unit = {
    val operands = args.filterNot(_.startsWith("--"))
    val keys = operands.headOption.getOrElse(
      sys.error("usage: R21Plan <key,...> <outDir> <suffix> [sfDir]"))
      .split(",").toSeq
    val outDir = operands.lift(1).getOrElse(sys.error("need outDir"))
    val suffix = operands.lift(2).getOrElse(sys.error("need suffix"))
    val sfDir = operands.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { key =>
      val df = graft.SparkEntry.queries(key)(spark, sfDir)
      if (!args.contains("--initial")) df.count()
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      val out = Paths.get(outDir, s"${key}_$suffix.txt")
      Files.write(out, txt.getBytes("UTF-8"))
      println(s"[r21plan] wrote $out (${txt.length} chars)")
    }
    spark.stop()
  }
}
