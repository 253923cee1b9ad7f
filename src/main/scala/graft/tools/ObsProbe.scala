package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** r21 probe: does `df.observe(Observation, ...)` deliver its metric when
  * the materializing action is an EAGER localCheckpoint (the CcCuts cut),
  * and does the metric row survive AQE? If yes, the CC fixpoint's
  * convergence count can ride the checkpoint job instead of paying a
  * second count job per round. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1L to 1000L).toDF("doc")
      .groupBy((col("doc") % 7).as("doc")).agg(min("doc").as("lbl"))
      .withColumn("old", when(col("doc") < 3, col("lbl")))
    val obs = Observation("probe")
    val observed = df.observe(obs,
      count(when(col("lbl") =!= col("old") || col("old").isNull, 1))
        .as("changed"))
      .select("doc", "lbl")
    val t0 = System.nanoTime()
    val cut = observed.localCheckpoint(true)
    val t1 = System.nanoTime()
    // obs.get blocks until the listener fires — bound it so a silent
    // never-fires answer shows up as a loud timeout instead of a hang
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val m = Await.result(Future(obs.get), 15.seconds)
    println(s"[obsprobe] checkpoint=${math.round((t1 - t0) / 1e6)}" +
      s"ms metrics=$m rows=${cut.count()}")
    // same question for the RELIABLE checkpoint path (graft.cc.checkpointDir)
    spark.sparkContext.setCheckpointDir("/tmp/obsprobe_ckpt")
    val obs2 = Observation("probe-reliable")
    val cut2 = df.observe(obs2,
      count(when(col("lbl") =!= col("old") || col("old").isNull, 1))
        .as("changed"))
      .select("doc", "lbl")
      .checkpoint(true)
    val m2 = Await.result(Future(obs2.get), 15.seconds)
    println(s"[obsprobe] reliable metrics=$m2 rows=${cut2.count()}")
    spark.stop()
  }
}
