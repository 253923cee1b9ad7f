package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch harness: time every draining streaming key under combinations
  * of drain-scoped state partitions and file-split size, to size the
  * drain's fixed-cost floor. Not part of the driver contract. */
object DrainTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = graft.streaming.Streams.drainKeys.toSeq.sorted
    keys.foreach(k => SparkEntry.queries(k)(spark, sfDir).count()) // warm

    def timeAll(tag: String): Unit = {
      val t0 = System.nanoTime()
      val per = keys.map { k =>
        val t1 = System.nanoTime()
        SparkEntry.queries(k)(spark, sfDir).count()
        f"$k=${(System.nanoTime() - t1) / 1e9}%.2f"
      }
      println(f"[tune] $tag TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        per.mkString(" "))
    }

    for (sp <- Seq("8", "4", "2", "1"); mpb <- Seq("1048576")) {
      spark.conf.set("graft.drain.statePartitions", sp)
      spark.conf.set("graft.drain.maxPartitionBytes", mpb)
      timeAll(s"sp=$sp mpb=$mpb")
    }
    spark.conf.set("graft.drain.statePartitions", "1")
    spark.conf.set("graft.drain.maxPartitionBytes", "1048576")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    timeAll("sp=1 mpb=1M rocksdb")
    spark.stop()
  }
}
