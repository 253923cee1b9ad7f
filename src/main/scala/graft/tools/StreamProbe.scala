package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Scratch harness for sizing the streaming drain's fixed costs: times a
  * subset of declared streaming keys under different state-store configs.
  * Not part of the driver contract; used to decide drain tuning. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = Seq("stream_tumbling", "stream_dedup", "stream_stateful_count",
      "stream_sliding", "stream_watermark_late")
    // warm the session + staged dir once (JIT, file staging)
    SparkEntry.queries("stream_tumbling")(spark, sfDir).count()

    def timeAll(tag: String): Unit = {
      val t0 = System.nanoTime()
      keys.foreach { k =>
        val t1 = System.nanoTime()
        SparkEntry.queries(k)(spark, sfDir).count()
        println(f"[probe] $tag $k ${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
      println(f"[probe] $tag TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // The drain DEFAULT is now 2, so the 8-partition baseline must be set
    // explicitly — otherwise this leg silently measures the same config
    // as the hdfs-2 leg and the comparison is meaningless.
    spark.conf.set("graft.drain.statePartitions", "8")
    timeAll("baseline-hdfs-8")
    spark.conf.set("graft.drain.statePartitions", "4")
    timeAll("hdfs-4")
    spark.conf.set("graft.drain.statePartitions", "2")
    timeAll("hdfs-2")
    spark.conf.set("graft.drain.statePartitions", "1")
    timeAll("hdfs-1")
    spark.conf.set("graft.drain.statePartitions", "8")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    timeAll("rocksdb-8")
    spark.stop()
  }
}
