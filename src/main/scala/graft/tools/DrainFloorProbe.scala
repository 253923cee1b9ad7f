package graft.tools

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Decomposes the per-drain fixed cost the bench's streaming keys pay
  * (r10 verdict item 5: ~1.3-1.6 s/drain driver-side — engine floor or
  * shaveable?). Times, warm, at the bench SF:
  *
  *   floor    — a STATELESS drain (scan → select → memory sink): pure
  *              query lifecycle (stream planning, one AvailableNow
  *              micro-batch, WAL writes, sink commit). No state store.
  *   dedup    — one stateful op (dropDuplicatesWithinWatermark): floor +
  *              state-store provider init + state commit.
  *   stateful — the declared flatMapGroupsWithState key end-to-end.
  *
  * floor ≈ stateful ⇒ the cost is engine lifecycle, not our plan shape;
  * the delta is the true state-store surcharge. Not part of the driver
  * contract; results recorded in ROUND11_NOTES.md.
  */
object DrainFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def stateless() = Streams.drain(
      Streams.eventsStream(spark, Tables.path(sfDir, "events"))
        .select(col("user_id"), col("event_type")),
      OutputMode.Append(), noDataBatch = Some(false)).count()
    def dedup() = graft.SparkEntry.queries("stream_dedup")(spark, sfDir).count()
    def stateful() =
      graft.SparkEntry.queries("stream_stateful_count")(spark, sfDir).count()

    // warm: JIT + staged dir + streaming infra
    stateless(); dedup(); stateful()
    for (leg <- Seq("floor" -> stateless _, "dedup" -> dedup _,
                    "stateful" -> stateful _); _ <- 1 to 3) {
      val (tag, fn) = leg
      val t0 = System.nanoTime()
      fn()
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
