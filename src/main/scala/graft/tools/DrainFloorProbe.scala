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
  *
  * r11 verdict asked the same decomposition for the foreachBatch/publish
  * path — `stream_upsert_snapshot` was the one key left above its bench
  * bar (driver 2.81 s vs ≤2.5), and the "most of the residual is
  * engine-fixed" claim was inferred from the single-drain legs, not
  * measured on a 4-micro-batch foreachBatch lifecycle. Three more legs
  * (same 4-file split source, maxFilesPerTrigger=1, so all three run 4
  * REAL micro-batches):
  *
  *   fb_floor   — foreachBatch that only counts each batch: the pure
  *                4-micro-batch drain lifecycle (planning + WAL + source
  *                listing per batch), no write, no catalog.
  *   fb_publish — foreachBatch running the real [[Streams.publishVersion]]
  *                per batch (latest-per-user merge chain + bucketed
  *                saveAsTable + version retirement) but NOT the declared
  *                key's final snapshot read — isolates publish cost.
  *   upsert     — the declared key end-to-end (adds the final
  *                localCheckpoint'd snapshot read over fb_publish).
  *
  * upsert − fb_publish = final-read cost; fb_publish − fb_floor = true
  * merge+catalog+write surcharge; fb_floor = engine-fixed for this key.
  * Results: ROUND12_NOTES.md.
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

    // ---- foreachBatch legs: all share the declared key's 4-file split
    // source + maxFilesPerTrigger=1 + its drain-scoped confs, so the only
    // variable is what the batch function does.
    val split = Streams.stageDirSplit(spark, Tables.path(sfDir, "events"), 4)
    def fbDrain(batchFn: (org.apache.spark.sql.DataFrame, Long) => Unit): Unit = {
      val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
      val prevMpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val ckpt = java.nio.file.Files.createTempDirectory(
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
          java.nio.file.Paths.get("/dev/shm")
        else java.nio.file.Paths.get(sys.props("java.io.tmpdir")),
        "graft_fbprobe_")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
        val q = Streams.eventsStreamDir(spark, split, maxFiles = Some(1))
          .select("user_id", "ts", "event_id", "event_type", "value")
          .writeStream.foreachBatch(batchFn)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.resolve("ckpt").toString)
          .start()
        q.awaitTermination()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevSp)
        spark.conf.set("spark.sql.files.maxPartitionBytes", prevMpb)
        graft.Staging.deleteRecursively(ckpt)
      }
    }
    def fbFloor() = fbDrain((b, _) => { b.count(); () })
    def fbPublish(): Unit = {
      val snapRoot = java.nio.file.Files.createTempDirectory(
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
          java.nio.file.Paths.get("/dev/shm")
        else java.nio.file.Paths.get(sys.props("java.io.tmpdir")),
        "graft_fbpub_")
      // the EXACT batch function the declared key runs (derived-prev +
      // deferred retirement + conditional replay-guard cleanup), so
      // upsert − fb_publish is precisely the final-snapshot-read cost
      val tag = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      try fbDrain(Streams.mergeBatchFn(spark, snapRoot, tag, _ => ()))
      finally {
        Streams.dropRunTables(spark, tag)
        graft.Staging.deleteRecursively(snapRoot)
      }
    }
    def upsert() =
      graft.SparkEntry.queries("stream_upsert_snapshot")(spark, sfDir).count()

    // warm: JIT + staged dir + streaming infra
    stateless(); dedup(); stateful(); fbFloor(); fbPublish(); upsert()
    for (leg <- Seq("floor" -> stateless _, "dedup" -> dedup _,
                    "stateful" -> stateful _, "fb_floor" -> fbFloor _,
                    "fb_publish" -> fbPublish _, "upsert" -> upsert _);
         _ <- 1 to 3) {
      val (tag, fn) = leg
      val t0 = System.nanoTime()
      fn()
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
