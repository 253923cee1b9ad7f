package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Restart-from-checkpoint recovery for the CDC upsert sink — the
  * contract `stream_upsert_snapshot`'s Scaladoc promises but (until r12)
  * no test drove: a drain killed mid-stream and RESTARTED from the same
  * checkpoint WAL must converge to the identical final snapshot.
  *
  * The crash is injected at the worst point: AFTER
  * [[graft.streaming.Streams.publishVersion]] fully publishes version 2
  * but BEFORE foreachBatch returns — so the engine's commit log lacks
  * batch 2 and the restart REPLAYS it against an already-published v2.
  * That exercises both restart-safety legs of
  * [[graft.streaming.Streams.mergeBatchFn]]:
  *   - derived prev: the replay recomputes prev = v1 from the batch id
  *     (no mutable pointer to recover);
  *   - deferred retirement: v1 must still be catalog-live at replay time
  *     (batch 2 retires v0, not v1 — asserted between the runs).
  */
class UpsertRecoverySpec extends AnyFunSuite {
  import TestSpark._
  import graft.streaming.Streams

  test("mid-drain crash after v2 publish; restart from same checkpoint " +
       "converges to the uninterrupted snapshot") {
    val src = Streams.stageDirSplit(spark, Tables.path(sf, "events"), 4)
    val snapRoot = java.nio.file.Files.createTempDirectory("graft_upsert_rec_")
    val runTag = "rec" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    @volatile var cur: Option[(String, String)] = None
    val inner = Streams.mergeBatchFn(spark, snapRoot, runTag, c => cur = Some(c))
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(fn: (org.apache.spark.sql.DataFrame, Long) => Unit): Unit = {
      val q = Streams.eventsStreamDir(spark, src, maxFiles = Some(1))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .writeStream.foreachBatch(fn)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", snapRoot.resolve("ckpt").toString)
        .start()
      q.awaitTermination()
    }
    try {
      // Run 1: batches 0 and 1 commit; batch 2 publishes v2 then dies
      // pre-commit. awaitTermination surfaces the failure.
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run { (b, id) =>
          inner(b, id)
          if (id == 2 && crashed.compareAndSet(false, true))
            throw new RuntimeException("injected crash after v2 publish")
        }
      }
      assert(crashed.get, "crash never fired — split produced <3 batches?")
      // The replay's merge input must have survived the crash: deferred
      // retirement keeps v1 live (batch 2 retired v0, not v1).
      assert(spark.catalog.tableExists(s"graft_upsert_${runTag}_v1"),
        "v1 retired before batch 2 committed — replay would have no prev")
      assert(!spark.catalog.tableExists(s"graft_upsert_${runTag}_v0"),
        "v0 should have been retired when batch 2 ran")
      // Run 2: same checkpoint WAL, no crash. Must replay batch 2 over
      // the half-finished v2, then process batch 3.
      run(inner)
      assert(cur.exists(_._1.endsWith("_v3")),
        s"expected final version v3, got $cur")
      val fin = spark.table(cur.get._1)
        .select("user_id", "ts", "event_id", "event_type", "value")
      val oracle = Streams.upsertLatest(
        Tables.events(spark, sf)
          .select("user_id", "ts", "event_id", "event_type", "value"))
      assert(rowSet(fin) === rowSet(oracle),
        "recovered snapshot differs from the uninterrupted merge")
    } finally {
      Streams.dropRunTables(spark, runTag)
      graft.Staging.deleteRecursively(snapRoot)
    }
  }

  test("catalog wiped between crash and restart (fresh-JVM simulation): " +
       "publishVersion re-registers prev from its version directory") {
    // Same crash point as above, but before the restart EVERY catalog
    // entry of the run is dropped — the in-memory catalog of a genuinely
    // new JVM starts empty, and only the snapshot-root FILES survive a
    // process death. The replay of batch 2 must re-register v1 from
    // snapRoot/v1 (and batch 3 must re-register v2) or the restart dies
    // with TABLE_OR_VIEW_NOT_FOUND. Tables are external, so the DROPs
    // delete no files — exactly the fresh-JVM state.
    val src = Streams.stageDirSplit(spark, Tables.path(sf, "events"), 4)
    val snapRoot = java.nio.file.Files.createTempDirectory("graft_upsert_rec2_")
    val runTag = "rcw" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    @volatile var cur: Option[(String, String)] = None
    val inner = Streams.mergeBatchFn(spark, snapRoot, runTag, c => cur = Some(c))
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(fn: (org.apache.spark.sql.DataFrame, Long) => Unit): Unit = {
      val q = Streams.eventsStreamDir(spark, src, maxFiles = Some(1))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .writeStream.foreachBatch(fn)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", snapRoot.resolve("ckpt").toString)
        .start()
      q.awaitTermination()
    }
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run { (b, id) =>
          inner(b, id)
          if (id == 2 && crashed.compareAndSet(false, true))
            throw new RuntimeException("injected crash after v2 publish")
        }
      }
      assert(crashed.get, "crash never fired — split produced <3 batches?")
      // fresh-JVM simulation: wipe the run's catalog entries, keep files
      Streams.dropRunTables(spark, runTag)
      assert(java.nio.file.Files.isDirectory(snapRoot.resolve("v1")),
        "v1 files must survive the catalog wipe (external tables)")
      run(inner)
      assert(cur.exists(_._1.endsWith("_v3")),
        s"expected final version v3, got $cur")
      val fin = spark.table(cur.get._1)
        .select("user_id", "ts", "event_id", "event_type", "value")
      val oracle = Streams.upsertLatest(
        Tables.events(spark, sf)
          .select("user_id", "ts", "event_id", "event_type", "value"))
      assert(rowSet(fin) === rowSet(oracle),
        "catalog-wipe recovery differs from the uninterrupted merge")
    } finally {
      Streams.dropRunTables(spark, runTag)
      graft.Staging.deleteRecursively(snapRoot)
    }
  }
}
