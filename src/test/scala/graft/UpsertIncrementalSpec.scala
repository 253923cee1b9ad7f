package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-bucket incremental snapshot publication
  * ([[graft.streaming.Streams.publishVersion]]): a version write must
  * rewrite ONLY the buckets the batch touches and carry every untouched
  * bucket's files forward untouched, while producing exactly the same
  * table contents as a full merge+rewrite. Three pinned properties:
  *
  *  1. `bucketOf` (pmod(hash(col), n)) computes the SAME bucket id the
  *     bucketed writer encodes in its file names — if Spark ever changed
  *     its bucket hash, carrying files forward would silently misroute
  *     rows, so this equivalence is asserted against the real layout.
  *  2. Incremental publish == full-rewrite oracle, and untouched bucket
  *     files are byte-identical carries (same file name, same size).
  *  3. Republishing the same version id (foreachBatch replay after a
  *     checkpoint restart) is idempotent, not a crash.
  */
class UpsertIncrementalSpec extends AnyFunSuite {
  import TestSpark._
  import graft.streaming.Streams.{bucketIdOfFile, bucketOf, publishVersion,
    upsertLatest, upsertMerge, writeBucketedSnapshot}

  private def eventsSlim(): DataFrame =
    Tables.events(spark, sf).select("user_id", "ts", "event_id", "event_type", "value")

  private def dataFiles(dir: java.nio.file.Path): Map[String, Long] = {
    val ls = java.nio.file.Files.list(dir)
    try ls.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter { p =>
        val n = p.getFileName.toString
        !n.startsWith(".") && !n.startsWith("_")
      }
      .map(p => p.getFileName.toString -> java.nio.file.Files.size(p))
      .toMap
    finally ls.close()
  }

  test("bucketOf matches the bucketed writer's file layout") {
    val snap = upsertLatest(eventsSlim())
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_inc_")
    val name = "graft_inc_layout_snap"
    try {
      writeBucketedSnapshot(snap, name, root.resolve("v0").toString)
      val files = dataFiles(root.resolve("v0")).keySet
      assert(files.nonEmpty)
      for (fn <- files) {
        val bid = bucketIdOfFile(fn)
        assert(bid.isDefined, s"no bucket id parsed from $fn")
        val rows = spark.read.parquet(root.resolve("v0").resolve(fn).toString)
          .select(col("user_id"), bucketOf(col("user_id"), 8).as("b"))
          .where(col("b") =!= lit(bid.get))
        assert(rows.count() === 0,
          s"file $fn (bucket ${bid.get}) holds rows bucketOf assigns elsewhere")
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Staging.deleteRecursively(root)
    }
  }

  test("incremental publish == full rewrite; untouched buckets are carried") {
    val ev = eventsSlim()
    val snap0 = upsertLatest(ev.where(col("event_id") % 2 === 0))
    // batch confined to 2 of the 8 buckets, with strictly newer events so
    // the merge must prefer them
    val batch = upsertLatest(ev.where(col("event_id") % 2 === 1))
      .where(bucketOf(col("user_id"), 8).isin(1, 3))
      .withColumn("event_id", col("event_id") + lit(1000000000L))
      .withColumn("ts", col("ts") + expr("INTERVAL 1000 DAYS"))
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_inc_")
    val v0 = "graft_inc_v0"
    val v1 = "graft_inc_v1"
    try {
      writeBucketedSnapshot(snap0, v0, root.resolve("v0").toString)
      publishVersion(spark, Some((v0, root.resolve("v0").toString)),
        batch, v1, root.resolve("v1").toString)
      val oracle = upsertMerge(snap0, batch)
      assert(rowSet(spark.table(v1)) === rowSet(oracle))
      // every v0 file for an untouched bucket must appear in v1 with the
      // same name and size (a hardlink/copy, not a rewrite)
      val f0 = dataFiles(root.resolve("v0"))
      val f1 = dataFiles(root.resolve("v1"))
      val untouched0 = f0.filter { case (n, _) =>
        bucketIdOfFile(n).exists(b => b != 1 && b != 3) }
      assert(untouched0.nonEmpty, "fixture produced no untouched buckets")
      for ((n, sz) <- untouched0)
        assert(f1.get(n).contains(sz), s"untouched bucket file $n not carried")
      // and no TOUCHED bucket file from v0 was carried (they were merged)
      assert(!f1.keySet.exists(n => f0.contains(n) &&
        bucketIdOfFile(n).exists(b => b == 1 || b == 3)))
    } finally {
      Seq(v0, v1).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Staging.deleteRecursively(root)
    }
  }

  test("all-buckets-touched publish takes the full-merge fast path, same result") {
    // When the batch touches every bucket (the declared key's shape),
    // publishVersion skips the isin filter + hardlink carry and does a
    // plain full merge+rewrite. Same contents as the incremental oracle,
    // and NO v0 file may be carried by name+size into v1 — every bucket
    // was merged, so every file is a rewrite.
    val ev = eventsSlim()
    val snap0 = upsertLatest(ev.where(col("event_id") % 2 === 0))
    // synthetic 100-user batch: the test corpus has only 15 users at this
    // SF, which murmur3 happens to spread over 7 of 8 buckets — too few
    // to exercise the all-touched shape. 100 sequential user_ids cover
    // all 8 (asserted below); ts far in the future so the merge must
    // prefer the batch for every overlapping user.
    val batch = spark.range(0, 100).select(
      col("id").as("user_id"),
      expr("timestamp_micros(1900000000000000 + id)").as("ts"),
      (col("id") + lit(2000000000L)).as("event_id"),
      lit("click").as("event_type"),
      col("id").cast("double").as("value"))
    // fixture sanity: the batch really does touch all 8 buckets
    assert(batch.select(bucketOf(col("user_id"), 8)).distinct().count() === 8)
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_inc_")
    val v0 = "graft_inc_fp_v0"
    val v1 = "graft_inc_fp_v1"
    try {
      writeBucketedSnapshot(snap0, v0, root.resolve("v0").toString)
      publishVersion(spark, Some((v0, root.resolve("v0").toString)),
        batch, v1, root.resolve("v1").toString)
      assert(rowSet(spark.table(v1)) === rowSet(upsertMerge(snap0, batch)))
      // the promised no-carry property, asserted on the actual layout: a
      // regression that silently fell back to the hardlink carry path
      // would reproduce some v0 (name, size) pair in v1
      val f0 = dataFiles(root.resolve("v0"))
      val f1 = dataFiles(root.resolve("v1"))
      val carried = f1.toSet.intersect(f0.toSet)
      assert(carried.isEmpty,
        s"fast path carried v0 files into v1: ${carried.map(_._1)}")
    } finally {
      Seq(v0, v1).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Staging.deleteRecursively(root)
    }
  }

  test("point lookup on the published snapshot is bucket-pruned") {
    // The read-side payoff of the bucketed layout: a key-equality probe
    // against the snapshot scans ONE bucket's files, not the table — at
    // 100 TB in 10k buckets that is the difference between a point
    // lookup and a table scan. Spark prunes buckets for equality/IN
    // predicates on the bucket column; the plan advertises it as
    // SelectedBucketsCount.
    val snap = upsertLatest(eventsSlim())
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_inc_")
    val name = "graft_inc_probe_snap"
    // DisableUnnecessaryBucketedScan would turn the bucketed scan off here
    // (no join/agg needs the distribution) WITHOUT weighing the pruning
    // benefit — a lookup workload disables that rule, as documented on
    // publishVersion. Scoped + restored.
    val prevAuto =
      spark.conf.getOption("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      writeBucketedSnapshot(snap, name, root.resolve("v0").toString)
      val someKey = snap.select("user_id").head().getLong(0)
      val probe = spark.table(name).where(col("user_id") === lit(someKey))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"point lookup is not bucket-pruned:\n$plan")
      assert(probe.count() === 1)
    } finally {
      prevAuto match {
        case Some(v) => spark.conf.set(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.sources.bucketing.autoBucketedScan.enabled")
      }
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Staging.deleteRecursively(root)
    }
  }

  test("republishing the same version id is idempotent (foreachBatch replay)") {
    val ev = eventsSlim()
    val snap0 = upsertLatest(ev.where(col("event_id") % 2 === 0))
    val batch = upsertLatest(ev.where(col("event_id") % 2 === 1))
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_inc_")
    val v0 = "graft_inc_rep_v0"
    val v1 = "graft_inc_rep_v1"
    try {
      writeBucketedSnapshot(snap0, v0, root.resolve("v0").toString)
      publishVersion(spark, Some((v0, root.resolve("v0").toString)),
        batch, v1, root.resolve("v1").toString)
      val first = rowSet(spark.table(v1))
      // replay: same version id, same inputs — must republish, not throw
      publishVersion(spark, Some((v0, root.resolve("v0").toString)),
        batch, v1, root.resolve("v1").toString)
      assert(rowSet(spark.table(v1)) === first)
    } finally {
      Seq(v0, v1).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Staging.deleteRecursively(root)
    }
  }
}
