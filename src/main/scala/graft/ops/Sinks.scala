package graft.ops

import graft.{D, Tables}
import graft.QueryDefs.Q
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 sink surface, declared END-TO-END: the classic ETL date
  * layout — `events` written `partitionBy(day)` once per corpus version,
  * then read back through a PARTITION filter so only one day's directory
  * is listed and scanned. The csv/json/ORC sink roundtrips stay internal
  * (SinkRoundtripSpec); this is the one sink shape whose READ side has
  * plan-level semantics worth declaring: at 100 TB the day predicate
  * prunes file listing to 1/365th of the lake before a single row is
  * read, which no post-scan filter can do. PlanAuditSpec asserts the
  * predicate lands in the scan's `PartitionFilters`, not in a Filter node.
  */
object Sinks {

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Day-partitioned events sink, written once per MACHINE + corpus
    * version: fingerprint-keyed dir, `_SUCCESS`-gated reuse, unique-temp +
    * atomic-rename publish (same discipline as Staging.materialize and
    * Joins.ensureBucketed — a racing JVM either wins the rename or uses
    * the winner's complete copy; a reader never sees a half-written dir).
    * NOT gated by `graft.staging`: the partitioned files ARE this
    * operator's semantics — a plan-only consumer still needs a real
    * directory to plan the partition-pruned scan against. */
  def ensurePartitionedEvents(s: SparkSession, dir: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val out = Paths.get(sys.props("java.io.tmpdir"), "graft_sink",
      s"${Tables.sourceFingerprint(Tables.path(dir, "events"))}_events_byday_v1")
    locks.computeIfAbsent(out.toString, _ => new Object).synchronized {
      if (!Files.exists(out.resolve("_SUCCESS"))) {
        val tmp = Paths.get(out.toString + ".tmp-" +
          java.util.UUID.randomUUID.toString)
        Tables.events(s, dir)
          .withColumn("day", to_date(col("ts")))
          .write.partitionBy("day").mode("overwrite").parquet(tmp.toString)
        Files.createDirectories(out.getParent)
        var attempts = 0
        var done = false
        while (!done && attempts < 3) {
          attempts += 1
          try { Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE); done = true }
          catch { case _: java.nio.file.FileAlreadyExistsException |
                       _: java.nio.file.DirectoryNotEmptyException =>
            // Same TOCTOU discipline as Staging: a complete racing copy
            // (gated by _SUCCESS) is used as-is; an OLD dir without
            // _SUCCESS is a crash leftover and is evicted; a FRESH one may
            // be mid-publish — wait for its _SUCCESS rather than deleting
            // files under another JVM's query.
            if (Files.exists(out.resolve("_SUCCESS"))) {
              graft.Staging.deleteRecursively(tmp); done = true
            } else if (Files.getLastModifiedTime(out).toMillis <
                         System.currentTimeMillis() - 60000L) {
              graft.Staging.deleteRecursively(out)
            } else {
              Thread.sleep(1000L)
            }
          }
        }
        if (!done) {
          graft.Staging.deleteRecursively(tmp)
          if (!Files.exists(out.resolve("_SUCCESS")))
            throw new IllegalStateException(
              s"partitioned sink $out contended and never complete")
        }
      }
      out.toString
    }
  }

  /** Two schema-evolved generations of `orders` under one parent dir —
    * v1 wrote (o_orderkey, o_totalprice); v2 added `o_orderstatus` (the
    * classic additive column evolution). Split is `o_orderkey % 2` so
    * the DuckDB oracle can replay which rows lack the late column
    * without reading our files. Same fingerprint-keyed atomic-publish
    * discipline as the partitioned sink. */
  def ensureEvolvedOrders(s: SparkSession, dir: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val out = Paths.get(sys.props("java.io.tmpdir"), "graft_sink",
      s"${Tables.sourceFingerprint(Tables.path(dir, "orders"))}_orders_evolved_v1")
    locks.computeIfAbsent(out.toString, _ => new Object).synchronized {
      if (!Files.exists(out.resolve("_SUCCESS"))) {
        val tmp = Paths.get(out.toString + ".tmp-" +
          java.util.UUID.randomUUID.toString)
        val o = Tables.table(s, dir, "orders")
        o.where(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_totalprice")
          .write.parquet(s"$tmp/gen1")
        o.where(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
          .write.parquet(s"$tmp/gen2")
        Files.createFile(tmp.resolve("_SUCCESS"))
        try Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.DirectoryNotEmptyException =>
          // racing JVM completed it (or stale leftover — same discipline
          // as ensurePartitionedEvents, but the window is one test corpus
          // write, so lost races just use the winner's copy)
          graft.Staging.deleteRecursively(tmp)
          if (!Files.exists(out.resolve("_SUCCESS")))
            throw new IllegalStateException(s"evolved sink $out incomplete")
        }
      }
      out.toString
    }
  }

  val queries: Map[String, Q] = Map(
    // Schema evolution across file generations — the ETL reality a 100 TB
    // lake accumulates: a column added later must read back as NULL for
    // old files, with one reconciled schema. mergeSchema unions the
    // per-file footers at planning time; no data rewrite.
    "source_merge_schema" -> ((s, dir) => {
      val root = ensureEvolvedOrders(s, dir)
      s.read.option("mergeSchema", "true")
        .parquet(s"$root/gen1", s"$root/gen2")
        .select(col("o_orderkey"), col("o_totalprice").as("total"),
          col("o_orderstatus").as("st"))
        .orderBy("o_orderkey")
    }),

    // Partitioned sink + partition-pruned read: write events by day (once
    // per corpus version), read ONE day back through a literal partition
    // predicate, aggregate per type. The day literal is the corpus's
    // first day, fetched with a one-row bounded collect (partition-value
    // metadata, same pattern as the ANN centroid collects) so the filter
    // is a LITERAL — which is what static partition pruning requires.
    "sink_partitioned" -> ((s, dir) => {
      val sunk = s.read.parquet(ensurePartitionedEvents(s, dir))
      val d0 = sunk.agg(min("day")).head().getDate(0)
      sunk.where(col("day") === lit(d0))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), D.r2(sum("value")).as("sum_value"))
        // day emitted as TIMESTAMP, not DATE — same representation-drift
        // guard as scan_events_ns.
        .select(lit(d0).cast("timestamp").as("day"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "source_merge_schema" ->
      ("SELECT o_orderkey, o_totalprice AS total, " +
       "CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderstatus END AS st " +
       "FROM orders ORDER BY o_orderkey"),
    "sink_partitioned" ->
      ("WITH d AS (SELECT min(date_trunc('day', ts)) AS d0 FROM events) " +
       "SELECT CAST(d.d0 AS TIMESTAMP) AS day, event_type, count(*) AS n, " +
       "round(sum(value), 2) AS sum_value " +
       "FROM events, d WHERE date_trunc('day', ts) = d.d0 " +
       "GROUP BY 1, 2 ORDER BY event_type")
  )
}
