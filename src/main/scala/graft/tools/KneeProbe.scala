package graft.tools

import graft.Tables
import graft.ops.{Dedup, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Knee-point probe for the flag-gated scale paths (r11 verdict item 5):
  * replicate the sf0.1 tables at m× with id offsets — the drift-safe
  * scale-up (identical value distributions, m× rows; synthesizing fresh
  * random data would change the very densities the flags react to) — and
  * measure where each flag-gated path FIRST beats its default:
  *
  *  A. ngram PPJoin prefix (`graft.ngram.dfOrderedPrefix` /
  *     `graft.ngram.hotGramCap`): text replicas carry 14 doc-unique salt
  *     tokens so cross-replica Jaccard stays < 0.8 (max 100-token doc:
  *     98/(98+32) = 0.75) — pair OUTPUT scales m·(per-replica pairs),
  *     while every body trigram's df densifies ×m, exactly the hot-gram
  *     regime the flags target (the salt grams double as the rare-gram
  *     tail every real crawl corpus has and this synthetic one lacks —
  *     without it df-ordering has no rare grams to prefer at ANY scale).
  *     Lex-prefix candidates grow ~m² (C(df,2) per hot gram); df-ordered
  *     picks the df=1 salt grams first and stays ~m.
  *  B. two-level packing (`graft.pack.bucketWidth`): narrow
  *     (source, doc_id, toks) replication at large m — the single-window
  *     default sorts corpus/20 rows in ONE task per source, the
  *     two-level path bounds every window partition to ≤ bucketWidth.
  *  C. connected components (`graft.cc.largeStar`): pointer-jump vs
  *     large-star/small-star over the m-replicated near-dup graph
  *     (m disjoint copies: edges ×m, diameter constant — the drift-safe
  *     graph scale-up).
  *  D/E. end-to-end linear checks, cold (staging builds included):
  *     ANN family on m× embeddings (fixed probe set, m× corpus — the
  *     production ingest shape) and the CDC upsert on m× events.
  *
  * Per-bucket compaction's knee (the third flag-gated path the verdict
  * names) is measured by tools/UpsertProbe's snapshot ladder — its axis
  * is snapshot/batch ratio, not corpus multiplier, so it keeps its own
  * harness. Scratch tool, not part of the driver contract; numbers in
  * ROUND12_NOTES.md. Usage: runMain graft.tools.KneeProbe [sfDir] [legs]
  * — `legs` is an optional subset of "ABCDEFGHIJ" (default all); the D/E loop
  * runs when either letter is selected.
  */
object KneeProbe {
  def main(args: Array[String]): Unit = {
    // Replica corpora live under /tmp: a sink publish keyed to them would
    // compute its retired-sibling liveness from the WRONG tree and
    // reclaim the live testdata artifacts (the r15 mixed-pair incident).
    // Suppress retired sweeps for the probe; cleanup below uses
    // Sinks.sweepSinkChain instead. Save/restore the prior value so a
    // shared JVM (sbt in-process runMain) gets its retired-sibling sweeps
    // back after the probe (r15 ADVICE).
    val priorSweep = sys.props.get("graft.sink.sweepRetired")
    sys.props("graft.sink.sweepRetired") = "false"
    try run(args)
    finally priorSweep match {
      case Some(v) => sys.props("graft.sink.sweepRetired") = v
      case None    => sys.props -= "graft.sink.sweepRetired"
    }
  }

  private def run(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val legs = args.lift(1).getOrElse("ABCDEFGHIJ").toUpperCase
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[knee] $tag ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    /** m replicas of `df`, id columns offset by k·off per replica k. */
    def replicate(df: DataFrame, m: Int, off: Long, idCols: String*): DataFrame = {
      val rep = df.withColumn("k", explode(sequence(lit(0), lit(m - 1))))
      idCols.foldLeft(rep)((d, c) =>
        d.withColumn(c, col(c) + col("k") * off)).drop("k")
    }

    /** Shared replica-corpus cleanup for legs F/G/H (was copy-pasted
      * three times; the r15 sweepSinkChain upgrade had to be applied to
      * every copy — r15 review finding): fingerprints BEFORE the delete,
      * then derived-relation retirement, then the TRANSITIVE sink-chain
      * sweep (derived store artifacts are keyed by their input's
      * _SUCCESS fingerprint, which the corpus fp alone can't reach). */
    def cleanupReplicas(dir: java.nio.file.Path, tables: Seq[String]): Unit = {
      val fps = tables.flatMap { f =>
        try Some(Tables.sourceFingerprint(s"$dir/$f"))
        catch { case scala.util.control.NonFatal(_) => None }
      }
      graft.Staging.deleteRecursively(dir)
      fps.foreach(graft.Staging.retireDerived)
      graft.ops.Sinks.sweepSinkChain(fps.toSet)
    }

    // ---- A. ngram prefix: lex vs df-ordered vs df-ordered+cap ----------
    val docs0 = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    def saltedDocs(m: Int): DataFrame = {
      val salt = concat_ws(" ", (0 until 14).map(j =>
        concat(lit("z"), col("k"), lit("q"), col("doc_id"), lit("w" + j))): _*)
      docs0.withColumn("k", explode(sequence(lit(0), lit(m - 1))))
        .select((col("doc_id") + col("k") * 10000000L).as("doc_id"),
          concat(col("text"), lit(" "), salt).as("text"), col("k"))
        .drop("k")
        .localCheckpoint(true) // replication cost excluded from the timing
    }
    // JIT/codegen warm-up: one full PPJoin pass at m=1, untimed, so the
    // first timed leg doesn't carry cold-JVM compile cost.
    if (legs.contains('A')) {
    Dedup.ngramJaccardPairs(saltedDocs(1)).count()
    for (m <- Seq(1, 3, 10)) {
      // The production path stages the sorted-trigram relation once per
      // corpus version (trigrams_sorted_v1) — checkpoint it here so the
      // timing isolates the PPJoin (prefix index + candidate verify),
      // the part the flags actually change, not the 4×-referenced gram
      // build the staged artifact amortizes away.
      val g = Dedup.ngramGrams(saltedDocs(m)).localCheckpoint(true)
      t(s"A m=$m lex      ")(Dedup.ngramJaccardFromGrams(g).count())
      t(s"A m=$m dfOrdered")(Dedup.ngramJaccardFromGrams(g, dfOrderedPrefix = true).count())
      t(s"A m=$m cap256   ")(Dedup.ngramJaccardFromGrams(g, dfOrderedPrefix = true,
        hotGramCap = Some(256L)).count())
      g.unpersist()
    }
    }

    // ---- C. CC: pointer-jump vs large-star over the m× pair graph -----
    // Drift-safe graph scale-up: m disjoint offset copies of a fixed
    // near-dup-shaped base graph (chains of length 64 — the worst case
    // for plain propagation and the shape incremental edit-chains
    // produce — plus 64-leaf stars, the crawl-hub shape), so edges grow
    // ×m while diameter stays constant.
    def ccGraph(m: Int): DataFrame = {
      val chains = spark.range(100L * 64).toDF("i")
        .where(col("i") % 64 =!= 63)
        .select(col("i").as("doc_a"), (col("i") + 1).as("doc_b"))
      val stars = spark.range(100L * 64).toDF("i")
        .where(col("i") % 64 =!= 0)
        .select((col("i") - col("i") % 64 + 1000000L).as("doc_a"),
                (col("i") + 1000000L).as("doc_b"))
      replicate(chains.union(stars), m, 10000000L, "doc_a", "doc_b")
        .localCheckpoint(true)
    }
    if (legs.contains('C')) {
    Pipeline.connectedComponents(ccGraph(1)).count() // warm
    for (m <- Seq(1, 3, 10)) {
      val pairs = ccGraph(m)
      t(s"C m=$m jump     ")(Pipeline.connectedComponents(pairs).count())
      spark.conf.set("graft.cc.largeStar", "true")
      try t(s"C m=$m largeStar")(Pipeline.connectedComponents(pairs).count())
      finally spark.conf.unset("graft.cc.largeStar")
      pairs.unpersist()
    }
    }

    // ---- B. packing: single window vs two-level prefix sum ------------
    val toks0 = Tables.table(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    if (legs.contains('B')) {
    Pipeline.packShards(replicate(toks0, 10, 10000000L, "doc_id"), 512, None)
      .agg(max("shard")).count() // warm
    for (m <- Seq(100, 1000, 10000)) {
      val d = replicate(toks0, m, 10000000L, "doc_id").localCheckpoint(true)
      t(s"B m=$m single  ")(Pipeline.packShards(d, 512, None)
        .agg(max("shard")).count())
      t(s"B m=$m 2lvl-50k")(Pipeline.packShards(d, 512, Some(50000L))
        .agg(max("shard")).count())
      d.unpersist()
    }
    }

    // ---- D/E. end-to-end cold: ANN on m× embeddings, upsert on m× events
    val shm = java.nio.file.Paths.get("/dev/shm")
    val tmpBase = if (java.nio.file.Files.isDirectory(shm)) shm
      else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    // m=1 twice: the first pass is the untimed JIT/streaming-infra warm-up
    // (cold-JVM compile cost would otherwise make m=1 look SLOWER than
    // m=10); timed legs start from the second m=1.
    if (legs.contains('D') || legs.contains('E'))
    for ((m, warm) <- Seq((1, true), (1, false), (10, false))) {
      val dir = java.nio.file.Files.createTempDirectory(tmpBase, s"graft_knee_${m}x_")
      try {
        replicate(Tables.table(spark, sfDir, "embeddings"), m, 1000000L, "vec_id")
          .repartition(4).write.parquet(s"$dir/embeddings.parquet")
        replicate(Tables.events(spark, sfDir), m, 100000000L, "event_id", "user_id")
          .repartition(4).write.parquet(s"$dir/events.parquet")
        // dedup_semantic rides the same replica: since r13 it derives
        // C = max(16, ⌈√N⌉) (was pinned to the 16-cell toy artifact, which
        // made Σ|cell|² ≈ N²/16 — measured super-linear here, ~4.7× per
        // decade); with C ~ √N the decade ratio should sit near the other
        // linear D legs'. This leg is the regression check for that.
        for (k <- Seq("embed_ann_ivf", "embed_ann_pq", "embed_ann_incremental",
                      "dedup_semantic", "embed_quantize_int8",
                      "embed_ann_sq8_ivf", // r13: cell-filtered SQ8 decade
                      "dedup_semantic_2l", // r13: two-hop build, ~N^1.25 target
                      "dedup_semantic_mp", // r14: multi-probe leg decade
                      "stream_upsert_snapshot")) {
          val tag = if (k == "stream_upsert_snapshot") "E" else "D"
          if (warm) { graft.SparkEntry.queries(k)(spark, dir.toString).count(); () }
          else {
            t(s"$tag m=$m $k")(
              graft.SparkEntry.queries(k)(spark, dir.toString).count())
            // dedup_semantic's decade conflates INDEX BUILD (assignment
            // N·C + Lloyd — paid once per corpus version) with PAIR work
            // (Σ|cell|² — paid per query against the staged cells): a
            // second, warm-staged run isolates the per-query pair cost,
            // and cold − warm ≈ the amortized build.
            // same split for the two-level variant: its claim is that the
            // BUILD decade (cold − warm) drops from the single-level
            // ~N^1.5 (3.2×/decade) toward N^1.25 (~1.8×/decade); the
            // warm per-query pair cost should match dedup_semantic's
            // (same C, same Σ|cell|² bound).
            if (k == "dedup_semantic" || k == "dedup_semantic_2l" ||
                k == "dedup_semantic_mp")
              t(s"D m=$m $k(warm)")(
                graft.SparkEntry.queries(k)(spark, dir.toString).count())
          }
        }
      } finally {
        // fingerprints must be computed BEFORE the dir is deleted
        val fps = Seq("embeddings.parquet", "events.parquet").flatMap { f =>
          try Some(Tables.sourceFingerprint(s"$dir/$f"))
          catch { case scala.util.control.NonFatal(_) => None }
        }
        graft.Staging.deleteRecursively(dir)
        fps.foreach { fp =>
          graft.Staging.retireDerived(fp)
          // the upsert leg's split stream-source artifact lives under its
          // own root, keyed by the same corpus fingerprint
          val splitRoot = java.nio.file.Paths.get(
            sys.props("java.io.tmpdir"), "graft_stream_src")
          if (java.nio.file.Files.isDirectory(splitRoot)) {
            val ls = java.nio.file.Files.list(splitRoot)
            try ls.filter(_.getFileName.toString.startsWith(fp + "_"))
              .forEach(p => graft.Staging.deleteRecursively(p))
            finally ls.close()
          }
        }
      }
    }

    // ---- F. r14 warehouse/ER keys: linear-decade check on m× replicas.
    // Customer replicas REGENERATE c_name from the offset key (the name
    // carries the entity id this family blocks/corrupts on — replicating
    // identical names would fabricate cross-replica hamming matches
    // instead of scaling the entity space). merge_scd2 / sink_delete get
    // a warm re-run to split staged-artifact build from query cost.
    if (legs.contains('F'))
    for ((m, warm) <- Seq((1, true), (1, false), (10, false))) {
      val dir = java.nio.file.Files.createTempDirectory(tmpBase, s"graft_kneeF_${m}x_")
      try {
        replicate(Tables.events(spark, sfDir), m, 100000000L, "event_id", "user_id")
          .repartition(4).write.parquet(s"$dir/events.parquet")
        replicate(Tables.table(spark, sfDir, "customer"), m, 10000000L, "c_custkey")
          .withColumn("c_name",
            concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
          .repartition(4).write.parquet(s"$dir/customer.parquet")
        for (k <- Seq("join_fuzzy_blocked", "dq_anomaly_volume",
                      "merge_scd2", "sink_delete")) {
          if (warm) { graft.SparkEntry.queries(k)(spark, dir.toString).count(); () }
          else {
            t(s"F m=$m $k")(
              graft.SparkEntry.queries(k)(spark, dir.toString).count())
            if (k == "merge_scd2" || k == "sink_delete")
              t(s"F m=$m $k(warm)")(
                graft.SparkEntry.queries(k)(spark, dir.toString).count())
          }
        }
      } finally cleanupReplicas(dir, Seq("events.parquet", "customer.parquet"))
    }
    // ---- G. r14b keys the r14 decade table missed (verdict item 8):
    // dq_profile (orders), dq_expectations (orders + customer),
    // sink_vacuum (events). Same m× replica scheme as leg F; orders
    // replicas offset o_orderkey and o_custkey INDEPENDENTLY so the PK
    // space scales while every order still references a live customer
    // replica (the RI check must stay 0-orphan at every decade).
    // dq_expectations is skipped in the warm pass on purpose: its report
    // is memoized by source fingerprint, so a warm run would turn the
    // timed run into a memo read — its decade number is therefore
    // first-construction cost (JIT-warm from the other keys).
    // m=100 adds a second decade for the two DQ keys (orders at 15M rows
    // is where the profiler's 6× Expand starts to register); sink_vacuum
    // is skipped there — a 100× partitioned store build is probe cost,
    // not key cost, and its m=10 warm number is already file-count-flat.
    if (legs.contains('G'))
    for ((m, warm) <- Seq((1, true), (1, false), (10, false), (100, false))) {
      val dir = java.nio.file.Files.createTempDirectory(tmpBase, s"graft_kneeG_${m}x_")
      try {
        if (m <= 10)
          replicate(Tables.events(spark, sfDir), m, 100000000L, "event_id", "user_id")
            .repartition(4).write.parquet(s"$dir/events.parquet")
        replicate(Tables.table(spark, sfDir, "customer"), m, 10000000L, "c_custkey")
          .repartition(4).write.parquet(s"$dir/customer.parquet")
        Tables.table(spark, sfDir, "orders")
          .withColumn("k", explode(sequence(lit(0), lit(m - 1))))
          .withColumn("o_orderkey", col("o_orderkey") + col("k") * 100000000L)
          .withColumn("o_custkey", col("o_custkey") + col("k") * 10000000L)
          .drop("k")
          .repartition(4).write.parquet(s"$dir/orders.parquet")
        for (k <- Seq("dq_profile", "dq_expectations", "sink_vacuum")
               if !(k == "sink_vacuum" && m > 10)) {
          if (warm) {
            if (k != "dq_expectations") {
              graft.SparkEntry.queries(k)(spark, dir.toString).count(); ()
            }
          } else {
            t(s"G m=$m $k")(
              graft.SparkEntry.queries(k)(spark, dir.toString).count())
            if (k == "sink_vacuum")
              t(s"G m=$m $k(warm)")(
                graft.SparkEntry.queries(k)(spark, dir.toString).count())
          }
        }
      } finally cleanupReplicas(dir,
        Seq("events.parquet", "customer.parquet", "orders.parquet"))
    }
    // ---- H. r15 extra keys: mv refresh / time travel / change feed on
    // m× events (leg F/G replica scheme), BFS on m× documents with
    // REPLICA-level salt. Salt placement matters and the first run of
    // this leg got it wrong: leg A's PER-DOC salt keeps cross-replica
    // Jaccard < 0.8 but also drags WITHIN-replica near-dups below the
    // threshold (each of a pair gains ~16 disjoint grams), so the graph
    // came back EMPTY and the "BFS decade" measured pair generation over
    // nothing. Per-REPLICA salt (the same 14 tokens for every doc of
    // replica k) adds SHARED grams within a replica — J' = (i+s)/(u+s) >
    // J, pairs preserved — while cross-replica copies of one doc still
    // cap at ~98/(98+32) ≈ 0.75 < 0.8. The graph then scales as m
    // disjoint copies of the original. mv_incremental_refresh and the
    // store pair get warm re-runs to split staged/artifact build from
    // query cost; change_feed's cold includes BOTH store builds.
    if (legs.contains('H'))
    for ((m, warm) <- Seq((1, true), (1, false), (10, false))) {
      val dir = java.nio.file.Files.createTempDirectory(tmpBase, s"graft_kneeH_${m}x_")
      try {
        replicate(Tables.events(spark, sfDir), m, 100000000L, "event_id", "user_id")
          .repartition(4).write.parquet(s"$dir/events.parquet")
        val replicaSalt = concat_ws(" ", (0 until 14).map(j =>
          concat(lit("z"), col("k"), lit("w" + j))): _*)
        Tables.table(spark, sfDir, "documents")
          .withColumn("k", explode(sequence(lit(0), lit(m - 1))))
          .withColumn("doc_id", col("doc_id") + col("k") * 10000000L)
          .withColumn("text", concat(col("text"), lit(" "), replicaSalt))
          .drop("k")
          .repartition(4).write.parquet(s"$dir/documents.parquet")
        for (k <- Seq("mv_incremental_refresh", "sink_time_travel",
                      "sink_change_feed", "graph_shortest_path")) {
          if (warm) { graft.SparkEntry.queries(k)(spark, dir.toString).count(); () }
          else {
            t(s"H m=$m $k")(
              graft.SparkEntry.queries(k)(spark, dir.toString).count())
            t(s"H m=$m $k(warm)")(
              graft.SparkEntry.queries(k)(spark, dir.toString).count())
          }
        }
      } finally cleanupReplicas(dir, Seq("events.parquet", "documents.parquet"))
    }

    // ---- I. r16 keys: linear-decade check. The scan/agg family (PII
    // scrub, PSI drift, freshness, interpolation, Welch t-test) must
    // scale as one corpus pass each — their rollups are |types|- or
    // |types|·10-row relations at any volume (interpolation's window
    // runs over the HOURLY relation, which the replicas do NOT widen:
    // same 30-day span, denser hours — its decade should be ~flat after
    // the hourly agg). embed_mips_ivf rides the D-leg embeddings scheme:
    // cold includes the augmented index build (2 corpus passes + cells),
    // warm isolates the cell-bounded search. embed_ann_nsw's build has
    // its own leg (J) since r17 made it cell-bounded.
    if (legs.contains('I'))
    for ((m, warm) <- Seq((1, true), (1, false), (10, false))) {
      val dir = java.nio.file.Files.createTempDirectory(tmpBase, s"graft_kneeI_${m}x_")
      try {
        replicate(Tables.events(spark, sfDir), m, 100000000L, "event_id", "user_id")
          .repartition(4).write.parquet(s"$dir/events.parquet")
        replicate(Tables.table(spark, sfDir, "documents"), m, 10000000L, "doc_id")
          .repartition(4).write.parquet(s"$dir/documents.parquet")
        replicate(Tables.table(spark, sfDir, "embeddings"), m, 1000000L, "vec_id")
          .repartition(4).write.parquet(s"$dir/embeddings.parquet")
        for (k <- Seq("text_pii_redact", "dq_drift_psi", "dq_freshness",
                      "win_interpolate_linear", "agg_ab_ttest",
                      "embed_mips_ivf")) {
          if (warm) { graft.SparkEntry.queries(k)(spark, dir.toString).count(); () }
          else {
            t(s"I m=$m $k")(
              graft.SparkEntry.queries(k)(spark, dir.toString).count())
            if (k == "embed_mips_ivf")
              t(s"I m=$m $k(warm)")(
                graft.SparkEntry.queries(k)(spark, dir.toString).count())
          }
        }
      } finally cleanupReplicas(dir,
        Seq("events.parquet", "documents.parquet", "embeddings.parquet"))
    }

    // ---- J. r17: the two staged kNN-graph BUILDS are now cell-bounded
    // (embed_ann_nsw routes both sides through the shared multi-probe
    // inverted file; graph_knn_triangles through the single-probe cells)
    // — this leg is the sub-quadratic evidence the r16 verdict asked
    // for on the pre-r17 corpus×corpus passes. Cold − warm ≈ the staged
    // build (mp/cell assignment N·C + Σ|cell|² within-cell scoring —
    // the dedup_semantic ~N^1.5 target, ~3.2×/decade; the old exact
    // pass would decade at ~100× = N²); warm isolates what the key pays
    // per query against the staged edges (beam search / counting joins).
    if (legs.contains('J'))
    for ((m, warm) <- Seq((1, true), (1, false), (10, false))) {
      val dir = java.nio.file.Files.createTempDirectory(tmpBase, s"graft_kneeJ_${m}x_")
      try {
        replicate(Tables.table(spark, sfDir, "embeddings"), m, 1000000L, "vec_id")
          .repartition(4).write.parquet(s"$dir/embeddings.parquet")
        for (k <- Seq("embed_ann_nsw", "graph_knn_triangles")) {
          if (warm) { graft.SparkEntry.queries(k)(spark, dir.toString).count(); () }
          else {
            t(s"J m=$m $k")(
              graft.SparkEntry.queries(k)(spark, dir.toString).count())
            t(s"J m=$m $k(warm)")(
              graft.SparkEntry.queries(k)(spark, dir.toString).count())
          }
        }
      } finally cleanupReplicas(dir, Seq("embeddings.parquet"))
    }
    spark.stop()
  }
}
