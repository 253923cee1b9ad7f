package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialization cache for derived relations that a plan would otherwise
  * recompute several times (a self-joined subtree is evaluated once PER
  * REFERENCE in Spark — the minhash signature table appears 4× in its
  * plan). Writes the relation once to a tmpdir parquet keyed by the SOURCE
  * file's fingerprint (so regenerated testdata can never hit a stale
  * copy — same scheme as the staged stream dir and the bucketed tables)
  * and serves every subsequent reference from the columnar file.
  *
  * This is the production shape too: at 100 TB, dedup signatures are
  * materialized incrementally next to the corpus, not recomputed per run.
  * The `_SUCCESS` marker gates reuse, so a write killed halfway is redone.
  */
object Staging {
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}

  /** Monotone count of staged-artifact BUILDS (cache misses) across every
    * staging layer in the engine — derived relations here, the stream
    * source copies/splits in Streams.stageDir/stageDirSplit, the
    * publish-once sink artifacts in Sinks, the bucketed tables in Joins.
    * Degraded reads (staged copy unreadable → uncached plan) count too:
    * the caller did not get a warm staged read. Bench samples deltas
    * around each timed key and reports per-key `staged_hit` booleans, so
    * a cross-round bench diff can tell a warm-read measurement from one
    * that silently paid an artifact build (the r10 driver-vs-builder
    * 64.6 s vs 46.6 s gap was unattributable without this). */
  val buildCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Set `-Dgraft.staging=false` to bypass materialization: plan-only
    * consumers (graft.Explain, PlanAuditSpec) use it so they see the full
    * computation subtree instead of a staged-file scan, and pay no
    * execution cost for a plan. */
  def enabled: Boolean =
    sys.props.getOrElse("graft.staging", "true").toBoolean

  /** Engine-wide staging FORMAT version, part of EVERY staged-artifact
    * key (derived relations here, split stream dirs in Streams). Bump it
    * whenever any staging writer changes what its bytes MEAN — a source
    * fingerprint can't see that (the source didn't change, the staging
    * code did), and r9 shipped a stale-artifact bug exactly because a
    * writer's semantics changed under an unversioned key (µs-as-long
    * split files read as nanos). One constant, so a semantic change
    * anywhere invalidates everything at once instead of case-by-case.
    * Old-version artifacts are swept as orphans (see [[sweepOrphans]]). */
  val formatVersion = 2
  private[graft] def versionTag(v: Int = formatVersion) = s"v$v"

  /** The staged-artifact directory for (source, name) under version `v` —
    * exposed so tests can pin that a version bump relocates every key
    * (forcing a cold rebuild) while an unchanged version is byte-stable.
    *
    * INVARIANT: every write under the `graft_derived` root MUST take its
    * path from this method. [[sweepOrphans]] reaps ANY entry there (older
    * than 1h) whose name lacks the current `_v<N>` suffix — a writer that
    * invents its own name under this root will have its artifact silently
    * deleted as a retired-format orphan. */
  private[graft] def derivedDir(sourcePath: String, name: String,
                                v: Int = formatVersion): Path =
    Paths.get(sys.props("java.io.tmpdir"), "graft_derived",
      s"${Tables.sourceFingerprint(sourcePath)}_${name}_${versionTag(v)}")

  def materialize(df: DataFrame, sourcePath: String, name: String): DataFrame =
    materialize(df.sparkSession, sourcePath, name)(df)

  /** Compute-or-load variant: `build` is evaluated ONLY on a cache miss
    * (or when staging is disabled). The plain overload above is fine when
    * the argument is a lazy plan, but some artifacts cost eager DRIVER
    * work to construct — the PQ codebook's seed collect + Lloyd corpus
    * pass — and a by-value argument would redo that work on every
    * invocation even when the staged copy is about to be served. */
  def materialize(session: SparkSession, sourcePath: String, name: String)(
      build: => DataFrame): DataFrame =
    materializeWithStatus(session, sourcePath, name)(build)._1

  /** Like the thunked `materialize`, but also reports WHERE the result
    * comes from: `._2` is true iff the returned DataFrame reads the
    * staged artifact. Callers that reclaim upstream storage once a
    * result is "safely staged" (ccLabels retiring the CC fixpoint's
    * checkpoint) MUST key off this status, not off the artifact's
    * existence on disk — with staging disabled, or on any degraded exit,
    * the returned frame is still backed by the build's own storage even
    * when a (possibly stale, possibly another JVM's) artifact exists. */
  /** Per-artifact-directory locks: two threads materializing DIFFERENT
    * artifacts on one session proceed concurrently (a build can be a
    * minutes-long CC fixpoint or Lloyd pass — serializing every staging
    * call in the JVM behind one of those starves unrelated queries);
    * two threads racing the SAME artifact still build it exactly once.
    * Entries are tiny monitor objects keyed by a bounded artifact-name
    * space — never evicted, by design. */
  private val dirLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[graft] def materializeWithStatus(
      session: SparkSession, sourcePath: String, name: String)(
      build: => DataFrame): (DataFrame, Boolean) = {
    if (!enabled) return (build, false)
    val dir = derivedDir(sourcePath, name)
    dirLocks.computeIfAbsent(dir.toString, _ => new Object).synchronized {
      // Cache hit: serve the staged copy without touching `build` at all.
      // Only a broken READ degrades to the uncached plan here.
      try {
        if (Files.exists(dir.resolve("_SUCCESS")))
          // memoized (Tables.memoizedDirRead): a warm staged READ paid a
          // ~50-100 ms listing+footer construct per reference before r21
          return (Tables.memoizedDirRead(session, dir.toString), true)
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[staging] $name staged copy unreadable (${e.getMessage}); running uncached")
          buildCount.incrementAndGet()
          return (build, false)
      }
      // Cache miss: force the build ONCE, outside the IO-degradation
      // try. A failing build is a real query error and must propagate —
      // retrying it from a catch handler would re-run the entire eager
      // construction (CC fixpoint, Lloyd pass) just to fail again.
      buildCount.incrementAndGet()
      val df = build
      try {
        // Write to a private temp dir, then atomically rename into place:
        // a concurrent JVM racing the same key either wins the rename or
        // finds the winner's completed dir — never a half-written one,
        // and never a delete under a reader (overwrite-in-place would
        // first delete files another JVM's running query is scanning).
        val tmp = Paths.get(dir.toString + ".tmp-" +
          java.util.UUID.randomUUID.toString)
        df.write.mode("overwrite").parquet(tmp.toString)
        var attempts = 0
        var done = false
        while (!done && attempts < 3) {
          attempts += 1
          try { Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE); done = true }
          catch { case _: java.nio.file.FileAlreadyExistsException |
                       _: java.nio.file.DirectoryNotEmptyException =>
            // Destination exists — EITHER a racing JVM completed it
            // (gated by _SUCCESS) or it's a stale partial from a crashed
            // pre-atomic-rename write. The exception alone can't tell
            // them apart, so re-check the _SUCCESS gate: present → use
            // the winner's copy; absent → evict ONLY if the dir is old.
            // The age guard closes a TOCTOU hole: without it, JVM A's
            // stale _SUCCESS check could run just before JVM B publishes
            // a complete copy, and A's delete would rip files out from
            // under B's already-planned query. A fresh mtime means
            // "possibly just published / mid-publish" → treat as a lost
            // race and serve the plan uncached; only genuinely old
            // crash-leftovers (no _SUCCESS after 60 s) are evicted.
            if (Files.exists(dir.resolve("_SUCCESS"))) {
              deleteRecursively(tmp); done = true
            } else if (Files.getLastModifiedTime(dir).toMillis <
                         System.currentTimeMillis() - 60000L) {
              deleteRecursively(dir)
            } else {
              deleteRecursively(tmp)
              return (df, false)
            }
          }
        }
        if (!done) { // contended + never complete: give up on the cache
          deleteRecursively(tmp)
          if (!Files.exists(dir.resolve("_SUCCESS"))) return (df, false)
        }
        sweepOrphans(dir.getParent)
        sweepRetiredSources(dir.getParent, Paths.get(sourcePath))
        (Tables.memoizedDirRead(session, dir.toString), true)
      } catch {
        // Unwritable/full tmpdir must degrade to the slower uncached plan,
        // not fail the query — results are identical either way. (Spark
        // wraps IO failures in SparkException, so catch broadly.)
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[staging] $name not materialized (${e.getMessage}); running uncached")
          (df, false)
      }
    }
  }

  /** Remove staged artifacts of `sourcePath` whose NAME starts with
    * `namePrefix` but is not `keep` — reclamation for artifacts whose
    * name embeds a SECOND source's fingerprint (agg_gini folds the
    * customer-table fingerprint into an orders-keyed name): when that
    * inner source regenerates, the new name strands the old artifact
    * with a LIVE outer fingerprint and a CURRENT format tag, invisible
    * to both sweepOrphans and sweepRetiredSources (r19 ADVICE). Only
    * current-format siblings are touched (older formats are
    * sweepOrphans' job), with the same 1h age guard so a concurrent
    * JVM's fresh publish is never raced. */
  private[graft] def retireSiblings(sourcePath: String, namePrefix: String,
                                    keep: String): Unit =
    try {
      val parent = derivedDir(sourcePath, keep).getParent
      if (parent == null || !Files.isDirectory(parent)) return
      val fp = Tables.sourceFingerprint(sourcePath)
      val keepName = s"${fp}_${keep}_${versionTag()}"
      val cutoff = System.currentTimeMillis() - 3600000L
      val ls = Files.list(parent)
      try ls.forEach { c =>
        val n = c.getFileName.toString
        if (n.startsWith(s"${fp}_$namePrefix") &&
            n.endsWith(s"_${versionTag()}") && n != keepName &&
            Files.getLastModifiedTime(c).toMillis < cutoff)
          deleteRecursively(c)
      } finally ls.close()
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort

  /** Remove every staged artifact keyed by `fingerprint` — probe cleanup
    * for retired synthetic corpora (a 500k-doc leg's staged trigram
    * relation is ~1 GB; repeated probe runs must not stack copies). */
  private[graft] def retireDerived(fingerprint: String): Unit = {
    val derived = Paths.get(sys.props("java.io.tmpdir"), "graft_derived")
    if (Files.isDirectory(derived)) {
      val ls = Files.list(derived)
      try ls.filter(_.getFileName.toString.startsWith(fingerprint + "_"))
        .forEach(p => deleteRecursively(p))
      finally ls.close()
    }
  }

  private[graft] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRecursively(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  /** Artifact NAMES no current writer produces — renamed keys leave the
    * old name's full-corpus copy stranded for LIVE corpora (the format
    * tag is still current, the fingerprint is still live, so neither
    * other sweep can touch it; only this registry knows the name is
    * dead). Append here whenever a materialize name is renamed. */
  private[graft] val retiredArtifactNames: Seq[String] =
    Seq("ivf_cells16_v1",   // re-keyed ivf_cells16_lloyd1_v1 (Lloyd round)
        "pq_codes8x16_v1")  // re-keyed pq_codes8x16_v2_lloyd1*

  /** Remove `.tmp-<uuid>` staging dirs orphaned by a crashed writer or a
    * lost race, retired-FORMAT artifacts (dirs not carrying the current
    * [[formatVersion]] tag), and retired-NAME artifacts
    * ([[retiredArtifactNames]]) — all full dataset copies no current
    * code will ever read again — so none accumulates in the tmpdir
    * across runs/rounds. Age guards so a concurrent publish is never
    * raced: 1h for retired dirs; 6h for `.tmp-` temps, because a
    * temp's mtime is set when its WRITE STARTS (Spark creates _temporary
    * immediately, commits at the end), so a large artifact still being
    * written when it crosses the shorter cutoff would have its live temp
    * deleted mid-write by a sibling publish's sweep — temps are
    * invisible to readers either way, so patience costs nothing. */
  private[graft] def sweepOrphans(parent: Path): Unit =
    try {
      if (parent != null && Files.isDirectory(parent)) {
        val now = System.currentTimeMillis()
        val s = Files.list(parent)
        try s.forEach { c =>
          val n = c.getFileName.toString
          val cutoff =
            if (n.contains(".tmp-")) now - 21600000L else now - 3600000L
          val retiredName = retiredArtifactNames
            .exists(r => n.endsWith(s"_${r}_${versionTag()}"))
          if ((n.contains(".tmp-") || !n.endsWith(s"_${versionTag()}") ||
               retiredName) &&
              Files.getLastModifiedTime(c).toMillis < cutoff)
            deleteRecursively(c)
        } finally s.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort

  /** Fingerprints of every table file/dir the CURRENTLY-LIVE corpus
    * generations carry: `src`'s corpus root (its grandparent — corpora
    * lay out as <root>/<sfDir>/<table>) is listed and every immediate
    * child of every sibling scale-factor dir is fingerprinted. Same
    * liveness notion as [[graft.ops.Sinks.sweepRetired]]'s, widened to
    * every table (one derived root holds artifacts of several tables).
    * Empty result means liveness could NOT be established — callers must
    * sweep nothing in that case. */
  private[graft] def liveSourceFingerprints(src: Path): Set[String] =
    try {
      val root = Option(src.getParent).flatMap(p => Option(p.getParent))
      root match {
        case Some(r) if Files.isDirectory(r) =>
          val out = scala.collection.mutable.Set[String]()
          val ls = Files.list(r)
          try ls.forEach { sf =>
            if (Files.isDirectory(sf)) {
              val ls2 = Files.list(sf)
              try ls2.forEach { t =>
                try out += Tables.sourceFingerprint(t.toString)
                catch { case scala.util.control.NonFatal(_) => () }
              } finally ls2.close()
            }
          } finally ls.close()
          out.toSet
        case _ if Files.exists(src) =>
          Set(Tables.sourceFingerprint(src.toString))
        case _ => Set.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Set.empty }

  /** Sweep RETIRED-SOURCE artifacts under `root`: entries whose
    * fingerprint prefix (up to the first '_', or the whole name for
    * stageDir's plain copies) matches NO currently-live corpus
    * generation of `src`'s tree. This is the reclamation
    * [[sweepOrphans]] cannot do — a testdata regeneration changes every
    * source fingerprint, so the stranded artifacts (full dataset copies:
    * derived relations, split stream dirs) still carry the CURRENT
    * format tag and look perfectly healthy; only liveness against the
    * corpus tree identifies them. Runs on cold builds (a regeneration
    * forces one). Guards mirror sweepRetired's: 1h age so a concurrent
    * JVM's fresh build is never raced, empty live set → sweep nothing,
    * `.tmp-`/dot temps left to [[sweepOrphans]]'s own cutoffs.
    * Caveat (documented tradeoff): an artifact keyed to a live corpus
    * OUTSIDE `src`'s tree (a probe's temp corpus elsewhere in tmp) looks
    * retired from here once >1h old — probes must either finish inside
    * the hour or tolerate a staged rebuild. */
  private[graft] def sweepRetiredSources(root: Path, src: Path): Unit =
    try {
      if (!Files.isDirectory(root)) return
      val live = liveSourceFingerprints(src)
      if (live.isEmpty) return
      val cutoff = System.currentTimeMillis() - 3600000L
      val ls = Files.list(root)
      try ls.forEach { c =>
        val n = c.getFileName.toString
        val fp = n.takeWhile(_ != '_')
        if (fp.nonEmpty && !n.startsWith(".") && !n.contains(".tmp-") &&
            !live.contains(fp) &&
            Files.getLastModifiedTime(c).toMillis < cutoff)
          deleteRecursively(c)
      } finally ls.close()
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort
}
