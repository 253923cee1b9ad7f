package graft

import org.scalatest.funsuite.AnyFunSuite

/** Compute-or-load semantics of the thunked `Staging.materialize`
  * overload: the build thunk must run on a cache miss and must NOT run
  * when the staged artifact is served — that laziness is what lets
  * eager-to-construct artifacts (the PQ codebook's seed collect + Lloyd
  * corpus pass) cost their build once per corpus version instead of once
  * per query. */
class StagingSpec extends AnyFunSuite {
  import TestSpark._

  test("Bench.stagedReadKeys are all declared queries") {
    // The bench warm-up force-builds every stagedReadKeys artifact by
    // invoking the key; a renamed/removed key would make the warm-up
    // silently skip it (NonFatal-swallowed) and the timed pass would pay
    // a cold build again — exactly the r10 driver-bench failure mode.
    val unknown = Bench.stagedReadKeys.toSet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"stagedReadKeys not in queries: $unknown")
  }

  test("unusable tmpdir degrades to the uncached plan, not a failure") {
    import spark.implicits._
    // Force session init AND first-query lazies (ArtifactManager's static
    // artifact root) BEFORE breaking tmpdir — both need a writable temp
    // dir once per JVM, and this suite may run first / in isolation.
    Seq((0, "z")).toDF("id", "s").collect()
    val src = Tables.path(sf, "region")
    // Point java.io.tmpdir at a FILE so the graft_derived dir can't be
    // created: materialize must return the original plan (identical
    // results, just uncached), never throw.
    val blocker = java.nio.file.Files.createTempFile("graft-not-a-dir", "")
    val tmpWas = sys.props("java.io.tmpdir")
    sys.props("java.io.tmpdir") = blocker.toString
    try {
      val out = Staging.materialize(spark, src, "stagingspec_unwritable_v1") {
        Seq((7, "x")).toDF("id", "s")
      }
      assert(out.collect().map(_.getInt(0)).toSeq === Seq(7))
    } finally {
      sys.props("java.io.tmpdir") = tmpWas
      java.nio.file.Files.deleteIfExists(blocker)
    }
  }

  test("build thunk runs on miss, is skipped on hit, runs again when disabled") {
    import spark.implicits._
    val src = Tables.path(sf, "region") // any real file, for the fingerprint
    val name = "stagingspec_probe_v1"
    val dir = Staging.derivedDir(src, name)
    Staging.deleteRecursively(dir)
    var builds = 0
    def build = { builds += 1; Seq((1, "a"), (2, "b")).toDF("id", "s") }
    val stagingWas = sys.props.get("graft.staging")
    try {
      sys.props -= "graft.staging" // default: enabled
      val first = Staging.materialize(spark, src, name)(build)
      assert(builds === 1)
      assert(first.collect().map(_.getInt(0)).sorted === Array(1, 2))
      val second = Staging.materialize(spark, src, name)(build)
      assert(builds === 1, "build thunk forced on a cache hit")
      assert(second.collect().map(_.getInt(0)).sorted === Array(1, 2))
      // disabled → bypass the cache entirely: the thunk's plan IS the result
      sys.props("graft.staging") = "false"
      Staging.materialize(spark, src, name)(build)
      assert(builds === 2, "disabled staging must evaluate the thunk")
    } finally {
      stagingWas match {
        case Some(v) => sys.props("graft.staging") = v
        case None => sys.props -= "graft.staging"
      }
      Staging.deleteRecursively(dir)
    }
  }

  test("format version is part of every staged key; old formats are swept") {
    import spark.implicits._
    val src = Tables.path(sf, "region")
    val name = "stagingspec_fmt_probe"
    val cur = Staging.derivedDir(src, name)
    // a bumped version RELOCATES the key → nothing at the new path → the
    // next materialize cold-rebuilds; an unchanged version is byte-stable
    val bumped = Staging.derivedDir(src, name, Staging.formatVersion + 1)
    assert(cur.toString.endsWith("_v" + Staging.formatVersion))
    assert(cur != bumped && !java.nio.file.Files.exists(bumped))
    // seed a retired-format artifact (the pre-version unsuffixed shape)
    // plus a CURRENT-format sibling; the sweep must take only the former
    val parent = cur.getParent
    java.nio.file.Files.createDirectories(parent)
    val retired = parent.resolve(s"${Tables.sourceFingerprint(src)}_${name}_stale")
    java.nio.file.Files.createDirectories(retired)
    java.nio.file.Files.setLastModifiedTime(retired,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L)) // past the 1h guard
    Staging.deleteRecursively(cur)
    try {
      Staging.materialize(spark, src, name)(Seq((1, "a")).toDF("id", "s"))
      assert(java.nio.file.Files.isDirectory(cur), "current-format key missing")
      assert(!java.nio.file.Files.exists(retired),
        "retired-format artifact survived the sweep")
    } finally {
      Staging.deleteRecursively(cur)
      Staging.deleteRecursively(retired)
    }
  }

  test("superseded name-siblings (embedded inner fingerprint) are reclaimed") {
    // agg_gini folds the CUSTOMER fingerprint into an orders-keyed name:
    // when customer regenerates, the old name strands with a live outer
    // fingerprint + current format tag — only retireSiblings can take it
    // (r19 ADVICE). Fresh siblings and other names must survive.
    val src = Tables.path(sf, "region")
    val keep = "stagingspec_sib_cNEW_v1"
    val parent = Staging.derivedDir(src, keep).getParent
    java.nio.file.Files.createDirectories(parent)
    val fp = Tables.sourceFingerprint(src)
    def mk(name: String, old: Boolean): java.nio.file.Path = {
      val p = parent.resolve(s"${fp}_${name}_v" + Staging.formatVersion)
      java.nio.file.Files.createDirectories(p)
      if (old) java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 7200000L))
      p
    }
    val keepDir  = mk(keep, old = true)             // the current name
    val staleSib = mk("stagingspec_sib_cOLD_v1", old = true)  // superseded
    val freshSib = mk("stagingspec_sib_cMID_v1", old = false) // < 1h guard
    val other    = mk("stagingspec_other_v1", old = true)     // ≠ prefix
    try {
      Staging.retireSiblings(src, "stagingspec_sib_c", keep)
      assert(java.nio.file.Files.isDirectory(keepDir), "current name swept")
      assert(!java.nio.file.Files.exists(staleSib),
        "superseded sibling survived retireSiblings")
      assert(java.nio.file.Files.isDirectory(freshSib),
        "age guard ignored — a possibly-concurrent publish was raced")
      assert(java.nio.file.Files.isDirectory(other), "non-prefix name swept")
    } finally Seq(keepDir, staleSib, freshSib, other)
      .foreach(Staging.deleteRecursively)
  }

  test("retired-SOURCE artifacts are reclaimed; live and unestablishable " +
       "cases are left alone") {
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    // corpus root with two live sf dirs (one file-shaped, one dir-shaped
    // table — both must count as live)
    val corpus = Files.createTempDirectory("graft_stg_corpus_")
    Files.createDirectories(corpus.resolve("sfA"))
    Files.write(corpus.resolve("sfA").resolve("tbl.parquet"), Array[Byte](1))
    Files.createDirectories(corpus.resolve("sfB").resolve("tbl.parquet"))
    Files.write(corpus.resolve("sfB").resolve("tbl.parquet").resolve("p0"),
      Array[Byte](2))
    val src = corpus.resolve("sfA").resolve("tbl.parquet")
    val fpA = Tables.sourceFingerprint(src.toString)
    val fpB = Tables.sourceFingerprint(
      corpus.resolve("sfB").resolve("tbl.parquet").toString)
    val root = Files.createTempDirectory("graft_stg_root_")
    def mk(name: String, old: Boolean): java.nio.file.Path = {
      val d = Files.createDirectories(root.resolve(name))
      if (old) Files.setLastModifiedTime(d,
        FileTime.fromMillis(System.currentTimeMillis() - 7200000L))
      d
    }
    try {
      val liveA = mk(s"${fpA}_x_v2", old = true)   // live fp, old — keep
      val liveB = mk(s"${fpB}_x_v2", old = true)   // other live SF — keep
      val deadOld = mk("aaaa12345678_x_v2", old = true)   // retired — sweep
      val deadNew = mk("bbbb12345678_x_v2", old = false)  // too fresh — keep
      val tmp = mk("cccc12345678_x_v2.tmp-abc", old = true) // temps skipped
      Staging.sweepRetiredSources(root, src)
      assert(Files.exists(liveA) && Files.exists(liveB),
        "sweep deleted an artifact keyed to a live corpus generation")
      assert(!Files.exists(deadOld), "retired-source artifact not reclaimed")
      assert(Files.exists(deadNew), "age guard ignored")
      assert(Files.exists(tmp), "live-writer temp raced by the sweep")
      // liveness unestablishable (corpus root itself is gone — e.g. a
      // probe's deleted temp tree): must sweep NOTHING
      val ghost = java.nio.file.Paths.get(
        root.toString + "_gone", "sfX", "none.parquet")
      val survivor = mk("dddd12345678_x_v2", old = true)
      Staging.sweepRetiredSources(root, ghost)
      assert(Files.exists(survivor),
        "sweep ran with an empty live set — deletion with no liveness proof")
    } finally {
      Staging.deleteRecursively(root)
      Staging.deleteRecursively(corpus)
    }
  }
}
