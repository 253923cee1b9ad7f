package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.10 / §5: property tests for the dedup_minhash key (DuckDB-
  * oracled since r16).
  *
  * Ground truth is computed inside Spark from raw token sets (exact
  * Jaccard via array_intersect/array_union sizes) — an independent path
  * from the MinHash/LSH pipeline under test.
  */
class MinhashSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val pairs =
    SparkEntry.queries("dedup_minhash")(spark, sf).cache()

  /** (doc_a, doc_b, exact token-set Jaccard) for the reported pairs. */
  private lazy val withTrueJac = {
    val toks = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
              array_distinct(split(lower(col("text")), " ")).as("toks"))
    pairs
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("tb")), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
      .cache()
  }

  test("every reported pair has estimated Jaccard >= 0.9") {
    assert(pairs.where(col("est_jac") < 0.9).count() === 0)
    assert(pairs.count() > 0, "pipeline found no near-dups at all")
  }

  test("identical token sets are ALWAYS detected, with estimate 1.0") {
    // Identical shingle sets => identical MinHash signature => same hash in
    // every band => the pair is guaranteed (not probabilistically) caught.
    val toks = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
              array_sort(array_distinct(split(lower(col("text")), " ")))
                .as("toks"))
    val truth = toks.select(col("doc_id").as("doc_a"), col("toks"))
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("t2")),
        col("doc_a") < col("doc_b") && col("toks") === col("t2"))
      .select("doc_a", "doc_b")
    val nTruth = truth.count()
    assert(nTruth > 0, "sf0.001 should contain exact-duplicate token sets")
    val caught = truth.join(pairs, Seq("doc_a", "doc_b"), "left_semi").count()
    assert(caught === nTruth, s"missed ${nTruth - caught} identical pairs")
    val est1 = truth.join(pairs, Seq("doc_a", "doc_b"))
      .where(col("est_jac") === 1.0).count()
    assert(est1 === nTruth, "identical sets must estimate exactly 1.0")
  }

  test("reported pairs are genuinely similar (no garbage candidates)") {
    // Measured on this corpus: min true Jaccard of reported pairs is 0.6,
    // mean 0.896 — assert with slack so the property, not the corpus
    // sample, is what's under test.
    val row = withTrueJac.agg(min("jac"), avg("jac")).head()
    assert(row.getDouble(0) >= 0.5, s"worst reported pair jac=${row.getDouble(0)}")
    assert(row.getDouble(1) >= 0.8, s"mean reported-pair jac=${row.getDouble(1)}")
  }

  /** Full independent replay of signature → banding → candidate →
    * estimate on the actual documents table at `sfDir`: tokens hashed
    * with java.security MD5 (the portable primitive the r16 re-key put
    * under the query's md5() calls), but the banding, bucketing, pair
    * formation, and estimate logic reimplemented driver-side in plain
    * Scala collections. Anything the distributed pipeline drops,
    * duplicates, or mis-hashes shows up as a set difference here — a
    * second, engine-independent oracle next to the DuckDB one. */
  private def bandingReplay(sfDir: String): Unit = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // Spark split(text, " ") keeps trailing empties: split(_, -1) matches.
    // Fixed-width lowercase hex: string min ≡ numeric min, like the query.
    val sigs: Map[Long, Array[String]] = docs.map { case (id, text) =>
      val toks = text.split(" ", -1).distinct
      id -> Array.tabulate(32)(i => toks.map(t => md5hex(s"$i:$t")).min)
    }.toMap
    def bandHash(sig: Array[String], b: Int): String =
      md5hex((8 * b until 8 * (b + 1)).map(sig).mkString)
    val buckets = new scala.collection.mutable.HashMap[(Int, String), List[Long]]()
    for ((id, sig) <- sigs; b <- 0 until 4)
      buckets.updateWith((b, bandHash(sig, b)))(o => Some(id :: o.getOrElse(Nil)))
    val expected = buckets.values.flatMap { ids =>
      for (a <- ids; bId <- ids if a < bId) yield (a, bId)
    }.toSet[(Long, Long)].flatMap { case (a, b) =>
      val est = round6(sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 32.0)
      if (est >= 0.9) Some((a, b, est)) else None
    }
    val got = SparkEntry.queries("dedup_minhash")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, s"replay found no pairs at $sfDir — degenerate corpus?")
    assert(got === expected,
      s"banding diverged: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("banding pipeline matches a driver-side reference on the real corpus") {
    bandingReplay(sf)
  }

  test("banding replay also holds on the driver's gate corpus (sf0.01)") {
    // r12 verdict item 5: the exact pair SET at the scale factor the
    // driver's correctness gate actually runs — not just the spec corpus.
    bandingReplay("/root/testdata/sf0.01")
  }

  test("minhash estimate tracks exact Jaccard (mean abs error small)") {
    // 32 hash functions => stderr of the estimator ~ sqrt(J(1-J)/32) <= 0.09;
    // mean |est - exact| over thousands of pairs must land well under that.
    val mae = withTrueJac
      .agg(avg(abs(col("est_jac") - col("jac")))).head().getDouble(0)
    assert(mae <= 0.1, s"mean abs error $mae")
  }
}
