package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.10 / §5: property tests for the no-oracle dedup_minhash key.
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

  test("minhash estimate tracks exact Jaccard (mean abs error small)") {
    // 32 hash functions => stderr of the estimator ~ sqrt(J(1-J)/32) <= 0.09;
    // mean |est - exact| over thousands of pairs must land well under that.
    val mae = withTrueJac
      .agg(avg(abs(col("est_jac") - col("jac")))).head().getDouble(0)
    assert(mae <= 0.1, s"mean abs error $mae")
  }
}
