package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native CosineSim expression must be BIT-IDENTICAL to the HOF
  * formulation (same left-to-right summation) — that equality is what
  * keeps the embedding queries in parity with the DuckDB oracle after
  * swapping in the fast path.
  */
class CosineSimSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val pairs = {
    val e = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.where(col("vec_id") < 20).select(col("vec_id").as("qid"), col("v").as("q"))
      .crossJoin(e.where(col("vec_id") >= 20).limit(200))
  }

  test("native expression == HOF fold, bitwise, on real embeddings") {
    val diff = pairs
      .select(ops.Vector.cosine(col("q"), col("v")).as("fast"),
        ops.Vector.cosineHof(col("q"), col("v")).as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("interpreted eval matches codegen (nullSafeEval path)") {
    val r = pairs.limit(50)
      .select(ops.Vector.cosine(col("q"), col("v")).as("c")).collect()
    val rows = pairs.limit(50).select(col("q"), col("v")).collect()
    rows.zip(r).foreach { case (in, out) =>
      val q = in.getSeq[Double](0); val v = in.getSeq[Double](1)
      val dot = q.zip(v).foldLeft(0.0)((s, p) => s + p._1 * p._2)
      val na = q.foldLeft(0.0)((s, x) => s + x * x)
      val nb = v.foldLeft(0.0)((s, x) => s + x * x)
      assert(out.getDouble(0) === dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  test("SQL registration: graft_cosine callable from SQL text") {
    functions.GraftExtensions.register(spark)
    Tables.table(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
      .limit(5).createOrReplaceTempView("cos_spec_v")
    val out = spark.sql(
      "SELECT graft_cosine(v, v) AS c FROM cos_spec_v").collect()
    assert(out.length === 5)
    out.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("null array yields null") {
    functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c")
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("length mismatch yields null (matching the HOF reference)") {
    functions.GraftExtensions.register(spark)
    // literal form (constant-folded => interpreted eval path)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d), array(1.0d)) AS c").collect()
    assert(r.head.isNullAt(0))
    // non-foldable form over real rows => whole-stage CODEGEN path: slice
    // the stored 64-dim vector so the mismatch branch compiles and runs.
    val cg = Tables.table(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
      .limit(10)
      .select(ops.Vector.cosine(col("v"),
        slice(col("v"), lit(1), lit(32))).as("c"))
      .collect()
    assert(cg.length === 10)
    cg.foreach(row => assert(row.isNullAt(0), "codegen mismatch must be null"))
    // and the HOF reference agrees
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val both = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(ops.Vector.cosine(col("a"), col("b")).as("fast"),
        ops.Vector.cosineHof(col("a"), col("b")).as("ref"))
      .head()
    assert(both.isNullAt(0) && both.isNullAt(1))
  }
}
