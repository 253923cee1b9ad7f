package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native L2Sq expression must be BIT-IDENTICAL to the HOF
  * formulation (same left-to-right summation) — that equality is what
  * keeps the PQ codebook/codes (and therefore AnnSpec's driver-side
  * fixed-point replay) exact after swapping in the fast path.
  */
class L2SqSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val pairs = {
    val e = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.where(col("vec_id") < 20).select(col("vec_id").as("qid"), col("v").as("q"))
      .crossJoin(e.where(col("vec_id") >= 20).limit(200))
  }

  test("native expression == HOF fold, bitwise, on real embeddings") {
    val diff = pairs
      .select(org.apache.spark.sql.graft.L2Sq(col("q"), col("v")).as("fast"),
        ops.Ann.l2sqHof(col("q"), col("v")).as("ref"))
      .where(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
  }

  test("interpreted eval matches codegen and null semantics match the HOF") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(1.5, 0.5, -1.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))), // length mismatch
      (None, Some(Seq(1.0)))                           // null side
    ).toDF("a", "b")
    val rows = df.select(
      org.apache.spark.sql.graft.L2Sq(col("a"), col("b")).as("fast"),
      ops.Ann.l2sqHof(col("a"), col("b")).as("ref")).collect()
    // exact value on the well-formed row
    assert(rows(0).getDouble(0) === 0.25 + 2.25 + 16.0)
    // mismatch + null rows: both formulations yield null
    Seq(1, 2).foreach { i =>
      assert(rows(i).isNullAt(0) && rows(i).isNullAt(1),
        s"row $i: native/HOF null semantics diverged")
    }
    assert(rows(0).getDouble(0) === rows(0).getDouble(1))
  }
}
