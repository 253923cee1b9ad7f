package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5: ScalaCheck-generated properties for the vector math that
  * underpins the §2.10 similarity operators. Generated vectors run through
  * the SAME Spark HOF expressions the queries use (one DataFrame per
  * property, all cases batched) and are checked against a plain-Scala
  * reference. Seeds are pinned — the test is deterministic.
  * (ScalaCheck's Gen is driven directly rather than through the
  * scalatestplus bridge, which isn't on the offline classpath.)
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(16, Gen.choose(-10.0, 10.0))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private def refCosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  private def sparkCosine(pairs: Seq[(Seq[Double], Seq[Double])]): Seq[Double] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    pairs.toDF("a", "b")
      .select(graft.ops.Vector.cosine(col("a"), col("b")).as("c"))
      .collect().toSeq.map(_.getDouble(0))
  }

  test("Spark cosine HOF matches scala reference, symmetric, bounded (40 cases)") {
    val pairs = sample(Gen.zip(vecGen, vecGen), 40, seed = 42L)
      .map { case (a, b) => (a: Seq[Double], b: Seq[Double]) }
    val ab = sparkCosine(pairs)
    val ba = sparkCosine(pairs.map(_.swap))
    pairs.indices.foreach { i =>
      val ref = refCosine(pairs(i)._1, pairs(i)._2)
      assert(math.abs(ab(i) - ref) < 1e-9, s"case $i: ${ab(i)} vs ref $ref")
      assert(math.abs(ab(i) - ba(i)) < 1e-9, s"case $i not symmetric")
      assert(ab(i) >= -1.0 - 1e-12 && ab(i) <= 1.0 + 1e-12, s"case $i out of range")
    }
  }

  test("cosine is scale-invariant: cos(ka, b) == cos(a, b) for k>0 (20 cases)") {
    val base = sample(Gen.zip(vecGen, vecGen, Gen.choose(0.1, 100.0)), 20, 7L)
    val plain = sparkCosine(base.map { case (a, b, _) => (a, b) })
    val scaled = sparkCosine(base.map { case (a, b, k) => (a.map(_ * k), b) })
    base.indices.foreach(i => assert(math.abs(plain(i) - scaled(i)) < 1e-9))
  }
}
