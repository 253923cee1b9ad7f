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

  test("agg_ewma: convex combination stays inside per-user value bounds " +
    "and matches a driver-side fold") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("agg_ewma")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // Driver replay: same chronological order (second-truncated ts,
    // event_id), same Horner fold, exact equality expected — every op is
    // IEEE *,+ on the same doubles in the same order.
    val hist = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("second", col("ts")).as("tss"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1)
    assert(got.keySet === hist.keySet)
    for ((u, rows) <- hist) {
      val vals = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val ref = vals.tail.foldLeft(vals.head)((a, x) => a * 0.875 + x * 0.125)
      assert(got(u) == ref, s"user $u: ${got(u)} != driver fold $ref")
      assert(got(u) >= vals.min && got(u) <= vals.max,
        s"user $u: ewma outside [min, max]")
    }
  }

  test("asof tolerance: gap laws, completeness vs the untolerated asof") {
    val out = SparkEntry.queries("join_asof_tolerance")(spark, sf).collect()
    assert(out.nonEmpty)
    var matched = 0
    out.foreach { r =>
      val gapNull = r.isNullAt(r.fieldIndex("gap_s"))
      val sigNull = r.isNullAt(r.fieldIndex("matched_signup"))
      assert(gapNull === sigNull, "gap and match must NULL together")
      if (!gapNull) {
        val g = r.getAs[Long]("gap_s")
        assert(g >= 0 && g <= 3600, s"gap $g outside tolerance")
        matched += 1
      }
    }
    assert(matched > 0, "tolerance must match something on this corpus")
    // completeness + consistency against the declared untolerated key:
    // same purchases, and a row is matched here iff its asof gap ≤ 1h
    val base = SparkEntry.queries("join_asof")(spark, sf).collect()
      .map(r => r.getAs[Long]("p_id") ->
        r.getAs[java.sql.Timestamp]("prev_signup")).toMap
    val purchases = out.map(_.getAs[Long]("p_id")).toSet
    assert(base.keySet.subsetOf(purchases),
      "tolerance key must keep every purchase the base key matched")
    out.foreach { r =>
      val pid = r.getAs[Long]("p_id")
      (base.get(pid), r.isNullAt(r.fieldIndex("matched_signup"))) match {
        case (Some(sig), false) =>
          assert(r.getAs[java.sql.Timestamp]("matched_signup") === sig,
            s"$pid matched a different signup than the base asof")
        case (None, keptNull) => assert(keptNull,
          s"$pid has no prior signup yet the tolerance key matched one")
        case _ => // base matched but gap > 1h → correctly NULL here
      }
    }
  }

  test("win_rolling_median is always one of the customer's own totals") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("win_rolling_median")(spark, sf)
      .select("o_custkey", "med5").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val byCust = Tables.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rows.foreach { case (c, m) =>
      assert(byCust(c).contains(m),
        s"customer $c: median $m is not one of their totals (selection " +
          "property violated)")
    }
  }
}
