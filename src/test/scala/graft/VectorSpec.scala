package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.10 / §5: differential tests for the embedding-similarity
  * operators. The distributed broadcast-topK implementation is checked
  * against a naive in-memory brute force over the collected vectors —
  * feasible because sf0.001 is ~1k vectors; the property generalizes
  * because the operator under test is scale-invariant in its semantics.
  */
class VectorSpec extends AnyFunSuite {
  import TestSpark._

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val vecs: Map[Long, (Array[Double], Int)] =
    Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toArray, r.getInt(2)))
      .toMap

  test("cosine HOF: self-similarity is 1") {
    val sims = Tables.table(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
      .limit(50)
      .select(graft.ops.Vector.cosine(col("v"), col("v")).as("s"))
      .collect().map(_.getDouble(0))
    sims.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("graph_components: edge endpoints share a component, " +
      "label is the component minimum (union-find law)") {
    val comp = SparkEntry.queries("graph_components")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = graft.ops.Vector.knnEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty && comp.nonEmpty)
    // Law 1: the component of a vector equals the component of every
    // one of its kNN neighbors — the closure property the key exists for.
    edges.foreach { case (a, b) =>
      assert(comp(a) === comp(b),
        s"edge ($a,$b) straddles components ${comp(a)}/${comp(b)}")
    }
    // Law 2: min-label semantics — each component's label IS its
    // smallest member id, and the label names a member.
    comp.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min === lbl,
        s"component $lbl label is not its min member")
    }
    // Every edge endpoint is labeled (no node dropped by the fixpoint).
    edges.foreach { case (a, b) =>
      assert(comp.contains(a) && comp.contains(b))
    }
  }

  test("embed_normalize output is unit-norm and mean-centered") {
    val rows = SparkEntry.queries("embed_normalize")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byVec = rows.groupBy(_._1)
    assert(byVec.size == vecs.size, "one output vector per input vector")
    // every output vector has L2 norm 1
    byVec.values.foreach { dims =>
      val n2 = dims.map(d => d._3 * d._3).sum
      assert(math.abs(n2 - 1.0) < 1e-9, s"norm² = $n2")
    }
    // centering: the mean of (pre-normalization) centered values is 0 by
    // construction; post-normalization the per-dim mean is only ~0, but
    // replaying center+normalize in plain Scala must match bit-for-bit.
    val n = vecs.size
    val dim = vecs.values.head._1.length
    val mean = Array.tabulate(dim) { d =>
      vecs.values.map(v => math.round(v._1(d) * 1e6)).sum.toDouble /
        (n.toLong * 1000000L)
    }
    rows.foreach { case (id, pos, got) =>
      val v = vecs(id)._1
      val c = Array.tabulate(dim)(d => v(d) - mean(d))
      var s2 = 0.0; var i = 0
      while (i < dim) { s2 += c(i) * c(i); i += 1 }
      val want = c(pos.toInt) / math.sqrt(s2)
      assert(java.lang.Double.compare(got, want) == 0,
        s"vec $id pos $pos: $got != $want")
    }
  }

  test("embed_cosine_topk matches in-memory brute force exactly") {
    val got = SparkEntry.queries("embed_cosine_topk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // Reference: same contract — probes vec_id<10, exclude self, rank by
    // round(cos, 6) desc then vec_id asc, top 5.
    val want = vecs.keys.filter(_ < 10).toSeq.sorted.flatMap { q =>
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, (v, _)) =>
          (id, BigDecimal(cosine(vecs(q)._1, v))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (q, i + 1, id) }
    }
    assert(got.toSeq.sorted === want.sorted)
  }

  test("embed_knn_label matches in-memory brute-force kNN vote") {
    val got = SparkEntry.queries("embed_knn_label")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val corpus = vecs.filter(_._1 >= 100).toSeq
    val want = vecs.keys.filter(_ < 100).map { q =>
      val neigh = corpus
        .map { case (id, (v, lab)) =>
          (id, lab, BigDecimal(cosine(vecs(q)._1, v))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, _, s) => (-s, id) }
        .take(10)
      // majority vote, smaller label wins ties
      val pred = neigh.groupBy(_._2).toSeq
        .map { case (lab, xs) => (lab, xs.size) }
        .sortBy { case (lab, n) => (-n, lab) }.head._1
      q -> pred
    }.toMap
    assert(got.size === 100)
    assert(got === want)
  }

  test("embed_kmeans: driver-side Lloyd replay matches exactly and " +
       "inertia is monotone non-increasing across rounds") {
    // Independent formulation: plain while-loop arrays, same seed rule
    // (lowest-8 vec_ids), same (round-6 l2², id) argmin, same 10⁻⁶
    // fixed-point means — a rank/rounding/empty-cell slip in the
    // declared key cannot survive both implementations. Plus the law
    // that makes it k-MEANS: each Lloyd update must not increase the
    // training loss (assignment and mean steps are both minimizers;
    // the 1e-6 fixed-point quantization gets a matching tolerance).
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val ids = vecs.keys.toSeq.sorted
    var cents: Seq[(Long, Array[Double])] =
      ids.filter(_ < 8).sorted.map(id => id -> vecs(id)._1)
    def assign(cs: Seq[(Long, Array[Double])]): Map[Long, (Long, Double)] =
      ids.map { id =>
        val best = cs.map { case (cid, cv) =>
          (r6(l2sq(vecs(id)._1, cv)), cid) }.min
        id -> (best._2, best._1)
      }.toMap
    def inertia(cs: Seq[(Long, Array[Double])]): Double =
      assign(cs).values.map(_._2).sum
    val trajectory = Seq.newBuilder[Double]
    trajectory += inertia(cents)
    for (_ <- 1 to 3) {
      val a = assign(cents)
      val upd = a.toSeq.groupBy(_._2._1).map { case (cid, members) =>
        val vs = members.map(m => vecs(m._1)._1)
        val dim = vs.head.length
        cid -> Array.tabulate(dim) { d =>
          vs.map(v => math.round(v(d) * 1e6)).sum.toDouble / vs.size / 1e6
        }
      }
      cents = cents.map { case (cid, cv) => cid -> upd.getOrElse(cid, cv) }
      trajectory += inertia(cents)
    }
    val traj = trajectory.result()
    traj.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-3, s"inertia increased across a Lloyd round: $traj")
    }
    // the declared per-cluster report equals the replay's final state
    val fin = assign(cents)
    val expect = fin.toSeq.groupBy(_._2._1).map { case (cid, ms) =>
      cid -> (ms.size.toLong,
        r6(ms.map(m => math.round(m._2._2 * 1e6)).sum.toDouble / 1e6))
    }
    val out = SparkEntry.queries("embed_kmeans")(spark, sf).collect()
    assert(out.length === expect.size)
    out.foreach { r =>
      val (n, in) = expect(r.getLong(0))
      assert(r.getLong(1) === n, s"cluster ${r.getLong(0)} size")
      assert(math.abs(r.getDouble(2) - in) < 1e-9,
        s"cluster ${r.getLong(0)} inertia")
    }
  }

  test("embed_abtt: output is orthogonal to the top direction and obeys " +
       "Pythagoras per vector") {
    // The corrected vector a = x − (x·u)u must satisfy a·u ≈ 0 and
    // ‖a‖² = ‖x‖² − (x·u)² for a UNIT u — both laws fail loudly if u is
    // unnormalized, the projection is off, or a dimension is misaligned.
    val rows = SparkEntry.queries("embed_abtt")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val a = rows.groupBy(_._1).map { case (id, ds) =>
      id -> ds.sortBy(_._2).map(_._3).toArray }
    assert(a.nonEmpty)
    // recover u from any two vectors' residuals: u ∝ x − a
    val xs = vecs
    val (id0, a0) = a.head
    val diff = xs(id0)._1.zip(a0).map { case (x, av) => x - av }
    val dn = math.sqrt(diff.map(d => d * d).sum)
    // degenerate only if x ⟂ u exactly — not this corpus
    assert(dn > 1e-12, "residual degenerate; cannot recover u")
    val u = diff.map(_ / dn)
    a.foreach { case (id, av) =>
      val x = xs(id)._1
      val p = x.zip(u).map { case (xi, ui) => xi * ui }.sum
      val du = av.zip(u).map { case (ai, ui) => ai * ui }.sum
      assert(math.abs(du) < 1e-6, s"vec $id not orthogonal to u: $du")
      val nx = x.map(v => v * v).sum
      val na = av.map(v => v * v).sum
      assert(math.abs(na - (nx - p * p)) < 1e-6, s"vec $id Pythagoras")
    }
  }

  test("top eigenvector: unit norm, dominant direction, deterministic") {
    val out = SparkEntry.queries("embed_top_eigen")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    assert(out.length === 64)
    // rounded loadings of a normalized vector: ||v|| = 1 up to rounding
    val nrm = math.sqrt(out.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-4, s"loadings norm $nrm != 1")
    // the POINT of the key: mean squared projection onto the learned
    // direction must dominate a fixed baseline axis (e1, the power
    // iteration's own start — 3 iterations must have moved off it
    // toward the dominant direction)
    val vecs = Tables.table(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0))
    def msp(dir: Seq[Double]) = {
      val ps = vecs.map(v => v.zip(dir).map { case (a, b) => a * b }.sum)
      ps.map(p => p * p).sum / ps.length
    }
    val e1 = 1.0 +: Seq.fill(63)(0.0)
    assert(msp(out) > msp(e1),
      s"learned direction ${msp(out)} does not dominate e1 ${msp(e1)}")
    val again = SparkEntry.queries("embed_top_eigen")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
    assert(again === out)
  }
}
