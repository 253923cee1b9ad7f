package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Law tests for the r19 text/dedup additions, beyond what their DuckDB
  * oracles can state (the oracles replay the same arithmetic; these pin
  * the MATHEMATICAL invariants an arithmetic slip could break on both
  * engines at once — the dq_drift_psi spec posture).
  */
class KeywordContainmentSpec extends AnyFunSuite {
  import TestSpark._

  test("text_keywords_rake: no stopword in any phrase; score ≥ phrase " +
      "length (word score = degree/freq ≥ 1 since plen ≥ 1)") {
    val rows = SparkEntry.queries("text_keywords_rake")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val stops = Set("a", "the", "and", "of", "to", "in",
      "der", "die", "das", "und", "le", "la", "et", "el", "y")
    rows.foreach { case (phrase, n, score) =>
      val words = phrase.split(' ')
      assert(words.forall(w => !stops(w)),
        s"stopword leaked into phrase '$phrase'")
      assert(n >= 1)
      // each member word's score = degree/freq ≥ min phrase length ≥ 1,
      // so the phrase score is at least its word count
      assert(score >= words.length - 1e-9,
        s"phrase '$phrase' score $score below its length ${words.length}")
    }
  }

  test("dedup_containment: containment ∈ [0.9, 1]; inter ≤ n_grams; " +
      "directional — the container relation is not forced symmetric") {
    val rows = SparkEntry.queries("dedup_containment")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty, "no containment pairs on the gate corpus")
    rows.foreach { case (a, b, inter, n, c) =>
      assert(a !== b)
      assert(inter <= n, s"pair ($a,$b): inter $inter > |A| $n")
      assert(c >= 0.9 - 1e-9 && c <= 1.0 + 1e-9, s"pair ($a,$b): c=$c")
      assert(math.abs(c - inter.toDouble / n) < 1e-6)
    }
    // every symmetric jaccard ≥ 0.8 pair whose SMALLER side is ≥ 0.9
    // contained must appear here (the asymmetric relation is a superset
    // on that slice) — replayed from the staged pair list itself
    val jac = graft.ops.Dedup.ngramPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val have = rows.map(t => (t._1, t._2)).toSet
    val grams: Map[Long, Set[String]] =
      graft.ops.Dedup.stagedGrams(spark, sf)
        .select(col("doc_id"), col("g")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    jac.foreach { case (x, y) =>
      val (ga, gb) = (grams(x), grams(y))
      val inter = ga.intersect(gb).size
      if (inter * 10 >= ga.size * 9)
        assert(have((x, y)), s"jaccard pair ($x,$y) with C≥0.9 missing")
      if (inter * 10 >= gb.size * 9)
        assert(have((y, x)), s"jaccard pair ($y,$x) with C≥0.9 missing")
    }
  }

  test("pipeline_dataset_card: dup share ∈ [0,1], counts consistent, " +
      "modal lang is a real lang of the source") {
    val card = SparkEntry.queries("pipeline_dataset_card")(spark, sf)
      .collect()
    assert(card.length > 0)
    val bySource = Tables.table(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"),
        countDistinct("lang").as("nl")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    card.foreach { r =>
      val (src, nDocs, nLangs, dupN, dupPct) =
        (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(5),
          r.getDouble(6))
      assert(bySource(src)._1 === nDocs, s"$src n_docs drifted")
      assert(bySource(src)._2 === nLangs, s"$src n_langs drifted")
      assert(dupN <= nDocs && dupPct >= 0.0 && dupPct <= 1.0)
    }
  }
}
