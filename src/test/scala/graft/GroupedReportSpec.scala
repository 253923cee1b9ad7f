package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The duplicate-heavy grouped report (`graft.dedup.groupedReport=true`)
  * must expand LOSSLESSLY to the plain pair set for every report family:
  * cross rows (a, b, score, n_a, n_b) expand to group(a) × group(b) and
  * self rows (r, r, perfect, n, n) to the group's n·(n−1)/2 intra pairs,
  * all carrying the family's text-functional score — and that expansion
  * must equal the plain report row-for-row, including NOT inventing
  * intra-group pairs for texts the plain pipeline never pairs (ngram's
  * < 3-token docs). */
class GroupedReportSpec extends AnyFunSuite {
  import TestSpark._

  private val keys = Seq("dedup_ngram_jaccard", "dedup_simhash", "dedup_minhash")

  test("grouped report expands losslessly to the plain pair set") {
    import spark.implicits._
    // Exact-copy groups, a near-dup across groups, identical SHORT docs
    // (eligibility edge), uniques — the shapes a crawl corpus mixes.
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val mut = ((1 to 19).map(i => s"w$i") :+ "zz").mkString(" ") // J=17/19
    val other = (1 to 20).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), (3L, base), // 3-copy group
      (4L, mut), (5L, mut),               // near-dup group of 2
      (6L, other), (7L, other),           // unrelated exact group
      (8L, (1 to 20).map(i => s"y$i").mkString(" ")), // unique
      (9L, "a b"), (10L, "a b")           // identical SHORT docs
    ).map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft-grpt").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // group membership by exact text, driver-side reference
    val members: Map[Long, Seq[Long]] = docs.groupBy(_._2).values
      .map(g => g.map(_._1).min -> g.map(_._1).sorted.toSeq).toMap
    val stagingWas = sys.props.get("graft.staging")
    sys.props("graft.staging") = "false"
    try keys.foreach { key =>
      val q = SparkEntry.queries(key)
      val plain = q(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), String.valueOf(r.get(2)))).toSet
      spark.conf.set("graft.dedup.groupedReport", "true")
      val grouped =
        try q(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1), String.valueOf(r.get(2)),
            r.getLong(3), r.getLong(4)))
        finally spark.conf.unset("graft.dedup.groupedReport")
      // multiplicities must be the actual group sizes
      grouped.foreach { case (a, b, _, na, nb) =>
        assert(na === members(a).size.toLong, s"$key n_a wrong for rep $a")
        assert(nb === members(b).size.toLong, s"$key n_b wrong for rep $b")
      }
      val expanded = grouped.flatMap { case (a, b, score, _, _) =>
        if (a == b) members(a).combinations(2).map(p =>
          (p.min, p.max, score))
        else for (da <- members(a); db <- members(b))
          yield (math.min(da, db), math.max(da, db), score)
      }.toSet
      assert(expanded === plain, s"$key grouped expansion != plain pairs")
      assert(grouped.size < plain.size || plain.size <= 1,
        s"$key grouped report is not smaller on a dup-heavy corpus")
    } finally {
      stagingWas match {
        case Some(v) => sys.props("graft.staging") = v
        case None => sys.props -= "graft.staging"
      }
      Staging.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
