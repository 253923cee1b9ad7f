package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.10 `text_sentiment`: lexicon-based polarity scoring. The
  * driver oracle replays the rollup through an independent unnest+join
  * formulation; this spec pins the pieces the rollup can mask.
  */
class SentimentSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Tables.table(spark, sf, "documents")

  test("CASE-fold score equals the explode+join score doc-by-doc") {
    // The declared key folds a CASE chain map-side; a large production
    // lexicon would use a broadcast token join instead. Prove the two
    // shapes identical on every document, so swapping is behavior-free.
    val folded = SparkEntry.queries("text_sentiment") // touch the key map
    assert(folded != null)
    val sess = spark
    import sess.implicits._
    val lex = Seq("fast" -> 3L, "value" -> 2L, "big" -> 1L, "merge" -> 1L,
      "join" -> 1L, "slow" -> -3L, "dup" -> -2L, "small" -> -1L,
      "filter" -> -1L, "crash" -> -4L, "fail" -> -3L, "error" -> -2L,
      "good" -> 3L, "bad" -> -3L).toDF("word", "valence")
    val viaJoin = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("word"))
      .join(broadcast(lex), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(coalesce(sum(col("valence")), lit(0L)).as("score"))
    val viaFold = docs.select(col("doc_id"),
      graft.ops.TextQuality.sentimentScore.as("score"))
    val diff = viaJoin.join(viaFold, "doc_id")
      .where(viaJoin("score") =!= viaFold("score")).count()
    assert(diff === 0L, s"$diff docs score differently between CASE fold " +
      "and broadcast lexicon join")
  }

  test("polarity is non-degenerate on the corpus") {
    val row = SparkEntry.queries("text_sentiment")(spark, sf)
      .agg(sum("n_pos").as("p"), sum("n_neg").as("n"), sum("n_docs").as("d"))
      .head()
    val (p, n, d) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(d > 0)
    assert(p > 0 && n > 0,
      s"lexicon never fired on either side (pos=$p neg=$n of $d docs) — " +
        "the key is testing nothing; re-seat the lexicon on the corpus vocab")
    assert(p + n <= d)
  }

  test("top_pos/top_neg doc ids are the deterministic tie-broken picks") {
    val scored = docs.select(col("lang"), col("source"), col("doc_id"),
      graft.ops.TextQuality.sentimentScore.as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "source")
    val expect = scored
      .withColumn("rp", row_number().over(
        w.orderBy(col("score").desc, col("doc_id"))))
      .withColumn("rn", row_number().over(
        w.orderBy(col("score").asc, col("doc_id"))))
      .groupBy("lang", "source")
      .agg(max(when(col("rp") === 1, col("doc_id"))).as("e_pos"),
        max(when(col("rn") === 1, col("doc_id"))).as("e_neg"))
    val got = SparkEntry.queries("text_sentiment")(spark, sf)
      .select(col("lang"), col("source"),
        col("top_pos_doc"), col("top_neg_doc"))
    val bad = got.join(expect, Seq("lang", "source"))
      .where(col("top_pos_doc") =!= col("e_pos") ||
        col("top_neg_doc") =!= col("e_neg")).count()
    assert(bad === 0L,
      s"$bad groups picked a different top doc than the window-rank replay")
  }
}
