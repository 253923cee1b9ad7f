package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** text_bpe_tokenize / pack_sequences_bpe against an INDEPENDENT
  * driver-side reference implementation (the Mann-Whitney replay
  * pattern): training is re-derived with a naive greedy while-loop over
  * plain Scala collections — no windows, no islands, no SQL — and both
  * keys' outputs must match it exactly. A bug in the islands-parity
  * formulation that the oracle (same formulation) would reproduce
  * cannot survive this second derivation.
  */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Naive reference BPE: split-to-chars, then K greedy rounds of
    * (max count, lexicographic tie) merges applied left-to-right. */
  private def referenceVocab(k: Int): Map[String, Vector[String]] = {
    val words = Tables.table(spark, sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .collect().map(_.getString(0))
    val wc = words.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    var v: Map[String, Vector[String]] =
      wc.keys.map(w => w -> w.toVector.map(_.toString)).toMap
    for (_ <- 1 to k) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, toks) <- v; i <- 0 until toks.length - 1)
        pc((toks(i), toks(i + 1))) =
          pc.getOrElse((toks(i), toks(i + 1)), 0L) + wc(w)
      if (pc.nonEmpty) {
        val mx = pc.values.max
        val (a, b) = pc.collect { case (p, c) if c == mx => p }.toSeq.min
        v = v.map { case (w, toks) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += toks(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    // words that shrank to nothing (the empty word) drop from round 1 on
    v.filter(_._2.nonEmpty).map { case (w, t) => w -> t }
  }

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("BPE: per-doc token counts and stream md5 replay from a naive " +
    "greedy reference tokenizer") {
    val ref = referenceVocab(12)
    // every trained token array must concatenate back to its word
    ref.foreach { case (w, t) => assert(t.mkString === w, s"vocab broke '$w'") }
    // and at least one real multi-char merge must have been learned
    assert(ref.values.exists(_.exists(_.length >= 3)),
      "no >=3-char subword learned in 12 rounds — merges not applying")
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1).toSeq
        .flatMap(w => ref.getOrElse(w, Vector.empty))
      if (toks.isEmpty) None
      else Some(id -> (toks.length.toLong, md5hex(toks.mkString(" "))))
    }.toMap
    val got = SparkEntry.queries("text_bpe_tokenize")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2))).toMap
    assert(got === want)
  }

  test("BPE packing: shard rollup replays from reference token counts " +
    "under the exclusive-prefix rule") {
    val ref = referenceVocab(12)
    val docs = Tables.table(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val counted = docs.flatMap { case (src, id, text) =>
      val n = text.toLowerCase.split(" ", -1).toSeq
        .map(w => ref.getOrElse(w, Vector.empty).length).sum
      val present = text.toLowerCase.split(" ", -1)
        .exists(w => ref.contains(w))
      if (present) Some((src, id, n.toLong)) else None
    }
    val want = counted.groupBy(_._1).flatMap { case (src, xs) =>
      val sorted = xs.sortBy(_._2)
      var cum = 0L
      sorted.map { case (_, _, n) =>
        val shard = cum / 512; cum += n; (src, shard, n)
      }.groupBy(_._2).map { case (shard, ys) =>
        (src, shard) -> (ys.size.toLong, ys.map(_._3).sum)
      }
    }
    val got = SparkEntry.queries("pack_sequences_bpe")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
  }
}
