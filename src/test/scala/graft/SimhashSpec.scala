package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the dedup_simhash key (ops/Dedup.scala; DuckDB-
  * oracled since r16).
  *
  * Ground truth is exact token-set Jaccard computed independently from the
  * raw text — the SimHash pipeline under test never sees it.
  */
class SimhashSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val pairs =
    SparkEntry.queries("dedup_simhash")(spark, sf).cache()

  private lazy val toks = Tables.table(spark, sf, "documents")
    .select(col("doc_id"),
      array_distinct(split(lower(col("text")), " ")).as("toks"))

  test("deterministic: two runs produce identical pairs") {
    val again = SparkEntry.queries("dedup_simhash")(spark, sf)
    assert(rowSet(pairs.toDF()) === rowSet(again))
  }

  test("identical token sets are always caught at hamming 0") {
    val truth = toks
      .select(col("doc_id").as("doc_a"),
        array_sort(col("toks")).as("t1"))
      .join(toks.select(col("doc_id").as("doc_b"),
        array_sort(col("toks")).as("t2")),
        col("doc_a") < col("doc_b") && col("t1") === col("t2"))
      .select("doc_a", "doc_b")
    val nTruth = truth.count()
    assert(nTruth > 0, "sf0.001 should contain exact-duplicate token sets")
    val caught = truth.join(pairs, Seq("doc_a", "doc_b"), "inner")
    assert(caught.count() === nTruth)
    assert(caught.where(col("hamming") =!= 0).count() === 0,
      "identical sets must fingerprint identically")
  }

  test("reported pairs are genuinely similar (mean exact Jaccard high)") {
    val jac = pairs
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("tb")), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
    val row = jac.agg(avg("jac"), count(lit(1))).head()
    assert(row.getLong(1) > 0, "no pairs reported at all")
    assert(row.getDouble(0) >= 0.7, s"mean true jac=${row.getDouble(0)}")
  }

  test("band-bucket pipeline matches a driver-side reference on the real corpus") {
    // Full independent replay of fingerprint → banding → candidate →
    // hamming filter on the actual documents table (the minhash replay's
    // twin): tokens hashed with java.security MD5 exactly as the r16
    // portable re-key does (first 15 hex chars → 60-bit long), the 60
    // sign-sums, 4×15-bit banding, bucket pair formation, and the
    // hamming<=3 cut all reimplemented driver-side — a second,
    // engine-independent oracle next to the DuckDB one.
    def tokHash(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // Spark split(text, " ") keeps trailing empties: split(_, -1) matches;
    // array_distinct keeps first occurrences (sum of ±1 is order-free).
    val fps: Map[Long, Long] = docs.map { case (id, text) =>
      val th = text.split(" ", -1).distinct.map(tokHash)
      var fp = 0L
      for (i <- 0 until ops.Dedup.SimBits) {
        val bitSum = th.map(h => ((h >> i) & 1L) * 2 - 1).sum
        if (bitSum >= 0) fp |= 1L << i
      }
      id -> fp
    }.toMap
    val bb = ops.Dedup.SimBandBits
    val buckets = new scala.collection.mutable.HashMap[(Int, Long), List[Long]]()
    for ((id, fp) <- fps; b <- 0 until ops.Dedup.SimBands)
      buckets.updateWith((b, (fp >> (bb * b)) & ((1L << bb) - 1)))(
        o => Some(id :: o.getOrElse(Nil)))
    val expected = buckets.values.flatMap { ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet[(Long, Long)].flatMap { case (a, b) =>
      val h = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if (h <= 3) Some((a, b, h)) else None
    }
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected,
      s"banding diverged: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("banding is exhaustive: every hamming<=3 pair is reported") {
    // Pigeonhole: hamming <= 3 over 4 disjoint 15-bit bands forces at least
    // one identical band, so LSH candidate generation must be lossless.
    val fps = ops.Dedup.simhashed(spark, sf)
    val all = fps.select(col("doc_id").as("doc_a"), col("fp").as("fa"))
      .crossJoin(fps.select(col("doc_id").as("doc_b"), col("fp").as("fb")))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .where(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
    assert(rowSet(all) === rowSet(pairs.toDF()))
  }
}
