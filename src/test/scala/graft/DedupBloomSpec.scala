package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** The no-oracle dedup_bloom_incremental key's oracle in all but name:
  * the sketch is a pure function of the corpus (order-independent bit-OR
  * inserts, fixed hash seeds), so a plain-Scala rebuild from the raw
  * table must reproduce every probe bit-exactly. Plus the two properties
  * that make a Bloom probe usable for dedup at all: no false negatives
  * (exercised on synthetic guaranteed-positives, since the gate corpus
  * has no cross-boundary dups), and a bounded false-positive rate.
  */
class DedupBloomSpec extends AnyFunSuite {
  import TestSpark._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def docs(sfDir: String): Array[(Long, String)] =
    Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

  for (sfDir <- Seq(sf, "/root/testdata/sf0.01"))
    test(s"bit-exact driver-side sketch replay ($sfDir)") {
      val all = docs(sfDir)
      val mx = all.map(_._1).max
      val corpusKeys =
        all.filter(_._1 * 10 < mx * 9).map(d => md5hex(d._2)).distinct
      // Same construction as the key's staged build: stat.bloomFilter
      // inserts the string column's UTF-8 bytes; putString is that hash.
      val bf = BloomFilter.create(math.max(corpusKeys.length, 1).toLong, 0.01)
      corpusKeys.foreach(bf.putString)
      val expected = all.filter(_._1 * 10 >= mx * 9).sortBy(_._1).map {
        case (id, t) =>
          val k = md5hex(t)
          (id, corpusKeys.contains(k), bf.mightContainString(k))
      }
      // The raw probe relation keeps the bit-level teeth (the declared
      // key projects the contract-oracle columns from it since r19).
      val got = graft.ops.Dedup.bloomProbe(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      assert(got.length === expected.length, "batch row count drifted")
      // miss (exact && !flagged) must be all-false — the no-false-negative
      // contract surfaced as a column by the probe itself.
      assert(got.forall(!_._4), "false negative: exact dup not flagged")
      got.zip(expected).foreach { case ((gi, ge, gf, _), (ei, ee, ef)) =>
        assert(gi === ei && ge === ee, s"exact-dup ground truth drifted at $gi")
        assert(gf === ef, s"bloom flag mismatch at doc $gi (replay says $ef)")
      }
      // The DECLARED key must be exactly the probe's contract projection:
      // same ground truth, and the law column all-TRUE (what the DuckDB
      // oracle pins as a literal).
      val decl = SparkEntry.queries("dedup_bloom_incremental")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
      assert(decl.map(d => (d._1, d._2)).toSeq ===
        got.map(g => (g._1, g._2)).toSeq,
        "declared projection drifted from the probe relation")
      assert(decl.forall(_._3), "no_false_negative law column not all-TRUE")
    }

  test("no false negatives on guaranteed positives; fp rate bounded") {
    // The gate corpus has no cross-boundary dups, so exercise the
    // property with synthetic keys: everything inserted MUST flag.
    val inserted = (0 until 5000).map(i => md5hex(s"in-$i"))
    val bf = BloomFilter.create(inserted.length.toLong, 0.01)
    inserted.foreach(bf.putString)
    assert(inserted.forall(bf.mightContainString),
      "BloomFilter dropped an inserted key — contract broken")
    val fresh = (0 until 5000).map(i => md5hex(s"out-$i"))
    val fp = fresh.count(bf.mightContainString)
    assert(fp < 5000 * 0.05,
      s"false-positive rate $fp/5000 far above the 1% build target")
  }
}
