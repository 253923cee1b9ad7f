package graft.ops

import graft.Tables
import graft.QueryDefs.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection beyond MinHash (SURVEY.md §2.10 / the
  * training-data-pipeline surface): SimHash, exact n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale shapes:
  *  - `dedup_simhash`: the 64-bit fingerprint is computed map-side with
  *    HOF folds; candidate pairs come ONLY from 16-bit band buckets
  *    (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 of 4 bands identical), never an
  *    all-pairs join, so cost tracks the number of genuine collisions.
  *  - `dedup_ngram_jaccard`: inverted-index join on shared trigrams —
  *    pairs are generated per shared gram and hash-aggregated. At 100 TB
  *    add a hot-gram df-cap (drop grams in >1k docs) to bound skew; the
  *    LSH path (`dedup_minhash`) is the constant-cost alternative.
  *  - `embed_neardup`: incoming-batch-vs-corpus shape — the small probe
  *    batch broadcasts and the corpus streams partition-local, O(B×N)
  *    with no corpus self-join.
  */
object Dedup {

  /** 64-bit SimHash over distinct tokens: bit i of the fingerprint is the
    * sign of Σ_tokens (±1 by bit i of xxhash64(token)). All one map-side
    * codegen'd expression tree; fixed seed ⇒ deterministic.
    */
  def simhash(tokens: Column): Column =
    (0 until 64).map { i =>
      val bitSum = aggregate(tokens, lit(0L),
        (acc, t) => acc + (shiftright(xxhash64(t), i).bitwiseAND(lit(1L)) * 2 - 1))
      when(bitSum >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** doc_id + fingerprint for every document. */
  def simhashed(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        simhash(array_distinct(split(lower(col("text")), " "))).as("fp"))

  val queries: Map[String, Q] = Map(

    /** no-oracle: SimHash near-dup pairs (hamming distance ≤ 3) via 4×16-bit
      * band LSH. Property-tested internally (identical docs → distance 0;
      * pairs agree with exact Jaccard near-dups; deterministic). */
    "dedup_simhash" -> ((s, dir) => {
      val fps = simhashed(s, dir)
      val banded = fps.select(col("doc_id"), col("fp"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band_id"),
            shiftright(col("fp"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("band_val"))
        }: _*)).as("band"))
        .select(col("doc_id"), col("fp"),
          col("band.band_id").as("band_id"), col("band.band_val").as("band_val"))
      val l = banded.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"),
        col("band_id"), col("band_val"))
      val r = banded.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"),
        col("band_id").as("band_id_r"), col("band_val").as("band_val_r"))
      l.join(r, col("band_id") === col("band_id_r") &&
          col("band_val") === col("band_val_r") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
        .where(col("hamming") <= 3)
        .distinct()
        .orderBy("doc_a", "doc_b")
    }),

    // Exact word-trigram Jaccard ≥ 0.8 via inverted-index join: candidate
    // pairs only where at least one trigram is shared; |A∩B| = count of
    // shared grams (grams are distinct per doc), |A∪B| = |A|+|B|−|A∩B|.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val grams = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
        .where(size(col("t")) >= 3)
        .select(col("doc_id"),
          array_distinct(transform(sequence(lit(1), size(col("t")) - 2),
            i => concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
            .as("g"))
      val sizes = grams.select(col("doc_id"), size(col("g")).as("sz"))
      val inv = grams.select(col("doc_id"), explode(col("g")).as("gram"))
      val pairs = inv.select(col("doc_id").as("doc_a"), col("gram"))
        .join(inv.select(col("doc_id").as("doc_b"), col("gram").as("gram_b")),
          col("gram") === col("gram_b") && col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      val jac = col("inter") / (col("sz_a") + col("sz_b") - col("inter"))
      pairs
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
        .where(jac >= 0.8)
        .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jac"))
        .orderBy("doc_a", "doc_b")
    }),

    // Dedup an incoming batch (vec_id < 50) against the corpus by embedding
    // cosine ≥ 0.35: rows whose near-duplicate already exists in the corpus.
    "embed_neardup" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val batch = e.where(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("v").as("q"))
      val corpus = e.where(col("vec_id") >= 50)
      corpus.crossJoin(broadcast(batch))
        .withColumn("sim", round(Vector.cosine(col("q"), col("v")), 6))
        .where(col("sim") >= 0.35)
        .select(col("q_id"), col("vec_id"), col("sim"))
        .orderBy("q_id", "vec_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "dedup_ngram_jaccard" ->
      ("WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents), " +
        "grams AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1), " +
        "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM toks WHERE len(t) >= 3), " +
        "sizes AS (SELECT doc_id, len(g) AS sz FROM grams), " +
        "inv AS (SELECT doc_id, unnest(g) AS gram FROM grams), " +
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter " +
        "FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, round(inter / (sa.sz + sb.sz - inter), 6) AS jac " +
        "FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b " +
        "WHERE inter / (sa.sz + sb.sz - inter) >= 0.8 ORDER BY doc_a, doc_b"),
    "embed_neardup" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "b AS (SELECT vec_id AS q_id, v AS q FROM e WHERE vec_id < 50), " +
        "c AS (SELECT vec_id, v FROM e WHERE vec_id >= 50) " +
        "SELECT q_id, vec_id, round(list_cosine_similarity(q, v), 6) AS sim " +
        "FROM b CROSS JOIN c WHERE round(list_cosine_similarity(q, v), 6) >= 0.35 " +
        "ORDER BY q_id, vec_id")
  )
}
