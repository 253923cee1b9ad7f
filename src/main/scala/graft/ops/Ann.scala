package graft.ops

import graft.Tables
import graft.QueryDefs.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate nearest neighbor over the embedding corpus: IVF (inverted
  * file) with deterministic coarse centroids. `embed_cosine_topk` in
  * [[Vector]] is the exact brute-force baseline; this is the scale path.
  *
  * Scale shape: cell assignment is a map-side argmax against the BROADCAST
  * centroid table (no shuffle, no window — an `array_sort` over C=16
  * (−sim, c_id) structs per row inside codegen). Probes search only their
  * nprobe=4 nearest cells, so the candidate join touches ~nprobe/C of the
  * corpus instead of all of it; with a learned/larger centroid set the
  * same plan gives the classic IVF cost O(N·C/P + |probes|·N·nprobe/C).
  */
object Ann {

  private val NumCentroids = 16
  private val NProbe = 4

  /** Rank a broadcastable (id, vector) centroid list against `v` and keep
    * the `k` nearest as (rank, c_id) — pure map-side expression. */
  private def nearestCells(v: Column, cents: Seq[(Long, Column)], k: Int): Column =
    slice(array_sort(array(cents.map { case (id, cv) =>
      struct((-round(Vector.cosine(v, cv), 6)).as("neg"), lit(id).as("c_id"))
    }: _*)), 1, k)

  val queries: Map[String, Q] = Map(

    // IVF ANN: centroids = the 16 lowest vec_ids ("trained" deterministically
    // so the oracle can replay it); every corpus vector lands in its nearest
    // cell; each probe (vec_id < 10) searches its 4 nearest cells and ranks
    // candidates by rounded cosine with vec_id tie-break.
    "embed_ann_ivf" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      // 16 centroid vectors as literal columns via a collected broadcast —
      // C is tiny and fixed; the corpus-side work stays fully distributed.
      val cents = e.where(col("vec_id") < NumCentroids)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      val centLit: Seq[(Long, Column)] = cents.collect().toSeq
        .sortBy(_.getLong(0))
        .map(r => r.getLong(0) ->
          array(r.getSeq[Double](1).map(lit): _*))
      val cells = e.select(col("vec_id"), col("v"),
        element_at(nearestCells(col("v"), centLit, 1), 1)("c_id").as("cell"))
      val probeCells = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("q"),
          explode(transform(nearestCells(col("v"), centLit, NProbe),
            x => x("c_id"))).as("cell"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
      cells.join(broadcast(probeCells), "cell")
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(Vector.cosine(col("q"), col("v")), 6))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("vec_id"), col("sim"))
        .orderBy("q_id", "rnk")
    }),

    // LSH-bucketed ANN — the other classic scale path: 6 hyperplane
    // normals (deterministically the first 6 corpus vectors, so the
    // oracle can replay them), bucket = 6-bit sign pattern of the
    // hyperplane cosines, probes search ONLY their own bucket (~1/64 of
    // the corpus). Signatures are computed map-side against broadcast
    // literals — no shuffle until the bucket join. Recall vs the exact
    // brute force is asserted in AnnSpec.
    "embed_ann_lsh" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val hps: Seq[(Int, Column)] = e.where(col("vec_id") < NumPlanes)
        .collect().sortBy(_.getLong(0))
        .map(r => r.getLong(0).toInt ->
          array(r.getSeq[Double](1).map(lit): _*))
      val bucket = hps.map { case (i, hv) =>
        when(round(Vector.cosine(col("v"), hv), 6) >= 0, lit(1 << i))
          .otherwise(lit(0))
      }.reduce(_ + _)
      val sig = e.select(col("vec_id"), col("v"), bucket.as("bucket"))
      val probes = sig.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("q"), col("bucket"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
      sig.join(broadcast(probes), "bucket")
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(Vector.cosine(col("q"), col("v")), 6))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("vec_id"), col("sim"))
        .orderBy("q_id", "rnk")
    })
  )

  private val NumPlanes = 6

  val oracles: Map[String, String] = Map(
    "embed_ann_lsh" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "hp AS (SELECT CAST(vec_id AS INT) AS h_id, v AS hv FROM e WHERE vec_id < 6), " +
        "sig AS (SELECT e.vec_id, sum(CASE WHEN round(list_cosine_similarity(e.v, hp.hv), 6) >= 0 " +
        "THEN 1 << h_id ELSE 0 END) AS bucket FROM e CROSS JOIN hp GROUP BY e.vec_id), " +
        "sv AS (SELECT sig.vec_id, sig.bucket, e.v FROM sig JOIN e USING (vec_id)), " +
        "probes AS (SELECT vec_id AS q_id, v AS q, bucket FROM sv WHERE vec_id < 10), " +
        "cand AS (SELECT p.q_id, p.q, s.vec_id, s.v FROM probes p JOIN sv s USING (bucket) " +
        "WHERE s.vec_id <> p.q_id), " +
        "ranked AS (SELECT q_id, vec_id, round(list_cosine_similarity(q, v), 6) AS sim, " +
        "row_number() OVER (PARTITION BY q_id " +
        "ORDER BY round(list_cosine_similarity(q, v), 6) DESC, vec_id) AS rnk FROM cand) " +
        "SELECT q_id, rnk, vec_id, sim FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk"),
    "embed_ann_ivf" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        "cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 16), " +
        "assign AS (SELECT vec_id, v, c_id, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY round(list_cosine_similarity(v, cv), 6) DESC, c_id) AS rc " +
        "FROM e CROSS JOIN cent), " +
        "cells AS (SELECT vec_id, v, c_id AS cell FROM assign WHERE rc = 1), " +
        "probes AS (SELECT vec_id AS q_id, v AS q FROM e WHERE vec_id < 10), " +
        "pcells AS (SELECT q_id, q, c_id AS cell, row_number() OVER (PARTITION BY q_id " +
        "ORDER BY round(list_cosine_similarity(q, cv), 6) DESC, c_id) AS pr " +
        "FROM probes CROSS JOIN cent), " +
        "cand AS (SELECT p.q_id, p.q, c.vec_id, c.v " +
        "FROM (SELECT * FROM pcells WHERE pr <= 4) p JOIN cells c ON p.cell = c.cell " +
        "WHERE c.vec_id <> p.q_id), " +
        "ranked AS (SELECT q_id, vec_id, round(list_cosine_similarity(q, v), 6) AS sim, " +
        "row_number() OVER (PARTITION BY q_id " +
        "ORDER BY round(list_cosine_similarity(q, v), 6) DESC, vec_id) AS rnk FROM cand) " +
        "SELECT q_id, rnk, vec_id, sim FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk")
  )
}
