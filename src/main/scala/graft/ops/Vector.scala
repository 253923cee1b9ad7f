package graft.ops

import graft.{D, Tables}
import graft.QueryDefs.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.10 embedding-similarity operators over `embeddings`
  * (fixed-dim 64 float vectors).
  *
  * All similarity math is built-in higher-order functions (zip_with /
  * transform / aggregate) over array<double> — codegen-friendly, no UDFs.
  * Scale shape: the probe set is always the SMALL side and is broadcast, so
  * cost is O(|probes| × |corpus|) with the corpus streaming partition-local —
  * never a corpus × corpus self-join. Ranking happens per-probe on the
  * 6-dp-rounded similarity with vec_id tie-break (§7.3 determinism).
  */
object Vector {

  /** Σ aᵢ·bᵢ as a left fold in index order (deterministic summation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), _ + _))

  /** Built-in-HOF cosine: same left-to-right summation as [[cosine]];
    * kept as the reference implementation for the parity spec. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity via the native codegen'd Catalyst expression
    * ([[org.apache.spark.sql.graft.CosineSim]]) — bit-identical to
    * [[cosineHof]], one fused loop per row instead of three lambda folds. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.CosineSim(a, b)

  /** embeddings with the float vector widened to array<double> once. */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
              col("embedding").cast("array<double>").as("v"))

  /** One power-iteration aggregate: per-dim exact fixed-point sums of
    * xᵢ·(xᵢ·v) against the broadcast current direction — the body of
    * embed_top_eigen's iterations, factored out so embed_abtt derives
    * the SAME eigenvector (drift between the two would silently change
    * what "the top component" means). sd accumulates as
    * round(x·10⁶)·round((x·v)·10⁶) in DECIMAL(38,0) — exact integers,
    * partition-order-proof, HUGEINT-mirrored in the oracles. */
  private def eigenSums(e: DataFrame, vcur: Seq[Double]): DataFrame = {
    val vlit = array(vcur.map(lit): _*)
    e.select(col("v"),
        round(dot(col("v"), vlit) * 1e6).cast("long").as("q"))
      .select(posexplode(col("v")).as(Seq("pos", "xd")), col("q"))
      .select(col("pos"),
        (round(col("xd") * 1e6).cast("long").cast("decimal(38,0)") *
          col("q")).as("t"))
      .groupBy("pos").agg(sum(col("t")).as("s"))
  }

  /** `rounds` driver-side power iterations from v₀ = e₁ (64 bounded sums
    * collected per round — the IVF-centroid class); each new direction is
    * sd/‖sd‖ with the SAME double conversion and ordered fold both
    * engines run, so the result is bit-identical to the oracle CTEs. */
  private def powerIterate(e: DataFrame, rounds: Int): Seq[Double] = {
    var vcur: Seq[Double] = 1.0 +: Seq.fill(63)(0.0)
    for (_ <- 1 to rounds) {
      val sd = eigenSums(e, vcur).collect()
        .map(r => r.getInt(0) -> r.getDecimal(1).doubleValue).sortBy(_._1)
        .map(_._2).toSeq
      val nrm = math.sqrt(sd.map(x => x * x).foldLeft(0.0)(_ + _))
      vcur = sd.map(_ / nrm)
    }
    vcur
  }

  /** The staged top direction (abtt's u — 64 doubles of index metadata,
    * staged per corpus version so the 3 training passes amortize like
    * every other model artifact; doubles round-trip parquet bit-exactly,
    * so staged ≡ fresh). Shared by embed_abtt and embed_pca2 — the two
    * keys MUST agree on what "the top component" is. */
  private def abttU(s: SparkSession, dir: String): Seq[Double] =
    graft.Staging.materialize(
      s, Tables.path(dir, "embeddings"), "abtt_u3_v1") {
      import s.implicits._
      powerIterate(emb(s, dir), 3).zipWithIndex
        .map { case (v, i) => (i, v) }.toDF("pos", "uval")
    }.collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq

  /** Shard count for a corpus-sized ranking when the session conf leaves
    * the choice to the engine. 8 bounds the local[32] bench's widest
    * candidate sets at ~1/8 corpus per task; a 1000-executor deployment
    * sets `graft.ann.topkShards` to its core count. */
  private val DefaultTopkShards = 8

  /** Top-k rows per probe under a TOTAL order (tie-broken — required for
    * determinism and for the sharded variant's losslessness): appends
    * `rankCol` = row_number and keeps rank ≤ k.
    *
    * Two shapes. Single-window: one partition per q_id — right when a
    * probe's candidate set is bucket-bounded (IVF cell, LSH bucket). The
    * two-stage scale shape: a partial top-k inside each of S hash shards
    * of the candidates, then the final top-k over the ≤ S·k survivors —
    * per-task row counts bounded at ~|cand|/S regardless of corpus size,
    * and the output is bit-identical because a global top-k row is
    * necessarily in its shard's top-k (the order is total).
    *
    * Which shape runs is NOT an opt-in: callers whose candidate side is
    * corpus-sized (the exact scan, kNN, the PQ ADC scan) pass
    * `corpusSized = true` and get the sharded plan BY DEFAULT — the
    * scale-safe shape is what the declared key runs. Bucket-bounded
    * callers keep the single window. `graft.ann.topkShards` overrides
    * both ways: an integer ≥ 2 forces S shards everywhere, `off` forces
    * the single-window plan (the A/B baseline). Anything else fails fast
    * at plan time — 0 would pmod every row into one NULL shard and
    * silently defeat the posture. */
  private[ops] def rankPerProbe(df: DataFrame, order: Seq[Column], k: Int,
                                rankCol: String,
                                corpusSized: Boolean = false): DataFrame = {
    val shards: Option[Int] =
      df.sparkSession.conf.getOption("graft.ann.topkShards") match {
        case Some("off") => None
        case Some(v) =>
          val n =
            try v.toInt
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"graft.ann.topkShards must be 'off' or an integer >= 2, got '$v'")
            }
          require(n >= 2,
            s"graft.ann.topkShards must be >= 2 (got $n); use 'off' for the unsharded plan")
          Some(n)
        case None => if (corpusSized) Some(DefaultTopkShards) else None
      }
    val w = Window.partitionBy("q_id").orderBy(order: _*)
    shards match {
      case None =>
        df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
      case Some(s) =>
        // Improbable internal names: an input relation that already
        // carried a column of the same name would be silently replaced
        // by withColumn — guarded, not just unlikely.
        val (shardCol, prCol) = ("__graft_topk_shard", "__graft_topk_pr")
        require(!df.columns.contains(shardCol) && !df.columns.contains(prCol),
          s"input relation already carries $shardCol/$prCol")
        val pw = Window.partitionBy(col("q_id"), col(shardCol)).orderBy(order: _*)
        df.withColumn(shardCol, pmod(xxhash64(col("vec_id")), lit(s)))
          .withColumn(prCol, row_number().over(pw)).where(col(prCol) <= k)
          .drop(shardCol, prCol)
          .withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
    }
  }

  /** Broadcast `probes` (q_id, q) against the corpus, rank neighbors by
    * rounded cosine, keep top k per probe. The candidate set IS the
    * corpus, so the ranking defaults to the sharded two-stage shape.
    * The ranking input is projected NARROW (ids + label + rounded sim)
    * before any window: the 64-dim vectors are consumed by the map-side
    * cosine and must not ride the ranking shuffles — at corpus scale
    * they are ~50× the width of the rows the windows actually order. */
  private[ops] def topK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame =
    rankPerProbe(
      corpus.crossJoin(broadcast(probes))
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(cosine(col("q"), col("v")), 6))
        .select((corpus.columns.filter(_ != "v").map(col).toIndexedSeq ++
          Seq(col("q_id"), col("sim"))): _*),
      Seq(col("sim").desc, col("vec_id")), k, "rnk", corpusSized = true)

  val queries: Map[String, Q] = Map(
    "embed_cosine_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val probes = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("q"))
      topK(e, probes, 5)
        .select(col("q_id"), col("rnk"), col("vec_id"), col("sim"))
        .orderBy("q_id", "rnk")
    }),

    /** Matryoshka prefix-rerank ANN (round 17) — the adaptive-retrieval
      * pattern MRL-trained embeddings enable: the first D′ dims of the
      * vector are themselves a usable embedding, so stage 1 ranks the
      * corpus by PREFIX-32 cosine (half the arithmetic per candidate —
      * and at scale the prefix is stored as its own column next to the
      * full vector, so the scan reads half the bytes) and only the
      * top-100 survivors pay the exact 64-dim re-rank (bounded:
      * 100 × |probes| rows). The budget is wide because this corpus's
      * RANDOM embeddings are the adversarial case for prefix ranking
      * (the prefix carries only D′/D of the signal and no cluster
      * structure concentrates it — measured recall@5 0.92/0.96/0.78 at
      * the three SFs); MRL-trained embeddings front-load the signal and
      * run the same plan with a tighter budget. Same probe set and
      * output shape as
      * embed_cosine_topk, so VectorSpec pins recall@5 against the exact
      * scan. Stage 1 reuses the sharded two-stage topK ranking
      * machinery; every ordering carries the (rounded sim, vec_id)
      * total tie-break. */
    "embed_ann_matryoshka" -> ((s, dir) => {
      val e = emb(s, dir)
      val probes = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("q"))
      val pref = e.select(col("vec_id"), col("label"),
        slice(col("v"), 1, 32).as("v"))
      val probesPref = probes
        .select(col("q_id"), slice(col("q"), 1, 32).as("q"))
      val cand = topK(pref, probesPref, 100).select("q_id", "vec_id")
      val rer = cand
        .join(e.select(col("vec_id"), col("v")), "vec_id")
        .join(broadcast(probes.select(col("q_id"), col("q").as("qf"))),
          "q_id")
        .withColumn("sim", round(cosine(col("qf"), col("v")), 6))
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id"))
      rer.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("vec_id"), col("sim"))
        .orderBy("q_id", "rnk")
    }),

    /** kNN label prediction (k=10, majority vote, smaller label wins
      * ties) for the 100 held-out ids vec_id < 100 against the rest of the
      * corpus. Every step carries a total tie-break (rounded sim + vec_id
      * for the neighbor rank, votes + label for the winner), so the result
      * is exactly reproducible — oracled since round 3 (was no-oracle;
      * cosine bit-parity was already proven via embed_cosine_topk). */
    "embed_knn_label" -> ((s, dir) => {
      val e = emb(s, dir)
      val probes = e.where(col("vec_id") < 100)
        .select(col("vec_id").as("q_id"), col("v").as("q"))
      val corpus = e.where(col("vec_id") >= 100)
      val votes = topK(corpus, probes, 10)
        .groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
      val best = Window.partitionBy("q_id")
        .orderBy(col("votes").desc, col("label"))
      votes.withColumn("r", row_number().over(best))
        .where(col("r") === 1)
        .select(col("q_id").as("vec_id"), col("label").as("predicted"),
                col("votes"))
        .orderBy("vec_id")
    }),

    // Per-label embedding centroid, emitted as exploded (label, pos,
    // dim_mean) rows — the class-centroid op diversity balancing and
    // clustering seeds need. posexplode keeps the elementwise mean fully
    // distributed: (label, pos) partial aggs combine map-side and only
    // |labels|·dim tiny rows cross the shuffle; no driver-side vector
    // math, no array-wide shuffle rows.
    "embed_centroid_label" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("v")))
        .groupBy("label", "pos")
        .agg(D.r6(avg("col")).as("dim_mean"))
        .select(col("label"), col("pos").cast("long").as("pos"),
          col("dim_mean"))
        .orderBy("label", "pos")),

    // Mean-center + L2-normalize — the embedding-preprocessing step every
    // cosine/ANN pipeline runs first (centering removes the corpus-common
    // component that inflates all cosines; unit norm makes dot = cosine).
    // The per-dim corpus mean is a fixed-point two-phase agg (round(x·1e6)
    // BIGINT sums — the proven bit-exact Lloyd pattern: a double sum's
    // value depends on partition order), reassembled into ONE broadcast
    // 64-element array row; every per-row op after that (center, ordered
    // square-sum fold, divide) is the same IEEE sequence on both engines,
    // so the output doubles are bit-identical unrounded. Scale: the mean
    // is dim-sized state, the normalize pass is map-side over the
    // broadcast — one small shuffle, no row×row joins.
    "embed_normalize" -> ((s, dir) => {
      val e = emb(s, dir)
      val means = e.select(posexplode(col("v")))
        .groupBy("pos")
        .agg(sum(round(col("col") * 1000000, 0).cast("long")).as("sfx"),
          count(lit(1)).as("n"))
        .select(col("pos"), (col("sfx") / (col("n") * lit(1000000L))).as("m"))
        .groupBy()
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(transform(col("pm"), x => x.getField("m")).as("means"))
      e.crossJoin(broadcast(means))
        .select(col("vec_id"),
          zip_with(col("v"), col("means"), (x, m) => x - m).as("c"))
        .select(col("vec_id"), col("c"),
          sqrt(aggregate(col("c"), lit(0.0), (acc, x) => acc + x * x))
            .as("nrm"))
        .select(col("vec_id"),
          posexplode(transform(col("c"), x => x / col("nrm"))))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("col").as("nval"))
        .orderBy("vec_id", "pos")
    }),

    // All-but-the-top post-processing (round 18) — the classic
    // embedding correction (Mu & Viswanath '18): subtract each vector's
    // projection on the DOMINANT principal direction, which in real
    // embedding spaces carries corpus-frequency noise rather than
    // meaning; retrieval/similarity quality improves once it is gone.
    // Composes the family: u = the SAME three exact fixed-point power
    // iterations embed_top_eigen runs (shared powerIterate derivation —
    // the two keys cannot disagree about what "the top component" is),
    // broadcast as 64 literals; each row then emits x − (x·u)·u per
    // dimension with the ordered-fold dot product. Output doubles are
    // UNROUNDED (bitwise-stable: identical fold order on identical
    // inputs — the embed_normalize posture). Scale: the u derivation
    // is 3 bounded-collect corpus passes (index-build class); the
    // correction itself is ONE map-side pass, no shuffle but the
    // declared output order.
    "embed_abtt" -> ((s, dir) => {
      val e = emb(s, dir)
      val ulit = array(abttU(s, dir).map(lit): _*)
      e.select(col("vec_id"), col("v"), dot(col("v"), ulit).as("p"))
        .select(col("vec_id"),
          posexplode(zip_with(col("v"), ulit,
            (x, uu) => x - col("p") * uu)))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("col").as("aval"))
        .orderBy("vec_id", "pos")
    }),

    // Two-component PCA projections (round 19) — the visualization /
    // whitening readout the spectral family stops short of
    // (embed_top_eigen emits u₁'s loadings, embed_abtt removes u₁;
    // neither gives the (pc1, pc2) coordinates every embedding-space
    // map plots). u₁ = the SAME staged abtt direction; u₂ = three
    // power iterations over the DEFLATED rows x − (x·u₁)u₁ (classic
    // Hotelling deflation — u₂ ⊥ u₁ by construction), staged as its own
    // artifact. Every iteration is the proven eigenSums pass: exact
    // fixed-point DECIMAL(38,0) per-dim sums, 64-row driver collects
    // (IVF-centroid-class model state), no vector ever rides a shuffle.
    // Projections are one ordered-fold dot per component, rounded 6dp;
    // the oracle chains a SECOND eigen-iteration CTE block over the
    // abtt residual tree, so u₂ replays bit-exactly.
    "embed_pca2" -> ((s, dir) => {
      val e = emb(s, dir)
      val u1 = abttU(s, dir)
      val u1lit = array(u1.map(lit): _*)
      val u2Df = graft.Staging.materialize(
        s, Tables.path(dir, "embeddings"), "pca2_u2_v1") {
        import s.implicits._
        val deflated = e
          .withColumn("p", dot(col("v"), u1lit))
          .select(col("vec_id"),
            zip_with(col("v"), u1lit, (x, uu) => x - col("p") * uu)
              .as("v"))
        powerIterate(deflated, 3).zipWithIndex
          .map { case (v, i) => (i, v) }.toDF("pos", "uval")
      }
      val u2lit = array(u2Df.collect().sortBy(_.getInt(0))
        .map(_.getDouble(1)).map(lit): _*)
      e.select(col("vec_id"), col("label"),
          round(dot(col("v"), u1lit), 6).as("pc1"),
          round(dot(col("v"), u2lit), 6).as("pc2"))
        .orderBy("vec_id")
    }),

    /** Top principal direction by POWER ITERATION (round 17) — the
      * dimensionality-reduction primitive the embedding family lacked
      * (whitening, drift monitoring, and the classic "remove the top
      * component" post-processing all start from the dominant
      * eigenvector of XᵀX). Three fixed iterations from v₀ = e₁:
      * v ← normalize(Σᵢ xᵢ·(xᵢ·v)). Each iteration is ONE corpus pass:
      * the projection q = round((x·v)·10⁶) is map-side (v broadcast as
      * 64 literals — dim-sized model state), and the per-dim update is
      * an exact fixed-point aggregate — round(x_d·10⁶)·q summed in
      * DECIMAL(38,0) (cast BEFORE the multiply; a long Σ overflows at
      * ~1e12 rows, the t-test envelope) — so the accumulated vector is
      * an exact integer both engines convert to double ONCE. The first
      * two iterations collect 64 bounded sums driver-side (the IVF-
      * centroid pattern) to feed the next round's literals; the LAST
      * stays in the plan — norm via the embed_normalize ordered-fold
      * idiom over a 1-row broadcast, loadings rounded 6dp. The oracle
      * replays all three iterations as chained CTEs (Lloyd precedent).
      * Scale: 3 scans, |dim| shuffle rows each, no vector ever rides a
      * shuffle. */
    "embed_top_eigen" -> ((s, dir) => {
      val e = emb(s, dir)
      def sumsFor(vcur: Seq[Double]) = eigenSums(e, vcur)
      val vcur = powerIterate(e, 2)
      val s3 = sumsFor(vcur)
      val n3 = s3.groupBy()
        .agg(sqrt(aggregate(transform(
          array_sort(collect_list(struct(col("pos"),
            col("s").cast("double").as("sd")))),
          x => x.getField("sd") * x.getField("sd")), lit(0.0), _ + _))
          .as("nrm"))
      s3.crossJoin(broadcast(n3))
        .select(col("pos").cast("long").as("pos"),
          round(col("s").cast("double") / col("nrm"), 6).as("loading"))
        .orderBy("pos")
    }),

    // "Multimodal columns": text + embedding vector joined into one
    // relation, mixed-type analytics per label.
    // Triangle counting + global clustering coefficient over the kNN
    // graph — the manifold-quality metric (a well-clustered embedding
    // space closes its wedges; random vectors don't). The graph is
    // BOUNDED-DEGREE by construction (top-3 per vector → ≤ 3n directed
    // edges), which is what makes the classic orient-and-join triangle
    // algorithm linear-ish: edges oriented a<b, T = E(ab)⋈E(bc)⋈E(ac),
    // each join on a real equi-key. Since r17 the BUILD is candidate-
    // bounded too (the r16 verdict's last quadratic): each vector's
    // top-3 are taken over only the members of its own cell in the
    // shared Lloyd-refined inverted file (Ann.semCells, C = max(16,
    // ⌈√N⌉)) — Σ|cell|² ≈ N^1.5 scored pairs instead of N², the
    // dedup_semantic bound, and the same graph the searches would see
    // at 100 TB where the exact pass is unbuildable. The counting half
    // is unchanged.
    // Fixed-K k-means (round 18) — the first-class CLUSTERING operator
    // the ANN family trains privately (IVF/PQ each run Lloyd rounds as
    // index prep) but never declared: K = 8 centers over the embedding
    // corpus, 3 Lloyd rounds, the workhorse behind topic bucketing /
    // corpus curation / semantic sharding. Fully deterministic so the
    // static SQL oracle can replay it: seeds are the K lowest vec_ids
    // (the ivfCentroids convention), assignment is argmin over
    // (6dp-rounded squared L2, c_id) — the native codegen'd L2Sq fused
    // loop, identical fold order to DuckDB's replay — and each update
    // moves a center to the per-dim FIXED-POINT mean (round(x·10⁶)
    // longs; long addition is associative, so centers are bit-identical
    // under any partitioning). Empty clusters keep their previous
    // center. The declared output is the per-cluster report (size +
    // inertia, the Σd² training loss) of the final assignment; inertia
    // sums the 6dp-rounded distances as exact 10⁻⁶ fixed-point longs in
    // DECIMAL(38,0) (a double sum would wobble with partition order;
    // DuckDB mirrors in HUGEINT). Scale: each round is ONE corpus pass
    // (map-side K×dim argmin into a K-row partial+final aggregate —
    // the model state collected is K rows, the ivfCentroids bound), and
    // the trained centers are STAGED per corpus version like every
    // other index artifact — at 100 TB the 4 training passes amortize
    // into metadata and the serving pass is a single scan.
    // VectorSpec replays the whole trajectory driver-side and pins the
    // inertia-monotonicity law on the update rounds.
    "embed_kmeans" -> ((s, dir) => {
      val K = 8; val Rounds = 3
      val e = emb(s, dir).select(col("vec_id"), col("v"))
      def scoredArr(cs: Seq[(Long, Seq[Double])]): Column =
        array_sort(array(cs.map { case (cid, cv) =>
          struct(round(org.apache.spark.sql.graft.L2Sq(col("v"),
            array(cv.map(lit): _*)), 6).as("d"), lit(cid).as("c"))
        }: _*))
      val cents = graft.Staging.materialize(
        s, Tables.path(dir, "embeddings"), "kmeans8_lloyd3_v1") {
        // one bounded collect (K rows — fixed model state), then
        // Rounds × (corpus pass → K-row collect), all inside the build
        // thunk so a warm staged hit launches exactly one job
        val seedRows: Seq[(Long, Seq[Double])] =
          e.where(col("vec_id") < K).collect()
            .map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq.sortBy(_._1)
        val dim = seedRows.headOption.map(_._2.size).getOrElse(0)
        val fin = (1 to Rounds).foldLeft(seedRows) { (cs, _) =>
          val upd = e.select(element_at(scoredArr(cs), 1)("c").as("cl"),
              transform(col("v"), x => round(x * 1e6).cast("long")).as("q"))
            .groupBy("cl")
            .agg(count(lit(1)).as("n"),
              array((0 until dim).map(i =>
                sum(element_at(col("q"), i + 1))): _*).as("sums"))
            .collect()
            .map { r =>
              r.getLong(0) ->
                r.getSeq[Long](2).map(sv => sv.toDouble / r.getLong(1) / 1e6)
            }.toMap
          cs.map { case (cid, cv) => cid -> upd.getOrElse(cid, cv) }
        }
        import s.implicits._
        fin.toDF("c_id", "cv")
      }
      val centLit: Seq[(Long, Seq[Double])] =
        cents.collect().toSeq.sortBy(_.getLong(0))
          .map(r => r.getLong(0) -> r.getSeq[Double](1))
      e.select(element_at(scoredArr(centLit), 1).as("a"))
        .select(col("a.c").as("cluster"),
          round(col("a.d") * 1e6).cast("long").as("ic"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"),
          sum(col("ic").cast("decimal(38,0)")).as("ics"))
        .select(col("cluster"), col("n_members"),
          round(col("ics").cast("double") / 1e6, 6).as("inertia"))
        .orderBy("cluster")
    }),

    "graph_knn_triangles" -> ((s, dir) => {
      val edges = knnEdges(s, dir)
      val ecnt = edges.agg(count(lit(1)).as("n_edges"))
      val wed = edges
        .select(explode(array(col("a"), col("b"))).as("vv"))
        .groupBy("vv").agg(count(lit(1)).as("d"))
        .agg((sum(col("d") * (col("d") - 1)) / 2).cast("long")
          .as("n_wedges"))
      val ab = edges.select(col("a").as("t_a"), col("b").as("t_b"))
      val bc = edges.select(col("a").as("t_b2"), col("b").as("t_c"))
      val ac = edges.select(col("a").as("t_a2"), col("b").as("t_c2"))
      val tri = ab
        .join(bc, col("t_b") === col("t_b2"))
        .join(ac, col("t_a") === col("t_a2") && col("t_c") === col("t_c2"))
        .agg(count(lit(1)).as("n_triangles"))
      ecnt.crossJoin(broadcast(wed)).crossJoin(broadcast(tri))
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          (lit(3.0) * col("n_triangles") / col("n_wedges"))
            .as("clustering"))
    }),

    // Connected components over the kNN graph as a FIRST-CLASS key
    // (r18 verdict item 5) — the most-used graph primitive in data
    // curation (near-dup family resolution, split closure, "everything
    // reachable from flagged content"). Min-label pointer-jumping CC
    // (the dedup_cluster machinery, O(log n) rounds, per-node state one
    // long) over the SAME staged kNN edge list graph_knn_triangles
    // counts on; labels are themselves staged per corpus version — the
    // production shape where cluster ids live next to the index and
    // update incrementally. Output: (vec_id, component = smallest
    // vec_id reachable) for every vector with ≥1 kNN edge; the oracle
    // replays reachability exactly via DuckDB's recursive CTE (the
    // dedup_cluster precedent), so the fixpoint's round count cannot
    // matter — only the closure it converges to.
    "graph_components" -> ((s, dir) =>
      Pipeline.stagedComponents(
        s, Tables.path(dir, "embeddings"), "knn_cc_v1") {
        knnEdges(s, dir)
          .select(col("a").as("doc_a"), col("b").as("doc_b"))
      }
        .select(col("doc").as("vec_id"), col("lbl").as("component"))
        .orderBy("vec_id")),

    "multimodal_join" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val e = Tables.table(s, dir, "embeddings")
      docs.join(e, col("doc_id") === col("vec_id"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
             D.r2(avg("n_chars")).as("avg_chars"),
             D.r2(avg(size(split(col("text"), " ")))).as("avg_toks"))
        .orderBy("label")
    })
  )

  /** The staged top-3 kNN edge list over the cell-bounded similarity
    * join — a pure function of the corpus, staged per corpus version
    * like every other similarity index (the n·k-row artifact is tiny
    * next to the scoring pass that builds it). Shared by
    * `graph_knn_triangles` (counting joins) and `graph_components`
    * (min-label CC) so the two keys can never disagree on the graph. */
  private[graft] def knnEdges(
      s: SparkSession, dir: String): DataFrame =
    graft.Staging.materialize(
      s, Tables.path(dir, "embeddings"), "knn3_edges_cell_v2") {
      val cells = Ann.semCells(s, dir, Ann.embDouble(s, dir))
      val a = cells.select(col("vec_id").as("q_id"), col("v").as("q"),
        col("cell"))
      val b = cells.select(col("vec_id"), col("v"), col("cell"))
      rankPerProbe(
        a.join(b, "cell")
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("sim", round(cosine(col("q"), col("v")), 6))
          .select(col("q_id"), col("vec_id"), col("sim")),
        Seq(col("sim").desc, col("vec_id")), 3, "rnk")
        .select(
          least(col("q_id"), col("vec_id")).as("a"),
          greatest(col("q_id"), col("vec_id")).as("b")).distinct()
    }

  val oracles: Map[String, String] = Map(
    // Full 3-round Lloyd replay as chained CTEs (the embed_ann_ivf
    // refinement block, iterated): per round assign by (rounded l2²,
    // c_id) row_number, fixed-point per-dim means, empty clusters
    // keep the previous center; the final assignment aggregates the
    // per-cluster report with the identical 10⁻⁶ fixed-point inertia.
    "embed_kmeans" -> {
      val l2 = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(1, 65), i -> " +
        "((v)[i] - (cv)[i]) * ((v)[i] - (cv)[i]))), (x, y) -> x + y)"
      def roundCte(i: Int): String = {
        val prev = s"cent${i - 1}"
        s"a$i AS (SELECT vec_id, v, c_id, row_number() OVER " +
        s"(PARTITION BY vec_id ORDER BY round($l2, 6), c_id) AS rc " +
        s"FROM e CROSS JOIN $prev), " +
        s"m$i AS (SELECT v, c_id FROM a$i WHERE rc = 1), " +
        s"dx$i AS (SELECT c_id, unnest(v) AS x, " +
        s"generate_subscripts(v, 1) AS d FROM m$i), " +
        s"ds$i AS (SELECT c_id, d, " +
        s"sum(CAST(round(x * 1e6) AS BIGINT)) AS sm, count(*) AS n " +
        s"FROM dx$i GROUP BY c_id, d), " +
        s"cm$i AS (SELECT c_id, list(CAST(sm AS DOUBLE) / n / 1e6 " +
        s"ORDER BY d) AS cv FROM ds$i GROUP BY c_id), " +
        s"cent$i AS (SELECT c_id, cv FROM cm$i UNION ALL " +
        s"SELECT c_id, cv FROM $prev " +
        s"WHERE c_id NOT IN (SELECT c_id FROM cm$i)), "
      }
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
      "FROM embeddings), " +
      "cent0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8), " +
      (1 to 3).map(roundCte).mkString +
      "fa AS (SELECT vec_id, c_id, dd, row_number() OVER " +
      "(PARTITION BY vec_id ORDER BY dd, c_id) AS rc FROM " +
      s"(SELECT vec_id, c_id, round($l2, 6) AS dd " +
      "FROM e CROSS JOIN cent3)), " +
      "fm AS (SELECT c_id, CAST(round(dd * 1e6) AS BIGINT) AS ic " +
      "FROM fa WHERE rc = 1) " +
      "SELECT c_id AS cluster, count(*) AS n_members, " +
      "round(CAST(CAST(sum(ic) AS HUGEINT) AS DOUBLE) / 1e6, 6) " +
      "AS inertia FROM fm GROUP BY 1 ORDER BY 1"
    },
    "embed_centroid_label" ->
      // unnest + generate_subscripts in one SELECT zip positionally;
      // - 1 matches posexplode's 0-based pos (cast long on both sides).
      ("WITH ex AS (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x, " +
       "generate_subscripts(CAST(embedding AS DOUBLE[]), 1) - 1 AS pos FROM embeddings) " +
       "SELECT label, CAST(pos AS BIGINT) AS pos, round(avg(x), 6) AS dim_mean " +
       "FROM ex GROUP BY label, pos ORDER BY label, pos"),
    "embed_normalize" ->
      // fixed-point mean (round(x·1e6) BIGINT sums), then the centered
      // square-sum replays Spark's aggregate() fold as a LEFT list_reduce
      // over pos-ORDERED squares (a SQL sum() would re-associate the
      // additions); generate_subscripts is 1-based → pos - 1.
      ("WITH ex AS (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x, " +
       "generate_subscripts(embedding, 1) AS pos FROM embeddings), " +
       "m AS (SELECT pos, CAST(sum(CAST(round(x*1000000) AS BIGINT)) AS DOUBLE) " +
       "/ (count(*) * 1000000) AS m FROM ex GROUP BY pos), " +
       "c AS (SELECT vec_id, pos, x - m AS cx FROM ex JOIN m USING (pos)), " +
       "n AS (SELECT vec_id, sqrt(list_reduce(" +
       "list_prepend(0.0, list(cx*cx ORDER BY pos)), (a,b) -> a + b)) AS nrm " +
       "FROM c GROUP BY vec_id) " +
       "SELECT c.vec_id, CAST(c.pos - 1 AS BIGINT) AS pos, c.cx / n.nrm AS nval " +
       "FROM c JOIN n ON c.vec_id = n.vec_id ORDER BY c.vec_id, pos"),
    "embed_cosine_topk" ->
      ("WITH p AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q " +
       "FROM embeddings WHERE vec_id < 10), " +
       "sims AS (SELECT p.q_id, e.vec_id, " +
       "round(list_cosine_similarity(p.q, CAST(e.embedding AS DOUBLE[])), 6) AS sim " +
       "FROM p CROSS JOIN embeddings e WHERE e.vec_id <> p.q_id), " +
       "r AS (SELECT q_id, vec_id, sim, " +
       "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk " +
       "FROM sims) " +
       "SELECT q_id, rnk, vec_id, sim FROM r WHERE rnk <= 5 ORDER BY q_id, rnk"),
    // DuckDB's l[1:32] is 1-based inclusive-first-32 ≡ Spark slice(v,1,32)
    "embed_ann_matryoshka" ->
      ("WITH p AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q " +
       "FROM embeddings WHERE vec_id < 10), " +
       "c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
       "FROM embeddings), " +
       "sims AS (SELECT p.q_id, c.vec_id, " +
       "round(list_cosine_similarity(p.q[1:32], c.v[1:32]), 6) AS sim " +
       "FROM p CROSS JOIN c WHERE c.vec_id <> p.q_id), " +
       "cand AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id, " +
       "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) " +
       "AS r FROM sims) WHERE r <= 100), " +
       "rr AS (SELECT cand.q_id, cand.vec_id, " +
       "round(list_cosine_similarity(p.q, c.v), 6) AS sim " +
       "FROM cand JOIN p USING (q_id) JOIN c USING (vec_id)) " +
       "SELECT q_id, rnk, vec_id, sim FROM (SELECT q_id, vec_id, sim, " +
       "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) " +
       "AS rnk FROM rr) WHERE rnk <= 5 ORDER BY q_id, rnk"),
    "embed_knn_label" ->
      ("WITH p AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q " +
       "FROM embeddings WHERE vec_id < 100), " +
       "c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v " +
       "FROM embeddings WHERE vec_id >= 100), " +
       "sims AS (SELECT p.q_id, c.vec_id, c.label, " +
       "round(list_cosine_similarity(p.q, c.v), 6) AS sim FROM p CROSS JOIN c), " +
       "r AS (SELECT q_id, label, row_number() OVER (PARTITION BY q_id " +
       "ORDER BY sim DESC, vec_id) AS rnk FROM sims), " +
       "votes AS (SELECT q_id, label, count(*) AS votes FROM r WHERE rnk <= 10 " +
       "GROUP BY 1, 2), " +
       "best AS (SELECT q_id, label, votes, row_number() OVER (PARTITION BY q_id " +
       "ORDER BY votes DESC, label) AS rb FROM votes) " +
       "SELECT q_id AS vec_id, label AS predicted, votes FROM best WHERE rb = 1 " +
       "ORDER BY vec_id"),
    // Cell-bounded build replay (r17): the shared derived-C inverted
    // file (Ann.semCellsCte, ends with cells(vec_id, v, cell)), top-3
    // per vector over same-cell candidates only — the identical rule
    // the Spark side stages; the counting tail is unchanged.
    "graph_knn_triangles" ->
      (Ann.semCellsCte +
       "sims AS (SELECT p.vec_id AS q_id, c.vec_id AS nid, " +
       "round(list_cosine_similarity(p.v, c.v), 6) AS sim " +
       "FROM cells p JOIN cells c ON p.cell = c.cell " +
       "AND p.vec_id <> c.vec_id), " +
       "r AS (SELECT q_id, nid, row_number() OVER (PARTITION BY q_id " +
       "ORDER BY sim DESC, nid) AS rnk FROM sims), " +
       "ed AS (SELECT DISTINCT least(q_id, nid) AS a, " +
       "greatest(q_id, nid) AS b FROM r WHERE rnk <= 3), " +
       "dg AS (SELECT vv, count(*) AS d FROM " +
       "(SELECT a AS vv FROM ed UNION ALL SELECT b FROM ed) GROUP BY vv), " +
       "w AS (SELECT CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS n_wedges " +
       "FROM dg), " +
       "t AS (SELECT count(*) AS n_triangles FROM ed ab " +
       "JOIN ed bc ON ab.b = bc.a " +
       "JOIN ed ac ON ac.a = ab.a AND ac.b = bc.b), " +
       "e2 AS (SELECT count(*) AS n_edges FROM ed) " +
       "SELECT e2.n_edges, w.n_wedges, t.n_triangles, " +
       "3.0 * t.n_triangles / w.n_wedges AS clustering FROM e2, w, t"),
    // Same cell-bounded kNN edge replay as graph_knn_triangles, then
    // EXACT reachability closure via the recursive CTE (the
    // dedup_cluster precedent): component = min reachable id, which is
    // what min-label propagation converges to — the oracle is round-
    // count-free by construction.
    "graph_components" ->
      (Ann.semCellsCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
       "sims AS (SELECT p.vec_id AS q_id, c.vec_id AS nid, " +
       "round(list_cosine_similarity(p.v, c.v), 6) AS sim " +
       "FROM cells p JOIN cells c ON p.cell = c.cell " +
       "AND p.vec_id <> c.vec_id), " +
       "rk AS (SELECT q_id, nid, row_number() OVER (PARTITION BY q_id " +
       "ORDER BY sim DESC, nid) AS rnk FROM sims), " +
       "ed AS (SELECT DISTINCT least(q_id, nid) AS a, " +
       "greatest(q_id, nid) AS b FROM rk WHERE rnk <= 3), " +
       "edges AS (SELECT a AS s, b AS d FROM ed " +
       "UNION ALL SELECT b, a FROM ed), " +
       "reach(doc, r) AS (SELECT s, s FROM edges " +
       "UNION SELECT reach.doc, e.d FROM reach JOIN edges e ON e.s = reach.r) " +
       "SELECT doc AS vec_id, CAST(min(r) AS BIGINT) AS component " +
       "FROM reach GROUP BY doc ORDER BY doc"),
    "multimodal_join" ->
      ("SELECT label, count(*) AS n, round(avg(n_chars), 2) AS avg_chars, " +
       "round(avg(len(string_split(text, ' '))), 2) AS avg_toks " +
       "FROM documents JOIN embeddings ON doc_id = vec_id " +
       "GROUP BY label ORDER BY label"),
    // Power-iteration replay: three chained (project → fixed-point
    // per-dim sums → ordered-fold norm → normalize) CTE blocks from
    // v0 = e1, HUGEINT mirroring decimal(38,0), the identical left
    // folds for dot and norm. s-CTEs MATERIALIZED (each is referenced
    // twice and would otherwise inline its whole upstream chain).
    "embed_top_eigen" ->
      (EigenPrefixCte +
        "SELECT CAST(d - 1 AS BIGINT) AS pos, " +
        "round(CAST(sd AS DOUBLE) / n.nrm, 6) AS loading " +
        "FROM s3 CROSS JOIN n3 n ORDER BY pos"),
    // u1 = the shared eigen chain; deflated rows = the abtt residual
    // tree rebuilt into per-vec lists; u2 = a SECOND eigen chain (tag
    // "b") over them; projections = the same ordered-fold dot, 6dp.
    "embed_pca2" ->
      (EigenPrefixCte.dropRight(1) + ", " +
        s"pp AS (SELECT vec_id, v, list_reduce(list_prepend($EigenFold0, " +
        "list_transform(range(1, 65), i -> v[i] * u.vv[i])), " +
        "(x, y) -> x + y) AS p FROM e CROSS JOIN vv4 u), " +
        "a AS (SELECT vec_id, list(x - p * uv ORDER BY d) AS v FROM " +
        "(SELECT vec_id, p, unnest(v) AS x, " +
        "generate_subscripts(v, 1) AS d, unnest(u2.vv) AS uv " +
        "FROM pp CROSS JOIN vv4 u2) GROUP BY vec_id), " +
        "vvb1 AS (SELECT list_transform(range(1, 65), i -> " +
        "CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE) " +
        "ELSE CAST(0.0 AS DOUBLE) END) AS vv), " +
        (1 to 3).map(eigenIterCteFrom("a", "b", _)).mkString(", ") + " " +
        s"SELECT e.vec_id, emb.label, " +
        s"round(list_reduce(list_prepend($EigenFold0, " +
        "list_transform(range(1, 65), i -> e.v[i] * u1.vv[i])), " +
        "(x, y) -> x + y), 6) AS pc1, " +
        s"round(list_reduce(list_prepend($EigenFold0, " +
        "list_transform(range(1, 65), i -> e.v[i] * ub.vv[i])), " +
        "(x, y) -> x + y), 6) AS pc2 " +
        "FROM e CROSS JOIN vv4 u1 CROSS JOIN vvb4 ub " +
        "JOIN embeddings emb ON emb.vec_id = e.vec_id " +
        "ORDER BY e.vec_id"),
    // same three-iteration u, per-row ordered-fold projection, the
    // identical x − p·u tree per dimension — unrounded doubles
    "embed_abtt" ->
      (EigenPrefixCte.dropRight(1) + ", " +
        s"p AS (SELECT vec_id, v, list_reduce(list_prepend($EigenFold0, " +
        "list_transform(range(1, 65), i -> v[i] * u.vv[i])), " +
        "(x, y) -> x + y) AS p FROM e CROSS JOIN vv4 u) " +
        "SELECT vec_id, CAST(d - 1 AS BIGINT) AS pos, " +
        "x - p * uv AS aval FROM " +
        "(SELECT vec_id, p, unnest(v) AS x, " +
        "generate_subscripts(v, 1) AS d, unnest(u2.vv) AS uv " +
        "FROM p CROSS JOIN vv4 u2) " +
        "ORDER BY vec_id, pos")
  )

  // defs / lazy val: the oracles map above references these at object
  // init, and a forward-referenced plain val would still be null there
  private def EigenFold0 = "CAST(0.0 AS DOUBLE)"

  /** One eigen power-iteration round as a CTE chunk (vv{tag}{r} →
    * vv{tag}{r+1}) over source relation `src(vec_id, v)`, verbatim from
    * the proven embed_top_eigen replay — shared with embed_abtt (same
    * direction) and embed_pca2 (a SECOND chain, tag "b", over the
    * deflated rows). */
  private def eigenIterCteFrom(src: String, tag: String, r: Int): String =
    s"q$tag$r AS (SELECT vec_id, v, CAST(round(list_reduce(list_prepend(" +
      s"$EigenFold0, list_transform(range(1, 65), i -> v[i] * w.vv[i])), " +
      s"(x, y) -> x + y) * 1e6) AS BIGINT) AS q " +
      s"FROM $src CROSS JOIN vv$tag$r w), " +
      s"s$tag$r AS MATERIALIZED (SELECT d, " +
      s"sum(CAST(CAST(round(x * 1e6) AS BIGINT) AS HUGEINT) * q) AS sd " +
      s"FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS d, q " +
      s"FROM q$tag$r) GROUP BY d), " +
      s"n$tag$r AS (SELECT sqrt(list_reduce(list_prepend($EigenFold0, " +
      s"list_transform(list(CAST(sd AS DOUBLE) ORDER BY d), " +
      s"t -> t * t)), (x, y) -> x + y)) AS nrm FROM s$tag$r), " +
      s"vv$tag${r + 1} AS (SELECT list(CAST(s.sd AS DOUBLE) / n.nrm " +
      s"ORDER BY s.d) AS vv FROM s$tag$r s CROSS JOIN n$tag$r n)"

  private def eigenIterCte(r: Int): String = eigenIterCteFrom("e", "", r)

  /** `WITH e, vv1, 3 iterations ` — the shared eigen replay prefix
    * (trailing space; ends ready for a SELECT, vv4 = the unit top
    * direction). */
  private lazy val EigenPrefixCte: String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
      "FROM embeddings), " +
      "vv1 AS (SELECT list_transform(range(1, 65), i -> " +
      "CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE) " +
      "ELSE CAST(0.0 AS DOUBLE) END) AS vv), " +
      (1 to 3).map(eigenIterCte).mkString(", ") + " "
}
