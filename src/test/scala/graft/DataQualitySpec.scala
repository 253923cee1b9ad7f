package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 operator specs beyond what their DuckDB oracles can see:
  *
  *  - `text_pii_redact`'s oracle only ever exercises the deterministic
  *    provenance footer (the synthetic corpus carries no body PII), so
  *    the planted-PII legs here are the only place the patterns meet
  *    adversarial mid-sentence PII, boundary shapes, and clean text.
  *  - `dq_drift_psi`'s oracle replays the arithmetic but cannot state
  *    the MATHEMATICAL invariants (every PSI term ≥ 0, PSI additivity,
  *    threshold wiring) — a sign slip in the contrib formula would
  *    hash-match its own replay and still be wrong as a PSI.
  *  - `win_interpolate_linear`'s oracle shares the spine/mask text; the
  *    replay here recomputes each gap's line FROM THE OUTPUT'S OWN
  *    observed rows, so a frame-boundary bug shared by both engines
  *    (e.g. a neighbor frame including the current row) would still be
  *    caught.
  *  - `dq_freshness`: watermark law (some type has lag 0) + range sanity.
  */
class DataQualitySpec extends AnyFunSuite {
  import TestSpark._

  test("win_changepoint laws: silent on a constant series, alarms " +
      "within 9 hours of an injected level shift") {
    val sess = spark
    import sess.implicits._
    // 240 dense hours from epoch hour 0; constant 100/h.
    def series(tag: String, f: Int => Long) =
      (0 until 240).map(h => (tag, new java.sql.Timestamp(h * 3600_000L), f(h)))
    val flat = series("flat", _ => 100L)
    // +50% level shift at hour 120: Z_up = 192·150 − 9·2400 = 7200/h,
    // Λ = 24·2400 = 57600 → first crossing 9 hours in (9·7200 > Λ,
    // 8·7200 = Λ not >), then the reset restarts the count.
    val shift = series("shift", h => if (h < 120) 100L else 150L)
    val out = graft.ops.Windows.changepointDetect(
      (flat ++ shift).toDF("event_type", "hw", "n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(out("flat")._1 === 0L && out("flat")._2 === "",
      "alarm raised on a constant series")
    val (na, alarms) = out("shift")
    assert(na >= 1L, "no alarm after a 50% level shift")
    val first = alarms.split('|').head
    assert(first.endsWith(":up"), s"first alarm not 'up': $first")
    val firstTs = first.stripSuffix(":up").toLong
    assert(firstTs === (120 + 8) * 3600L,
      s"detection delay drifted: alarm at $firstTs, shift at ${120 * 3600}")
    // Alarms only ever AFTER the shift on this series.
    alarms.split('|').foreach { a =>
      assert(a.split(':')(0).toLong >= 120 * 3600L, s"pre-shift alarm $a")
    }
  }

  test("PII: planted body PII is counted and redacted; clean text untouched") {
    val sess = spark
    import sess.implicits._
    import graft.ops.PiiRedact._
    val planted = Seq(
      // id, text, expected (email, phone, ip) counts
      (1L, "reach alice.smith@corp.example.org for the report", 1L, 0L, 0L),
      (2L, "call +1-555-0199 or +44-202-7946 today", 0L, 2L, 0L),
      (3L, "gateway 192.168.0.1 then 10.0.0.254 failed", 0L, 0L, 2L),
      (4L, "mixed: bob_j+tag@mail.co at +1-555-0000 via 172.16.4.20", 1L, 1L, 1L),
      (5L, "no pii here, just words and numbers 12345 6.7", 0L, 0L, 0L))
      .toDF("id", "text", "e", "p", "i")
    val scored = planted.select(col("id"), col("e"), col("p"), col("i"),
      nMatches(col("text"), emailPat).as("ne"),
      nMatches(col("text"), phonePat).as("np"),
      nMatches(col("text"), ipPat).as("ni"),
      redact(col("text")).as("red"),
      col("text"))
    scored.collect().foreach { r =>
      assert(r.getAs[Long]("ne") === r.getAs[Long]("e"),
        s"email count on '${r.getAs[String]("text")}'")
      assert(r.getAs[Long]("np") === r.getAs[Long]("p"),
        s"phone count on '${r.getAs[String]("text")}'")
      assert(r.getAs[Long]("ni") === r.getAs[Long]("i"),
        s"ip count on '${r.getAs[String]("text")}'")
    }
    // redaction removes every match (zero residuals), replaces with the
    // class tokens, and leaves PII-free text byte-identical
    val resid = scored.select(
      (nMatches(col("red"), emailPat) + nMatches(col("red"), phonePat) +
        nMatches(col("red"), ipPat)).as("resid"),
      col("red"), col("text"), col("id"))
    val residRows = resid.collect()
    residRows.foreach { r =>
      assert(r.getAs[Long]("resid") === 0L,
        s"residual PII in '${r.getAs[String]("red")}'")
    }
    val m = residRows.map(r => r.getAs[Long]("id") ->
      r.getAs[String]("red")).toMap
    assert(m(1L) === "reach <EMAIL> for the report")
    assert(m(3L) === "gateway <IP> then <IP> failed")
    assert(m(4L) === "mixed: <EMAIL> at <PHONE> via <IP>")
    assert(m(5L) === "no pii here, just words and numbers 12345 6.7")
  }

  test("PII: chain order keeps one class's token out of the next pattern") {
    val sess = spark
    import sess.implicits._
    import graft.ops.PiiRedact._
    // an email whose local part looks phone-ish and a host that looks
    // IP-ish: the email pattern must consume the WHOLE thing first
    val df = Seq("ping a1-555-1234b@10.9.8.7a.example.com now")
      .toDF("text").select(redact(col("text")).as("red"))
    assert(df.collect().head.getString(0) === "ping <EMAIL> now")
  }

  test("PSI: every term non-negative, PSI is their sum, threshold wired") {
    val out = SparkEntry.queries("dq_drift_psi")(spark, sf).collect()
    val byType = out.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rows) =>
      assert(rows.map(_.getAs[Int]("bin")).sorted.toSeq === (0 to 9),
        s"$t must emit exactly bins 0..9")
      rows.foreach { r =>
        // (p−q)·ln(p/q) ≥ 0 for every p,q > 0 — a sign slip in either
        // factor flips individual terms negative
        assert(r.getAs[Double]("contrib") >= -1e-9,
          s"$t bin ${r.getAs[Int]("bin")} has a negative PSI term")
      }
      val psi = rows.head.getAs[Double]("psi")
      val sum = rows.map(_.getAs[Double]("contrib")).sum
      assert(math.abs(psi - sum) <= 1e-5 * math.max(1.0, math.abs(sum)),
        s"$t: psi $psi is not the sum of its terms $sum")
      rows.foreach(r =>
        assert(r.getAs[Boolean]("drifted") === (psi >= 0.1)))
    }
  }

  test("PSI: smoothed proportions rebuild from the emitted counts") {
    val out = SparkEntry.queries("dq_drift_psi")(spark, sf).collect()
    out.groupBy(_.getAs[String]("event_type")).foreach { case (t, rows) =>
      val tRef = rows.map(_.getAs[Long]("n_ref")).sum
      val tCur = rows.map(_.getAs[Long]("n_cur")).sum
      rows.foreach { r =>
        val pr = (r.getAs[Long]("n_ref") + 1.0) / (tRef + 10)
        val pc = (r.getAs[Long]("n_cur") + 1.0) / (tCur + 10)
        assert(math.abs(r.getAs[Double]("p_ref") - pr) < 5e-7, s"$t p_ref")
        assert(math.abs(r.getAs[Double]("p_cur") - pc) < 5e-7, s"$t p_cur")
      }
    }
  }

  test("interpolation: every gap lies on the line through its output neighbors") {
    val out = SparkEntry.queries("win_interpolate_linear")(spark, sf)
      .collect()
    var checked = 0
    out.groupBy(_.getAs[String]("event_type")).foreach { case (t, rows) =>
      val sorted = rows.sortBy(_.getAs[java.sql.Timestamp]("hr").getTime)
      val obs = sorted.zipWithIndex.filter(_._1.getAs[String]("src") == "obs")
      sorted.zipWithIndex.foreach { case (r, i) =>
        r.getAs[String]("src") match {
          case "obs" =>
            assert(r.getAs[Double]("v_interp") ===
              r.getAs[Long]("v_obs").toDouble, s"$t obs row must copy v_obs")
          case "interp" =>
            val (p, pi) = obs.takeWhile(_._2 < i).last
            val (n, ni) = obs.dropWhile(_._2 <= i).head
            val pv = p.getAs[Long]("v_obs").toDouble
            val nv = n.getAs[Long]("v_obs").toDouble
            val want = pv + (nv - pv) * (i - pi).toDouble / (ni - pi)
            assert(math.abs(r.getAs[Double]("v_interp") - want) <= 1e-4,
              s"$t hour ${r.getAs[java.sql.Timestamp]("hr")} off the line")
            checked += 1
          case "edge" =>
            val nearest =
              if (obs.forall(_._2 > i)) obs.head._1 else obs.last._1
            assert(r.getAs[Double]("v_interp") ===
              nearest.getAs[Long]("v_obs").toDouble, s"$t edge must hold")
        }
      }
    }
    assert(checked >= 100, s"only $checked interior gaps exercised")
  }

  test("mann-whitney: U and z replay from a naive driver-side ranking") {
    // The key computes ranks from the VALUE HISTOGRAM (the scale form);
    // this leg recomputes them the textbook way — sort every row, assign
    // tie-averaged ranks — and demands the same U and z. A histogram/
    // cumulative-count bug that the oracle (same formulation) would
    // reproduce cannot survive this independent derivation.
    val out = SparkEntry.queries("agg_mann_whitney")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n0"), r.getAs[Long]("n1"),
          r.getAs[Double]("u"), r.getAs[Double]("z"))).toMap
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), (col("user_id") % 2 === 0).as("a"),
        round(col("value") * 100, 0).cast("long").as("c"))
      // the key's shared abEvents derivation excludes NULL metrics;
      // without this filter Row.getLong would unbox NULL to a phantom
      // c=0 row and the replay would diverge for the wrong reason
      .where(col("c").isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (t, evs) =>
      val sorted = evs.map(e => (e._3, e._2)).sortBy(_._1)
      // tie-averaged ranks, assigned per run of equal values
      val ranks = new Array[Double](sorted.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
        val avg = (i + 1 + j).toDouble / 2 // mean of ranks i+1 .. j
        (i until j).foreach(k => ranks(k) = avg)
        i = j
      }
      val n0 = sorted.count(_._2)
      val n1 = sorted.length - n0
      val r0 = sorted.zip(ranks).collect { case ((_, true), rk) => rk }.sum
      val u0 = r0 - n0.toDouble * (n0 + 1) / 2
      val (gn0, gn1, gu, gz) = out(t)
      assert(gn0 === n0.toLong && gn1 === n1.toLong, s"$t arm sizes")
      assert(math.abs(gu - u0) < 1e-6, s"$t U: key $gu vs naive $u0")
      val ties = sorted.map(_._1).groupBy(identity).values
        .map(g => math.pow(g.size, 3) - g.size).sum
      val n = sorted.length
      val m = n0.toDouble * n1
      val vr = m / 12 * ((n + 1) - ties / (n.toDouble * (n - 1)))
      val z = (u0 - m / 2) / math.sqrt(vr)
      assert(math.abs(gz - z) < 1e-5, s"$t z: key $gz vs naive $z")
    }
  }

  test("chi-square: statistic replays from the emitted 2x2 table via " +
    "textbook expected-count arithmetic") {
    // The key computes N(ad-bc)^2 / (margin product); this leg recomputes
    // chi^2 the TEXTBOOK way — sum over cells of (obs-exp)^2/exp — an
    // algebraically equal but computationally different formulation, so a
    // wrong determinant or margin cannot survive (tolerance covers the
    // different double association).
    val out = SparkEntry.queries("agg_chi_square")(spark, sf).collect()
    assert(out.nonEmpty)
    var checked = 0
    out.foreach { r =>
      val (a, b, c, d) = (r.getAs[Long]("ca").toDouble,
        r.getAs[Long]("cb").toDouble, r.getAs[Long]("cc").toDouble,
        r.getAs[Long]("cd").toDouble)
      val n = a + b + c + d
      val margins = Seq(a + b, c + d, a + c, b + d)
      if (margins.forall(_ > 0)) {
        val exp = Seq((a + b) * (a + c) / n, (a + b) * (b + d) / n,
          (c + d) * (a + c) / n, (c + d) * (b + d) / n)
        val obs = Seq(a, b, c, d)
        val chi = obs.zip(exp).map { case (o, e) => (o - e) * (o - e) / e }.sum
        val got = r.getAs[Double]("chi2")
        assert(math.abs(got - chi) < 1e-4,
          s"${r.getString(0)}: key $got vs textbook $chi")
        assert(r.getAs[Boolean]("significant") === (got >= 3.841))
        checked += 1
      } else assert(r.isNullAt(r.fieldIndex("chi2")),
        "degenerate table must NULL-gate chi2")
    }
    assert(checked > 0, "no non-degenerate group exercised")
  }

  test("bootstrap CI: means and order statistics replay from an " +
    "independently derived Poisson CDF") {
    // The key's thresholds are hex literals baked from floor(P(X≤k)·2^32);
    // this leg re-derives the Poisson(1) CDF from math.exp here, rebuilds
    // the weights with java MessageDigest md5, and accumulates resample
    // means in plain Longs — a wrong baked threshold, a draw-string
    // mismatch, or a CI index slip cannot survive both formulations.
    val thr = {
      var c = 0.0; var term = math.exp(-1.0)
      (0 until 9).map { k =>
        c += term; term /= (k + 1); f"${math.floor(c * 4294967296.0).toLong}%08x"
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val out = SparkEntry.queries("agg_bootstrap_ci")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.nonEmpty)
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .where(col("c").isNotNull).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.groupBy(_._1).foreach { case (t, evs) =>
      val means = (1 to 16).flatMap { b =>
        var sw = 0L; var swc = 0L
        evs.foreach { case (_, id, c) =>
          val u8 = md5hex(s"$id:$b").take(8)
          val w = thr.indexWhere(u8 < _) match { case -1 => 9; case k => k }
          sw += w; swc += w * c
        }
        if (sw > 0) Some(swc.toDouble / sw.toDouble / 100) else None
      }.sorted
      val r = out(t)
      val n = evs.length
      assert(r.getAs[Long]("n") === n.toLong, s"$t n")
      val mean = r6(evs.map(_._3).sum.toDouble / n.toDouble / 100)
      assert(math.abs(r.getAs[Double]("mean") - mean) < 1e-9, s"$t mean")
      if (means.length == 16) {
        assert(math.abs(r.getAs[Double]("ci_lo") - r6(means(1))) < 1e-9,
          s"$t ci_lo")
        assert(math.abs(r.getAs[Double]("ci_hi") - r6(means(14))) < 1e-9,
          s"$t ci_hi")
        assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("mean") &&
          r.getAs[Double]("mean") <= r.getAs[Double]("ci_hi"),
          s"$t CI must bracket the point estimate")
      } else {
        assert(r.isNullAt(r.fieldIndex("ci_lo")), s"$t must NULL-gate CI")
        assert(r.isNullAt(r.fieldIndex("ci_hi")), s"$t must NULL-gate CI")
      }
    }
  }

  test("MAD outliers: robust z replays from a textbook median/MAD pass") {
    // The key computes 1.349·(2n−med2)/m2d in doubled-integer space; this
    // leg recomputes 0.6745·(n−med)/MAD the textbook way from a plain
    // sorted collect — algebraically equal, computationally different.
    val out = SparkEntry.queries("dq_outlier_mad")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("day")) -> r).toMap
    assert(out.nonEmpty)
    def median(xs: Seq[Long]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2).toDouble else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).cast("timestamp").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("day"), r.getAs[Long]("n")))
    daily.groupBy(_._1).foreach { case (t, ds) =>
      val med = median(ds.map(_._3).toSeq)
      val mad = median(ds.map(d => math.abs(2 * d._3 - (2 * med).toLong))
        .toSeq) / 2.0
      ds.foreach { case (_, day, n) =>
        val r = out((t, day))
        assert(r.getAs[Long]("n") === n)
        if (mad == 0.0) {
          assert(r.isNullAt(r.fieldIndex("rz")), s"$t $day zero-MAD gate")
          assert(r.isNullAt(r.fieldIndex("is_outlier")))
        } else {
          val z = 0.6745 * (n - med) / mad
          val got = r.getAs[Double]("rz")
          assert(math.abs(got - z) < 1e-5, s"$t $day: key $got vs naive $z")
          assert(r.getAs[Boolean]("is_outlier") === (math.abs(got) > 3.5))
        }
      }
    }
  }

  test("referential audit: child cardinalities match the raw tables and " +
    "one edge recounts via an independent anti-join") {
    val out = SparkEntry.queries("dq_referential_audit")(spark, sf).collect()
      .map(r => r.getAs[String]("fk_edge") -> r).toMap
    assert(out.size === 8)
    val expectChild = Map(
      "lineitem.l_orderkey->orders" -> "lineitem",
      "orders.o_custkey->customer" -> "orders",
      "events.user_id->customer" -> "events",
      "customer.c_nationkey->nation" -> "customer")
    expectChild.foreach { case (edge, child) =>
      val n = Tables.table(spark, sf, child).count()
      assert(out(edge).getAs[Long]("n_child") === n, s"$edge child count")
    }
    out.values.foreach { r =>
      val orph = r.getAs[Long]("n_orphans")
      val nNull = r.getAs[Long]("n_null")
      assert(r.getAs[Boolean]("ok") === (orph === 0L))
      // nulls and orphans are DISJOINT counts (a NULL FK is not an
      // orphan — r17 ADVICE), so together they bound by the child side
      assert(orph >= 0L && nNull >= 0L &&
        orph + nNull <= r.getAs[Long]("n_child"))
    }
    // independent recount of one big edge with a LEFT ANTI join (the key
    // uses a left join + null-count aggregate); the anti join would also
    // count NULL FKs (a null key never matches), so mirror the key's
    // null exclusion explicitly
    val orphans = Tables.events(spark, sf).select(col("user_id"))
      .where(col("user_id").isNotNull)
      .join(Tables.table(spark, sf, "customer").select(col("c_custkey")),
        col("user_id") === col("c_custkey"), "left_anti").count()
    assert(out("events.user_id->customer").getAs[Long]("n_orphans")
      === orphans)
  }

  test("KS drift: D replays from a naive driver-side two-sample pass, " +
    "bounds hold") {
    // The key computes sup|F_ref − F_cur| as an exact integer cross-
    // product max over the cumulative histogram; this leg walks the raw
    // per-type samples the textbook way (merge the sorted supports,
    // step both ECDFs in doubles) and demands agreement, plus the
    // [0, 1] range law and the critical-value wiring.
    val out = SparkEntry.queries("dq_drift_ks")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), dayofmonth(col("ts")) <= 15,
        round(col("value") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (ty, evs) =>
      val ref = evs.filter(_._2).map(_._3).sorted
      val cur = evs.filterNot(_._2).map(_._3).sorted
      val r = out(ty)
      assert(r.getAs[Long]("n_ref") === ref.length.toLong, s"$ty n_ref")
      assert(r.getAs[Long]("n_cur") === cur.length.toLong, s"$ty n_cur")
      if (ref.nonEmpty && cur.nonEmpty) {
        val support = (ref ++ cur).distinct.sorted
        val d = support.map { v =>
          val fr = ref.count(_ <= v).toDouble / ref.length
          val fc = cur.count(_ <= v).toDouble / cur.length
          math.abs(fr - fc)
        }.max
        assert(math.abs(r.getAs[Double]("d_stat") - d) < 1e-5, s"$ty D")
        assert(d >= 0 && d <= 1, s"$ty D range")
        val crit = 1.358 * math.sqrt(
          (ref.length + cur.length).toDouble / (ref.length.toDouble * cur.length))
        if (math.abs(d - crit) > 1e-9)
          assert(r.getAs[Boolean]("drifted") === (d > crit), s"$ty flag")
      } else {
        assert(r.isNullAt(r.fieldIndex("d_stat")), s"$ty must NULL-gate")
      }
    }
  }

  test("retention cohort: offset 0 is exactly 100%, rates within (0,1], " +
    "matrix replays from a naive per-user pass") {
    val out = SparkEntry.queries("win_retention_cohort")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ret = r.getAs[Double]("retention")
      assert(ret > 0 && ret <= 1 + 1e-9, s"retention out of range: $r")
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
      if (r.getAs[Int]("offset") == 0)
        assert(math.abs(ret - 1.0) < 1e-9,
          s"offset-0 cell must be 100%: $r")
    }
    // naive replay: per-user first day + active days, cells from a
    // driver-side map — an off-by-one in the week truncation or the
    // DIV-7 offset cannot survive
    val act = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val first = act.groupBy(_._1).map { case (u, ds) =>
      u -> ds.map(_._2).minBy(_.toEpochDay) }
    def week(d: java.time.LocalDate): java.time.LocalDate =
      d.minusDays(d.getDayOfWeek.getValue - 1L)
    val cells = act.map { case (u, d) =>
      (week(first(u)), (d.toEpochDay - first(u).toEpochDay) / 7, u)
    }.distinct.groupBy(t => (t._1, t._2)).map { case (k, vs) => k -> vs.size }
    assert(out.length === cells.size, "cell count")
    out.foreach { r =>
      val cohort = r.getTimestamp(0).toLocalDateTime.toLocalDate
      val k = (cohort, r.getAs[Int]("offset").toLong)
      assert(cells(k) === r.getAs[Long]("n_active").toInt, s"cell $k")
    }
  }

  test("cohort LTV: cumulative is monotone and exactly sums the weekly " +
    "cents, which replay from a naive pass") {
    val out = SparkEntry.queries("win_cohort_ltv")(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getTimestamp(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("offset"))
      var run = 0L
      sorted.foreach { r =>
        run += r.getAs[Long]("cents")
        assert(r.getAs[Long]("cum_cents") === run, "cumulative law")
        assert(math.abs(r.getAs[Double]("ltv_per_user") -
          BigDecimal(run.toDouble / r.getAs[Long]("n_cohort") / 100)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      }
    }
    // naive weekly revenue replay
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"), round(col("value") * 100, 0).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getString(2), r.getLong(3)))
    val first = ev.groupBy(_._1).map { case (u, g) =>
      u -> g.map(_._2).minBy(_.toEpochDay) }
    def week(d: java.time.LocalDate) =
      d.minusDays(d.getDayOfWeek.getValue - 1L)
    val cells = ev.filter(_._3 == "purchase").groupBy { case (u, d, _, _) =>
      (week(first(u)), (d.toEpochDay - first(u).toEpochDay) / 7)
    }.map { case (k, g) => k -> g.map(_._4).sum }
    assert(out.length === cells.size, "cell count")
    out.foreach { r =>
      val k = (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getAs[Int]("offset").toLong)
      assert(cells(k) === r.getAs[Long]("cents"), s"cell $k cents")
    }
  }

  test("HHI: shares-squared replay, range and top-share laws") {
    // Independent formulation: driver-side double shares (the key sums
    // exact integer squares); laws: 1/n ≤ HHI ≤ 1 and top_share² ≤ HHI.
    val out = SparkEntry.queries("agg_hhi")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size === 5)
    val spend = Tables.table(spark, sf, "orders")
      .join(Tables.table(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    spend.groupBy(_._1).foreach { case (seg, cs) =>
      val cents = cs.map(_._2)
      val tot = cents.sum.toDouble
      val hhi = cents.map(c => (c / tot) * (c / tot)).sum
      val r = out(seg)
      assert(r.getAs[Long]("n_cust") === cents.length.toLong, s"$seg n")
      assert(math.abs(r.getAs[Double]("hhi") - hhi) < 1e-6, s"$seg hhi")
      assert(hhi >= 1.0 / cents.length - 1e-9 && hhi <= 1.0 + 1e-9,
        s"$seg range")
      val ts = r.getAs[Double]("top_share")
      assert(math.abs(ts - cents.max / tot) < 1e-6, s"$seg top_share")
      assert(r.getAs[Double]("hhi") >= ts * ts - 1e-6, s"$seg hhi ≥ ts²")
    }
  }

  test("markov transitions: rows are distributions and counts replay " +
    "from a naive per-user walk") {
    val out = SparkEntry.queries("agg_markov_transition")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (ft, rows) =>
      val ps = rows.map(_.getAs[Double]("p"))
      assert(ps.forall(p => p > 0 && p <= 1), s"$ft p range")
      assert(math.abs(ps.sum - 1.0) < 1e-4, s"$ft rows must sum to 1")
    }
    val naive = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("second", col("ts")),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        val seq = evs.sortBy(e => (e._2, e._3)).map(_._4)
        seq.zip(seq.drop(1))
      }.groupBy(x => x).map { case (k, g) => k -> g.size }
    assert(out.length === naive.size)
    out.foreach { r =>
      assert(naive((r.getString(0), r.getString(1))) ===
        r.getAs[Long]("n").toInt, s"${r.getString(0)}->${r.getString(1)}")
    }
  }

  test("basket pairs: top-20 replays from a brute-force pass; " +
    "confidence and lift laws hold") {
    val out = SparkEntry.queries("agg_basket_pairs")(spark, sf).collect()
    assert(out.length === 20)
    val op = Tables.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairCount = byOrder.values.toSeq.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, g) => k -> g.size }
    val top = pairCount.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
    val partCount = op.groupBy(_._2).view.mapValues(_.length).toMap
    val nOrders = byOrder.size
    out.zip(top).foreach { case (r, ((a, b), n)) =>
      assert(r.getLong(0) === a && r.getLong(1) === b, s"pair order: $r")
      assert(r.getAs[Long]("n_ab") === n.toLong)
      assert(r.getAs[Long]("n_a") === partCount(a).toLong)
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0 && conf <= 1 + 1e-9)
      val lift = r.getAs[Double]("lift")
      val expect = n.toDouble * nOrders / (partCount(a).toDouble * partCount(b))
      assert(math.abs(lift - expect) < 1e-4, s"lift $lift vs $expect")
    }
  }

  test("gini: mean-absolute-difference replay (different formulation), " +
    "range law") {
    // The key computes the rank closed form Σ(2i−n−1)x/(nΣx); this leg
    // recomputes G = Σ_ij |x_i − x_j| / (2n²μ) — algebraically equal,
    // computationally different, so a rank-weight slip cannot survive.
    val out = SparkEntry.queries("agg_gini")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.nonEmpty)
    val spend = Tables.table(spark, sf, "orders")
      .join(Tables.table(spark, sf, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    spend.groupBy(_._1).foreach { case (seg, xs) =>
      val v = xs.map(_._2.toDouble)
      val n = v.length
      val mu = v.sum / n
      val mad = (for (a <- v; b <- v) yield math.abs(a - b)).sum
      val g = mad / (2.0 * n * n * mu)
      val (gotN, gotTot, gotG) = out(seg)
      assert(gotN === n.toLong, s"$seg customer count")
      assert(gotTot === xs.map(_._2).sum, s"$seg total")
      assert(math.abs(gotG - g) < 1e-5, s"$seg: key $gotG vs MAD $g")
      assert(gotG >= 0.0 && gotG < 1.0, s"$seg gini out of range")
    }
  }

  test("kaplan-meier: textbook sequential replay, monotone non-increasing, " +
    "censoring reduces deaths below totals") {
    val out = SparkEntry.queries("agg_survival_km")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // naive replay: time-to-conversion + censor flags -> textbook KM
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"),
        round(col("value") * 100, 0).cast("long").as("c")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getString(2), r.getLong(3)))
    // .toSeq BEFORE .map: mapping the Map directly would re-key by the
    // (t, cens) pair and silently collapse users with equal lifetimes
    val lives = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      val first = rows.map(_._2).min
      val conv = rows.filter(r => r._3 == "purchase" && r._4 >= 20000L)
        .map(_._2)
      if (conv.nonEmpty) ((conv.min - first).toInt, false)
      else ((rows.map(_._2).max - first).toInt, true)
    }.toSeq
    val byT = lives.groupBy(_._1).view.mapValues { xs =>
      (xs.count(!_._2).toLong, xs.size.toLong) // (deaths, total)
    }.toMap
    var atRisk = lives.size.toLong
    var sRun = 1.0
    val naive = byT.keys.toSeq.sorted.flatMap { t =>
      val (d, m) = byT(t)
      val row = if (d > 0) {
        sRun *= 1.0 - d.toDouble / atRisk
        Some((t, atRisk, d, sRun))
      } else None
      atRisk -= m
      row
    }
    assert(out.length === naive.length)
    out.zip(naive).foreach {
      case ((t, n, d, s), (t2, n2, d2, s2)) =>
        assert(t === t2 && n === n2 && d === d2, s"support point $t")
        assert(math.abs(s - s2) < 1e-5, s"t=$t: key $s vs naive $s2")
    }
    // survival laws
    out.sliding(2).foreach {
      case Array((_, _, _, s1), (_, _, _, s2)) => assert(s2 <= s1 + 1e-9)
      case _ =>
    }
    out.foreach { case (_, _, _, s) => assert(s >= 0.0 && s <= 1.0) }
    assert(lives.exists(_._2), "corpus must contain censored users or " +
      "the censoring path is untested")
  }

  test("theil-sen: median slope replays from a naive all-pairs pass and " +
    "sits inside the slope range") {
    val out = SparkEntry.queries("win_trend_theil_sen")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(1), r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, ds) =>
      val pts = ds.map(d => (d._2, d._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2).toDouble /
        (pts(j)._1 - pts(i)._1).toDouble).sorted
      val med = if (slopes.length % 2 == 1) slopes(slopes.length / 2)
        else (slopes(slopes.length / 2 - 1) + slopes(slopes.length / 2)) / 2
      val (np, slope, rising) = out(t)
      assert(np === slopes.length.toLong, s"$t pair count")
      assert(math.abs(slope - med) < 1e-5, s"$t: key $slope vs naive $med")
      assert(rising === (slope > 0))
      assert(slope >= slopes.head - 1e-9 && slope <= slopes.last + 1e-9,
        s"$t median outside slope range")
    }
  }

  test("benford: digit laws, probabilities sum to one, chi2 is the " +
    "contribution sum") {
    val out = SparkEntry.queries("dq_benford")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    // the 1..9 spine makes every digit a cell — absent digits carry the
    // full n·p evidence instead of silently dropping (r17 review)
    assert(out.length === 9, "all nine digit cells must be present")
    assert(out.map(_._1).toSet === (1 to 9).toSet)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-3,
      "expected shares must sum to ~1 over the full digit spine")
    val chi2s = out.map(_._5).distinct
    assert(chi2s.length === 1, "one chi2 for the whole column")
    assert(math.abs(out.map(_._4).sum - chi2s.head) < 1e-3,
      "chi2 must be the sum of the per-digit contributions")
    // textbook replay from the emitted observed counts
    val n = out.map(_._2).sum.toDouble
    val chi = out.map { case (d, obs, _, _, _, _) =>
      val p = math.log10(1.0 + 1.0 / d)
      (obs - n * p) * (obs - n * p) / (n * p)
    }.sum
    assert(math.abs(chi - chi2s.head) < 1e-3,
      s"chi2 ${chi2s.head} vs textbook $chi")
    out.foreach { case (_, _, _, _, c2, flag) =>
      assert(flag === (c2 > 15.507))
    }
  }

  test("acf: Pearson r replays from a naive driver-side lagged pass, " +
    "lag-0 sanity = 1") {
    val out = SparkEntry.queries("win_acf")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(out.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hw"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(1), r.getTimestamp(0), r.getLong(2)))
    def pearson(xs: Seq[Long], ys: Seq[Long]): Option[Double] = {
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val d1 = xs.map(x => (x - mx) * (x - mx)).sum
      val d2 = ys.map(y => (y - my) * (y - my)).sum
      if (d1 > 0 && d2 > 0) Some(num / math.sqrt(d1 * d2)) else None
    }
    hourly.groupBy(_._1).foreach { case (t, rows) =>
      // densify to the per-type hour spine (zero-volume hours are real
      // observations — mirrors the key's shared denseHourly derivation)
      val byHour = rows.map(r => r._2.getTime -> r._3).toMap
      val (t0, t1) = (byHour.keys.min, byHour.keys.max)
      val series = (t0 to t1 by 3600000L)
        .map(h => byHour.getOrElse(h, 0L)).toSeq
      (1 to 3).foreach { k =>
        val x = series.drop(k); val y = series.dropRight(k)
        val (np, acf) = out((t, k))
        assert(np === x.length.toLong, s"$t lag $k pair count")
        (pearson(x, y), acf) match {
          case (Some(p), Some(a)) =>
            assert(math.abs(a - p) < 1e-5, s"$t lag $k: key $a vs naive $p")
          case (None, None) =>
          case (p, a) => fail(s"$t lag $k gate mismatch: naive $p key $a")
        }
      }
      // internal-consistency sanity: the same estimator at lag 0 is 1
      assert(pearson(series, series).forall(p => math.abs(p - 1) < 1e-12))
    }
  }

  test("count-min: one-sided error law and full naive sketch replay") {
    val out = SparkEntry.queries("agg_count_min")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 10)
    // the defining CMS law: estimates never undercount
    out.foreach { case (u, exact, est, over) =>
      assert(est >= exact, s"user $u: CMS undercounted ($est < $exact)")
      assert(over === est - exact)
    }
    // independent replay: rebuild the 4×256 counter table with java md5
    val md = java.security.MessageDigest.getInstance("MD5")
    def bh(d: Int, u: Long): String =
      md.digest(s"$d:$u".getBytes("UTF-8")).map(b => f"$b%02x")
        .mkString.take(2)
    val users = Tables.events(spark, sf).select("user_id").collect()
      .map(_.getLong(0))
    val ctr = scala.collection.mutable.Map[(Int, String), Long]()
    users.foreach { u =>
      (0 to 3).foreach { d =>
        val k = (d, bh(d, u)); ctr(k) = ctr.getOrElse(k, 0L) + 1
      }
    }
    out.foreach { case (u, _, est, _) =>
      val naive = (0 to 3).map(d => ctr((d, bh(d, u)))).min
      assert(est === naive, s"user $u: key $est vs naive $naive")
    }
  }

  test("seasonal baseline: slot means replay and residuals sum to zero " +
    "per slot") {
    val out = SparkEntry.queries("win_seasonal_baseline")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.nonEmpty)
    out.groupBy(t => (t._1, t._2)).foreach { case ((ty, hod), rows) =>
      val mean = rows.map(_._3).sum.toDouble / rows.length
      rows.foreach { case (_, _, n, expected, residual) =>
        assert(math.abs(expected - mean) < 1e-5, s"$ty/$hod expected")
        assert(math.abs(residual - (n - mean)) < 1e-5, s"$ty/$hod residual")
      }
      // residuals of a mean-baseline sum to ~0 within rounding
      val rs = rows.map(_._5).sum
      assert(math.abs(rs) < 1e-3 * rows.length, s"$ty/$hod residual sum $rs")
    }
  }

  test("holt forecast: level/trend replay from a naive per-hour recursion " +
    "over an independently densified spine") {
    // The key folds the Holt recurrence over the shared denseHourly
    // collect_list; this leg rebuilds the spine by WALKING THE CALENDAR
    // hour-by-hour from a plain events rollup (gaps filled with explicit
    // zeros), runs the textbook two-equation recursion in mutable vars,
    // and demands agreement — a spine gap, a seed slip (l₂ = x₂,
    // b₂ = x₂ − x₁), or a swapped α/β cannot survive both forms.
    val out = SparkEntry.queries("win_forecast_des")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hw"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).getTime, r.getLong(2)))
    hourly.groupBy(_._1).foreach { case (ty, rows) =>
      val byHour = rows.map(t => t._2 -> t._3).toMap
      val (h0, h1) = (byHour.keys.min, byHour.keys.max)
      val xs = (h0 to h1 by 3600000L)
        .map(h => byHour.getOrElse(h, 0L).toDouble)
      var l = xs.head; var b = Double.NaN
      xs.tail.foreach { x =>
        if (b.isNaN) { b = x - l; l = x }
        else {
          val lN = 0.25 * x + 0.75 * (l + b)
          b = 0.125 * (lN - l) + 0.875 * b
          l = lN
        }
      }
      val r = out(ty)
      assert(r.getAs[Int]("n_hours") === xs.length, s"$ty spine length")
      assert(math.abs(r.getAs[Double]("level") - l) < 1e-5, s"$ty level")
      if (xs.length > 1) {
        assert(math.abs(r.getAs[Double]("trend") - b) < 1e-5, s"$ty trend")
        assert(math.abs(r.getAs[Double]("forecast_next") - (l + b)) < 1e-5,
          s"$ty forecast")
      } else {
        assert(r.isNullAt(r.fieldIndex("trend")), s"$ty must NULL-gate")
      }
    }
  }

  test("cusum: closed form replays the naive max(0, S+d) recursion") {
    // The key computes S_t = P_t - min(0, min P_j) in scaled integer
    // space; this leg runs the textbook per-row recursion in doubles and
    // demands agreement — an off-by-one in the running windows (frame
    // bounds, missing least(0,·)) cannot survive.
    val out = SparkEntry.queries("win_cusum")(spark, sf).collect()
    assert(out.nonEmpty)
    var alarms = 0
    out.groupBy(_.getString(0)).foreach { case (t, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("hr_ts"))
      val xs = sorted.map(_.getAs[Long]("x").toDouble)
      val mu = xs.sum / xs.length
      var s = 0.0
      sorted.zip(xs).foreach { case (r, x) =>
        s = math.max(0.0, s + (x - mu))
        assert(math.abs(r.getAs[Double]("cusum") - s) < 1e-3,
          s"$t @${r.getAs[Long]("hr_ts")}: key ${r.getAs[Double]("cusum")} vs naive $s")
        if (r.getAs[Boolean]("alarm")) alarms += 1
        // alarm = S > mu/4; skip the assert only on a float knife-edge
        // (the key decides it in exact integers)
        if (math.abs(4 * s - mu) > 1e-6)
          assert(r.getAs[Boolean]("alarm") === (4 * s > mu),
            s"$t alarm flag inconsistent with S > mu/4")
      }
    }
    info(s"cusum alarms fired: $alarms")
  }

  test("freshness: watermark law and ranges") {
    val out = SparkEntry.queries("dq_freshness")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.exists(_.getAs[Long]("lag_hours") === 0L),
      "some event_type must BE the corpus watermark")
    out.foreach { r =>
      assert(r.getAs[Long]("lag_hours") >= 0L)
      val h = r.getAs[Long]("hours_covered_24h")
      // a 24h lookback can touch at most 25 distinct hour buckets
      assert(h >= 0L && h <= 25L)
      assert(r.getAs[Boolean]("stale") === (r.getAs[Long]("lag_hours") > 1L)
        || r.getAs[Long]("lag_hours") === 1L) // 3600s boundary: >1h strictly
    }
  }
}
