package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-20 knee probe (r19 verdict item 8): per-decade scaling
  * exponents for the r19-new heavy keys that had no ScaleProbe entry —
  * `text_keywords_rake`, `dedup_containment`, `win_changepoint`,
  * `agg_survival_km`, `dedup_cluster_incremental`. Staging is DISABLED
  * for the timed runs, so every invocation pays its full computation
  * (a superlinear term cannot hide behind a warm staged artifact —
  * exactly the judge's concern). Each key runs once untimed at sf0.001
  * (JIT warm-up), then timed at sf0.001 / sf0.01 / sf0.1; the printed
  * decade ratios sit against the 10× data growth (ratio ≈ 10 → linear;
  * well under → fixed-cost-dominated; well over → superlinear, the
  * thing this probe exists to catch).
  *
  * Usage: runMain graft.tools.R20Knee [key,key,...]
  * Not part of the driver contract; results recorded in ROUND20_NOTES.
  */
object R20Knee {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.split(',').toSeq).getOrElse(Seq(
      "text_keywords_rake", "dedup_containment", "win_changepoint",
      "agg_survival_km", "dedup_cluster_incremental"))
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stagingWas = sys.props.get("graft.staging")
    sys.props("graft.staging") = "false"
    try keys.foreach { key =>
      val fn = graft.SparkEntry.queries.getOrElse(key,
        sys.error(s"unknown key $key"))
      fn(spark, sfs.head).count() // JIT warm-up, untimed
      val times = sfs.map { sf =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sf).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[r20knee] $key $sf: $sec%7.2f s  rows=$rows")
        sec
      }
      val ratios = times.sliding(2).map(p => p(1) / p(0)).toSeq
      println(f"[r20knee] $key decade ratios: " +
        ratios.map(r => f"$r%.2f").mkString(" , ") +
        "  (10.0 = linear in rows)")
    } finally {
      stagingWas match {
        case Some(v) => sys.props("graft.staging") = v
        case None    => sys.props -= "graft.staging"
      }
      // inside the finally: a failing key must not leak the local[32]
      // session into a shared (sbt in-process) JVM
      spark.stop()
    }
  }
}
