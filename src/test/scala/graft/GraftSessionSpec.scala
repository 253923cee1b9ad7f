package graft

import org.scalatest.funsuite.AnyFunSuite

/** The library entry point must yield a session where the SQL extension
  * and the tuning confs are actually active. Uses a dedicated session
  * (newSession would share extensions anyway; a fresh builder proves the
  * activation path users take). */
class GraftSessionSpec extends AnyFunSuite {

  test("builder applies extensions and tuning confs") {
    // getOrCreate against the already-running test context still applies
    // session-scoped confs and extension injection for a NEW session state
    TestSpark.spark // ensure a SparkContext exists (shared JVM context)
    val s = GraftSession.builder(shufflePartitions = 7)
      .master("local[2]").getOrCreate().newSession()
    try {
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      // the native expression is callable from SQL text
      graft.functions.GraftExtensions.register(s)
      val r = s.sql(
        "SELECT round(graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c")
        .head().getDouble(0)
      assert(r === 1.0)
    } finally () // shared context: nothing to stop
  }
}
