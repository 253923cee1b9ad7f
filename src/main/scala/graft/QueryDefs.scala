package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

object QueryDefs {
  /** The driver contract's query-function shape: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Parse an optional integer tuning conf, naming the conf in the error —
    * a bare `.toLong` on a mis-set 100 TB knob (`bucketWidth=50k`) throws
    * an anonymous NumberFormatException at plan time with no hint of
    * WHICH conf is malformed. Same contract as Ann.pqTrainStride's
    * validation. */
  def longConf(s: SparkSession, key: String): Option[Long] =
    s.conf.getOption(key).map { v =>
      try v.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$key must be an integer, got '$v'")
      }
    }
}

/** Memoized child sessions for keys whose semantics REQUIRE non-default
  * planner confs (CBO on, runtime bloom filters sized for test SF).
  *
  * Why a child session and not `s.conf.set`: a returned DataFrame is
  * planned lazily, at ACTION time — a conf set during construction and
  * restored afterwards would never reach the optimizer, and one left set
  * would leak into every OTHER key's plan (CBO flips the whole stats
  * visitor; a lowered broadcast threshold would de-broadcast every
  * hint-free dim join that runs later). `newSession()` shares the
  * SparkContext and the external catalog (so staged/ANALYZEd tables are
  * visible) but owns its conf — the returned frame carries the scoped
  * session, and nothing else in the JVM sees the overrides.
  *
  * Memoized per (parent, tag, confs) so PlanSweep/Bench's repeated
  * constructions reuse one child; weak keys so children die with their
  * parent. The CONFS are part of the memo key on purpose: keying by tag
  * alone made the first caller win silently, so a test carrying a
  * hand-copied conf list could drift from the declared key's and one of
  * the two would plan under the other's stale confs (r15 review
  * finding). Two callers with the same tag but different confs now each
  * get a session configured exactly as they asked. */
object Scoped {
  import java.util.concurrent.ConcurrentHashMap
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      ConcurrentHashMap[String, SparkSession]]())
  def session(parent: SparkSession, tag: String,
              confs: Seq[(String, String)]): SparkSession = {
    val perParent = memo.synchronized {
      var m = memo.get(parent)
      if (m == null) { m = new ConcurrentHashMap(); memo.put(parent, m) }
      m
    }
    val key = tag + "|" +
      confs.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(";")
    perParent.computeIfAbsent(key, _ => {
      val child = parent.newSession()
      confs.foreach { case (k, v) => child.conf.set(k, v) }
      child
    })
  }
}

/** Determinism helpers (SURVEY.md §7.3): every declared query must end in a
  * total order with a unique tie-break key, and every aggregated double must
  * be rounded so Spark and the DuckDB oracle hash-match on written parquet.
  */
object D {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.round
  def r2(c: Column): Column = round(c, 2)
  def r6(c: Column): Column = round(c, 6)
}
