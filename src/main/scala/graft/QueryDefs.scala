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
