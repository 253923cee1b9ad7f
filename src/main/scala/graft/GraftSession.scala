package graft

import org.apache.spark.sql.SparkSession

/** Library entry point for production use: a SparkSession.Builder
  * pre-loaded with the engine's recommended cluster defaults and the
  * graft SQL extensions, so `SELECT graft_cosine(a, b)` and every
  * `SparkEntry.queries` operator work out of the box.
  *
  * The defaults encode the 100 TB tuning stance (SURVEY §7.6):
  *  - AQE on with skew-join splitting: runtime re-plan absorbs stats
  *    drift and hot keys that static planning can't see;
  *  - 256 MiB scan partitions: big enough to amortize task overhead at
  *    100 TB (≈400k tasks), small enough to fit executor memory with
  *    room for shuffle spill structures;
  *  - parquet TIMESTAMP(NANOS) read as long (the `events.ts` contract —
  *    Tables.events converts to microsecond timestamps);
  *  - UTC session timezone: date_trunc/window results must not depend on
  *    cluster locale.
  *
  * `shufflePartitions` should be ≈ 2-3× total executor cores on a real
  * cluster (AQE coalesces down from there); the local harnesses pass
  * their core count.
  */
object GraftSession {
  def builder(shufflePartitions: Int = 200): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "268435456")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
}
