package graft.tools

import org.apache.spark.sql.SparkSession

/** R21 optimization-round probe: quantify the per-call fixed cost of
  * `spark.read.parquet` (file listing + footer schema inference) that
  * every `Tables.table` call pays, vs reusing one already-resolved
  * DataFrame. Motivated by guide §1 (measure first) + §6 (listing /
  * metadata costs): a bench pass makes ~1500 Tables.table calls, so a
  * 10-30 ms per-call constant is seconds of pure fixed cost per pass.
  *
  * Usage: runMain graft.tools.R21Probe [sfDir] [iters]
  */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[r21probe] $tag: $s%8.3f s  (${s / iters * 1000}%8.2f ms/iter)")
      s
    }
    val p = s"$sfDir/lineitem.parquet"
    // JIT warm-up
    (1 to 5).foreach(_ => spark.read.parquet(p))
    spark.read.parquet(p).count()
    // (a) DataFrame construction only: listing + schema inference
    timed("read.parquet construct")((1 to iters).foreach(_ => spark.read.parquet(p)))
    // (b) construct + tiny action (1-row limit count)
    timed("fresh df head")((1 to iters).foreach(_ => spark.read.parquet(p).limit(1).count()))
    // (c) memoized df + same tiny action
    val memo = spark.read.parquet(p)
    timed("memo df head")((1 to iters).foreach(_ => memo.limit(1).count()))
    // (d) via Tables.table (current code path)
    timed("Tables.table construct")((1 to iters).foreach(_ => graft.Tables.table(spark, sfDir, "lineitem")))
    spark.stop()
  }
}
