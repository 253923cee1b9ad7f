package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** sink_vacuum's file law, checked at the byte level: the littered store
  * carries exactly the planted failed-writer debris, the vacuumed store
  * carries none of it, every committed file is carried over
  * byte-identical — and Spark READS are unaffected by the litter
  * (orphans are a storage problem, never a correctness one). */
class SinkVacuumSpec extends AnyFunSuite {
  import TestSpark._

  // streams closed — the same fd-leak class Sinks.scala fixes (r14)
  private def files(root: Path): Map[String, Seq[(String, Long)]] = {
    val ls = Files.list(root)
    try ls.iterator().asScala
      .filter(_.getFileName.toString.startsWith("day="))
      .map { d =>
        val w = Files.walk(d)
        try d.getFileName.toString -> w.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(p => (d.relativize(p).toString, Files.size(p)))
          .toSeq.sortBy(_._1)
        finally w.close()
      }.toMap
    finally ls.close()
  }

  test("vacuum removes exactly the planted debris, keeps bytes identical") {
    val lit = Paths.get(ops.Sinks.ensureLitteredStore(spark, sf))
    val vac = Paths.get(ops.Sinks.ensureVacuumedStore(spark, sf))
    val lf = files(lit)
    val vf = files(vac)
    assert(lf.keySet === vf.keySet, "same day partitions on both sides")
    for ((dayDir, lfs) <- lf) {
      val day = dayDir.stripPrefix("day=")
      val expectedOrphans = 1 + day.substring(8, 10).toInt % 3
      val (junk, kept) = lfs.partition(_._1.startsWith(".part-orphan-"))
      assert(junk.size === expectedOrphans,
        s"$dayDir must carry exactly the planting-formula debris")
      assert(vf(dayDir) === kept,
        s"$dayDir: vacuum must keep exactly the committed files")
      for ((rel, _) <- kept)
        assert(java.util.Arrays.equals(
          Files.readAllBytes(lit.resolve(dayDir).resolve(rel)),
          Files.readAllBytes(vac.resolve(dayDir).resolve(rel))),
          s"$dayDir/$rel must be byte-identical after vacuum")
    }
  }

  test("orphans are invisible to reads: littered == clean == vacuumed") {
    val clean = spark.read.parquet(ops.Sinks.ensureRetentionStore(spark, sf))
    val lit = spark.read.parquet(ops.Sinks.ensureLitteredStore(spark, sf))
    val vac = spark.read.parquet(ops.Sinks.ensureVacuumedStore(spark, sf))
    val cols = Seq("event_id", "user_id", "value")
    assert(rowSet(lit.select(cols.map(org.apache.spark.sql.functions.col): _*))
      === rowSet(clean.select(cols.map(org.apache.spark.sql.functions.col): _*)))
    assert(rowSet(vac.select(cols.map(org.apache.spark.sql.functions.col): _*))
      === rowSet(clean.select(cols.map(org.apache.spark.sql.functions.col): _*)))
  }
}
