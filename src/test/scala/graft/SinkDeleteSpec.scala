package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** sink_delete's copy-on-write file law, checked at the byte level:
  * untouched (day, bkt) cells must be carried over BYTE-IDENTICAL;
  * touched cells must be rewritten without the forget rows; each cell is
  * exactly one parquet file; rows balance exactly. */
class SinkDeleteSpec extends AnyFunSuite {
  import TestSpark._

  private def cells(root: Path): Map[(String, Int), Seq[Path]] =
    Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.startsWith("day="))
      .flatMap { d =>
        Files.list(d).iterator().asScala
          .filter(_.getFileName.toString.startsWith("bkt="))
          .map { b =>
            val key = (d.getFileName.toString.stripPrefix("day="),
              b.getFileName.toString.stripPrefix("bkt=").toInt)
            key -> Files.list(b).iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .toSeq.sortBy(_.getFileName.toString)
          }
      }.toMap

  test("copy-on-write delete: untouched cells byte-identical, touched " +
       "cells rewritten forget-free, one file per cell") {
    val storeRoot = Paths.get(ops.Sinks.ensureRetentionStore(spark, sf))
    val delRoot = Paths.get(ops.Sinks.ensureDeletedStore(spark, sf))
    val store = spark.read.parquet(storeRoot.toString)
    val isForget = pmod(col("user_id"), lit(37)) === 3

    val touched = store.where(isForget)
      .select(col("day").cast("string"), col("bkt"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(touched.nonEmpty, "corpus must exercise the forget predicate")

    val before = cells(storeRoot)
    val after = cells(delRoot)
    assert(before.values.forall(_.size == 1), "store law: one file per cell")
    assert(after.values.forall(_.size == 1), "delete law: one file per cell")

    for ((cell, files) <- before) {
      if (!touched.contains(cell)) {
        // untouched → exact same bytes under the same relative name
        val dst = after.get(cell)
        assert(dst.isDefined, s"untouched cell $cell must be carried over")
        assert(files.map(_.getFileName.toString) ===
          dst.get.map(_.getFileName.toString))
        for ((a, b) <- files.zip(dst.get))
          assert(java.util.Arrays.equals(Files.readAllBytes(a),
            Files.readAllBytes(b)), s"untouched cell $cell must be " +
            "byte-identical (copy-on-write must not rewrite it)")
      } else {
        // touched → absent iff every row was a forget row, else rewritten
        val cellRows = store.where(col("day").cast("string") === cell._1 &&
          col("bkt") === cell._2)
        val survivors = cellRows.where(!isForget).count()
        if (survivors == 0) assert(after.get(cell).isEmpty)
        else assert(after.contains(cell), s"touched cell $cell with " +
          s"$survivors survivors must be rewritten")
      }
    }

    val del = spark.read.parquet(delRoot.toString)
    assert(del.where(isForget).count() === 0, "no forget row may survive")
    assert(del.count() === store.where(!isForget).count(),
      "rows must balance: after == before - forget")
  }

  test("sink_change_feed_upsert: every CDC change type carries rows, " +
    "update images pair up, untouched v1 cells carry over byte-identical") {
    val byType = SparkEntry.queries("sink_change_feed_upsert")(spark, sf)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (t <- Seq("delete", "insert", "update_preimage", "update_postimage"))
      assert(byType.getOrElse(t, 0L) > 0L,
        s"change type '$t' emitted no rows — the upsert commit exists " +
          "to make every CDC leg non-empty (r15 verdict item 2)")
    assert(byType("update_preimage") === byType("update_postimage"),
      "update image rows must pair 1:1")
    // file law: cells the merge never touched are byte-copies in v2
    val v1 = Paths.get(graft.ops.Sinks.ensureDeletedStore(spark, sf))
    val v2 = Paths.get(graft.ops.Sinks.ensureUpsertedStore(spark, sf))
    val (c1, c2) = (cells(v1), cells(v2))
    val carried = c1.keySet.intersect(c2.keySet).filter { k =>
      c1(k).map(_.getFileName.toString) == c2(k).map(_.getFileName.toString)
    }
    assert(carried.nonEmpty, "no carried-over cell found — either every " +
      "cell was touched (corpus drift) or the copy-on-write path broke")
    for (k <- carried; (a, b) <- c1(k).zip(c2(k)))
      assert(java.util.Arrays.equals(Files.readAllBytes(a),
        Files.readAllBytes(b)), s"carried cell $k differs byte-wise: $a")
  }
}
