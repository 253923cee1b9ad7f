package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift tripwire (VERDICT r8 item 5). The driver regenerates the
  * testdata between rounds and has already changed a PHYSICAL column type
  * once (`events.ts`: TIMESTAMP(NANOS) → TIMESTAMP(MICROS), ~2026-08-13),
  * which surfaced as 47 cascading test failures with no single message
  * naming the cause. This spec reads every table's footer at sf0.001 and
  * asserts (a) the logical contract the engine assumes per column and
  * (b) that [[Tables.normalizeTs]] converges whatever `ts` variant
  * arrived. A future drift fails HERE first, with a one-line diagnosis
  * naming the table and column.
  */
class SchemaGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Expected logical column types per table, post-Tables.table load,
    * transcribed from the CURRENT testdata footers (pyarrow, 2026-08-13:
    * int32 region/nation keys, timestamp[us] order/ship dates, `vec_id`
    * on embeddings). `events.ts` is asserted separately (it is the one
    * adaptive column). */
  private val contract: Map[String, Seq[(String, DataType)]] = Map(
    "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
                      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
                      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
                      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
                      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
                      "p_brand" -> StringType, "p_type" -> StringType,
                      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_orderstatus" -> StringType,
                      "o_totalprice" -> DoubleType,
                      "o_orderdate" -> TimestampNTZType,
                      "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
                      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
                      "l_quantity" -> DoubleType,
                      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
                      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
                      "l_linestatus" -> StringType,
                      "l_shipdate" -> TimestampNTZType),
    "events"   -> Seq("event_id" -> LongType, "user_id" -> LongType,
                      "event_type" -> StringType, "value" -> DoubleType,
                      "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
                       "lang" -> StringType, "source" -> StringType,
                       "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
                        "embedding" -> ArrayType(FloatType, containsNull = true),
                        "label" -> IntegerType)
  )

  test("every table's loaded schema carries the engine's assumed types") {
    val drifted = for {
      (table, cols) <- contract.toSeq
      schema = Tables.table(spark, sf, table).schema
      (col, expected) <- cols
      actualOpt = schema.find(_.name == col).map(_.dataType)
      if !actualOpt.contains(expected)
    } yield s"$table.$col: expected $expected, footer has " +
      actualOpt.map(_.toString).getOrElse("NO SUCH COLUMN")
    assert(drifted.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT — the driver regenerated the parquet with " +
      s"different types; adapt Tables/queries:\n  ${drifted.mkString("\n  ")}")
  }

  test("events.ts converges to TimestampType whatever the footer says") {
    // the raw footer may legitimately be long-nanos, µs-NTZ, or µs-LTZ
    // across testdata generations; the ENGINE contract is the normalized
    // type. A fourth variant fails here with the footer type in the message.
    val raw = spark.read.parquet(Tables.path(sf, "events")).schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(raw),
      s"events.ts arrived as unhandled physical type $raw — teach " +
      s"Tables.normalizeTs the new variant")
    val normalized = Tables.events(spark, sf).schema("ts").dataType
    assert(normalized === TimestampType,
      s"Tables.normalizeTs left events.ts as $normalized (footer: $raw)")
  }

  test("eventsStreamDir adapts to a legacy long-ts source (footer-derived schema)") {
    // the current testdata is µs-native, so the legacy branch (ts stored
    // as int64 nanos, read as LongType) is only reachable through a
    // synthetic source — keep it covered or the next nanos regeneration
    // resurrects the round-7/8 failure mode in reverse
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_legacy_events_")
    try {
      val micros = 1700000000000000L
      Seq((1L, micros * 1000L, 7L, "view", 0.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(dir.toString)
      val stream = graft.streaming.Streams.eventsStreamDir(spark, dir.toString)
      assert(stream.isStreaming)
      assert(stream.schema("ts").dataType === TimestampType,
        s"legacy long-ts stream not normalized: ${stream.schema("ts").dataType}")
      // and the µs-native staged layout resolves through the same entry
      val native = graft.streaming.Streams.eventsStream(spark, Tables.path(sf, "events"))
      assert(native.schema("ts").dataType === TimestampType)
    } finally Staging.deleteRecursively(dir)
  }

  test("normalizeTs handles all three known physical variants") {
    import spark.implicits._
    val micros = 1700000000000000L // 2023-11-14T22:13:20Z
    val fromLong = Tables.normalizeTs(
      Seq(micros * 1000L).toDF("ts")) // long nanos
    val fromNtz = Tables.normalizeTs(
      Seq(micros).toDF("us").selectExpr("timestamp_micros(us) AS ts")
        .selectExpr("cast(ts AS timestamp_ntz) AS ts"))
    val fromLtz = Tables.normalizeTs(
      Seq(micros).toDF("us").selectExpr("timestamp_micros(us) AS ts"))
    for (df <- Seq(fromLong, fromNtz, fromLtz)) {
      assert(df.schema("ts").dataType === TimestampType)
      assert(df.selectExpr("unix_micros(ts)").head().getLong(0) === micros)
    }
  }
}
