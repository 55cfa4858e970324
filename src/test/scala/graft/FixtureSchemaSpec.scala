package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fixture contract, asserted loudly. The driver regenerates
  * `/root/testdata` between rounds and has already changed a physical type
  * once (events.ts: parquet TIMESTAMP(NANOS) → timestamp[us], which flips
  * the Spark type from nanos-LONG-under-`nanosAsLong` to TIMESTAMP_NTZ and
  * broke 9 queries + 6 suites as scattered analysis errors). This spec
  * pins every type the query surface assumes, so the NEXT silent
  * regeneration fails here first, with a message naming the drift.
  */
class FixtureSchemaSpec extends SparkSpec {

  private def typeOf(table: String, column: String): DataType =
    Tables.load(spark, sfDir, table).schema(column).dataType

  private def assertType(table: String, column: String, ok: Set[DataType]): Unit = {
    val dt = typeOf(table, column)
    assert(ok.contains(dt),
      s"FIXTURE DRIFT: $table.$column is ${dt.catalogString}, the suite assumes " +
        s"one of {${ok.map(_.catalogString).mkString(", ")}} — the driver " +
        "regenerated the fixtures with a new physical type. Audit every query " +
        s"reading $table.$column (and extend Tables' adaptive helpers if the " +
        "new type is a third timestamp shape).")
  }

  test("events.ts is a type the adaptive helpers handle (long | timestamp[_ntz])") {
    assertType("events", "ts", Set(LongType, TimestampType, TimestampNTZType))
    // and the helpers normalize it: nanos LONG for integral arithmetic,
    // TIMESTAMP for streaming event time — whichever shape shipped
    val evN = Tables.eventsNanos(spark, sfDir)
    assert(evN.schema("ts").dataType == LongType)
    val ev = Tables.events(spark, sfDir)
    val et = ev.select(
      Tables.eventTime(col("ts"), ev.schema("ts").dataType).as("ts"))
    assert(et.schema("ts").dataType == TimestampType)
    // the two views agree on the instant (µs precision)
    val probe = evN.select((col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .orderBy(col("us")).limit(1).collect()(0).getLong(0)
    val probeT = et.select(unix_micros(col("ts")).as("us"))
      .orderBy(col("us")).limit(1).collect()(0).getLong(0)
    assert(probe == probeT,
      s"eventsNanos ($probe µs) and eventTime ($probeT µs) disagree on the " +
        "earliest event — the two adaptive paths drifted apart")
  }

  test("events scalar columns keep their assumed types") {
    assertType("events", "event_id", Set(LongType))
    assertType("events", "user_id", Set(LongType))
    assertType("events", "event_type", Set(StringType))
    assertType("events", "value", Set(DoubleType))
    assertType("events", "props", Set(StringType))
  }

  test("documents columns keep their assumed types") {
    assertType("documents", "doc_id", Set(LongType))
    assertType("documents", "text", Set(StringType))
    assertType("documents", "lang", Set(StringType))
    assertType("documents", "source", Set(StringType))
    assertType("documents", "n_chars", Set(LongType))
  }

  test("embeddings columns keep their assumed types") {
    assertType("embeddings", "vec_id", Set(LongType))
    assertType("embeddings", "embedding", Set(ArrayType(FloatType), ArrayType(FloatType, false)))
    assertType("embeddings", "label", Set(IntegerType, LongType))
  }

  test("tpch key columns keep their assumed types") {
    assertType("lineitem", "l_orderkey", Set(LongType))
    assertType("lineitem", "l_quantity", Set(DoubleType))
    assertType("lineitem", "l_extendedprice", Set(DoubleType))
    // dates ship as timestamp[us] (TIMESTAMP_NTZ); the TPC-H tier compares
    // them against string literals, which resolves for either shape — but
    // a switch to e.g. epoch ints would not
    assertType("lineitem", "l_shipdate", Set(DateType, TimestampNTZType, TimestampType))
    assertType("orders", "o_orderkey", Set(LongType))
    assertType("orders", "o_orderdate", Set(DateType, TimestampNTZType, TimestampType))
    assertType("customer", "c_custkey", Set(LongType))
  }
}
