package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Fixture-table loaders. The driver ships one parquet file per table under
  * `/root/testdata/sf{0.001,0.01,0.1}/` (see TESTDATA.md / FIXTURES.md).
  *
  * At 100 TB these would be multi-file Iceberg tables; loading stays the same
  * (`spark.read.parquet(dir)` over a directory) — nothing here assumes a
  * single file.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")

  /** `events` with `ts` normalized to nanos-since-epoch LONG, whatever
    * physical type the fixture ships. The driver has shipped BOTH shapes
    * across regenerations: parquet TIMESTAMP(NANOS) (surfaced as a nanos
    * LONG under `spark.sql.legacy.parquet.nanosAsLong`) and plain
    * `timestamp[us]` (Spark TIMESTAMP_NTZ). Every query doing integral
    * time arithmetic routes through here so a fixture regeneration flips a
    * single branch instead of breaking fifteen call sites. The DuckDB
    * oracles need no type branch — `epoch_ns(ts)` is the same value on a
    * micros TIMESTAMP as this long is.
    */
  def eventsNanos(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    ev.withColumn("ts", nanosLong(col("ts"), ev.schema("ts").dataType))
  }

  /** A nanos-since-epoch LONG view of a time column of any fixture shape.
    * TIMESTAMP_NTZ casts through TIMESTAMP under the repo-wide UTC session
    * zone (wall clock == instant), so `unix_micros` is exact; sub-micro
    * precision was already absent from a micros fixture.
    */
  def nanosLong(c: Column, dt: DataType): Column = dt match {
    case LongType => c
    case TimestampType | TimestampNTZType =>
      unix_micros(c.cast(TimestampType)) * lit(1000L)
    case other =>
      throw new IllegalArgumentException(
        s"nanosLong: expected LONG or TIMESTAMP[_NTZ] ts column, got ${other.catalogString}")
  }

  /** An event-time TIMESTAMP view of the same column (for streaming
    * windows/watermarks): nanos-long truncates to µs; timestamp types pass
    * through (NTZ re-typed as TIMESTAMP under the UTC session zone —
    * identical instant, and watermarks need TimestampType).
    */
  def eventTime(c: Column, dt: DataType): Column = dt match {
    // exact integral /1000: Column./ is double division, and a ~1.7e18
    // nanos value does not survive the double round-trip bit-exactly
    case LongType =>
      timestamp_micros((c.cast("decimal(20,0)") / lit(1000)).cast(LongType))
    case TimestampType => c
    case TimestampNTZType => c.cast(TimestampType)
    case other =>
      throw new IllegalArgumentException(
        s"eventTime: expected LONG or TIMESTAMP[_NTZ] ts column, got ${other.catalogString}")
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
