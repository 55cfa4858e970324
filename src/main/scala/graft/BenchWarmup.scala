package graft

import org.apache.spark.sql.SparkSession

/** Untimed machinery warmup shared by [[Bench]] and [[DriftProbe]] — the
  * same discipline as the session/fixture warmup: JVM-wide ONE-TIME costs
  * (class loading, the row-level-operation rule pipeline's first planning,
  * streaming engine + state-store init, the RocksDB native library, the
  * changelog plan shapes) otherwise land entirely on whichever gate runs
  * first alphabetically and measure as that gate's cost. Everything here
  * runs on a throwaway ~1k-row table; the operators under test still do
  * all of their own work when timed. Best-effort: a warmup failure must
  * never cost the round its bench artifact.
  */
/** Minimal stateful processor for the transformWithState warmup — same
  * operator class as q100's, trivial state.
  */
private[graft] class WarmStatefulProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double), (Long, Double)] {
  import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
  import org.apache.spark.sql.{Encoders, streaming}

  @transient private var state: ValueState[Double] = _

  override def init(outputMode: streaming.OutputMode,
      timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Double](
      "warm", Encoders.scalaDouble, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timers: streaming.TimerValues): Iterator[(Long, Double)] = {
    val prev = if (state.exists()) state.get() else 0.0
    val sum = prev + rows.map(_._2).sum
    state.update(sum)
    Iterator.single((key, sum))
  }
}

object BenchWarmup {

  def run(spark: SparkSession): Unit = {
    try {
      val root = java.nio.file.Files
        .createTempDirectory("graft-bench-warm").toString
      val g = s"gwarm${java.util.UUID.randomUUID().toString.take(8)}"
      spark.conf.set(s"spark.sql.catalog.$g",
        "graft.sources.dsv2.GraftSparkCatalog")
      spark.conf.set(s"spark.sql.catalog.$g.root", root)
      spark.sql(s"CREATE TABLE $g.w (k BIGINT, v DOUBLE) " +
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
      spark.sql(s"INSERT INTO $g.w SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(0, 1000)")
      // streaming engine + a stateful operator under the RocksDB provider
      // (loads the native library) — BEFORE the delete so the append
      // stream sees only append snapshots
      val prevProvider =
        spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      try {
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider")
        val q = spark.readStream.table(s"$g.w")
          .dropDuplicates("k")
          .writeStream.format("memory").queryName(s"${g}_sink")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.catalog.dropTempView(s"${g}_sink")
        // transformWithState has its OWN first-use machinery beyond the
        // dropDuplicates operator above (StatefulProcessor handle +
        // state-schema setup, operator codegen): q100's bench samples
        // spread 1.7–2.8 s against a 1.5 s level (r20 verdict item 6)
        // while a same-session min-of-3 converges to ~1.2 — class-load/
        // JIT cost, warmed here on the same 1k-row throwaway table
        import spark.implicits._
        val q2 = spark.readStream.table(s"$g.w")
          .as[(Long, Double)]
          .groupByKey(_._1)
          .transformWithState(new WarmStatefulProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .writeStream.format("memory").queryName(s"${g}_sink2")
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q2.awaitTermination()
        spark.catalog.dropTempView(s"${g}_sink2")
      } finally prevProvider match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
      // untranslatable predicate -> merge-on-read WriteDelta (the
      // row-level-operation planning pipeline), then a doorway read
      spark.sql(s"DELETE FROM $g.w WHERE k % 2 = 0 AND k % 3 = 0")
      spark.sql(s"SELECT sum(v) FROM $g.w").collect()
      // V1 format doorway + the changelog (single-scan diff) shapes
      val cat = new graft.sources.GraftCatalog(root)
      spark.read.format("graft").option("root", root).option("table", "w")
        .load().count()
      val head = cat.currentSnapshotId("w")
      cat.changelog(spark, "w", head - 1, head)
        .write.mode("overwrite").format("noop").save()
      ()
    } catch {
      // NonFatal only (r20 advice): a warmup OOM/VM error must surface, not
      // leave the bench silently running on a degraded JVM — the warmup
      // exists to stabilize the very timings that degradation would skew
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"BenchWarmup skipped: ${e.getClass.getSimpleName}")
    }
  }
}
