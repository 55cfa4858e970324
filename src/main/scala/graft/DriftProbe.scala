package graft

import org.apache.spark.sql.SparkSession

/** Dev-only drift probe: time a NAMED subset of the declared queries
  * min-of-N on an idle box, with the same session shape and noop-sink
  * evaluation as [[Bench]] — the tool that turns "this query drifted in
  * the round's single-shot bench" into a recorded disposition (real
  * regression vs documented host stall). Usage:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.DriftProbe 3 q27_setops q26_window q4_mor_projection"
  * }}}
  *
  * Prints one JSON line: per-query all N samples plus the min.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DriftProbe <samples> <queryName>...")
    val samples = args(0).toInt
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val avail = Runtime.getRuntime.availableProcessors()
    val cpus = math.min(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(math.min(32, avail)),
      avail)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SPARK_GRAFT_SHUFFLE").map(_.toInt).getOrElse(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id) s").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    graft.operators.MorFixtures.dataTable(spark, sfDir).count()
    graft.operators.DmlFixtures.stageAll(spark, sfDir)
    BenchWarmup.run(spark)
    def fmt(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to samples).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      s""""$name":{"samples":[${ts.map(fmt).mkString(",")}],"min":${fmt(ts.min)}}"""
    }
    spark.stop()
    val line = s"""{"sf":"$sfDir","probe":{${results.mkString(",")}}}"""
    println(line)
    System.err.println(line)
  }
}
