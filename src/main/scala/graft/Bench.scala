package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Emits ONE JSON line on stdout AND writes the same line to
  * /tmp/bench.json (sbt prefixes stdout with `[info]`, which broke the
  * driver's parse in round 1 — the file copy is the machine-readable signal).
  * A failed query is recorded as -1 in `queries` and listed under `errors`
  * instead of silently counting its elapsed time as a success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session/codegen/shuffle-service init otherwise lands
    // entirely on whichever query runs first.
    spark.range(100000).selectExpr("sum(id) s").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val errors = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // noop sink forces full evaluation of every output column —
        // count() would let Catalyst prune the projections away and time
        // row-level queries as bare scans
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable => errors += s"$name: ${e.getClass.getSimpleName}"; false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errJson = errors.map(e => "\"" + e.replace("\"", "'") + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("/tmp/bench.json"), line)
    println(line)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
