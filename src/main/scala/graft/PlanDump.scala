package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dev-only plan dumper for the optimization-round evidence files: runs the
  * NAMED declared queries and writes each one's `explain("formatted")` to
  * `<outDir>/<name>.txt` — the per-query before/after artifacts the round's
  * plan claims are checked against (`plans/r<N>/<query>_before.txt`).
  *
  * {{{
  * sbt "runMain graft.PlanDump /root/testdata/sf0.001 plans/r20 _after \
  *   q120_changelog q154_spj_deletes"
  * }}}
  *
  * Same session shape as [[ExplainAudit]]. Note the dump runs the query
  * function (gates stage fixtures and assert their in-gate requires), so a
  * dumped plan is the plan of a PASSING gate's returned frame.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <query>...")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"$name$suffix.txt"), plan)
      println(s"dumped $name$suffix")
    }
    spark.stop()
  }
}
