package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only phase profiler for the DML gates (NOT a declared query; never
  * referenced by Bench/Verify). Times each statement of a q136/q145-shaped
  * run and counts Spark jobs per phase.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val avail = Runtime.getRuntime.availableProcessors()
    val cpus = math.min(32, avail)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id) s").collect()
    graft.operators.DmlFixtures.stageAll(spark, sfDir)

    @volatile var jobs = 0
    val jobInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        jobs += 1
        val stages = s.stageInfos.map(si => si.name.take(60)).mkString(" | ")
        val desc = Option(s.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(s.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobInfo.put(s.jobId, (s"$desc :: $stages", s.time, 0L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        jobInfo.computeIfPresent(e.jobId,
          (_, v) => (v._1, v._2, e.time)); ()
      }
    })

    // GRAFT_RULES=1 additionally prints each phase's top Catalyst rules
    // (resetMetrics per phase), splitting the driver-side wall between
    // analyzer/optimizer tax and everything else (commit IO, scan planning)
    val ruleDump = sys.env.get("GRAFT_RULES").contains("1")
    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs
      val ids0 = new java.util.HashSet(jobInfo.keySet())
      if (ruleDump)
        org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-28s ${dt}%6.2f s  jobs=${jobs - j0}")
      import scala.jdk.CollectionConverters._
      jobInfo.asScala.toSeq.filterNot(kv => ids0.contains(kv._1))
        .sortBy(_._1).foreach { case (id, (desc, t0j, t1j)) =>
          val d = if (t1j > 0) (t1j - t0j) / 1e3 else -1.0
          println(f"    job $id%-4d ${d}%8.3f s  ${desc.take(160)}")
        }
      if (ruleDump) {
        val dump = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
        dump.linesIterator.find(_.startsWith("Total time:"))
          .foreach(l => println(s"    RULES $l"))
        dump.linesIterator.filter(_.startsWith("org."))
          .take(5)
          .foreach(l => println("    RULE " + l.replaceAll("\\s+", " ").take(150)))
      }
      r
    }

    for (mode <- Seq("cow", "mor"); rep <- 1 to 2) {
      println(s"=== run $mode #$rep ===")
      val t0all = System.nanoTime()
      val root = java.nio.file.Files.createTempDirectory("graft-devprof").toString
      val cat = new graft.sources.GraftCatalog(s"$root/cat")
      phase("createTable") {
        cat.createTable("lineitem",
          graft.operators.DmlFixtures.lineitemSliceTasks(spark, sfDir))
      }
      phase("props") {
        if (mode == "cow")
          cat.updateTableProperties("lineitem",
            Map("write.cow.group-filter" -> "false"))
        else
          cat.updateTableProperties("lineitem", Map(
            "write.delete.mode" -> "merge-on-read",
            "write.update.mode" -> "merge-on-read",
            "write.merge.mode" -> "merge-on-read"))
      }
      val g = s"gdev_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
      spark.conf.set(s"spark.sql.catalog.$g.root", s"$root/cat")
      phase("DELETE") {
        spark.sql(
          s"DELETE FROM $g.lineitem WHERE l_returnflag = 'A' AND l_quantity < 25")
      }
      phase("UPDATE") {
        spark.sql(
          s"UPDATE $g.lineitem SET l_quantity = l_quantity + 100 WHERE l_returnflag = 'R'")
      }
      phase("merge-src") {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .filter(col("l_orderkey") <= 2000)
          .select(col("l_orderkey"), col("l_linenumber"))
          .distinct()
          .createOrReplaceTempView("dev_src")
      }
      phase("MERGE") {
        spark.sql(
          s"""MERGE INTO $g.lineitem t USING dev_src s
            |ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
            |WHEN MATCHED AND t.l_quantity > 120 THEN DELETE
            |WHEN MATCHED THEN UPDATE SET l_quantity = t.l_quantity + 7""".stripMargin)
      }
      phase("final-agg") {
        cat.scanTable(spark, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
          .write.mode("overwrite").format("noop").save()
      }
      println(f"TOTAL ${(System.nanoTime() - t0all) / 1e9}%6.2f s")
    }
    // top Catalyst rules by cumulative time across the whole run — names
    // the analyzer/optimizer tax, including any injected extension rules
    println("=== rule time spent ===")
    println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
