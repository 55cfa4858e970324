package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only phase profiler for the maintenance gates (q138/q146 shape —
  * NOT a declared query; never referenced by Bench/Verify): MoR delete,
  * full compaction, expiry, composed-state SELECT, with per-phase jobs.
  */
object DevProfileMaint {
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
        val stages = s.stageInfos.map(_.name.take(55)).mkString(" | ")
        jobInfo.put(s.jobId, (stages, s.time, 0L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        jobInfo.computeIfPresent(e.jobId, (_, v) => (v._1, v._2, e.time)); ()
      }
    })
    def phase[T](name: String)(f: => T): T = {
      val ids0 = new java.util.HashSet(jobInfo.keySet())
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-22s ${dt}%6.2f s")
      import scala.jdk.CollectionConverters._
      jobInfo.asScala.toSeq.filterNot(kv => ids0.contains(kv._1))
        .sortBy(_._1).foreach { case (id, (desc, t0j, t1j)) =>
          val d = if (t1j > 0) (t1j - t0j) / 1e3 else -1.0
          println(f"    job $id%-4d ${d}%8.3f s  $desc")
        }
      r
    }

    for (rep <- 1 to 2) {
      println(s"=== maint run #$rep ===")
      val t0all = System.nanoTime()
      val root = java.nio.file.Files.createTempDirectory("graft-devmaint").toString
      val cat = new graft.sources.GraftCatalog(s"$root/cat")
      phase("createTable") {
        cat.createTable("lineitem",
          graft.operators.DmlFixtures.lineitemSliceTasks(spark, sfDir))
      }
      phase("mor-delete") {
        cat.deleteWhere(spark, "lineitem", col("l_quantity") >= 30, s"$root/d")
      }
      phase("compact-full") {
        spark.sql(
          s"SELECT snapshot_id FROM graft_compact('$root/cat','lineitem','full')")
          .head()
      }
      phase("expire") {
        spark.sql(
          s"SELECT count(*) FROM graft_expire('$root/cat','lineitem', 1)")
          .head().getLong(0)
      }
      phase("final-select") {
        spark.sql(
          s"""SELECT agg.n, agg.sum_qty, m.n_delete_files
             |FROM (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |      FROM graft_table('$root/cat', 'lineitem')) agg
             |CROSS JOIN
             |     (SELECT CAST(count(*) AS BIGINT) AS n_delete_files
             |      FROM graft_meta('$root/cat', 'lineitem', 'files')
             |      WHERE content <> 'data') m""".stripMargin)
          .write.mode("overwrite").format("noop").save()
      }
      println(f"TOTAL ${(System.nanoTime() - t0all) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
