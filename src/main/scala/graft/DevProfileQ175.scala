package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the q175 streaming-CDC gate (NOT a declared
  * query; never referenced by Bench/Verify). Mirrors q175's statement
  * sequence with per-phase wall timing, twice, to find where the gate's
  * seconds go.
  */
object DevProfileQ175 {
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
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          import scala.jdk.CollectionConverters._
          val d = e.progress.durationMs.asScala.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(s"  BATCH ${e.progress.batchId} rows=" +
            s"${e.progress.numInputRows} $d")
        }
      })

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (rep <- 1 to 2) {
      println(s"=== q175 run #$rep ===")
      val t0all = System.nanoTime()
      val root = java.nio.file.Files.createTempDirectory("graft-devq175").toString
      val g = s"gdev175_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
      spark.conf.set(s"spark.sql.catalog.$g.root", root)
      phase("create+insert-init") {
        spark.sql(s"CREATE TABLE $g.o (o_orderkey BIGINT, o_orderpriority STRING, " +
          "o_totalprice DOUBLE) " +
          "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
        spark.read.parquet(s"$sfDir/orders.parquet")
          .createOrReplaceTempView("dev175_src")
        spark.read.parquet(s"$sfDir/orders.parquet")
          .where("o_orderkey <= 20000")
          .repartitionByRange(4, col("o_orderkey"))
          .createOrReplaceTempView("dev175_init")
        spark.sql(s"INSERT INTO $g.o SELECT o_orderkey, o_orderpriority, " +
          "o_totalprice FROM dev175_init")
      }
      phase("mor-delete") {
        spark.sql(s"DELETE FROM $g.o WHERE o_orderpriority = '1-URGENT' " +
          "AND o_orderkey % 2 = 0")
      }
      phase("insert-2") {
        spark.sql(s"INSERT INTO $g.o SELECT o_orderkey, o_orderpriority, " +
          "o_totalprice FROM dev175_src " +
          "WHERE o_orderkey > 20000 AND o_orderkey <= 30000")
      }
      phase("posdel-require") {
        require(new graft.sources.GraftCatalog(root)
          .loadEntries("o").exists(_.kind == "posdel"), "posdel")
      }
      val sink = java.nio.file.Files.createTempDirectory("graft-devq175-sink")
        .toString + "/rows"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-devq175-ckpt").toString
      def drain(): Unit = {
        val st = graft.sources.dsv2.GraftChangesMicroBatchStream
        val (c0, m0, b0, s0) = (st.planCalls.get, st.memoHits.get,
          st.buildMsTotal.get, st.serveMsTotal.get)
        val q = spark.readStream.table(s"$g.o.changes").writeStream
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              b.write.mode("append").parquet(sink)
              ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        println(s"  PLAN calls=${st.planCalls.get - c0} " +
          s"memoHits=${st.memoHits.get - m0} " +
          s"buildMs=${st.buildMsTotal.get - b0} " +
          s"serveMs=${st.serveMsTotal.get - s0}")
      }
      phase("drain-1")(drain())
      phase("counts-1") {
        spark.read.parquet(sink).groupBy(col("_change_type")).count().collect()
      }
      phase("accounting") {
        spark.sql(
          """SELECT
            |  count(IF(o_orderkey <= 20000, 1, NULL)) AS n_init,
            |  count(IF(o_orderkey <= 20000 AND o_orderpriority = '1-URGENT'
            |           AND o_orderkey % 2 = 0, 1, NULL)) AS n_del,
            |  count(IF(o_orderkey > 20000 AND o_orderkey <= 30000, 1, NULL)) AS n_ins,
            |  count(IF(o_orderkey IN (3, 7, 11), 1, NULL)) AS n_eqdel
            |FROM dev175_src""".stripMargin).head()
      }
      val catR = new graft.sources.GraftCatalog(root)
      val sPre = catR.currentSnapshotId("o")
      phase("eq-delete") {
        spark.sql(s"DELETE FROM $g.o WHERE o_orderkey IN (3, 7, 11)")
      }
      phase("candidates") {
        val sPost = catR.currentSnapshotId("o")
        val postEntries = catR.loadEntriesAt("o", sPost)
        val fromData = catR.loadEntriesAt("o", sPre).filter(_.kind == "data")
        val cand = catR.changelogEqDiffCandidates(spark, "o", fromData,
          postEntries.filter(_.kind == "eqdel"), catR.schemaAt("o", sPost))
        require(cand.exists(c => c.nonEmpty && c.size < fromData.size), s"$cand")
      }
      // decompose the eq-window changelog cost OUTSIDE the stream: build
      // (driver-side bounded reads + DataFrame construction), then each
      // Catalyst phase, then execution via the noop sink
      phase("cl-build") {
        val sPost = catR.currentSnapshotId("o")
        val df = catR.changelog(spark, "o", sPre, sPost)
        phase("cl-analyzed")(df.queryExecution.analyzed)
        phase("cl-optimized")(df.queryExecution.optimizedPlan)
        phase("cl-executed")(df.queryExecution.executedPlan)
        phase("cl-run")(df.write.mode("overwrite").format("noop").save())
      }
      phase("drain-2")(drain())
      phase("counts-2") {
        spark.read.parquet(sink).groupBy(col("_change_type")).count().collect()
      }
      phase("final-agg") {
        spark.read.parquet(sink).groupBy(col("_change_type"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("sum_tp"))
          .write.mode("overwrite").format("noop").save()
      }
      println(f"TOTAL ${(System.nanoTime() - t0all) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
