package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog
import org.apache.spark.sql.SparkSession

/** `spark.readStream.table("graft.db.t")` — the DSv2 streaming doorway:
  * same snapshot-offset semantics as the V1 `format("graft")` source
  * (shared [[graft.sources.GraftStreamSource.deltaTasks]]), exactly-once
  * across restarts of one checkpoint, rewrites fail loudly by default.
  */
class GraftV2StreamSpec extends SparkSpec {

  import spark.implicits._

  private def withCatalogSession(root: String)(body: SparkSession => Unit): Unit = {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val clean = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.sources.dsv2.GraftSparkCatalog")
      .config("spark.sql.catalog.graft.root", root)
      .getOrCreate()
    try body(clean)
    finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  private def drain(s: SparkSession, ckpt: String,
      buf: scala.collection.mutable.ListBuffer[Long]): Unit = {
    val q = s.readStream.table("graft.t").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        buf ++= b.select("k").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("maxFilesPerTrigger paces a catching-up stream snapshot-aligned") {
    val root = Files.createTempDirectory("graft-v2s-rate").toString
    val out = Files.createTempDirectory("graft-v2s-rate-out").toString
    withCatalogSession(root) { s =>
      val cat = new GraftCatalog(root)
      cat.createTable("t", Nil)
      // three append commits BEFORE the stream starts — a catching-up
      // stream with a 1-file budget must NOT plan one giant batch
      (1 to 3).foreach { i =>
        cat.appendFiles(s, "t",
          Seq((i.toLong, s"v$i")).toDF("k", "v").repartition(1), out)
      }
      val ckpt = Files.createTempDirectory("graft-v2s-rate-ckpt").toString
      val batches = scala.collection.mutable.ListBuffer[(Long, Seq[Long])]()
      val q = s.readStream.option("maxFilesPerTrigger", "1").table("graft.t")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          batches += ((id, b.select("k")
            .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val nonEmpty = batches.filter(_._2.nonEmpty)
      assert(nonEmpty.size == 3,
        s"1-file budget must pace the 3 single-file commits into 3 " +
          s"batches, got ${batches.map(_._2)}")
      assert(nonEmpty.flatMap(_._2).sorted.toSeq == Seq(1L, 2L, 3L),
        s"paced batches must still stream exactly once: $batches")
      assert(nonEmpty.forall(_._2.size == 1),
        s"no batch may exceed the file budget's rows here: $batches")
    }
  }

  test("maxRowsPerTrigger paces by row budget from recorded counts") {
    val root = Files.createTempDirectory("graft-v2s-rows").toString
    val out = Files.createTempDirectory("graft-v2s-rows-out").toString
    withCatalogSession(root) { s =>
      import s.implicits._
      val cat = new GraftCatalog(root)
      cat.createTable("t", Nil)
      // three 5-row single-file commits before the stream starts
      (0 until 3).foreach { i =>
        cat.appendFiles(s, "t",
          (0 until 5).map(j => (i * 5L + j, s"v$i-$j")).toDF("k", "v")
            .repartition(1), out)
      }
      def batchSizes(rowBudget: Long): Seq[Int] = {
        val ckpt = Files.createTempDirectory("graft-v2s-rows-ckpt").toString
        val sizes = scala.collection.mutable.ListBuffer[Int]()
        val q = s.readStream
          .option("maxRowsPerTrigger", rowBudget.toString).table("graft.t")
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            val n = b.count().toInt
            if (n > 0) sizes += n
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        sizes.toSeq
      }
      // a 5-row budget admits one commit per batch; 10 rows packs two
      assert(batchSizes(5L) == Seq(5, 5, 5))
      assert(batchSizes(10L) == Seq(10, 5))
    }
  }

  test("initial load + append deltas stream exactly once across runs") {
    val root = Files.createTempDirectory("graft-v2s").toString
    val out = Files.createTempDirectory("graft-v2s-out").toString
    withCatalogSession(root) { s =>
      val cat = new GraftCatalog(root)
      cat.createTable("t", Nil)
      cat.appendFiles(s, "t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), out)
      val ckpt = Files.createTempDirectory("graft-v2s-ckpt").toString
      val got = scala.collection.mutable.ListBuffer[Long]()
      drain(s, ckpt, got)
      assert(got.sorted.toSeq == Seq(1L, 2L), s"initial load: $got")
      // two append commits between runs; only the delta streams
      cat.appendFiles(s, "t", Seq((3L, "c")).toDF("k", "v"), out)
      cat.appendFiles(s, "t", Seq((4L, "d")).toDF("k", "v"), out)
      drain(s, ckpt, got)
      assert(got.sorted.toSeq == Seq(1L, 2L, 3L, 4L),
        s"delta-only on the second run: $got")
      // nothing new: a third run emits nothing
      drain(s, ckpt, got)
      assert(got.size == 4)
    }
  }

  test("writeStream.toTable lands exactly-once epoch commits; restart replays skip") {
    val root = Files.createTempDirectory("graft-v2sw").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.sink (k BIGINT, v STRING)")
      val cat = new GraftCatalog(root)
      val srcDir = Files.createTempDirectory("graft-v2sw-src").toString
      val ckpt = Files.createTempDirectory("graft-v2sw-ckpt").toString
      import s.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(s"$srcDir/b1")
      def drainOnce(): Unit = {
        val q = s.readStream.schema("k BIGINT, v STRING")
          .parquet(s"$srcDir/*")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("graft.sink")
        q.awaitTermination()
      }
      drainOnce()
      assert(s.sql("SELECT count(*) FROM graft.sink").head().getLong(0) == 2L)
      val headAfterFirst = cat.currentSnapshotId("sink")
      // a RESTART with nothing new: replayed/empty epochs commit nothing
      drainOnce()
      assert(cat.currentSnapshotId("sink") == headAfterFirst,
        "restart with no new data must not commit")
      assert(s.sql("SELECT count(*) FROM graft.sink").head().getLong(0) == 2L)
      // new source data: exactly the delta lands, one commit
      Seq((3L, "c")).toDF("k", "v").write.mode("append").parquet(s"$srcDir/b2")
      drainOnce()
      assert(s.sql("SELECT k FROM graft.sink ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      // the sink table is a full catalog citizen: MoR delete + read back
      cat.deleteWhere(s, "sink",
        org.apache.spark.sql.functions.col("k") === 2L, s"$root/_d")
      assert(s.sql("SELECT count(*) FROM graft.sink").head().getLong(0) == 2L)
    }
  }

  test("stream round-trip: readStream.table of one graft table into another") {
    val root = Files.createTempDirectory("graft-v2rt").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.src (k BIGINT, v STRING)")
      s.sql("CREATE TABLE graft.dst (k BIGINT, v STRING)")
      s.sql("INSERT INTO graft.src VALUES (1, 'a'), (2, 'b')")
      val ckpt = Files.createTempDirectory("graft-v2rt-ckpt").toString
      def pump(): Unit = {
        val q = s.readStream.table("graft.src")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("graft.dst")
        q.awaitTermination()
      }
      pump()
      assert(s.sql("SELECT count(*) FROM graft.dst").head().getLong(0) == 2L)
      s.sql("INSERT INTO graft.src VALUES (3, 'c')")
      pump()
      assert(s.sql("SELECT k FROM graft.dst ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
        "second pump must move ONLY the delta")
    }
  }

  test("a rewrite snapshot fails the stream loudly by default") {
    val root = Files.createTempDirectory("graft-v2s-rw").toString
    val out = Files.createTempDirectory("graft-v2s-rw-out").toString
    withCatalogSession(root) { s =>
      val cat = new GraftCatalog(root)
      cat.createTable("t", Nil)
      cat.appendFiles(s, "t", Seq((1L, "a")).toDF("k", "v"), out)
      val ckpt = Files.createTempDirectory("graft-v2s-rw-ckpt").toString
      val got = scala.collection.mutable.ListBuffer[Long]()
      drain(s, ckpt, got)
      assert(got.sorted.toSeq == Seq(1L))
      cat.compactTable(s, "t", s"$root/_data/t/gen1")
      val e = intercept[Exception](drain(s, ckpt, got))
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("not an append") || msg.contains("skipRewrites"), msg)
    }
  }
}
