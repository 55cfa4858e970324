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
