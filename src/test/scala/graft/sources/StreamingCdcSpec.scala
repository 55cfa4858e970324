package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The CHANGELOG stream (round-19): `readChangeFeed` on the V1 source and
  * the DSv2 `.changes` table emit the NET `'I'`/`'D'` rows per snapshot
  * window — exactly the batch changelog's semantics applied
  * snapshot-by-snapshot, checkpoint-recoverable, with the append stream's
  * rewrite contract (fail loudly, or skip under `skipRewrites`).
  */
class StreamingCdcSpec extends SparkSpec {

  import spark.implicits._

  private def drainCdc(
      root: String,
      table: String,
      ckpt: String,
      buf: scala.collection.mutable.ListBuffer[(Long, String, String)],
      skipRewrites: Boolean = false): Unit = {
    var reader = spark.readStream.format("graft")
      .option("root", root).option("table", table)
      .option("readChangeFeed", "true")
    if (skipRewrites) reader = reader.option("skipRewrites", "true")
    val q = reader.load().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        buf ++= b.select("k", "v", "_change_type")
          .as[(Long, String, String)].collect()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("changelog stream equals the batch changelog across a checkpointed restart") {
    val root = Files.createTempDirectory("graft-cdc-cat").toString
    val out = Files.createTempDirectory("graft-cdc-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    cat.appendFiles(spark, "t",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), out)
    val s1 = cat.currentSnapshotId("t")
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val got = scala.collection.mutable.ListBuffer[(Long, String, String)]()
    drainCdc(root, "t", ckpt, got)
    assert(got.toSet == Set((1L, "a", "I"), (2L, "b", "I"), (3L, "c", "I")),
      s"the initial load streams as inserts: $got")

    // between runs: a row-level delete and an append — the restarted
    // stream must emit exactly the batch changelog over the same window
    cat.deleteWhere(spark, "t", col("k") === 2L, s"$out/d")
    cat.appendFiles(spark, "t", Seq((4L, "d")).toDF("k", "v"), out)
    val s3 = cat.currentSnapshotId("t")
    got.clear()
    drainCdc(root, "t", ckpt, got)
    val expect = cat.changelog(spark, "t", s1, s3)
      .select("k", "v", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(got.toSet == expect, s"streamed $got vs batch $expect")
    assert(got.toSet == Set((2L, "b", "D"), (4L, "d", "I")))

    // no new commits: a third run emits nothing (no duplicates)
    got.clear()
    drainCdc(root, "t", ckpt, got)
    assert(got.isEmpty, s"an idle restart must emit nothing: $got")
  }

  test("DSv2 .changes table streams the changelog; rewrites fail or skip") {
    val root = Files.createTempDirectory("graft-cdc-v2").toString
    val g = s"gcdc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $g.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val cat = new GraftCatalog(root)

    def drainV2(ckpt: String,
        buf: scala.collection.mutable.ListBuffer[(Long, String, String)],
        skipRewrites: Boolean = false): Unit = {
      var reader = spark.readStream
      if (skipRewrites) reader = reader.option("skipRewrites", "true")
      val q = reader.table(s"$g.t.changes").writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          buf ++= b.select("k", "v", "_change_type")
            .as[(Long, String, String)].collect()
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val ckpt = Files.createTempDirectory("graft-cdc-v2-ckpt").toString
    val got = scala.collection.mutable.ListBuffer[(Long, String, String)]()
    drainV2(ckpt, got)
    assert(got.toSet == Set((1L, "a", "I"), (2L, "b", "I"), (3L, "c", "I")))

    // a MoR doorway DELETE between runs streams as a 'D' row
    spark.sql(s"DELETE FROM $g.t WHERE k = 2")
    got.clear()
    drainV2(ckpt, got)
    assert(got.toSet == Set((2L, "b", "D")), s"MoR delete must stream D: $got")

    // a compaction rewrite fails the stream by default...
    cat.compactTable(spark, "t", s"$root/t/_data/c1")
    spark.sql(s"INSERT INTO $g.t VALUES (5, 'e')")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainV2(ckpt, got)
    }
    assert(e.getCause.getMessage.contains("skipRewrites"), e.getCause.getMessage)
    // ...and skips under the option: only the post-rewrite append emits
    got.clear()
    drainV2(ckpt, got, skipRewrites = true)
    assert(got.toSet == Set((5L, "e", "I")), s"rewrite skipped, append streams: $got")

    // batch reads refuse with a pointer to the TVF
    val b = intercept[Exception] {
      spark.read.table(s"$g.t.changes").collect()
    }
    assert(b.getMessage != null)
  }
}
