package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** Write-audit-publish forks: a fork is a metadata copy that takes normal
  * writes and reads without disturbing main; publish atomically adopts the
  * fork's state, refusing when main moved under the audit.
  */
class WapForkSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): (GraftCatalog, String) = {
    val cat = new GraftCatalog(Files.createTempDirectory("graft-wap-cat").toString)
    val base = Files.createTempDirectory("graft-wap-base").toString
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/b0")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$base/b0").map(DataFileTask(_, 1L)))
    (cat, Files.createTempDirectory("graft-wap-out").toString)
  }

  private def ks(cat: GraftCatalog, table: String): Set[Long] =
    cat.scanTable(spark, table).select("k").as[Long].collect().toSet

  test("write-audit-publish: fork writes stay invisible until publish") {
    val (cat, out) = freshTable()
    val fork = cat.forkTable("t", "audit")
    assert(fork == "t@audit")

    // WRITE on the fork; main unchanged
    cat.deleteWhere(spark, fork, col("k") <= 10, out)
    assert(ks(cat, fork) == (11L to 100L).toSet)
    assert(ks(cat, "t") == (1L to 100L).toSet)

    // AUDIT = any read on the fork; PUBLISH adopts its state atomically
    val published = cat.publishFork(fork)
    assert(cat.currentSnapshotId("t") == published)
    assert(ks(cat, "t") == (11L to 100L).toSet)
  }

  test("publish refuses when main advanced past the fork base") {
    val (cat, out) = freshTable()
    val fork = cat.forkTable("t", "audit")
    cat.deleteWhere(spark, fork, col("k") <= 10, out)
    // main moves underneath the audit
    cat.deleteWhere(spark, "t", col("k") === 50L, s"$out/m")
    val err = intercept[GraftError.Metadata] { cat.publishFork(fork) }
    assert(err.getMessage.contains("publish conflict"))
    // main keeps its own history; re-fork and re-apply succeeds
    assert(ks(cat, "t") == ((1L to 49L) ++ (51L to 100L)).toSet)
    val fork2 = cat.forkTable("t", "audit2")
    cat.deleteWhere(spark, fork2, col("k") <= 10, s"$out/f2")
    cat.publishFork(fork2)
    assert(ks(cat, "t") == ((11L to 49L) ++ (51L to 100L)).toSet)
  }

  test("fork copies the partition spec; dropFork removes metadata only") {
    val (cat, out) = freshTable()
    cat.setPartitionSpec("t", Seq(
      GraftCatalog.PartitionFieldDef("kt", "truncate[100]", "k")))
    val fork = cat.forkTable("t", "audit")
    assert(cat.partitionSpec(fork) == cat.partitionSpec("t"))
    cat.dropFork(fork)
    // fork gone, main intact and scannable
    intercept[Exception] { cat.currentSnapshotId(fork) }
    assert(ks(cat, "t") == (1L to 100L).toSet)
    // non-forks refuse to drop
    intercept[IllegalArgumentException] { cat.dropFork("t") }
  }

  test("a fork re-bases onto its own publish and stays publishable") {
    val (cat, out) = freshTable()
    val fork = cat.forkTable("t", "audit")
    cat.deleteWhere(spark, fork, col("k") <= 10, s"$out/f1")
    cat.publishFork(fork)
    // second audited batch on the SAME fork: no one else moved main, so
    // the re-based fork publishes cleanly
    cat.deleteWhere(spark, fork, col("k") > 90, s"$out/f2")
    cat.publishFork(fork)
    assert(ks(cat, "t") == (11L to 90L).toSet)
    // a foreign commit still conflicts the third publish
    cat.deleteWhere(spark, "t", col("k") === 50L, s"$out/m")
    cat.deleteWhere(spark, fork, col("k") === 60L, s"$out/f3")
    intercept[GraftError.Metadata] { cat.publishFork(fork) }
  }

  test("forking a fork is rejected; fork survives republish inspection") {
    val (cat, out) = freshTable()
    val fork = cat.forkTable("t", "audit")
    intercept[IllegalArgumentException] { cat.forkTable(fork, "nested") }
    cat.deleteWhere(spark, fork, col("k") <= 10, out)
    cat.publishFork(fork)
    // the fork remains readable after publish (inspectable staging history)
    assert(ks(cat, fork) == (11L to 100L).toSet)
  }
}
