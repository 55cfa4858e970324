package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Table properties (Iceberg's key/value metadata map): set/merge/remove
  * semantics, fork carry, and survival across drop-unrelated operations.
  */
class TablePropertiesSpec extends SparkSpec {

  test("set, merge (last-writer-wins per key), remove, odd characters") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-props-cat").toString)
    cat.createTable("t", Nil)
    assert(cat.tableProperties("t").isEmpty)
    cat.updateTableProperties("t",
      Map("write.target-file-size" -> "134217728", "owner" -> "pipeline"))
    cat.updateTableProperties("t",
      Map("owner" -> "curation", "note" -> "tab\tand=eq chars"))
    assert(cat.tableProperties("t") == Map(
      "write.target-file-size" -> "134217728",
      "owner" -> "curation",
      "note" -> "tab\tand=eq chars"))
    cat.updateTableProperties("t", Map.empty, removals = Set("owner"))
    assert(!cat.tableProperties("t").contains("owner"))
    // a key in both sets is removed (removal is the later intent)
    cat.updateTableProperties("t", Map("x" -> "1"), removals = Set("x"))
    assert(!cat.tableProperties("t").contains("x"))
    // unknown table rejected
    intercept[IllegalArgumentException](
      cat.updateTableProperties("nope", Map("a" -> "b")))
  }

  test("metadata commits assert their base under the table lock") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-props-cas").toString
    val out = Files.createTempDirectory("graft-props-cas-out").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", Nil)
    cat.appendFiles(spark, "t", Seq((1L, "a")).toDF("k", "v"), out)
    val head = cat.currentSnapshotId("t")
    // a STALE base must 409 (GraftError.Metadata) for every metadata-only
    // commit shape — the check runs inside withTableLock, closing the
    // read-then-commit TOCTOU the REST facade used to have
    intercept[GraftError.Metadata](
      cat.updateTableProperties("t", Map("k" -> "v"),
        expectedHead = Some(head - 1)))
    intercept[GraftError.Metadata](
      cat.rollbackTo("t", head, expectedHead = Some(head - 1)))
    intercept[GraftError.Metadata](
      cat.evolveSchema("t", FieldIds.stamp(cat.scanTable(spark, "t").schema),
        expectedHead = Some(head - 1)))
    // the CURRENT base passes, and the operation lands exactly once
    cat.updateTableProperties("t", Map("k" -> "v"), expectedHead = Some(head))
    assert(cat.tableProperties("t")("k") == "v")
    val rolled = cat.rollbackTo("t", head - 1, expectedHead = Some(head))
    assert(rolled == head + 1)
  }

  test("forks inherit properties at fork time; later edits stay independent") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-props-cat").toString)
    cat.createTable("t", Nil)
    cat.updateTableProperties("t", Map("k" -> "v"))
    val fork = cat.forkTable("t", "audit")
    assert(cat.tableProperties(fork) == Map("k" -> "v"))
    cat.updateTableProperties(fork, Map("k" -> "w"))
    assert(cat.tableProperties("t") == Map("k" -> "v"))
    assert(cat.tableProperties(fork) == Map("k" -> "w"))
  }

  test("write.target-file-size-bytes sizes compaction output from metadata") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-tfs-cat").toString)
    val out = Files.createTempDirectory("graft-tfs-out").toString
    cat.createTable("t", Nil)
    // appendFiles records per-file manifest sizes — the metadata the knob
    // derives from
    (0 until 4).foreach(i =>
      cat.appendFiles(spark, "t",
        (1L to 2000L).map(k => (k + i * 10000L, s"v$k")).toDF("k", "v"), out))
    val entries = cat.loadEntries("t").filter(_.kind == "data")
    assert(entries.forall(_.sizeBytes > 0), "append must record sizes")
    val total = entries.map(_.sizeBytes).sum
    val target = total / 3 // expect ceil(total/target) = 3..4 output files

    cat.updateTableProperties("t",
      Map("write.target-file-size-bytes" -> target.toString))
    cat.compactTable(spark, "t", s"$out/c1")
    val n1 = cat.loadEntries("t").count(_.kind == "data")
    assert(n1 >= 3 && n1 <= 4, s"expected ~ceil(total/target) files, got $n1")
    assert(cat.scanTable(spark, "t").count() == 8000L)

    // without the property the caller's (default) partition count governs
    val cat2 = new GraftCatalog(
      Files.createTempDirectory("graft-tfs-cat2").toString)
    cat2.createTable("t", Nil)
    cat2.appendFiles(spark, "t",
      (1L to 2000L).map(k => (k, s"v$k")).toDF("k", "v"), out)
    cat2.compactTable(spark, "t", s"$out/c2",
      graft.sources.CompactionRunner.CompactionConfig(targetPartitions = 2))
    assert(cat2.loadEntries("t").count(_.kind == "data") == 2)
    assert(cat2.scanTable(spark, "t").filter(col("k") <= 10L).count() == 10L)
  }

  test("rename carries properties; drop removes them with the metadata") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-props-cat").toString)
    cat.createTable("t", Nil)
    cat.updateTableProperties("t", Map("k" -> "v"))
    cat.renameTable("t", "t2")
    assert(cat.tableProperties("t2") == Map("k" -> "v"))
    cat.dropTable("t2")
    cat.createTable("t2", Nil)
    assert(cat.tableProperties("t2").isEmpty,
      "a re-created table must not inherit the dropped one's properties")
  }
}
