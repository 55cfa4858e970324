package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask

/** Catalog edge cases from the round-15 review: flat-name validation
  * (path traversal / managed-tree shadowing / fork-name collisions),
  * nullCount-only stats surviving the snapshot round-trip, and the
  * 2^53 Long→Double boundary refusing bucket-hash IN pruning.
  */
class CatalogEdgeSpec extends SparkSpec {

  import spark.implicits._

  private def stage(root: String, rows: Seq[(Long, String)]): Seq[String] = {
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(s"$root/b0")
    CompactionRunner.listParquet(s"$root/b0")
  }

  test("flat table names validate: traversal, hidden, managed-tree, fork collisions") {
    val root = Files.createTempDirectory("graft-edge-names").toString
    val cat = new GraftCatalog(root)
    val files = stage(root, Seq((1L, "a"))).map(DataFileTask(_, 1L))
    for (bad <- Seq("..", ".", ".hidden", "_data", "a@b", "a\tb"))
      intercept[IllegalArgumentException](cat.createTable(bad, files))
    // nothing escaped the catalog root
    assert(!Files.exists(java.nio.file.Paths.get(root).getParent.resolve("HEAD")))
    assert(!Files.exists(java.nio.file.Paths.get(root, "HEAD")))
    cat.createTable("fine", files) // sane names still create
    assert(cat.tableExists("fine"))
  }

  test("nullCount-only stats survive the snapshot round-trip") {
    val root = Files.createTempDirectory("graft-edge-nullstats").toString
    val cat = new GraftCatalog(root)
    cat.createTable("t", stage(root, Seq((1L, "a"))).map(DataFileTask(_, 1L)))
    // an appended file whose stats carry ONLY a null count (an all-null
    // column has no min/max) — previously vanished after one round-trip
    cat.commitAppend("t", Seq(GraftCatalog.AddedFile(
      s"$root/extra.parquet", "parquet", 10L, 100L,
      colMins = Map("k" -> "1"), colMaxs = Map("k" -> "9"),
      nullCounts = Map("v" -> 10L, "k" -> 0L))))
    val e = cat.loadEntries("t").find(_.path.endsWith("extra.parquet")).get
    val st = e.stats.get
    assert(st.nullCounts == Map("v" -> 10L, "k" -> 0L),
      s"nullCount-only column 'v' must survive: $st")
    assert(st.colMins == Map("k" -> "1") && st.colMaxs == Map("k" -> "9"),
      "empty bound slots must decode to ABSENT bounds, not empty strings")
  }

  test("IN pruning refuses Longs past the Double round-trip (2^53 boundary)") {
    val root = Files.createTempDirectory("graft-edge-53").toString
    val cat = new GraftCatalog(root)
    val big = (1L << 53) + 1L // toDouble rounds to 2^53 — a DIFFERENT bucket hash
    cat.createTable("t", stage(root, Seq((big, "x"), (5L, "y")))
      .map(DataFileTask(_, 1L)))
    cat.setPartitionSpec("t", Seq(
      GraftCatalog.PartitionFieldDef("kb", "bucket[16]", "k")))
    val all = cat.loadEntries("t").filter(_.kind == "data").map(_.path).toSet
    // the unroundtrippable value must keep EVERY file (hashing the
    // rounded value would prune the covering file — silent wrong result);
    // exact values may still prune
    assert(cat.inKeepPaths(spark, "t", "k", Seq(big)) == all,
      "a 2^53+1 IN value must not prune through the Double-routed hash")
  }
}
