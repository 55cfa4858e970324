package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Writer-side per-file column bounds: doorway writes stamp exact
  * min/max/null-count into their commit messages, so a fresh INSERT is
  * stats-prunable from its first snapshot (before this, only compacted
  * files carried bounds — Iceberg stamps them from writer metrics the
  * same way).
  */
class WriterStatsSpec extends SparkSpec {

  private def row(vals: Any*): InternalRow =
    InternalRow.fromSeq(vals.map {
      case s: String => UTF8String.fromString(s)
      case v => v
    })

  test("accumulates exact numeric/string bounds and null counts") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("d", DoubleType)))
    val st = new WriterStats(schema)
    st.observe(row(5L, "mango", 2.5))
    st.observe(row(-3L, "apple", null))
    st.observe(row(12L, null, 7.25))
    val (mins, maxs, nulls) = st.result()
    assert(mins == Map("k" -> "-3", "v" -> "apple", "d" -> "2.5"))
    assert(maxs == Map("k" -> "12", "v" -> "mango", "d" -> "7.25"))
    assert(nulls == Map("k" -> 0L, "v" -> 1L, "d" -> 1L))
  }

  test("conservative drops: NaN, non-ASCII and oversized strings, all-null") {
    val schema = StructType(Seq(
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("big", StringType), StructField("n", LongType)))
    val st = new WriterStats(schema)
    st.observe(row(1.0, "café", "x" * 100, null))
    st.observe(row(Double.NaN, "abc", "y", null))
    // nulls AFTER the NaN drop: bounds stay dropped but null counting
    // must continue — the manifest COUNT(col) pushdown consumes
    // nullCounts with no bounds check, so an undercount would serve a
    // wrong aggregate
    st.observe(row(null, "abc", "y", null))
    st.observe(row(null, "abc", "y", null))
    val (mins, maxs, nulls) = st.result()
    assert(!mins.contains("d") && !maxs.contains("d"),
      "a NaN-bearing double column must drop its bounds")
    assert(nulls("d") == 2L,
      "null counting must survive the NaN bounds drop")
    assert(!mins.contains("s"), "non-ASCII bounds are dropped (the " +
      "eq-string pruner compares java-lexically, UTF8 binary order diverges)")
    assert(!mins.contains("big"), "oversized string bounds are dropped")
    assert(!mins.contains("n") && nulls("n") == 4L,
      "an all-null column records its null count but no bounds")
  }

  test("doorway INSERT lands stats-prunable files; MoR delta files carry bounds too") {
    val root = Files.createTempDirectory("graft-wstats").toString
    val g = s"gw_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    spark.sql(
      s"""CREATE TABLE $g.t (k BIGINT, v STRING)
         |TBLPROPERTIES ('write.update.mode' = 'merge-on-read')""".stripMargin)
    // two disjoint-range INSERTs -> two stat-stamped generations
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 1000)")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(5000, 6000)")
    val cat = new GraftCatalog(root)
    val data = cat.loadEntries("t").filter(_.kind == "data")
    assert(data.nonEmpty && data.forall(_.stats.isDefined),
      s"every doorway-written file must carry bounds: " +
        data.map(e => (e.path, e.stats)).mkString("; "))
    data.foreach { e =>
      val s = e.stats.get
      assert(s.colMins.keySet == Set("k", "v") && s.nullCounts.values.forall(_ == 0L))
    }
    // the point lookup prunes on the fresh bounds — no compaction ran
    val pruned = cat.scanTableWhere(spark, "t", "k", 5123.0, 5123.0)
    val expected = data.count(e =>
      e.stats.get.colMins("k").toDouble <= 5123 &&
        5123 <= e.stats.get.colMaxs("k").toDouble)
    assert(expected < data.size, "fixture must actually prune")
    assert(pruned.inputFiles.length == expected,
      s"lookup must open $expected of ${data.size} files, " +
        s"got ${pruned.inputFiles.length}")
    assert(spark.sql(s"SELECT v FROM $g.t WHERE k = 5123").head().getString(0)
      == "v5123")
    // MoR UPDATE: the delta's new-row data file carries bounds as well
    spark.sql(s"UPDATE $g.t SET v = concat(v, '!') WHERE k % 500 = 7")
    val fresh = cat.loadEntries("t").filter(e =>
      e.kind == "data" && !data.map(_.path).toSet(e.path))
    assert(fresh.nonEmpty && fresh.forall(_.stats.isDefined),
      "MoR delta data files must carry writer stats")
    assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 2000L)
  }

  test("a rename that REUSES a name never prunes with the old column's bounds") {
    // stats are keyed by column NAME but identity is the field id: after
    // `a -> c` then `b -> a`, a stat recorded for old-a under key "a"
    // describes a column the name no longer binds to. The rename commit
    // strips stats for every name on either side, so pruning goes
    // conservative instead of silently skipping files that hold matches.
    val root = Files.createTempDirectory("graft-wstats-rename").toString
    val g = s"gwr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    spark.sql(s"CREATE TABLE $g.t (a BIGINT, b BIGINT)")
    // disjoint ranges: old-a in [0, 1000), old-b in [100000, 101000)
    spark.sql(s"INSERT INTO $g.t SELECT id, id + 100000 FROM range(0, 1000)")
    val cat = new GraftCatalog(root)
    assert(cat.loadEntries("t").filter(_.kind == "data")
      .forall(_.stats.exists(_.colMins.contains("a"))),
      "fixture needs writer-stamped bounds under the original names")
    spark.sql(s"ALTER TABLE $g.t RENAME COLUMN a TO c")
    spark.sql(s"ALTER TABLE $g.t RENAME COLUMN b TO a")
    // column `a` is now OLD B: a lookup inside old-b's range must find
    // its row — with stale name-keyed bounds ([0, 999] under key "a")
    // stats pruning would skip every file and serve zero rows
    assert(spark.sql(s"SELECT c FROM $g.t WHERE a = 100500").collect()
      .map(_.getLong(0)).toSeq == Seq(500L),
      "pruning must not consult the renamed-away column's bounds")
    assert(cat.loadEntries("t").filter(_.kind == "data").forall(e =>
      e.stats.forall(s => Seq("a", "b", "c").forall(n =>
        !s.colMins.contains(n) && !s.nullCounts.contains(n)))),
      "the rename commits must strip stats for every affected name")
    // COUNT(col) stays exact too (nullCounts for the stripped names gone)
    assert(spark.sql(s"SELECT count(a) FROM $g.t").head().getLong(0) == 1000L)
    // fresh writes stamp stats under the NEW names immediately
    spark.sql(s"INSERT INTO $g.t SELECT id + 2000, id + 200000 FROM range(0, 10)")
    val newest = cat.loadEntries("t").filter(_.kind == "data")
      .maxBy(_.seqNum)
    assert(newest.stats.exists(s =>
      s.colMins.contains("a") && s.colMins.contains("c")))
  }
}
