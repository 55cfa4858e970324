package graft.functions

import graft.{SparkSpec, Tables}
import graft.sources.CompactionRunner._
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("interleaveBits: known vectors, symmetry, clamping") {
    assert(ZOrder.interleaveBits(0, 0) == 0L)
    // all 16 a-bits land on even positions, all b-bits on odd
    assert(ZOrder.interleaveBits(0xFFFFL, 0) == 0x55555555L)
    assert(ZOrder.interleaveBits(0, 0xFFFFL) == 0xAAAAAAAAL)
    assert(ZOrder.interleaveBits(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // a=3 (bits 0,1 → z bits 0,2), b=1 (bit 0 → z bit 1)
    assert(ZOrder.interleaveBits(3, 1) == 7L)
    // out-of-range inputs clamp to [0, 65535]
    assert(ZOrder.interleaveBits(-5, 70000) == 0xAAAAAAAAL)
    // locality: adjacent cells share high bits (same quadrant)
    assert((ZOrder.interleaveBits(40000, 40000) >> 30) ==
      (ZOrder.interleaveBits(40001, 40001) >> 30))
  }

  test("graft_interleave_bits is SQL-callable and matches the kernel") {
    GraftFunctions.registerAll(spark)
    val got = spark.sql(
      "SELECT graft_interleave_bits(CAST(65535 AS BIGINT), CAST(0 AS BIGINT)) z")
      .head().getLong(0)
    assert(got == 0x55555555L)
  }

  test("z-order compaction: tight 2-D file bounds, prunes where linear sort cannot") {
    val table = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Tables.lineitem(spark, sfDir).repartition(2).write.mode("overwrite").parquet(table)
    val tasks = listParquet(table)
      .zipWithIndex.map { case (p, i) => DataFileTask(p, i + 1L) }
    val stats = Seq("l_partkey", "l_suppkey")
    def run(cfg: CompactionConfig): CommitManifest = {
      val out = java.nio.file.Files.createTempDirectory("graft-zorder-out").toString
      compact(spark, tasks, Nil, Nil, out, cfg)
    }
    val plain = run(CompactionConfig(targetPartitions = 8, statsCols = stats))
    val linear = run(CompactionConfig(targetPartitions = 8, statsCols = stats,
      clusterBy = Seq("l_partkey")))
    val zorder = run(CompactionConfig(targetPartitions = 8, statsCols = stats,
      zOrderBy = Seq("l_partkey", "l_suppkey")))
    assert(zorder.outputRecordCount == plain.outputRecordCount)

    // normalized bounding-box area per file: plain files cover ~the whole
    // (partkey, suppkey) space; z-ordered files must cover far less
    val (loA, hiA, loB, hiB) = {
      val r = Tables.lineitem(spark, sfDir).agg(
        min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble,
        r.getLong(2).toDouble, r.getLong(3).toDouble)
    }
    def avgArea(m: CommitManifest): Double = {
      val areas = m.addedFiles.map { f =>
        val wa = (f.colMaxs("l_partkey").toDouble - f.colMins("l_partkey").toDouble) /
          (hiA - loA)
        val wb = (f.colMaxs("l_suppkey").toDouble - f.colMins("l_suppkey").toDouble) /
          (hiB - loB)
        wa * wb
      }
      areas.sum / areas.size
    }
    val (plainArea, zArea) = (avgArea(plain), avgArea(zorder))
    assert(zArea < 0.5 * plainArea,
      s"z-order avg bbox area $zArea not < half of plain $plainArea")

    // a narrow box on the SECOND dimension: linear-on-partkey sorting
    // cannot prune it (every file spans all suppkeys), z-order can
    // wide enough to contain integer keys even at sf0.001 (suppkey 0..9)
    val (lo, hi) = (loB + 0.4 * (hiB - loB), loB + 0.6 * (hiB - loB))
    val keptPlain = pruneByStats(plain.addedFiles, "l_suppkey", lo, hi).size
    val keptLinear = pruneByStats(linear.addedFiles, "l_suppkey", lo, hi).size
    val keptZ = pruneByStats(zorder.addedFiles, "l_suppkey", lo, hi)
    assert(keptPlain == plain.addedFiles.size, "plain unexpectedly prunable")
    assert(keptLinear == linear.addedFiles.size, "linear-on-a unexpectedly prunable on b")
    assert(keptZ.size < zorder.addedFiles.size,
      s"z-order kept all ${keptZ.size} files for the suppkey box")

    // …and the pruned subset is COMPLETE: it holds every matching row
    val prunedRows = spark.read.parquet(keptZ.map(_.path): _*)
      .filter(col("l_suppkey").between(lo, hi)).count()
    val fullRows = spark.read.parquet(zorder.addedFiles.map(_.path): _*)
      .filter(col("l_suppkey").between(lo, hi)).count()
    assert(prunedRows == fullRows && fullRows > 0)
  }
}
