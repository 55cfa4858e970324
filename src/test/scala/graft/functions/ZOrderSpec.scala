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

  test("n-dimensional interleave: round-robin bit layout, 2-D case matches binary kernel") {
    // n=2 must agree with the hot allocation-free path on random vectors
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val (a, b) = (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)
      assert(ZOrder.interleaveBitsN(Array(a, b)) == ZOrder.interleaveBits(a, b))
    }
    // 3-D: dimension j owns bits i*3+j → all-ones in one dim paints its lane
    assert(ZOrder.interleave3(0xFFFFL, 0, 0) == 0x249249249249L * 0x1) // bits 0,3,6,…
    assert(ZOrder.interleave3(0, 0xFFFFL, 0) == 0x249249249249L << 1)
    assert(ZOrder.interleave3(0, 0, 0xFFFFL) == 0x249249249249L << 2)
    // 4-D fills the long: every dim all-ones → all 64 bits set
    assert(ZOrder.interleave4(0xFFFFL, 0xFFFFL, 0xFFFFL, 0xFFFFL) == -1L)
    assert(ZOrder.interleave4(0xFFFFL, 0, 0, 0) == 0x1111111111111111L)
  }

  test("graft_interleave_bits is SQL-callable at 2-4 arity and matches the kernel") {
    GraftFunctions.registerAll(spark)
    val got = spark.sql(
      "SELECT graft_interleave_bits(CAST(65535 AS BIGINT), CAST(0 AS BIGINT)) z")
      .head().getLong(0)
    assert(got == 0x55555555L)
    val got3 = spark.sql(
      "SELECT graft_interleave_bits(0L, 65535L, 0L) z").head().getLong(0)
    assert(got3 == (0x249249249249L << 1))
    val got4 = spark.sql(
      "SELECT graft_interleave_bits(65535L, 65535L, 65535L, 65535L) z")
      .head().getLong(0)
    assert(got4 == -1L)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_interleave_bits(1L)").collect()
    }
    assert(err.getMessage.contains("2 to 4"))
  }

  test("3-column z-order compaction clusters all three dimensions") {
    val table = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
    Tables.lineitem(spark, sfDir).repartition(2).write.mode("overwrite").parquet(table)
    val tasks = listParquet(table)
      .zipWithIndex.map { case (p, i) => DataFileTask(p, i + 1L) }
    val stats = Seq("l_partkey", "l_suppkey", "l_orderkey")
    val out = java.nio.file.Files.createTempDirectory("graft-zorder3-out").toString
    val m = compact(spark, tasks, Nil, Nil, out,
      CompactionConfig(targetPartitions = 8, statsCols = stats,
        zOrderBy = stats))
    assert(m.addedFiles.size > 1)
    // every clustered dimension's per-file width must average well under
    // the full range (a plain round-robin write covers ~all of each)
    stats.foreach { c =>
      val r = Tables.lineitem(spark, sfDir)
        .agg(min(col(c)), max(col(c))).head()
      val range = (r.getLong(1) - r.getLong(0)).toDouble
      val widths = m.addedFiles.map(f =>
        (f.colMaxs(c).toDouble - f.colMins(c).toDouble) / range)
      val avg = widths.sum / widths.size
      // 0.85, not a tighter bound: RangePartitioner samples with an
      // rdd.id-derived seed, so boundary jitter varies with SUITE ORDER
      // in a full run — the claim is clustering, not an exact layout
      assert(avg < 0.85, s"dimension $c not clustered: avg width $avg")
    }
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
    // 0.6, not 0.5: range-sampling jitter (rdd.id-seeded, suite-order
    // dependent) can produce one small file that skews the average
    assert(zArea < 0.6 * plainArea,
      s"z-order avg bbox area $zArea not well under plain $plainArea")

    // a narrow box on the SECOND dimension: linear-on-partkey sorting
    // cannot prune it (every file spans all suppkeys), z-order can
    // wide enough to contain integer keys even at sf0.001 (suppkey 0..9)
    val (lo, hi) = (loB + 0.4 * (hiB - loB), loB + 0.6 * (hiB - loB))
    val keptPlain = pruneByStats(plain.addedFiles, "l_suppkey", lo, hi).size
    val keptLinear = pruneByStats(linear.addedFiles, "l_suppkey", lo, hi).size
    val keptZ = pruneByStats(zorder.addedFiles, "l_suppkey", lo, hi)
    // >= size-1, not strict equality: a jitter-tiny range file (see the
    // seeding note above) can cover a narrow suppkey band by chance and
    // become prunable — the CLAIM is that linear/plain layouts are
    // essentially unprunable on the second dimension, which one stray
    // small file does not change
    assert(keptPlain >= plain.addedFiles.size - 1,
      s"plain unexpectedly prunable: kept $keptPlain of ${plain.addedFiles.size}")
    assert(keptLinear >= linear.addedFiles.size - 1,
      s"linear-on-a unexpectedly prunable on b: kept $keptLinear of ${linear.addedFiles.size}")
    assert(keptZ.size < zorder.addedFiles.size,
      s"z-order kept all ${keptZ.size} files for the suppkey box")

    // …and the pruned subset is COMPLETE: it holds every matching row
    val prunedRows = spark.read.parquet(keptZ.map(_.path): _*)
      .filter(col("l_suppkey").between(lo, hi)).count()
    val fullRows = spark.read.parquet(zorder.addedFiles.map(_.path): _*)
      .filter(col("l_suppkey").between(lo, hi)).count()
    assert(prunedRows == fullRows && fullRows > 0)
  }

  test("z-order compaction survives an entirely-NULL cluster column") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft-zorder-null").toString
    // second dimension is all-NULL: its min/max stats row is (null, null),
    // which used to NPE in the ordinal builder (getDouble on a null cell)
    (1L to 100L).map(i => (i, Option.empty[Double]))
      .toDF("k", "dead")
      .repartition(2).write.mode("overwrite").parquet(table)
    val tasks = listParquet(table)
      .zipWithIndex.map { case (p, i) => DataFileTask(p, i + 1L) }
    val out = java.nio.file.Files.createTempDirectory("graft-zorder-null-out").toString
    val m = compact(spark, tasks, Nil, Nil, out,
      CompactionConfig(targetPartitions = 4,
        zOrderBy = Seq("k", "dead")))
    assert(m.outputRecordCount == 100L)
    // the live dimension still clusters: outputs ordered by k-range
    val ks = spark.read.parquet(m.addedFiles.map(_.path): _*)
      .select("k").as[Long].collect().toSet
    assert(ks == (1L to 100L).toSet)
  }
}
