package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.{CompactionConfig, DataFileTask}
import java.nio.file.{Files, Paths}

/** Segmented snapshot metadata — the Iceberg manifest-list shape: a
  * snapshot document is a list of references into immutable entry
  * segments, and additive commits (append, upsert, streaming batches)
  * carry the previous snapshot's segments BY REFERENCE, writing only their
  * own delta as a new segment. The 100 TB claim under test: commit
  * metadata cost is O(files touched), not O(table) — a flat document
  * rewrote (and retained, once per snapshot) every entry on every commit.
  */
class SegmentedSnapshotSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalogWithRoot(): (GraftCatalog, String) = {
    val root = Files.createTempDirectory("graft-seg-cat").toString
    (new GraftCatalog(root), root)
  }

  private def seed(cat: GraftCatalog, n: Long = 200L): Unit = {
    val base = Files.createTempDirectory("graft-seg-base").toString
    (1L to n).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/b0")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$base/b0").map(DataFileTask(_, 1L)))
  }

  /** Segment names referenced by snap-`id`, in order; asserts v2 form. */
  private def refs(root: String, id: Long): Seq[String] = {
    val txt = Files.readString(Paths.get(root, "t", s"snap-$id.tsv"))
    assert(txt.startsWith("#graft-snap-v2"),
      s"snap-$id is not a segmented document")
    txt.split("\n").toSeq.tail.filter(_.nonEmpty).map(_.split("\t")(0))
  }

  private def segFilesOnDisk(root: String): Set[String] = {
    val s = Files.list(Paths.get(root, "t"))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("seg-") && n.endsWith(".tsv")).toSet
    } finally s.close()
  }

  test("append commits carry prior segments by reference, O(delta) documents") {
    val (cat, root) = newCatalogWithRoot()
    seed(cat)
    val out = Files.createTempDirectory("graft-seg-out").toString

    val sizesBefore = scala.collection.mutable.Map[String, Long]()
    (1 to 3).foreach { i =>
      refs(root, cat.currentSnapshotId("t")).foreach { n =>
        sizesBefore(n) = Files.size(Paths.get(root, "t", n))
      }
      cat.appendFiles(spark, "t",
        Seq((1000L + i, s"a$i")).toDF("k", "v"), out)
    }

    // each snapshot's reference list extends the previous one's — identical
    // segment NAMES, no rewrite of carried history
    (2L to cat.currentSnapshotId("t")).foreach { id =>
      val prev = refs(root, id - 1)
      assert(refs(root, id).startsWith(prev),
        s"snap-$id must carry snap-${id - 1}'s segments by reference")
    }
    // carried segment files were not touched by later commits
    refs(root, cat.currentSnapshotId("t")).dropRight(1).foreach { n =>
      sizesBefore.get(n).foreach(sz =>
        assert(Files.size(Paths.get(root, "t", n)) === sz,
          s"carried segment $n was rewritten"))
    }
    // the head document itself is reference lines, not the entry list:
    // it must stay far below the size of the entries it reaches
    val headDoc = Paths.get(root, "t", s"snap-${cat.currentSnapshotId("t")}.tsv")
    val segBytes = refs(root, cat.currentSnapshotId("t"))
      .map(n => Files.size(Paths.get(root, "t", n))).sum
    assert(Files.size(headDoc) < segBytes,
      "snapshot document should be smaller than the segments it references")

    assert(cat.scanTable(spark, "t").count() === 203L)
  }

  test("legacy flat documents parse; the next commit segments the full state") {
    val (cat, root) = newCatalogWithRoot()
    seed(cat)
    val out = Files.createTempDirectory("graft-seg-legacy-out").toString

    // rewrite the current snapshot as the pre-segmentation flat form
    val tdir = Paths.get(root, "t")
    val head = cat.currentSnapshotId("t")
    val flat = refs(root, head).flatMap { n =>
      Files.readString(tdir.resolve(n)).split("\n").filter(_.nonEmpty)
    }.mkString("\n")
    Files.writeString(tdir.resolve(s"snap-$head.tsv"), flat)

    assert(cat.scanTable(spark, "t").count() === 200L,
      "flat legacy document must still serve reads")

    // a commit on top of a flat base cannot carry: full state + delta land
    // in one fresh segment, and carry resumes from there
    val id2 = cat.appendFiles(spark, "t", Seq((9001L, "z")).toDF("k", "v"), out)
    assert(refs(root, id2).length === 1)
    assert(cat.scanTable(spark, "t").count() === 201L)
    val id3 = cat.appendFiles(spark, "t", Seq((9002L, "z")).toDF("k", "v"), out)
    assert(refs(root, id3).startsWith(refs(root, id2)))
  }

  test("additive MoR commits carry; compaction writes fresh segments; results exact") {
    val (cat, root) = newCatalogWithRoot()
    seed(cat)
    val out = Files.createTempDirectory("graft-seg-mor-out").toString

    val baseRefs = refs(root, cat.currentSnapshotId("t"))
    // upsert = data file + eq-delete file, strictly additive entries
    val upId = cat.upsert(spark, "t",
      Seq((1L, "UPDATED"), (5000L, "NEW")).toDF("k", "v"), Seq("k"), out)
    assert(refs(root, upId).startsWith(baseRefs),
      "an upsert must not rewrite carried metadata")

    val expected = (2L to 200L).map(k => (k, s"v$k")) ++
      Seq((1L, "UPDATED"), (5000L, "NEW"))
    assert(cat.scanTable(spark, "t").as[(Long, String)].collect().toSet ===
      expected.toSet)

    // compaction rewrites the file set: the prefix breaks, fresh segment(s)
    val (cmpId, _) = cat.compactTable(spark, "t", out,
      CompactionConfig(targetPartitions = 2))
    assert(refs(root, cmpId).intersect(refs(root, upId)).isEmpty,
      "a full rewrite shares no segment with the pre-compaction snapshot")
    assert(cat.scanTable(spark, "t").as[(Long, String)].collect().toSet ===
      expected.toSet)
  }

  test("expiry garbage-collects segments no retained snapshot references") {
    val (cat, root) = newCatalogWithRoot()
    seed(cat)
    val out = Files.createTempDirectory("graft-seg-gc-out").toString
    (1 to 3).foreach(i =>
      cat.appendFiles(spark, "t", Seq((2000L + i, "g")).toDF("k", "v"), out))
    cat.compactTable(spark, "t", out, CompactionConfig(targetPartitions = 1))

    val expired = cat.expireSnapshots("t", keepLast = 1)
    assert(expired.nonEmpty)
    val retainedRefs = cat.snapshotIds("t")
      .flatMap(id => refs(root, id)).toSet
    assert(segFilesOnDisk(root) === retainedRefs,
      "exactly the referenced segments survive expiry GC")
    assert(cat.scanTable(spark, "t").count() === 203L)
  }

  test("a conflict loser reclaims its fresh segment") {
    val (cat, root) = newCatalogWithRoot()
    seed(cat)
    val out = Files.createTempDirectory("graft-seg-conflict-out").toString
    val tdir = Paths.get(root, "t")
    val head = cat.currentSnapshotId("t")
    // another driver's installed-but-unreferenced document for head+1
    Files.copy(tdir.resolve(s"snap-$head.tsv"),
      tdir.resolve(s"snap-${head + 1}.tsv"))

    val before = segFilesOnDisk(root)
    intercept[GraftError.Metadata] {
      cat.appendFiles(spark, "t", Seq((1L, "x")).toDF("k", "v"), out)
    }
    assert(segFilesOnDisk(root) === before,
      "the losing commit's segment must not leak")
  }
}
