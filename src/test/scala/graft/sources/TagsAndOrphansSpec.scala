package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

/** Snapshot tags (immutable named refs that protect snapshots from expiry —
  * Iceberg's tags) and the remove-orphans action (grace-period deletion of
  * files no retained snapshot references).
  */
class TagsAndOrphansSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(Files.createTempDirectory("graft-tag-cat").toString)

  private def writeParquet(rows: Seq[(Long, String)], dir: String): Seq[String] = {
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    CompactionRunner.listParquet(dir)
  }

  test("tags: immutable named pointers, time travel by name, survive expiry") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-tag-base").toString
    val f0 = writeParquet(Seq((1L, "v1")), s"$base/b0")
    cat.createTable("t", f0.map(DataFileTask(_, 1L)))
    (2 to 6).foreach { i =>
      cat.commitRewrite("t",
        writeParquet(Seq((i.toLong, s"v$i")), s"$base/b$i").map(DataFileTask(_, i.toLong)),
        Nil)
    }

    cat.tagSnapshot("t", "validated", 2L)
    assert(cat.tags("t") == Map("validated" -> 2L))
    assert(cat.loadTableAtTag("t", "validated").map(_.path).toSet ==
      cat.loadTableAt("t", 2L).map(_.path).toSet)
    // immutable: re-pointing requires an explicit drop
    intercept[IllegalArgumentException](cat.tagSnapshot("t", "validated", 3L))
    intercept[IllegalArgumentException](cat.tagSnapshot("t", "bad", 99L))
    intercept[IllegalArgumentException](cat.loadTableAtTag("t", "nope"))

    // expiry keeps HEAD, the keepLast window, AND the tagged snapshot
    val expired = cat.expireSnapshots("t", keepLast = 2)
    assert(!expired.contains(2L))
    assert(cat.snapshotIds("t").contains(2L))
    assert(cat.loadTableAtTag("t", "validated").nonEmpty)

    // dropping the tag releases it to the next expiry
    cat.dropTag("t", "validated")
    intercept[IllegalArgumentException](cat.dropTag("t", "validated"))
    val expired2 = cat.expireSnapshots("t", keepLast = 2)
    assert(expired2.contains(2L) && !cat.snapshotIds("t").contains(2L))
  }

  test("removeOrphanFiles: deletes aged orphans only; grace period shields recent files") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-orph-base").toString
    val live = writeParquet(Seq((1L, "v1")), s"$base/b0")
    cat.createTable("t", live.map(DataFileTask(_, 1L)))

    // two orphans: one aged past the grace period, one fresh (in-flight shape)
    val aged = writeParquet(Seq((2L, "x")), s"$base/orph-aged")
    val fresh = writeParquet(Seq((3L, "y")), s"$base/orph-fresh")
    aged.foreach(p =>
      new java.io.File(p).setLastModified(System.currentTimeMillis() - 100000))

    val candidates = live ++ aged ++ fresh
    val deleted = cat.removeOrphanFiles("t", candidates, olderThanMillis = 50000)
    assert(deleted.toSet == aged.toSet)
    aged.foreach(p => assert(!new java.io.File(p).exists(), s"aged orphan $p kept"))
    fresh.foreach(p => assert(new java.io.File(p).exists(), s"fresh orphan $p deleted"))
    live.foreach(p => assert(new java.io.File(p).exists(), s"live file $p deleted"))

    // after the grace period the fresh orphan becomes eligible
    fresh.foreach(p =>
      new java.io.File(p).setLastModified(System.currentTimeMillis() - 100000))
    assert(cat.removeOrphanFiles("t", candidates, olderThanMillis = 50000)
      .toSet == fresh.toSet)
  }
}
