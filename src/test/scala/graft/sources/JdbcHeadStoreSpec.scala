package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** SQL-backed catalog pointer (`JdbcHeadStore`) — the reference's
  * `SqlCatalog` deployment shape: the current-snapshot pointer lives as an
  * Iceberg-`JdbcCatalog`-shaped row in embedded Derby and every commit is a
  * compare-and-swap on `metadata_location`. Pins the CAS semantics, the
  * optimistic-commit abort path, and full catalog-lifecycle equivalence
  * with the file-backed pointer.
  */
class JdbcHeadStoreSpec extends SparkSpec {

  import spark.implicits._

  private def newDbUrl(): String =
    s"jdbc:derby:${Files.createTempDirectory("graft-derby")}/db;create=true"

  private def writeParquet(rows: Seq[(Long, String)], dir: String): Seq[String] = {
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    CompactionRunner.listParquet(dir)
  }

  test("store CAS semantics: create/read/advance, stale swap loses, duplicate create rejected") {
    val url = newDbUrl()
    val store = new JdbcHeadStore(url, "cat1")

    assert(!store.exists("t"))
    store.create("t", 1L)
    assert(store.exists("t") && store.read("t") == 1L)
    intercept[IllegalArgumentException](store.create("t", 1L))

    assert(store.cas("t", 1L, 2L))
    assert(store.read("t") == 2L)
    // a committer holding the OLD pointer must lose, and lose atomically
    assert(!store.cas("t", 1L, 3L))
    assert(store.read("t") == 2L)

    // a second connection to the same database sees and can advance the row
    val other = new JdbcHeadStore(url, "cat1")
    assert(other.read("t") == 2L)
    assert(other.cas("t", 2L, 3L))
    assert(store.read("t") == 3L)

    // same table name under a different catalog_name is a separate row
    val foreign = new JdbcHeadStore(url, "cat2")
    assert(!foreign.exists("t"))
  }

  test("full catalog lifecycle on the SQL pointer matches the file-backed catalog; no HEAD file") {
    val url = newDbUrl()
    val base = Files.createTempDirectory("graft-jdbc-base").toString
    val out = Files.createTempDirectory("graft-jdbc-out").toString
    val files = writeParquet((1L to 60L).map(k => (k, s"v$k")), s"$base/b0")

    def runLifecycle(cat: GraftCatalog): Seq[(Long, String)] = {
      cat.createTable("t", files.map(DataFileTask(_, 1L)))
      cat.upsert(spark, "t", Seq((1L, "NEW")).toDF("k", "v"), Seq("k"),
        s"$out/up-${java.util.UUID.randomUUID()}")
      cat.deleteWhere(spark, "t", col("k") > 55,
        s"$out/del-${java.util.UUID.randomUUID()}")
      cat.compactTable(spark, "t", s"$out/cmp-${java.util.UUID.randomUUID()}")
      cat.scanTable(spark, "t").select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    }

    val jdbcRoot = Files.createTempDirectory("graft-jdbc-cat").toString
    val jdbcCat = new GraftCatalog(jdbcRoot, Some(new JdbcHeadStore(url, "lc")))
    val fileCat = new GraftCatalog(
      Files.createTempDirectory("graft-file-cat").toString)

    val viaJdbc = runLifecycle(jdbcCat)
    val viaFile = runLifecycle(fileCat)
    assert(viaJdbc == viaFile)
    assert(viaJdbc.head == (1L, "NEW") && viaJdbc.size == 55)
    // the pointer lives in SQL: the table directory has no HEAD file
    assert(!Files.exists(java.nio.file.Paths.get(jdbcRoot, "t", "HEAD")))
  }

  /** Delegating store that lets a foreign committer win the race exactly
    * once, between a commit's snapshot read and its swap — the interleaving
    * a filesystem lock cannot prevent across drivers on different hosts.
    */
  private final class RacingStore(inner: JdbcHeadStore, foreign: JdbcHeadStore)
      extends GraftCatalog.HeadStore {
    @volatile var interleaveForeignCommit = false
    override def exists(t: String): Boolean = inner.exists(t)
    override def create(t: String, id: Long): Unit = inner.create(t, id)
    override def read(t: String): Long = inner.read(t)
    override def cas(t: String, expected: Long, next: Long): Boolean = {
      if (interleaveForeignCommit) {
        interleaveForeignCommit = false
        assert(foreign.cas(t, expected, expected + 1000))
      }
      inner.cas(t, expected, next)
    }
    override def remove(t: String): Unit = inner.remove(t)
  }

  test("optimistic-commit conflict: a foreign driver's interleaved commit aborts ours, typed") {
    val url = newDbUrl()
    val base = Files.createTempDirectory("graft-race-base").toString
    val racing = new RacingStore(
      new JdbcHeadStore(url, "race"), new JdbcHeadStore(url, "race"))
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-race-cat").toString, Some(racing))
    val f0 = writeParquet((1L to 10L).map(k => (k, s"v$k")), s"$base/b0")
    cat.createTable("t", f0.map(DataFileTask(_, 1L)))

    racing.interleaveForeignCommit = true
    val e = intercept[GraftError.Metadata] {
      cat.commitRewrite("t",
        writeParquet(Seq((11L, "v11")), s"$base/b1").map(DataFileTask(_, 2L)), Nil)
    }
    assert(e.getMessage.contains("commit conflict"))
    // the foreign pointer advance won; our snapshot was not installed
    assert(racing.read("t") == 1001L)

    // heal the pointer and the same commit succeeds (caller-retry contract)
    assert(racing.cas("t", 1001L, 1L))
    val snap = cat.commitRewrite("t",
      writeParquet(Seq((12L, "v12")), s"$base/b2").map(DataFileTask(_, 2L)), Nil)
    assert(snap == 2L && cat.loadTable("t").size == f0.size + 1)
  }

  test("commit storm: interleaved committers through two catalog instances lose no commit") {
    val url = newDbUrl()
    val root = Files.createTempDirectory("graft-storm-cat").toString
    val base = Files.createTempDirectory("graft-storm-base").toString
    val catA = new GraftCatalog(root, Some(new JdbcHeadStore(url, "storm")))
    val catB = new GraftCatalog(root, Some(new JdbcHeadStore(url, "storm")))
    catA.createTable("t",
      writeParquet(Seq((0L, "v0")), s"$base/b0").map(DataFileTask(_, 1L)))

    val commits = 12
    val threads = (1 to commits).map { i =>
      new Thread(() => {
        val cat = if (i % 2 == 0) catA else catB
        val files = writeParquet(Seq((i.toLong, s"v$i")), s"$base/b$i")
        cat.commitRewrite("t", files.map(DataFileTask(_, i + 1L)), Nil)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())

    assert(catA.currentSnapshotId("t") == 1L + commits)
    assert(catB.loadTable("t").size == 1 + commits)
    // every intermediate snapshot id was installed exactly once
    assert(catA.snapshotIds("t") == (1L to (1L + commits)))
  }
}
