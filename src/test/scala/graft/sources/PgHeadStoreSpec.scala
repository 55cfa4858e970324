package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import graft.wire.PgWireClient
import org.apache.spark.sql.functions.col

/** The SQL catalog pointer on a REAL postgres ([[PgHeadStore]] over the
  * hand-rolled v3 wire client) — the reference's deployed `SqlCatalog`
  * shape, previously provable only on embedded Derby. The suite launches
  * its own throwaway postgres (initdb + pg_ctl as the `postgres` system
  * user, trust auth on a loopback port) and pins the SAME contract the
  * Derby suite pins: CAS semantics, catalog-lifecycle equivalence with
  * the file pointer, the optimistic-commit abort, and a cross-instance
  * commit storm losing nothing. Environments without postgres cancel
  * (assume), not fail.
  */
class PgHeadStoreSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  import spark.implicits._
  import PgHeadStoreSpec._

  private def writeParquet(rows: Seq[(Long, String)], dir: String): Seq[String] = {
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    CompactionRunner.listParquet(dir)
  }

  private def store(catalogName: String): PgHeadStore = {
    val s = server.get
    new PgHeadStore("127.0.0.1", s.port, "postgres", "postgres", catalogName)
  }

  override def afterAll(): Unit = {
    PgHeadStoreSpec.stop()
    super.afterAll()
  }

  test("wire client: simple queries, text rows, nulls, errors carry SQLSTATE") {
    assume(server.isDefined, "no runnable postgres in this environment")
    val s = server.get
    val c = new PgWireClient("127.0.0.1", s.port, "postgres", "postgres")
    try {
      val r = c.query("SELECT 1 AS one, NULL::text AS nothing, 'a''b' AS q")
      assert(r.rows == Seq(Seq(Some("1"), None, Some("a'b"))))
      assert(r.commandTag.startsWith("SELECT"))
      val e = intercept[PgWireClient.PgError](c.query("SELECT * FROM no_such"))
      assert(e.sqlState == "42P01", s"undefined_table expected: $e")
      // the connection survives the error (drained to ReadyForQuery)
      assert(c.query("SELECT 2").rows == Seq(Seq(Some("2"))))
    } finally c.close()
  }

  test("store CAS semantics on postgres: advance, stale swap loses, duplicate create rejected") {
    assume(server.isDefined, "no runnable postgres in this environment")
    val st = store("cat1")
    assert(!st.exists("t"))
    st.create("t", 1L)
    assert(st.exists("t") && st.read("t") == 1L)
    intercept[IllegalArgumentException](st.create("t", 1L))

    assert(st.cas("t", 1L, 2L))
    assert(st.read("t") == 2L)
    assert(!st.cas("t", 1L, 3L), "a committer holding the OLD pointer must lose")
    assert(st.read("t") == 2L)

    // a second CONNECTION (fresh socket) sees and can advance the row —
    // the cross-driver serialization postgres row atomicity provides
    val other = store("cat1")
    assert(other.read("t") == 2L)
    assert(other.cas("t", 2L, 3L))
    assert(st.read("t") == 3L)
    // same table name under a different catalog_name is a separate row
    assert(!store("cat2").exists("t"))
    st.remove("t")
    assert(!other.exists("t"))
    other.remove("t") // idempotent
  }

  test("full catalog lifecycle on the postgres pointer matches the file-backed catalog") {
    assume(server.isDefined, "no runnable postgres in this environment")
    val base = Files.createTempDirectory("graft-pg-base").toString
    val out = Files.createTempDirectory("graft-pg-out").toString
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

    val pgRoot = Files.createTempDirectory("graft-pg-cat").toString
    val viaPg = runLifecycle(new GraftCatalog(pgRoot, Some(store("lc"))))
    val viaFile = runLifecycle(new GraftCatalog(
      Files.createTempDirectory("graft-pgfile-cat").toString))
    assert(viaPg == viaFile)
    assert(viaPg.head == (1L, "NEW") && viaPg.size == 55)
    // the pointer lives in postgres: the table directory has no HEAD file
    assert(!Files.exists(java.nio.file.Paths.get(pgRoot, "t", "HEAD")))
  }

  test("doorway mount with headstore=pg: SQL lifecycle commits through postgres") {
    assume(server.isDefined, "no runnable postgres in this environment")
    val s = server.get
    val root = Files.createTempDirectory("graft-pgdoor").toString
    val g = s"gpg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    spark.conf.set(s"spark.sql.catalog.$g.headstore", "pg")
    spark.conf.set(s"spark.sql.catalog.$g.pg.port", s.port.toString)
    spark.conf.set(s"spark.sql.catalog.$g.pg.catalog", "door")
    try {
      spark.sql(s"CREATE TABLE $g.t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $g.t SELECT id, concat('v', id) FROM range(0, 100)")
      spark.sql(s"DELETE FROM $g.t WHERE k >= 90")
      assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 90L)
      // the pointer LIVES in postgres: no HEAD file, and the row advanced
      assert(!Files.exists(java.nio.file.Paths.get(root, "t", "HEAD")),
        "a pg-pointed doorway table must not write a HEAD file")
      val reader = store("door")
      assert(reader.read("t") >= 3L,
        "CREATE + INSERT + DELETE must advance the postgres pointer")
      // a second session-independent catalog over the same root + store
      // reads the same state (cross-driver shape)
      val cat2 = new GraftCatalog(root, Some(store("door")))
      assert(cat2.scanTable(spark, "t").count() == 90L)
      spark.sql(s"DROP TABLE $g.t")
      assert(!reader.exists("t"), "DROP must deregister the postgres pointer")
    } finally {
      GraftCatalog.unbindHeadStore(root)
      Seq("", ".root", ".headstore", ".pg.port", ".pg.catalog")
        .foreach(k => spark.conf.unset(s"spark.sql.catalog.$g$k"))
    }
  }

  test("registry-bound store: storm over per-statement catalogs shares one socket safely") {
    assume(server.isDefined, "no runnable postgres in this environment")
    val s = server.get
    val root = Files.createTempDirectory("graft-pgreg").toString
    val base = Files.createTempDirectory("graft-pgreg-base").toString
    // the doorway shape: one binding per root, every `new GraftCatalog`
    // resolves the SAME memoized store (one socket; per-call synchronized)
    GraftCatalog.bindHeadStore(root, ("spec", s.port),
      () => new PgHeadStore("127.0.0.1", s.port, "postgres", "postgres", "reg"))
    try {
      new GraftCatalog(root).createTable("t",
        writeParquet(Seq((0L, "v0")), s"$base/b0").map(DataFileTask(_, 1L)))
      val commits = 12
      val threads = (1 to commits).map { i =>
        new Thread(() => {
          // a FRESH catalog per statement, like the doorway constructs
          val files = writeParquet(Seq((i.toLong, s"v$i")), s"$base/b$i")
          new GraftCatalog(root)
            .commitRewrite("t", files.map(DataFileTask(_, i + 1L)), Nil)
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      val cat = new GraftCatalog(root)
      assert(cat.currentSnapshotId("t") == 1L + commits)
      assert(cat.snapshotIds("t") == (1L to (1L + commits)))
      // the pointer really is the postgres row
      assert(store("reg").read("t") == 1L + commits)
    } finally GraftCatalog.unbindHeadStore(root)
  }

  test("commit storm through two catalog instances on postgres loses no commit") {
    assume(server.isDefined, "no runnable postgres in this environment")
    val root = Files.createTempDirectory("graft-pgstorm-cat").toString
    val base = Files.createTempDirectory("graft-pgstorm-base").toString
    val catA = new GraftCatalog(root, Some(store("storm")))
    val catB = new GraftCatalog(root, Some(store("storm")))
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

/** Throwaway postgres lifecycle, one per JVM: initdb + pg_ctl under the
  * `postgres` system user (the server refuses to run as root) with trust
  * auth on a free loopback port. `start()` returns None — and every test
  * above cancels — when any step is unavailable.
  */
private object PgHeadStoreSpec {

  final case class Running(dataDir: String, port: Int)

  private def run(cmd: String*): Int = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val outT = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    if (rc != 0) System.err.println(s"[pg-spec] ${cmd.mkString(" ")} -> $rc\n$outT")
    rc
  }

  lazy val server: Option[Running] =
    try {
      val pgCtl = Seq("/usr/local/bin/pg_ctl", "/usr/bin/pg_ctl")
        .find(p => new java.io.File(p).exists())
      val initdb = Seq("/usr/local/bin/initdb", "/usr/bin/initdb")
        .find(p => new java.io.File(p).exists())
      if (pgCtl.isEmpty || initdb.isEmpty) None
      else {
        val dir = Files.createTempDirectory("graft-pg-server").toString
        // postgres refuses root; run the server as the postgres user,
        // which needs to own its data directory
        if (run("chown", "-R", "postgres:postgres", dir) != 0) None
        else if (run("runuser", "-u", "postgres", "--", initdb.get,
            "-D", s"$dir/data", "-A", "trust", "-U", "postgres") != 0) None
        else {
          val sock = new java.net.ServerSocket(0)
          val port = sock.getLocalPort
          sock.close()
          val rc = run("runuser", "-u", "postgres", "--", pgCtl.get,
            "-D", s"$dir/data", "-w", "-t", "30", "-l", s"$dir/log",
            "-o", s"-p $port -c listen_addresses=127.0.0.1 " +
              s"-c unix_socket_directories=$dir",
            "start")
          if (rc != 0) None else Some(Running(s"$dir/data", port))
        }
      }
    } catch { case _: Exception => None }

  def stop(): Unit = server.foreach { s =>
    run("runuser", "-u", "postgres", "--",
      Seq("/usr/local/bin/pg_ctl", "/usr/bin/pg_ctl")
        .find(p => new java.io.File(p).exists()).getOrElse("pg_ctl"),
      "-D", s.dataDir, "-m", "immediate", "stop")
  }
}
