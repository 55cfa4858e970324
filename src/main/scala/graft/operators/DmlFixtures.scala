package graft.operators

import graft.Tables
import graft.sources.CompactionRunner.{CompactionConfig, DataFileTask}
import graft.sources.GraftCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bounded, session-shared inputs for the catalog-DML gates (q114–q130).
  *
  * Each of those gates builds a THROWAWAY catalog table and runs real write
  * IO against it (compaction fanout, delete-file commits, merge rewrites).
  * The operators under test are metadata-bounded by design — what is NOT
  * bounded is the gate's setup IO, which previously scanned-and-rewrote the
  * full scale-factor lineitem two to three times per gate: at sf0.1 on a
  * noisy box that measured as 10–35× the operator's own cost (q121: 174 s
  * for a metadata-only range delete, all of it the 600 k-row setup rewrite).
  *
  * Two layers of sharing:
  *
  *  1. '''The slice''' — `l_orderkey <= SliceMaxKey` (~60 k rows at every
  *     SF), staged ONCE per (session, sfDir) and shared by every DML gate.
  *     Below the cap (sf0.001/sf0.01 — the correctness gate) the slice is
  *     the whole table and the fixture parquet is used directly, so the
  *     DuckDB-checked surface is byte-identical to the uncapped gates. The
  *     oracles state the same cap in SQL (`WHERE l_orderkey <= 60000`), so
  *     which rows participate never depends on engine-side staging.
  *  2. '''Staged layouts''' — one SHARED catalog per (session, sfDir)
  *     holding the compacted/partitioned tables the gates read
  *     ([[clusteredLineitem]], [[part25kLineitem]], …): the expensive
  *     staging rewrite runs once per session instead of once per gate
  *     (r9 measured the per-gate staging at ~40 s of a 142 s suite).
  *     Read-only gates scan the shared table directly; mutating gates take
  *     a [[forkOf]] first — the catalog's own WAP metadata copy, built for
  *     exactly this — so the shared layout is never disturbed.
  *     [[stageAll]] lets the bench warm all layouts untimed (the same
  *     shared-scaffolding discipline as `MorFixtures.dataTable`).
  *
  * This caps and shares the GATE's fixture, not the operator: the
  * operators' scale story is carried by the plan-shape suites
  * (StatsPruningSpec, RangeDeleteSpec, SCALING.md probes), where IO is
  * asserted, not timed.
  */
object DmlFixtures {

  /** Slice cap, stated identically in every DML-gate oracle. 60 000 keeps
    * sf0.01 (the driver's correctness SF, max key 60 k) exactly full-table.
    */
  val SliceMaxKey = 60000L

  /** The oracle-side restatement of the slice — prepend to each gate's
    * WHERE clause.
    */
  val SliceSql = s"l_orderkey <= $SliceMaxKey"

  private val lock = new Object
  private val staged = scala.collection.mutable.HashMap.empty[String, Seq[String]]

  /** Recursive delete at JVM exit — staged slices and shared catalogs live
    * in java.io.tmpdir; without this a long-running CI box accumulates
    * them. (Deletion is best-effort: a second JVM sharing the directory
    * would re-stage on its next validation miss anyway.)
    */
  private def deleteOnExit(dir: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }, "graft-dml-fixture-cleanup"))

  /** Data-file tasks for the sliced lineitem: the fixture file itself when
    * the cap covers every key (no copy, no IO), else a once-per-session
    * staged parquet of the slice (two files — multi-file tables are the
    * code path the catalog actually serves). Cached paths are re-validated
    * on every call: a tmp reaper (or a test's own cleanup) may have
    * removed the staged directory since, and serving dead paths to
    * createTable would fail far from the cause — a miss simply re-stages.
    */
  def lineitemSliceTasks(spark: SparkSession, sfDir: String): Seq[DataFileTask] =
    lock.synchronized {
      val cached = staged.get(sfDir)
        .filter(_.forall(p => new java.io.File(p).exists()))
      val paths = cached.getOrElse {
        val full = Tables.lineitem(spark, sfDir)
        val maxKey = full.agg(max(col("l_orderkey"))).head().getLong(0)
        val ps =
          if (maxKey <= SliceMaxKey) Seq(s"$sfDir/lineitem.parquet")
          else {
            val dir = java.nio.file.Files
              .createTempDirectory("graft-dml-slice").toString
            deleteOnExit(dir)
            full.filter(col("l_orderkey") <= SliceMaxKey)
              .coalesce(2).write.parquet(s"$dir/lineitem")
            val files = new java.io.File(s"$dir/lineitem").listFiles()
              .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
              .map(_.getAbsolutePath).sorted.toSeq
            require(files.nonEmpty, s"slice staging produced no parquet under $dir")
            files
          }
        staged(sfDir) = ps
        ps
      }
      paths.map(DataFileTask(_, 1L))
    }

  // ---- shared staged catalog (one per session × sfDir) -------------------

  private val sharedRoots = scala.collection.mutable.HashMap.empty[String, String]
  private val stagedTables = scala.collection.mutable.HashSet.empty[(String, String)]

  /** Root directory of the shared staged catalog for `sfDir` (the `root`
    * option q123's `spark.read.format("graft")` needs).
    */
  def sharedRoot(sfDir: String): String = lock.synchronized {
    sharedRoots.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-dml-shared").toString
      deleteOnExit(dir)
      dir
    })
  }

  private def sharedCatalog(sfDir: String): GraftCatalog =
    new GraftCatalog(s"${sharedRoot(sfDir)}/cat")

  /** Ensure staged-table `name` exists in the shared catalog (building it
    * under the fixture lock exactly once per session), and return the
    * catalog + name. The staged table is SHARED — callers must either read
    * it or [[forkOf]] it, never mutate it.
    */
  private def ensure(spark: SparkSession, sfDir: String, name: String)(
      build: (GraftCatalog, String) => Unit): (GraftCatalog, String) =
    lock.synchronized {
      val cat = sharedCatalog(sfDir)
      if (!stagedTables((sfDir, name))) {
        build(cat, name)
        stagedTables += ((sfDir, name))
      }
      (cat, name)
    }

  private def outDir(sfDir: String, name: String): String =
    s"${sharedRoot(sfDir)}/out-$name"

  /** q116/q123's layout: the slice compacted range-clustered with
    * l_orderkey stats persisted into the snapshot (the stats-pruning read
    * path's input).
    */
  def clusteredLineitem(spark: SparkSession, sfDir: String): (GraftCatalog, String) =
    ensure(spark, sfDir, "li_cl") { (cat, t) =>
      cat.createTable(t, lineitemSliceTasks(spark, sfDir))
      cat.compactTable(spark, t, outDir(sfDir, t),
        CompactionConfig(targetPartitions = 8,
          clusterBy = Seq("l_orderkey"), statsCols = Seq("l_orderkey")))
    }

  /** q119's layout: two-field hidden partition spec
    * (`truncate[25000](l_orderkey)`, `bucket[8](l_suppkey)`) fanned out
    * into the Hive layout with per-file partition tuples committed.
    */
  def part25kLineitem(spark: SparkSession, sfDir: String): (GraftCatalog, String) =
    ensure(spark, sfDir, "li_p25k") { (cat, t) =>
      cat.createTable(t, lineitemSliceTasks(spark, sfDir))
      cat.setPartitionSpec(t, Seq(
        // widths sized to the key domain: ~6 truncate values x 8 buckets at
        // sf0.1 (a 250-wide truncate here means 4,800 Hive directories and
        // a 100x slower write - the classic over-partitioning trap)
        GraftCatalog.PartitionFieldDef("ok_t", "truncate[25000]", "l_orderkey"),
        GraftCatalog.PartitionFieldDef("sk_b", "bucket[8]", "l_suppkey")))
      cat.compactTable(spark, t, outDir(sfDir, t),
        CompactionConfig(targetPartitions = 2))
    }

  /** q121's layout: `truncate[2500](l_orderkey)` — partitions narrow
    * enough that a range DELETE fully covers some of them (the
    * metadata-only drop path under test).
    */
  def part2500Lineitem(spark: SparkSession, sfDir: String): (GraftCatalog, String) =
    ensure(spark, sfDir, "li_p2500") { (cat, t) =>
      cat.createTable(t, lineitemSliceTasks(spark, sfDir))
      cat.setPartitionSpec(t, Seq(
        GraftCatalog.PartitionFieldDef("ok_t", "truncate[2500]", "l_orderkey")))
      cat.compactTable(spark, t, outDir(sfDir, t),
        CompactionConfig(targetPartitions = 2))
    }

  /** q124's layout: the documents corpus bucketed `bucket[4](source)` —
    * the per-source point-lookup shape.
    */
  def docsSourceBucketed(spark: SparkSession, sfDir: String): (GraftCatalog, String) =
    ensure(spark, sfDir, "docs_srcb") { (cat, t) =>
      cat.createTable(t, Seq(DataFileTask(s"$sfDir/documents.parquet", 1L)))
      cat.setPartitionSpec(t, Seq(
        GraftCatalog.PartitionFieldDef("src_b", "bucket[4]", "source")))
      cat.compactTable(spark, t, outDir(sfDir, t),
        CompactionConfig(targetPartitions = 2))
    }

  /** q125's layout: documents under `identity(lang)` with per-file record
    * counts — the metadata-table integrity input.
    */
  def docsLangPartitioned(spark: SparkSession, sfDir: String): (GraftCatalog, String) =
    ensure(spark, sfDir, "docs_langp") { (cat, t) =>
      cat.createTable(t, Seq(DataFileTask(s"$sfDir/documents.parquet", 1L)))
      cat.setPartitionSpec(t, Seq(
        GraftCatalog.PartitionFieldDef("lang_p", "identity", "lang")))
      cat.compactTable(spark, t, outDir(sfDir, t),
        CompactionConfig(targetPartitions = 2))
    }

  /** q131's layout: the documents corpus with a content-fingerprint column
    * (`fp = md5(text)`) written ROUND-ROBIN into several files — hashes
    * scatter by construction, so every file's [min,max] straddles every
    * probe and stats pruning keeps everything — then a per-file bloom
    * filter on `fp` recorded into the catalog sidecar. The
    * content-addressed point-lookup shape (an exact-dedup probe by hash)
    * where ONLY the bloom can skip files.
    */
  def docsFingerprinted(spark: SparkSession, sfDir: String): (GraftCatalog, String) =
    ensure(spark, sfDir, "docs_fp") { (cat, t) =>
      val out = outDir(sfDir, t)
      spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("fp", md5(col("text")))
        .repartition(8)
        .write.mode("errorifexists").parquet(out)
      cat.createTable(t,
        graft.sources.CompactionRunner.listParquet(out).map(DataFileTask(_, 1L)))
      cat.recordBloomFilter(spark, t, "fp",
        expectedItemsPerFile = 20000L, fpp = 0.01)
      ()
    }

  /** q135's layout: the documents corpus registered with a DECLARED sort
    * order on doc_id, then compacted through the plain maintenance path —
    * no explicit layout in the config, so the catalog's own write-order
    * metadata drives the range-clustered rewrite and persists the bounds
    * the range scan prunes on.
    */
  def docsSorted(spark: SparkSession, sfDir: String): (GraftCatalog, String) =
    ensure(spark, sfDir, "docs_sorted") { (cat, t) =>
      cat.createTable(t, Seq(DataFileTask(s"$sfDir/documents.parquet", 1L)))
      cat.setSortOrder(t, Seq("doc_id"))
      cat.compactTable(spark, t, outDir(sfDir, t),
        CompactionConfig(targetPartitions = 8))
      ()
    }

  /** q171's staged input: the 3-column orders slice (o_orderkey ≤ 30000)
    * written once per session as a 2-file parquet directory. A plain
    * directory, NOT a shared catalog table: the gate's statsSweep walks
    * its whole catalog, so the stats lifecycle needs a private catalog
    * per invocation — it mounts these files with a metadata-only
    * createTable, and the bench times the lifecycle, not the slice write.
    */
  def orders30kTasks(spark: SparkSession, sfDir: String): Seq[DataFileTask] =
    lock.synchronized {
      val dir = s"${sharedRoot(sfDir)}/src-orders30k"
      // re-validated per call like lineitemSliceTasks: a tmp reaper may
      // have removed the staged directory since — a miss re-stages
      val existing = graft.sources.CompactionRunner.listParquet(dir)
      val files =
        if (stagedTables((sfDir, "src-orders30k")) && existing.nonEmpty) existing
        else {
          spark.read.parquet(s"$sfDir/orders.parquet")
            .where(col("o_orderkey") <= 30000)
            .select(col("o_orderkey"), col("o_orderpriority"),
              col("o_orderstatus"))
            .repartition(2)
            .write.mode("overwrite").parquet(dir)
          stagedTables += ((sfDir, "src-orders30k"))
          graft.sources.CompactionRunner.listParquet(dir)
        }
      files.map(DataFileTask(_, 1L))
    }

  /** q127's layout: orders compacted with stats — the metadata min/max
    * input (mutating gates fork it first).
    */
  def compactedOrders(spark: SparkSession, sfDir: String): (GraftCatalog, String) =
    ensure(spark, sfDir, "orders_c") { (cat, t) =>
      cat.createTable(t, Seq(DataFileTask(s"$sfDir/orders.parquet", 1L)))
      cat.compactTable(spark, t, outDir(sfDir, t),
        CompactionConfig(targetPartitions = 2))
    }

  /** Fork a shared staged table for a gate that MUTATES it — the catalog's
    * own WAP fork (a metadata copy: file lists, schema, partition spec; no
    * data IO). Branch names are unique per call, so bench retries and
    * concurrent suites never collide; forks are never published, so the
    * shared layout stays pristine. Leftover fork metadata is a few TSV
    * files under the session temp root.
    */
  def forkOf(spark: SparkSession, sfDir: String,
      stagedTable: (GraftCatalog, String)): (GraftCatalog, String) = {
    val (cat, t) = stagedTable
    val branch = s"g${java.util.UUID.randomUUID().toString.take(8)}"
    (cat, cat.forkTable(t, branch))
  }

  /** Stage every shared layout (idempotent) — the bench's untimed warmup
    * hook, so gate timings measure the operator under test, not
    * once-per-session fixture IO.
    */
  def stageAll(spark: SparkSession, sfDir: String): Unit = {
    clusteredLineitem(spark, sfDir)
    part25kLineitem(spark, sfDir)
    part2500Lineitem(spark, sfDir)
    docsSourceBucketed(spark, sfDir)
    docsLangPartitioned(spark, sfDir)
    docsFingerprinted(spark, sfDir)
    docsSorted(spark, sfDir)
    compactedOrders(spark, sfDir)
    orders30kTasks(spark, sfDir)
    ()
  }
}
