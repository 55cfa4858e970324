package graft.operators

import graft.Tables
import graft.sources.CompactionRunner.DataFileTask
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bounded, session-shared inputs for the catalog-DML gates (q114–q123).
  *
  * Each of those gates builds a THROWAWAY catalog table and runs real write
  * IO against it (compaction fanout, delete-file commits, merge rewrites).
  * The operators under test are metadata-bounded by design — what is NOT
  * bounded is the gate's setup IO, which previously scanned-and-rewrote the
  * full scale-factor lineitem two to three times per gate: at sf0.1 on a
  * noisy box that measured as 10–35× the operator's own cost (q121: 174 s
  * for a metadata-only range delete, all of it the 600 k-row setup rewrite).
  *
  * The fix is a capped slice: `l_orderkey <= SliceMaxKey` (~60 k rows at
  * every SF), staged ONCE per (session, sfDir) and shared by every DML gate.
  * Below the cap (sf0.001/sf0.01 — the correctness gate) the slice is the
  * whole table and the fixture parquet is used directly, so the
  * DuckDB-checked surface is byte-identical to the uncapped gates. The
  * oracles state the same cap in SQL (`WHERE l_orderkey <= 60000`), so
  * which rows participate never depends on engine-side staging.
  *
  * This caps the GATE, not the operator: the operators' scale story is
  * carried by the plan-shape suites (StatsPruningSpec, RangeDeleteSpec,
  * SCALING.md probes), where IO is asserted, not timed.
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

  private val staged =
    scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  /** Data-file tasks for the sliced lineitem: the fixture file itself when
    * the cap covers every key (no copy, no IO), else a once-per-session
    * staged parquet of the slice (two files — multi-file tables are the
    * code path the catalog actually serves).
    */
  def lineitemSliceTasks(spark: SparkSession, sfDir: String): Seq[DataFileTask] =
    staged.getOrElseUpdate(sfDir, {
      val full = Tables.lineitem(spark, sfDir)
      val maxKey = full.agg(max(col("l_orderkey"))).head().getLong(0)
      if (maxKey <= SliceMaxKey) Seq(s"$sfDir/lineitem.parquet")
      else {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-dml-slice").toString
        full.filter(col("l_orderkey") <= SliceMaxKey)
          .coalesce(2).write.parquet(s"$dir/lineitem")
        val files = new java.io.File(s"$dir/lineitem").listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath).sorted.toSeq
        require(files.nonEmpty, s"slice staging produced no parquet under $dir")
        files
      }
    }).map(DataFileTask(_, 1L))
}
