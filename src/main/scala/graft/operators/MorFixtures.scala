package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic reference-shaped MoR inputs synthesized from `lineitem`
  * (FIXTURES.md §B). Every derivation is a pure column expression (plus one
  * window for per-file row position), so the DuckDB oracle can reproduce the
  * exact same tables from the same parquet — see [[oracleCtes]].
  *
  * Layout simulated:
  *   - 29 synthetic data files `f0..f28`, file of a row = l_orderkey % 29
  *   - per-file sequence number = (l_orderkey % 29) + 1 (constant per file, as
  *     the reference requires — seq is a FileScanTask field,
  *     `iceberg_file_task_scan.rs:265-280`)
  *   - position = 0-based row index within the file under a total order over
  *     ALL columns (duplicate (l_orderkey, l_linenumber) pairs exist in the
  *     synthetic data, so a partial order would make pos nondeterministic)
  *   - position deletes: rows with (l_orderkey + l_linenumber) % 10 = 3
  *   - eq-delete group 1 on (l_orderkey, l_linenumber), seq = l_suppkey % 9
  *     (so the `data.seq < del.seq` guard genuinely filters)
  *   - eq-delete group 2 on (l_partkey, l_suppkey), seq = (l_linenumber % 4) + 3
  *
  * In the real compaction path positions come from the parquet
  * `_metadata.row_index` column (no shuffle) — see
  * [[graft.sources.CompactionRunner]]; the window here exists only so the
  * fixture is SQL-reproducible for the oracle.
  */
object MorFixtures {

  import MorPlanner._

  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** lineitem + hidden columns. Cached per (session, sfDir): the window is
    * the fixture's one expensive step and every MoR query references this
    * table two to four times (data side + delete derivations) — caching
    * computes it once per session instead of once per plan branch.
    */
  def dataTable(spark: SparkSession, sfDir: String): DataFrame = {
    // Self-cleaning lifecycle: entries for stopped sessions are dropped on
    // every access, so long-lived processes cycling SparkSessions don't
    // retain dead-session DataFrames or their persisted blocks.
    memo.keys.filter(_._1.sparkContext.isStopped).foreach(memo.remove)
    memo.getOrElseUpdate((spark, sfDir), buildDataTable(spark, sfDir).cache())
  }

  /** Unpersist and forget all memoized fixture tables (long-lived processes
    * cycling SparkSessions should call this on session teardown).
    */
  def clearCache(): Unit = {
    memo.values.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    memo.clear()
  }

  private def buildDataTable(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val file = concat(lit("f"), (col("l_orderkey") % 29).cast("string"))
    // Total ordering: the synthetic lineitem has duplicate
    // (l_orderkey, l_linenumber) pairs, so ordering by the "key" alone makes
    // tie positions nondeterministic across recomputations/engines. Ordering
    // by every column pins pos up to fully-identical rows (harmless).
    val w = Window.partitionBy(col(FilePathCol))
      .orderBy(li.columns.map(col).toSeq: _*)
    li.withColumn(FilePathCol, file)
      .withColumn(SeqNumCol, (col("l_orderkey") % 29) + 1)
      .withColumn(PosCol, row_number().over(w).cast("long") - 1)
  }

  def positionDeletes(data: DataFrame): DataFrame =
    data.filter((col("l_orderkey") + col("l_linenumber")) % 10 === 3)
      .select(col(FilePathCol), col(PosCol))

  def eqDeleteGroup1(spark: SparkSession, sfDir: String): EqualityDeleteGroup = {
    val li = Tables.lineitem(spark, sfDir)
    val df = li.filter(col("l_partkey") % 17 === 5)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_suppkey") % 9).as(SeqNumCol))
    EqualityDeleteGroup(df, Seq("l_orderkey", "l_linenumber"))
  }

  def eqDeleteGroup2(spark: SparkSession, sfDir: String): EqualityDeleteGroup = {
    val li = Tables.lineitem(spark, sfDir)
    val df = li.filter(col("l_orderkey") % 23 === 7)
      .select(col("l_partkey"), col("l_suppkey"),
        ((col("l_linenumber") % 4) + 3).as(SeqNumCol))
    EqualityDeleteGroup(df, Seq("l_partkey", "l_suppkey"))
  }

  /** DuckDB CTEs mirroring the synthesis above, shared by all MoR oracle SQL.
    * Keep in lock-step with the DataFrame code.
    */
  val oracleCtes: String =
    """WITH data AS (
      |  SELECT l.*,
      |         'f' || CAST(l_orderkey % 29 AS VARCHAR) AS sys_hidden_file_path,
      |         (l_orderkey % 29) + 1 AS sys_hidden_seq_num,
      |         row_number() OVER (PARTITION BY l_orderkey % 29
      |                            ORDER BY l_orderkey, l_partkey, l_suppkey,
      |                                     l_linenumber, l_quantity, l_extendedprice,
      |                                     l_discount, l_tax, l_returnflag,
      |                                     l_linestatus, l_shipdate) - 1 AS sys_hidden_pos
      |  FROM lineitem l),
      |pos_del AS (
      |  SELECT sys_hidden_file_path, sys_hidden_pos FROM data
      |  WHERE (l_orderkey + l_linenumber) % 10 = 3),
      |eq_del_1 AS (
      |  SELECT l_orderkey, l_linenumber, l_suppkey % 9 AS sys_hidden_seq_num
      |  FROM lineitem WHERE l_partkey % 17 = 5),
      |eq_del_2 AS (
      |  SELECT l_partkey, l_suppkey, (l_linenumber % 4) + 3 AS sys_hidden_seq_num
      |  FROM lineitem WHERE l_orderkey % 23 = 7)
      |""".stripMargin
}
