package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge-on-read (MoR) delete application — the reference's core computation.
  *
  * The reference generates one SQL query over three registered tables
  * (`SqlBuilder::build_merge_on_read_sql`,
  * reference `core/src/executor/datafusion/datafusion_processor.rs:254-308`):
  *
  * {{{
  * SELECT <user cols> FROM data
  *   LEFT ANTI JOIN pos_deletes ON file_path = file_path AND pos = pos
  *   LEFT ANTI JOIN eq_deletes_i ON <eq cols equal> AND data.seq < del.seq
  * }}}
  *
  * Here the same plan is declared directly with the DataFrame API so Catalyst
  * plans the physical joins. Scale notes (100 TB):
  *   - Position deletes join on (file_path, pos) — pure equi keys, so Spark
  *     picks shuffled-hash/sort-merge, or broadcast when the delete side is
  *     small (the common case: deletes are a fraction of data). AQE can
  *     convert to broadcast at runtime from actual sizes.
  *   - Equality deletes have equi keys (the equality_ids columns) plus the
  *     `data.seq < del.seq` inequality. Passing the equi conjuncts explicitly
  *     keeps Catalyst on a hash-based join with the `<` as a join residual —
  *     never a nested-loop join.
  *   - Consecutive delete groups fold left, matching the reference's chained
  *     `LEFT ANTI JOIN`s (`datafusion_processor.rs:281-304`).
  */
object MorPlanner {

  /** Hidden column names, as in the reference (`datafusion_processor.rs:37-40`). */
  val SeqNumCol = "sys_hidden_seq_num"
  val FilePathCol = "sys_hidden_file_path"
  val PosCol = "sys_hidden_pos"
  val HiddenCols: Seq[String] = Seq(SeqNumCol, FilePathCol, PosCol)

  /** One equality-delete table: projected equality columns + seq_num.
    * Mirrors reference grouping of consecutive delete files sharing an
    * `equality_ids` vector (`datafusion_processor.rs:376-400`).
    */
  final case class EqualityDeleteGroup(df: DataFrame, equalityCols: Seq[String])

  /** Drop data rows whose (file_path, pos) appears in the position-delete set.
    * Reference: `datafusion_processor.rs:267-277`.
    */
  def applyPositionDeletes(data: DataFrame, posDeletes: DataFrame): DataFrame =
    data.join(posDeletes, Seq(FilePathCol, PosCol), "left_anti")

  /** `col()` PARSES its argument (dots select struct fields), so every
    * data-column name interpolated into a reference must be backtick-quoted
    * — a column literally named `a.b` (legal through the DataFrame API)
    * would otherwise resolve as field `b` of column `a`, failing the read
    * or silently joining the wrong column. Names never contain backticks
    * (the writer path rejects them); the doubling keeps even those exact.
    */
  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Drop data rows equal on the group's equality columns AND strictly older
    * than the delete (`seq_num <` guard). Reference: `datafusion_processor.rs:281-304`.
    */
  def applyEqualityDeletes(data: DataFrame, group: EqualityDeleteGroup): DataFrame = {
    // a delete group with NO equality columns is corrupt metadata (Iceberg
    // requires equality_ids non-empty); matching "every row" would be
    // silent data loss and reduce() would throw an unnamed error mid-plan
    require(group.equalityCols.nonEmpty,
      "equality-delete group with no equality columns — corrupt delete " +
        "metadata (Iceberg requires non-empty equality_ids)")
    // Alias both sides so the join resolves even when the delete frame shares
    // lineage with the data frame (e.g. deletes derived from the same scan).
    val d = data.as("graft_mor_d")
    val del = group.df.as("graft_mor_del")
    val equi: Column = group.equalityCols
      .map(c => col(s"graft_mor_d.${quoted(c)}") === col(s"graft_mor_del.${quoted(c)}"))
      .reduce(_ && _)
    val cond = equi &&
      (col(s"graft_mor_d.$SeqNumCol") < col(s"graft_mor_del.$SeqNumCol"))
    d.join(del, cond, "left_anti")
  }

  /** Full MoR merge: position deletes, then each equality-delete group in
    * order, then project away the hidden columns (the reference's SELECT list
    * is the user columns only, `datafusion_processor.rs:259-263,406-412`).
    */
  def merge(
      data: DataFrame,
      posDeletes: Option[DataFrame],
      eqDeleteGroups: Seq[EqualityDeleteGroup]): DataFrame = {
    val afterPos = posDeletes.fold(data)(pd => applyPositionDeletes(data, pd))
    val afterEq = eqDeleteGroups.foldLeft(afterPos)(applyEqualityDeletes)
    val userCols = afterEq.columns.filterNot(HiddenCols.contains)
    afterEq.select(userCols.map(c => col(quoted(c))).toSeq: _*)
  }
}
