package graft.sources.dsv2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.types._

import graft.sources.{CompactionService, GraftCatalog}

/** The executor-side half of hidden-partitioned DSv2 writes: the table's
  * partition transforms, ANALYZED against the write schema on the driver
  * and bound to row ordinals, so each task can evaluate every row's
  * partition tuple with one unsafe projection (whole-stage-quality codegen,
  * no per-row Column machinery) and fan it out into Iceberg's Hive-layout
  * `name=value/` directories — the same layout the compaction fanout
  * writes and [[GraftCatalog]]'s commit paths recover tuples from
  * (reference fanout: `core/src/executor/datafusion/mod.rs:176-188`).
  *
  * Scale shape: this is Iceberg's fanout writer — one open file per
  * distinct tuple PER TASK, bounded by the partition cardinality the
  * task's slice actually touches. Engine-side clustering (the declared
  * write-order via `RequiresDistributionAndOrdering`) keeps that count
  * low for sorted tables; for bucket specs the worst case is `n` files
  * per task, exactly the trade Iceberg's own fanout writer makes.
  */
final case class PartitionLayout(
    names: Seq[String],
    exprs: Seq[Expression],
    types: Seq[DataType])
    extends Serializable {

  /** Per-task evaluator: row → relative partition directory (`a=1/b=x`). */
  def dirEvaluator(): InternalRow => String = {
    val proj = UnsafeProjection.create(exprs)
    row => {
      val tuple = proj(row)
      names.indices.map { i =>
        val raw = if (tuple.isNullAt(i)) null else tuple.get(i, types(i))
        names(i) + "=" + PartitionLayout.renderValue(raw, types(i))
      }.mkString("/")
    }
  }
}

object PartitionLayout {

  /** Resolve and bind a table's partition transforms against `schema` —
    * driver side, once per write. Analysis (not hand-resolution) so the
    * transform Columns get the same implicit casts and timezone binding
    * any query would.
    */
  def bind(
      spark: SparkSession,
      schema: StructType,
      spec: Seq[GraftCatalog.PartitionFieldDef]): PartitionLayout = {
    val base = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    val cols = spec.map { f =>
      val srcType = schema.fields.find(_.name == f.source).getOrElse(
        throw new IllegalArgumentException(
          s"partition source column '${f.source}' is not in the write schema " +
            s"(${schema.fieldNames.mkString(", ")})")).dataType
      CompactionService.partitionTransform(f.transform, f.source, srcType)
        .as(f.name)
    }
    val analyzed = base.select(cols: _*).queryExecution.analyzed match {
      case p: Project => p
      case other => throw new IllegalStateException(
        s"partition transform projection analyzed to ${other.nodeName}, expected Project")
    }
    // RuntimeReplaceable nodes (to_date/datediff inside the temporal
    // transforms) are only rewritten by the OPTIMIZER, which never runs
    // over this hand-bound projection — eval/codegen on the wrapper
    // asserts. Substitute each with its replacement here (recursively:
    // transformDown re-visits the substituted tree), exactly what the
    // optimizer's ReplaceExpressions rule would do.
    val bound = analyzed.projectList.map(e =>
      BindReferences.bindReference(e, analyzed.child.output)
        .transformDown {
          case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
            r.replacement
        }: Expression)
    PartitionLayout(spec.map(_.name), bound, analyzed.projectList.map(_.dataType))
  }

  /** A catalyst partition value as its Hive path-segment string — the
    * rendering [[GraftCatalog]]'s tuple recovery and the partition pruners
    * read back. Escaping matches Spark's own partitioned writer.
    */
  private[dsv2] def renderValue(v: Any, dt: DataType): String =
    if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    else {
      val s = dt match {
        case StringType => v.toString // UTF8String
        case DateType =>
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
        case TimestampType | TimestampNTZType =>
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .microsToInstant(v.asInstanceOf[Long]).toString
        case _ => String.valueOf(v)
      }
      ExternalCatalogUtils.escapePathName(s)
    }
}
