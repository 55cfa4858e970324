package graft.sources.dsv2

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

import graft.sources.{CompactionRunner, GraftCatalog}

/** VECTORIZED position-delete application: serve a pos-delete-bearing
  * SELECT as the scans' own `ColumnarBatch`es, masking deleted row
  * positions inside each batch instead of planning a row-based anti join —
  * the consuming query's `ColumnarToRow` stays the only row conversion
  * (the reference applies deletes inside its batch stream,
  * `iceberg_file_task_scan.rs:283-314`; Iceberg v3's deletion vectors are
  * the same shape). Deletes are sparse in practice, so most batches carry
  * no deleted position and pass through ZERO-COPY (bounds check against
  * the batch's row-index range); only delete-bearing batches pay a
  * selective column copy.
  *
  * Strictly opt-in when PROVABLE, else `None` and the row path serves:
  *  - position deletes only (an equality delete needs value comparison);
  *  - driver-bounded delete set (manifest record counts, ≤ [[MaxDeleteRows]]);
  *  - no row-id request, no COW group filter;
  *  - every schema group serves `required` verbatim (same name, same type
  *    — evolution adaptation would put a Project over the scan and break
  *    the bare columnar peel anyway);
  *  - maskable primitive column types only (the filtered copy is
  *    type-dispatched).
  *
  * Positions come from `_metadata.row_index` exactly like the row path's
  * hidden-column fabrication — selected as the `_metadata` struct so the
  * plan stays a bare scan (extracting a subfield would plan a Project).
  */
private[dsv2] object GraftColumnarMask {

  /** Driver-materialization bound for the broadcast delete set. */
  private val MaxDeleteRows = 4L * 1000 * 1000

  /** Diagnostics for tests: reads served masked-columnar. */
  val maskedServed = new java.util.concurrent.atomic.AtomicLong

  private def maskable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType | StringType => true
    case _ => false
  }

  def serve(
      spark: SparkSession,
      root: String,
      table: String,
      asOf: Option[Long],
      required: StructType,
      filters: Array[Filter],
      runtimeKeep: Option[Set[String]]): Option[Seq[RDD[ColumnarBatch]]] = {
    if (required.isEmpty) return None // COUNT(*) zero-column reads: row path
    // FILTERED reads keep the row path: its pruned-scan routing opens
    // only tuple/stats/bloom-covered files, while this path plans the
    // whole snapshot — masking a point lookup would silently trade one
    // anti join for reading every file. Unfiltered SELECTs (the
    // scan-everything shape masking is for) lose nothing.
    if (filters.nonEmpty) return None
    if (!required.fields.forall(f => maskable(f.dataType))) return None
    val cat = new GraftCatalog(root)
    val entries = asOf match {
      case Some(sid) =>
        if (!cat.snapshotIds(table).contains(sid)) return None
        cat.loadEntriesAt(table, sid)
      case None => cat.loadEntries(table)
    }
    if (entries.exists(e => e.kind != "data" && e.kind != "posdel")) return None
    val pos = entries.filter(_.kind == "posdel")
    if (pos.isEmpty) return None // delete-free: the plain columnar path serves
    if (!pos.forall(_.recordCount >= 0L) ||
        pos.map(_.recordCount).sum > MaxDeleteRows) return None
    val data = entries.filter(e => e.kind == "data" &&
      runtimeKeep.forall(_.contains(e.path)))
    if (data.isEmpty || !data.forall(_.format == "parquet")) return None

    // one bare pinned-schema scan per footer-schema group; every group
    // must carry `required` verbatim or the whole read refuses
    val groups = CompactionRunner.schemaGroups(spark, data.map(_.path))
    val plans: Seq[Option[DataFrame]] = groups.map { case (fileSchema, paths) =>
      val ok = required.fields.forall(rf =>
        fileSchema.fields.exists(ff => ff.name == rf.name && ff.dataType == rf.dataType))
      if (!ok) None
      else try {
        val base = spark.read.schema(fileSchema).parquet(paths: _*)
        val filtered = filters.flatMap(V1FilterColumns.toColumn)
          .foldLeft(base)(_.filter(_)) // pushdown only; peeled below, Spark re-checks
        Some(filtered.select(
          required.fields.map(f => col(f.name)).toIndexedSeq :+ col("_metadata"): _*))
      } catch {
        // e.g. a pushed filter names a column this generation's files
        // lack — the row path's evolution machinery handles it
        case _: org.apache.spark.sql.AnalysisException => None
      }
    }
    if (!plans.forall(_.isDefined)) return None
    val bridge = org.apache.spark.sql.graftbridge.DatasetBridge
    // the raw scan batches: required data columns + FLAT metadata columns
    // (selecting `_metadata` plans a struct-building Project over a scan
    // whose output already carries file_path / row_index — the raw leaf
    // is exactly what masking needs, located by name per group)
    val colRdds = plans.flatten.map(df => bridge.columnarScanRaw(df, peelFilters = true))
    if (!colRdds.forall(_.isDefined)) return None
    final case class Located(dataIdx: Array[Int], fileIdx: Int, rowIdx: Int)
    val located: Seq[Option[Located]] = colRdds.flatten.map { case (_, names) =>
      val dataIdx = required.fields.map(f => names.indexOf(f.name))
      // the leaf scan appends the flat metadata columns AFTER the data
      // columns; search only past the data region so a USER column named
      // file_path / row_index can never be mistaken for the metadata one
      // (masking against user values would silently resurrect deleted rows)
      val metaFrom = required.length
      val fileIdx = names.indexOf("file_path", metaFrom)
      val rowIdx = names.indexWhere(n =>
        n == "row_index" || n == "_tmp_metadata_row_index", metaFrom)
      if (dataIdx.forall(i => i >= 0 && i < metaFrom) && fileIdx >= 0 && rowIdx >= 0)
        Some(Located(dataIdx, fileIdx, rowIdx))
      else None
    }
    if (!located.forall(_.isDefined)) return None

    // driver-side delete set: canonical path -> sorted positions (bounded
    // by MaxDeleteRows above — the same driver-sized metadata posture as
    // the reference's in-memory delete vector). Deletion-vector sidecars
    // ARE this structure on disk — decode them directly; parquet row
    // files collect through one scan.
    val conf = spark.sessionState.newHadoopConf()
    // dispatch on the RECORDED entry format (no per-file sniff; entries
    // always carry it — commits stamp "parquet" or "dv")
    val (dvEntries, pqEntries) = pos.partition(_.format == "dv")
    val (dvFiles, pqFiles) = (dvEntries.map(_.path), pqEntries.map(_.path))
    val pqRows: Seq[(String, Long)] =
      if (pqFiles.isEmpty) Nil
      else spark.read.parquet(pqFiles: _*)
        .select(col("file_path"), col("pos"))
        .collect().toSeq
        .map(r => (CompactionRunner.canonPath(r.getString(0)), r.getLong(1)))
    val dvRows: Seq[(String, Long)] = dvFiles.flatMap(p =>
      graft.sources.DeletionVectors.read(p, conf).iterator.flatMap {
        case (f, ps) => ps.iterator.map(x => (CompactionRunner.canonPath(f), x))
      })
    val byFile: Map[String, Array[Long]] = (pqRows ++ dvRows)
      .groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).distinct.sorted.toArray }
    val bc = spark.sparkContext.broadcast(byFile)

    Some(colRdds.flatten.zip(located.flatten).map { case ((rdd, _), loc) =>
      rdd.mapPartitions({ it =>
        it.map { batch =>
          val n = batch.numRows()
          if (n == 0) strip(batch, loc.dataIdx)
          else {
            val file = CompactionRunner.canonPath(
              batch.column(loc.fileIdx).getUTF8String(0).toString)
            bc.value.get(file) match {
              case None => strip(batch, loc.dataIdx)
              case Some(dels) =>
                val rows = batch.column(loc.rowIdx)
                val first = rows.getLong(0)
                val last = rows.getLong(n - 1)
                // sorted delete positions: bounds check proves most
                // batches untouched without scanning them
                var lo = java.util.Arrays.binarySearch(dels, first)
                if (lo < 0) lo = -lo - 1
                if (lo >= dels.length || dels(lo) > last) strip(batch, loc.dataIdx)
                else copyFiltered(batch, loc.dataIdx, rows, dels, lo, required)
            }
          }
        }
      }, preservesPartitioning = true)
    })
  }

  /** The batch's data columns only (in `required` order) — zero-copy view
    * over the reader's vectors (same consume-before-next contract as
    * serving the original).
    */
  private def strip(batch: ColumnarBatch, dataIdx: Array[Int]): ColumnarBatch = {
    val cols = dataIdx.map(i => batch.column(i): ColumnVector)
    new ColumnarBatch(cols, batch.numRows())
  }

  /** Copy the batch's kept rows (row_index not in `dels`) into fresh
    * on-heap vectors. Only delete-bearing batches pay this.
    */
  private def copyFiltered(
      batch: ColumnarBatch,
      dataIdx: Array[Int],
      rows: ColumnVector,
      dels: Array[Long],
      delStart: Int,
      schema: StructType): ColumnarBatch = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    val n = batch.numRows()
    val keep = new Array[Boolean](n)
    var kept = 0
    var d = delStart
    var r = 0
    while (r < n) {
      val idx = rows.getLong(r)
      while (d < dels.length && dels(d) < idx) d += 1
      val drop = d < dels.length && dels(d) == idx
      keep(r) = !drop
      if (!drop) kept += 1
      r += 1
    }
    val out = OnHeapColumnVector.allocateColumns(kept, schema)
    var c = 0
    while (c < dataIdx.length) {
      val src = batch.column(dataIdx(c))
      val dst = out(c)
      val dt = schema.fields(c).dataType
      var i = 0
      var o = 0
      while (i < n) {
        if (keep(i)) {
          if (src.isNullAt(i)) dst.putNull(o)
          else dt match {
            case BooleanType => dst.putBoolean(o, src.getBoolean(i))
            case ByteType => dst.putByte(o, src.getByte(i))
            case ShortType => dst.putShort(o, src.getShort(i))
            case IntegerType | DateType => dst.putInt(o, src.getInt(i))
            case LongType | TimestampType | TimestampNTZType =>
              dst.putLong(o, src.getLong(i))
            case FloatType => dst.putFloat(o, src.getFloat(i))
            case DoubleType => dst.putDouble(o, src.getDouble(i))
            case StringType =>
              val s = src.getUTF8String(i)
              val b = s.getBytes
              dst.putByteArray(o, b, 0, b.length)
            case other => throw new IllegalStateException(
              s"unmaskable type $other escaped the plan-time guard")
          }
          o += 1
        }
        i += 1
      }
      c += 1
    }
    new ColumnarBatch(out.map(v => v: ColumnVector), kept)
  }
}
