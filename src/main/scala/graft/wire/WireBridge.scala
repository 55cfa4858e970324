package graft.wire

import graft.sources.{CompactionRunner, CompactionService, FieldIds}
import graft.sources.CompactionRunner.{
  CommitManifest, CompactionConfig, DataFileTask, EqDeleteTask, PosDeleteTask}
import graft.wire.CompactorProto._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Semantic layer between the wire messages ([[CompactorProto]]) and the
  * Spark engine: schema descriptors become Spark `StructType`s carrying
  * field-id metadata, scan-task descriptors route into data / pos-delete /
  * eq-delete task lists exactly like the reference's decoder
  * (`core/src/parser/proto.rs:132-144`: pos-deletes drop their projection,
  * eq-deletes project their equality ids), the literal tree decodes to
  * Spark values — including decimals backed by Int128 bytes, beyond-long
  * unscaled values included — and a full `RewriteFilesRequest` becomes one
  * [[CompactionRunner.compact]] call whose manifest encodes back as a
  * `RewriteFilesResponse`.
  */
object WireBridge {

  // ---- schema → Spark ----------------------------------------------------

  /** Iceberg wire type → Spark type, per the repo's wire-type conventions
    * (q36): TIME as micros-since-midnight LONG, the _NS timestamps as
    * nanos LONG (the same `nanosAsLong` convention the events fixture
    * uses), UUID as canonical string, FIXED as binary.
    */
  def toSparkType(t: WireFieldType): DataType = t match {
    case WirePrimitive(kind) => kind match {
      case WirePrimitiveKind.KBoolean => BooleanType
      case WirePrimitiveKind.KInt => IntegerType
      case WirePrimitiveKind.KLong => LongType
      case WirePrimitiveKind.KFloat => FloatType
      case WirePrimitiveKind.KDouble => DoubleType
      case WirePrimitiveKind.KDate => DateType
      case WirePrimitiveKind.KTime => LongType
      case WirePrimitiveKind.KTimestamp => TimestampNTZType
      case WirePrimitiveKind.KTimestamptz => TimestampType
      case WirePrimitiveKind.KTimestampNs => LongType
      case WirePrimitiveKind.KTimestamptzNs => LongType
      case WirePrimitiveKind.KString => StringType
      case WirePrimitiveKind.KUuid => StringType
      case WirePrimitiveKind.KBinary => BinaryType
      case WirePrimitiveKind.KDecimal(p, s) => DecimalType(p, s)
      case WirePrimitiveKind.KFixed(_) => BinaryType
    }
    case WireStructType(fields) => StructType(fields.map(toStructField))
    case WireListType(element) =>
      ArrayType(toSparkType(element.fieldType), containsNull = !element.required)
    case WireMapType(key, value) =>
      MapType(toSparkType(key.fieldType), toSparkType(value.fieldType),
        valueContainsNull = !value.required)
  }

  private def toStructField(f: WireField): StructField = {
    val meta = new MetadataBuilder().putLong(FieldIds.MetaKey, f.id.toLong).build()
    StructField(f.name, toSparkType(f.fieldType), nullable = !f.required, meta)
  }

  def toSparkSchema(s: WireSchema): StructType = StructType(s.fields.map(toStructField))

  // ---- literal → Spark value ---------------------------------------------

  /** Decode a wire literal to the Spark external value for `tpe`. Decimals
    * accept int/long/int128/uint128 backing — the int128 path is how the
    * wire ships unscaled values beyond int64 (`proto.rs:466-476`). The
    * AboveMax/BelowMin sentinels are NOT data values — they only appear in
    * bounds; use [[boundString]] there.
    */
  def literalValue(lit: WireLiteral, tpe: DataType): Any = (lit, tpe) match {
    case (WireLiteral.PBool(v), BooleanType) => v
    case (WireLiteral.PInt(v), IntegerType) => v
    case (WireLiteral.PInt(v), DateType) => java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(v.toLong))
    case (WireLiteral.PLong(v), LongType) => v
    case (WireLiteral.PLong(v), TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(v, 1000000L), (Math.floorMod(v, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (WireLiteral.PLong(v), TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(v, 1000000L), Math.floorMod(v, 1000000L) * 1000L))
    case (WireLiteral.PFloat(v), FloatType) => v
    case (WireLiteral.PDouble(v), DoubleType) => v
    case (WireLiteral.PString(v), StringType) => v
    case (WireLiteral.PBinary(v), BinaryType) => v.toArray
    case (WireLiteral.PInt(v), dt: DecimalType) =>
      java.math.BigDecimal.valueOf(v.toLong, dt.scale)
    case (WireLiteral.PLong(v), dt: DecimalType) =>
      java.math.BigDecimal.valueOf(v, dt.scale)
    case (WireLiteral.PInt128(v), dt: DecimalType) =>
      new java.math.BigDecimal(v.underlying, dt.scale)
    case (WireLiteral.PUInt128(v), dt: DecimalType) =>
      new java.math.BigDecimal(v.underlying, dt.scale)
    case (WireLiteral.LStruct(inner), st: StructType) =>
      require(inner.length == st.fields.length,
        s"struct literal arity ${inner.length} != schema arity ${st.fields.length}")
      Row.fromSeq(inner.zip(st.fields).map {
        case (Some(l), f) => literalValue(l, f.dataType)
        case (None, _) => null
      })
    case (WireLiteral.LList(inner), at: ArrayType) =>
      inner.map {
        case Some(l) => literalValue(l, at.elementType)
        case None => null
      }
    case (WireLiteral.LMap(entries), mt: MapType) =>
      entries.map { case (k, v) =>
        literalValue(k, mt.keyType) ->
          v.map(literalValue(_, mt.valueType)).orNull
      }.toMap
    case (WireLiteral.AboveMax | WireLiteral.BelowMin, _) =>
      throw new IllegalArgumentException(
        s"$lit is a bounds sentinel, not a data value (see boundString)")
    case (l, t) =>
      throw new IllegalArgumentException(s"literal $l does not fit type ${t.catalogString}")
  }

  /** Render a bound literal in the engine's stats-string convention
    * ([[CompactionRunner.pruneByStats]]): sentinels as `above_max` /
    * `below_min`, everything else as its plain string rendering.
    */
  def boundString(lit: WireLiteral, tpe: DataType): String = lit match {
    case WireLiteral.AboveMax => "above_max"
    case WireLiteral.BelowMin => "below_min"
    case other => String.valueOf(literalValue(other, tpe))
  }

  // ---- request → engine --------------------------------------------------

  final case class DecodedRewrite(
      dataTasks: Seq[DataFileTask],
      posDeletes: Seq[PosDeleteTask],
      eqDeletes: Seq[EqDeleteTask],
      outDir: String,
      config: CompactionConfig,
      canonicalSchema: Option[StructType],
      fileIoProps: Map[String, String])

  private def formatName(format: Int): String = format match {
    case FormatAvro => "avro"
    case FormatOrc => "orc"
    case FormatParquet => "parquet"
    case other => throw new IllegalArgumentException(s"unknown DataFileFormat enum $other")
  }

  /** Wire request → engine inputs. Task routing mirrors the reference:
    * data tasks keep their projection, position deletes clear it (the
    * engine reads (file_path, pos) only), equality deletes project exactly
    * their equality ids — names resolved against the schema BY FIELD ID.
    */
  def decodeRequest(req: WireRewriteRequest): DecodedRewrite = {
    val schema = req.schema.map(toSparkSchema)
    val data = scala.collection.mutable.Buffer[DataFileTask]()
    val pos = scala.collection.mutable.Buffer[PosDeleteTask]()
    val eq = scala.collection.mutable.Buffer[EqDeleteTask]()
    req.tasks.foreach { t =>
      t.content match {
        case ContentData =>
          data += DataFileTask(t.path, t.sequenceNumber, formatName(t.format))
        case ContentPositionDeletes => pos += PosDeleteTask(t.path)
        case ContentEqualityDeletes =>
          val names = t.equalityIds.map { id =>
            schema.flatMap(FieldIds.nameById(_, id)).getOrElse(
              throw new IllegalArgumentException(
                s"equality id $id of ${t.path} not present in the request schema"))
          }
          eq += EqDeleteTask(t.path, t.sequenceNumber, names, t.equalityIds)
        case other =>
          throw new IllegalArgumentException(s"unknown DataContentType enum $other")
      }
    }
    val cfg = req.config
    def csv(key: String): Seq[String] =
      cfg.get(key).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val transforms = req.partitionSpec.toSeq.flatMap(_.fields).map { pf =>
      val src = schema.flatMap(FieldIds.nameById(_, pf.sourceId)).getOrElse(
        throw new IllegalArgumentException(
          s"partition source id ${pf.sourceId} not present in the request schema"))
      val srcType = schema.get(src).dataType
      pf.name -> CompactionService.partitionTransform(wireTransformName(pf.transform), src, srcType)
    }
    val config = CompactionConfig(
      targetPartitions = cfg.get("target_partitions").map(_.toInt).getOrElse(4),
      partitionTransforms = transforms,
      statsCols = csv("stats_cols"),
      clusterBy = csv("cluster_by"),
      zOrderBy = csv("z_order_by"),
      batchParallelism = cfg.get("batch_parallelism").map(_.toInt),
      dataFilePrefix = cfg.get("data_file_prefix"))
    DecodedRewrite(data.toSeq, pos.toSeq, eq.toSeq, req.dirPath, config, schema,
      req.fileIo.map(_.props).getOrElse(Map.empty))
  }

  private def wireTransformName(t: WireTransform): String = t match {
    case WireTransform.Identity => "identity"
    case WireTransform.Year => "year"
    case WireTransform.Month => "month"
    case WireTransform.Day => "day"
    case WireTransform.Hour => "hour"
    case WireTransform.Void => "void"
    case WireTransform.Unknown => "void" // unrecognized transform produces null partitions
    case WireTransform.Bucket(n) => s"bucket[$n]"
    case WireTransform.Truncate(w) => s"truncate[$w]"
  }

  // ---- manifest → response -----------------------------------------------

  /** Iceberg single-value binary serialization for bound values (spec
    * "Binary single-value serialization"): int 4-byte LE, long/timestamps
    * 8-byte LE, float 4-byte LE, double 8-byte LE, string UTF-8. Bounds the
    * engine rendered as stats strings re-encode per the column's canonical
    * type; unparseable values are omitted (a missing bound is always safe —
    * readers treat it as unbounded).
    */
  private[wire] def boundBytes(tpe: DataType, s: String): Option[Array[Byte]] =
    graft.sources.IcebergSingleValue.encode(tpe, s)

  /** Commit manifest → wire `RewriteFilesResponse`: one DataFile per added
    * file with record count, size, and per-column bounds keyed BY FIELD ID
    * (resolved against the canonical schema; columns without an id or with
    * unserializable bounds omit their entry). Partition values are not
    * tracked per output file by the engine manifest — the struct is empty,
    * like an unpartitioned table's.
    */
  /** `sortOrderId` marks the outputs as sort-clustered (the reference's
    * `DataFile.sort_order_id`, `iceberg.proto:200`): None = unsorted
    * (Iceberg order-id 0 semantics), Some(1) = the request's
    * cluster_by/z_order_by order — so a consuming catalog records that
    * these files satisfy a sort order and can plan order-aware scans.
    */
  def responseFor(
      manifest: CommitManifest,
      canonicalSchema: Option[StructType],
      sortOrderId: Option[Int] = None): WireRewriteResponse = {
    val files = manifest.addedFiles.map { f =>
      def bounds(m: Map[String, String]): Map[Int, Seq[Byte]] =
        canonicalSchema.map { sch =>
          m.flatMap { case (colName, v) =>
            for {
              sf <- sch.fields.find(_.name == colName)
              id <- FieldIds.idOf(sf)
              if v != "null" && v != "above_max" && v != "below_min"
              bytes <- boundBytes(sf.dataType, v)
            } yield id -> bytes.toSeq
          }
        }.getOrElse(Map.empty)
      def idCounts(m: Map[String, Long]): Map[Int, Long] =
        canonicalSchema.map { sch =>
          m.flatMap { case (colName, v) =>
            sch.fields.find(_.name == colName).flatMap(FieldIds.idOf).map(_ -> v)
          }
        }.getOrElse(Map.empty)
      WireDataFile(
        content = ContentData,
        path = f.path,
        format = FormatParquet,
        partition = Nil,
        recordCount = f.recordCount,
        fileSizeBytes = f.sizeBytes,
        nullValueCounts = idCounts(f.nullCounts),
        lowerBounds = bounds(f.colMins),
        upperBounds = bounds(f.colMaxs),
        sortOrderId = sortOrderId)
    }
    WireRewriteResponse(files,
      Some(WireStat(
        // the reference counts ALL consumed inputs — data + position-delete
        // + equality-delete files (`executor/mod.rs:68-72`); the engine
        // manifest splits them, so recombine for the wire
        rewrittenFilesCount =
          manifest.removedDataFiles.size.toLong + manifest.removedDeleteFiles.size.toLong,
        addedFilesCount = manifest.addedFilesCount,
        rewrittenBytes = manifest.rewrittenBytes,
        failedDataFilesCount = manifest.failedFilesCount)))
  }

  // ---- FileIO → Hadoop conf ----------------------------------------------

  /** Iceberg FileIO property keys → Hadoop s3a configuration — the remote
    * object-store seam: the reference threads per-request S3 credentials
    * through `FileIoBuilder.props` (`core/proto/iceberg.proto:129-132`,
    * applied at `parser/proto.rs:94-100`). Spark's analog is the session's
    * Hadoop configuration, which every distributed scan and write in the
    * request's compaction reads. Keys are the public Iceberg aws property
    * names; unknown props pass through under their own name so any
    * `fs.s3a.*`-spelled extras also land.
    */
  private val FileIoToHadoop: Map[String, String] = Map(
    "s3.endpoint" -> "fs.s3a.endpoint",
    "s3.access-key-id" -> "fs.s3a.access.key",
    "s3.secret-access-key" -> "fs.s3a.secret.key",
    "s3.session-token" -> "fs.s3a.session.token",
    "s3.region" -> "fs.s3a.endpoint.region",
    "s3.path-style-access" -> "fs.s3a.path.style.access",
    // the GCS / Azure FileIO property names (public Iceberg gcp/azure
    // modules) mapped onto the keys this library's own clients resolve
    "gcs.service.host" -> "fs.gs.endpoint",
    "adls.endpoint" -> "fs.azure.endpoint")

  /** Apply a request's FileIO props to the session's Hadoop configuration.
    * Mutates session state by design — file systems are resolved per
    * scheme+authority from this conf at scan/write time.
    */
  def applyFileIo(spark: SparkSession, props: Map[String, String]): Unit =
    props.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(FileIoToHadoop.getOrElse(k, k), v)
    }

  // ---- the full RPC body -------------------------------------------------

  /** RewriteFiles, end to end: decode the request bytes, apply the
    * request's FileIO credentials, run ONE distributed compaction, encode
    * the response bytes — the body behind the reference's tonic handler
    * (`services/compactor/src/rpc.rs:31-47`). Like the reference, the
    * CALLER commits: the response only reports added files + stats.
    */
  def rewriteFiles(spark: SparkSession, requestBytes: Array[Byte],
      executor: graft.sources.CompactionExecutor =
        graft.sources.SparkCompactionExecutor): Array[Byte] = {
    val req = decodeRewriteRequest(requestBytes)
    val d = decodeRequest(req)
    require(d.dataTasks.nonEmpty, "request has no data-file scan tasks")
    require(d.outDir.nonEmpty, "request has no dir_path")
    applyFileIo(spark, d.fileIoProps)
    val manifest = executor.rewriteFiles(
      spark, d.dataTasks, d.posDeletes, d.eqDeletes, d.outDir, d.config,
      d.canonicalSchema)
    val sortId =
      if (d.config.clusterBy.nonEmpty || d.config.zOrderBy.nonEmpty) Some(1)
      else None
    encodeRewriteResponse(responseFor(manifest, d.canonicalSchema, sortId))
  }
}
