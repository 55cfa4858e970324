package graft.sources

import graft.{SparkSpec, Tables}
import graft.functions.IcebergTransforms
import graft.operators.MorPlanner
import graft.sources.CompactionRunner._
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class CompactionRunnerSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("dedupByPath keeps first occurrence per path (J4)") {
    val tasks = Seq(("a", 1), ("b", 2), ("a", 9), ("c", 3), ("b", 8))
    val out = dedupByPath(tasks)(_._1)
    assert(out == Seq(("a", 1), ("b", 2), ("c", 3)))
  }

  test("canonPath preserves remote URIs and never percent-encodes") {
    assert(canonPath("s3://bucket/part-0.parquet") == "s3://bucket/part-0.parquet")
    assert(canonPath("hdfs://nn:8020/w/t/f.parquet") == "hdfs://nn:8020/w/t/f.parquet")
    assert(canonPath("/a/b.parquet") == "file:///a/b.parquet")
    assert(canonPath("file:/a/b.parquet") == "file:///a/b.parquet")
    assert(canonPath("file:///a/b.parquet") == "file:///a/b.parquet")
    assert(canonPath("/a/with space.parquet") == "file:///a/with space.parquet")
  }

  test("task paths that render differently from _metadata still bind their seq") {
    val table = tmpDir("graft-mismatch")
    Tables.lineitem(spark, sfDir).limit(10).write.mode("overwrite").parquet(table)
    val file = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    assert(scanWithHiddenCols(spark, Seq(DataFileTask(file, 1L))).count() == 10)
    // a task path that READS the same file but RENDERS differently
    // (redundant "./" survives canonPath; _metadata normalizes it away):
    // canonForms' Hadoop-normalized alias binds the seq entry, so the
    // scan serves all 10 rows instead of raising — and never silently
    // drops them (the left-outer seq join raises on a TRUE mismatch)
    val dir = file.substring(0, file.lastIndexOf('/'))
    val name = file.substring(file.lastIndexOf('/') + 1)
    val dotted = scanWithHiddenCols(spark, Seq(DataFileTask(s"$dir/./$name", 1L)))
    assert(dotted.count() == 10)
    assert(dotted.select(graft.operators.MorPlanner.SeqNumCol)
      .distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("the literal path domain: canonDecoded / canonKeys renderings") {
    // the scan side decodes Hadoop's encoding once, exactly
    assert(CompactionRunner.canonDecoded(
      "file:///a/seg=NOT%20SPECIFIED/f.parquet") ==
      "file:///a/seg=NOT SPECIFIED/f.parquet")
    // '+' is a literal path character, never a space
    assert(CompactionRunner.canonDecoded("file:///a+b/f.parquet") ==
      "file:///a+b/f.parquet")
    // a literal '%' round-trips (Hadoop encodes it as %25)
    assert(CompactionRunner.canonDecoded("file:///a%2520b/f.parquet") ==
      "file:///a%20b/f.parquet")
    // malformed sequences fall back to the normalized form, never throw
    assert(CompactionRunner.canonDecoded("file:///x%zz/f.parquet") ==
      "file:///x%zz/f.parquet")
    // task keys: the literal path plus its Hadoop-normalized alias
    assert(CompactionRunner.canonKeys("/a/./b/f.parquet") ==
      Seq("file:///a/./b/f.parquet", "file:///a/b/f.parquet"))
    // normalized spacey paths stay literal and collapse to one key
    assert(CompactionRunner.canonKeys("/a/seg=NOT SPECIFIED/f.parquet") ==
      Seq("file:///a/seg=NOT SPECIFIED/f.parquet"))
    assert(CompactionRunner.canonKey("s3://b/seg=a/f.parquet") ==
      "s3://b/seg=a/f.parquet")
  }

  test("pruning keeps files with sentinel, null, or unparseable bounds") {
    def f(mn: String, mx: String) = DataFileStats("/f", 1L, 1L,
      Map("c" -> mn), Map("c" -> mx), Map.empty)
    val files = Seq(
      f("0", "10"), // entirely below the probe range → pruned
      f("below_min", "25"), // -∞ min, max inside range → kept
      f("below_min", "10"), // -∞ min, but max still excludes → pruned
      f("15", "above_max"), // +∞ max, min below hi → kept
      f("null", "null"), // all-null stats, conservatively kept
      f("not-a-number", "also-not")) // unparseable, conservatively kept
    val kept = pruneByStats(files, "c", 20, 30)
    assert(kept.map(x => (x.colMins("c"), x.colMaxs("c"))) == Seq(
      ("below_min", "25"), ("15", "above_max"),
      ("null", "null"), ("not-a-number", "also-not")))
  }

  test("equality-delete grouping is by consecutive runs, not global dedup") {
    def t(p: String, cols: String*) = EqDeleteTask(p, 1L, cols.toSeq)
    // A,A,B -> [AA][B]; A,B,A -> [A][B][A] (a returning vector reopens)
    assert(groupConsecutive(Seq(t("1", "x"), t("2", "x"), t("3", "y")))
      .map(_.map(_.path)) == Seq(Seq("1", "2"), Seq("3")))
    assert(groupConsecutive(Seq(t("1", "x"), t("2", "y"), t("3", "x")))
      .map(_.map(_.path)) == Seq(Seq("1"), Seq("2"), Seq("3")))
    assert(groupConsecutive(Nil) == Nil)
  }

  test("scan fabricates hidden columns from _metadata with dense per-file positions") {
    val table = tmpDir("graft-table")
    Tables.lineitem(spark, sfDir).repartition(3).write.mode("overwrite").parquet(table)
    val files = new java.io.File(table).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 3)
    val tasks = files.zipWithIndex.map { case (p, i) => DataFileTask(p, i + 1L) }.toSeq
    val scan = scanWithHiddenCols(spark, tasks).cache()
    // every row tagged, seq matches its file's task
    assert(scan.count() == 6000)
    val bad = scan.groupBy(MorPlanner.FilePathCol)
      .agg(min(col(MorPlanner.PosCol)).as("mn"), max(col(MorPlanner.PosCol)).as("mx"),
        countDistinct(col(MorPlanner.PosCol)).as("nd"), count(lit(1)).as("n"),
        countDistinct(col(MorPlanner.SeqNumCol)).as("ns"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
        col("nd") =!= col("n") || col("ns") =!= 1)
    assert(bad.count() == 0, "positions not dense per file or seq not constant")
    // no shuffle in the scan: _metadata is computed inside the file scan and
    // seq arrives via broadcast
    val plan = scanWithHiddenCols(spark, tasks).queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"hidden-col scan should not shuffle:\n$plan")
    scan.unpersist()
  }

  test("ORC data files scan with dense positions via the window fallback (S2)") {
    val table = tmpDir("graft-orc")
    Tables.lineitem(spark, sfDir).repartition(2).write.mode("overwrite").orc(table)
    val files = new java.io.File(table).listFiles()
      .filter(f => f.getName.endsWith(".orc")).map(_.getPath).sorted
    assert(files.length == 2)
    val tasks = files.zipWithIndex.map { case (p, i) => DataFileTask(p, i + 1L, "orc") }.toSeq
    val scan = scanWithHiddenCols(spark, tasks)
    assert(scan.count() == 6000)
    val bad = scan.groupBy(MorPlanner.FilePathCol)
      .agg(min(col(MorPlanner.PosCol)).as("mn"), max(col(MorPlanner.PosCol)).as("mx"),
        countDistinct(col(MorPlanner.PosCol)).as("nd"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 || col("nd") =!= col("n"))
    assert(bad.count() == 0)
    // mixed-format scan: parquet + orc unioned under one set of hidden cols
    val ptable = tmpDir("graft-mixed")
    Tables.lineitem(spark, sfDir).limit(100).write.mode("overwrite").parquet(ptable)
    val pfiles = new java.io.File(ptable).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    val mixed = scanWithHiddenCols(spark,
      tasks ++ pfiles.map(p => DataFileTask(p, 9L, "parquet")))
    assert(mixed.count() == 6100)
  }

  // Write an avro container file (via the avro runtime directly — the test
  // twin of AvroScan's read path) holding the given projected lineitem rows.
  private def writeAvroFixture(path: String, rows: Seq[org.apache.spark.sql.Row]): Unit = {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = SchemaBuilder.record("lineitem").fields()
      .requiredLong("l_orderkey")
      .requiredInt("l_linenumber")
      .requiredDouble("l_quantity")
      .requiredString("l_returnflag")
      .endRecord()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    rows.foreach { r =>
      val rec = new GenericData.Record(schema)
      rec.put("l_orderkey", r.getLong(0))
      rec.put("l_linenumber", r.getInt(1))
      rec.put("l_quantity", r.getDouble(2))
      rec.put("l_returnflag", r.getString(3))
      w.append(rec)
    }
    w.close()
  }

  private val avroCols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  test("avro data files scan with dense zero-shuffle positions (S2)") {
    val dir = tmpDir("graft-avro")
    val slice = Tables.lineitem(spark, sfDir)
      .select(avroCols.map(col): _*).limit(400).collect().toSeq
    writeAvroFixture(s"$dir/a0.avro", slice.take(250))
    writeAvroFixture(s"$dir/a1.avro", slice.drop(250))
    val tasks = Seq(DataFileTask(s"$dir/a0.avro", 1L, "avro"),
      DataFileTask(s"$dir/a1.avro", 2L, "avro"))
    val scan = scanWithHiddenCols(spark, tasks).cache()
    assert(scan.count() == 400)
    // dense per-file positions, constant per-file seq
    val bad = scan.groupBy(MorPlanner.FilePathCol)
      .agg(min(col(MorPlanner.PosCol)).as("mn"), max(col(MorPlanner.PosCol)).as("mx"),
        countDistinct(col(MorPlanner.PosCol)).as("nd"), count(lit(1)).as("n"),
        countDistinct(col(MorPlanner.SeqNumCol)).as("ns"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 ||
        col("nd") =!= col("n") || col("ns") =!= 1)
    assert(bad.count() == 0, "avro positions not dense per file or seq not constant")
    // values survive the GenericRecord→Row bridge
    assert(scan.agg(sum(col("l_orderkey"))).head.getLong(0) ==
      slice.map(_.getLong(0)).sum)
    // zero shuffle: positions are fabricated inside the scan task
    val plan = scanWithHiddenCols(spark, tasks).queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"avro hidden-col scan should not shuffle:\n$plan")
    scan.unpersist()
  }

  test("avro bridge covers nested record/array/map and date/timestamp/decimal logical types") {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.types._
    val dir = tmpDir("graft-avro-types")
    val dateT = LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    val tsT = LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    val decT = LogicalTypes.decimal(10, 2).addToSchema(Schema.create(Schema.Type.BYTES))
    val inner = SchemaBuilder.record("inner").fields()
      .requiredString("s").requiredInt("n").endRecord()
    val schema = SchemaBuilder.record("wide").fields()
      .requiredLong("id")
      .name("d").`type`(dateT).noDefault()
      .name("ts").`type`(tsT).noDefault()
      .name("amt").`type`(decT).noDefault()
      .name("tags").`type`().array().items().stringType().noDefault()
      .name("props").`type`().map().values().longType().noDefault()
      .name("nested").`type`(inner).noDefault()
      .endRecord()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/wide.avro"))
    val rec = new GenericData.Record(schema)
    rec.put("id", 7L)
    rec.put("d", 19000) // 2022-01-08
    rec.put("ts", 1_600_000_000_123_456L) // µs precision must survive
    rec.put("amt", java.nio.ByteBuffer.wrap(BigInt(123456).toByteArray)) // 1234.56
    rec.put("tags", java.util.Arrays.asList("a", "b"))
    val props = new java.util.HashMap[String, Long](); props.put("k", 42L)
    rec.put("props", props)
    val in = new GenericData.Record(inner); in.put("s", "x"); in.put("n", 3)
    rec.put("nested", in)
    w.append(rec); w.close()

    val df = AvroScan.readWithHiddenCols(spark, Seq(s"$dir/wide.avro"))
    val f = df.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(f("d") == DateType && f("ts") == TimestampType)
    assert(f("amt") == DecimalType(10, 2))
    assert(f("tags") == ArrayType(StringType, containsNull = false) &&
      f("props") == MapType(StringType, LongType, valueContainsNull = false))
    assert(f("nested").isInstanceOf[StructType])
    val r = df.collect().head
    assert(r.getAs[java.sql.Date]("d").toString == "2022-01-08")
    assert(r.getAs[java.sql.Timestamp]("ts").getNanos == 123456000) // µs kept
    assert(r.getAs[java.math.BigDecimal]("amt")
      .compareTo(new java.math.BigDecimal("1234.56")) == 0)
    assert(r.getSeq[String](r.fieldIndex("tags")).toList == List("a", "b"))
    assert(r.getAs[Map[String, Long]]("props") == Map("k" -> 42L))
    assert(r.getAs[org.apache.spark.sql.Row]("nested").getString(0) == "x")
  }

  test("mixed parquet+ORC+avro compaction merges deletes across formats (S2 e2e)") {
    val dir = tmpDir("graft-mixed3")
    val out = tmpDir("graft-mixed3-out")
    val base = Tables.lineitem(spark, sfDir).select(avroCols.map(col): _*)
    base.limit(300).write.mode("overwrite").parquet(s"$dir/p")
    base.limit(900).except(base.limit(300)).limit(300)
      .write.mode("overwrite").orc(s"$dir/o")
    writeAvroFixture(s"$dir/a.avro",
      base.limit(1500).except(base.limit(900)).limit(300).collect().toSeq)
    def filesIn(d: String, suffix: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(suffix)).map(_.getPath).sorted.toSeq
    val tasks =
      filesIn(s"$dir/p", ".parquet").map(DataFileTask(_, 1L, "parquet")) ++
        filesIn(s"$dir/o", ".orc").map(DataFileTask(_, 2L, "orc")) ++
        Seq(DataFileTask(s"$dir/a.avro", 3L, "avro"))
    val total = scanWithHiddenCols(spark, tasks).count()
    assert(total > 600, s"3-format union too small: $total")
    // position deletes spanning all three formats
    scanWithHiddenCols(spark, tasks).filter(col("l_orderkey") % 7 === 2)
      .select(col(MorPlanner.FilePathCol).as("file_path"),
        col(MorPlanner.PosCol).as("pos"))
      .write.mode("overwrite").parquet(s"$dir/posdel")
    val posTasks = filesIn(s"$dir/posdel", ".parquet").map(PosDeleteTask(_))
    val manifest = compact(spark, tasks, posTasks, Nil, out,
      CompactionConfig(targetPartitions = 2, statsCols = Seq("l_orderkey")))
    val expected = scanWithHiddenCols(spark, tasks)
      .filter(col("l_orderkey") % 7 =!= 2).count()
    assert(manifest.outputRecordCount == expected && expected > 0)
    assert(spark.read.parquet(s"$out/data").count() == expected)
  }

  test("clustered write yields near-disjoint file stats; pruning is complete") {
    val table = tmpDir("graft-cluster")
    val out = tmpDir("graft-cluster-out")
    Tables.lineitem(spark, sfDir).repartition(2).write.mode("overwrite").parquet(table)
    val tasks = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
      .zipWithIndex.map { case (p, i) => DataFileTask(p, i + 1L) }.toSeq
    val manifest = compact(spark, tasks, Nil, Nil, out,
      CompactionConfig(targetPartitions = 4,
        statsCols = Seq("l_orderkey"), clusterBy = Seq("l_orderkey")))
    assert(manifest.addedFiles.size >= 3)
    // range clustering: file [min,max] orderkey ranges must not all overlap
    val ranges = manifest.addedFiles.map(f =>
      (f.colMins("l_orderkey").toDouble, f.colMaxs("l_orderkey").toDouble))
      .sortBy(_._1)
    val overlaps = ranges.zip(ranges.tail).count { case ((_, aMax), (bMin, _)) => aMax > bMin }
    assert(overlaps == 0, s"clustered file ranges overlap: $ranges")
    // pruning keeps fewer files for a narrow range…
    val maxKey = ranges.map(_._2).max
    val pruned = pruneByStats(manifest.addedFiles, "l_orderkey", 0, maxKey / 10)
    assert(pruned.size < manifest.addedFiles.size)
    // …and is COMPLETE: the pruned subset holds every matching row
    val prunedRows = spark.read.parquet(pruned.map(_.path): _*)
      .filter(col("l_orderkey") <= maxKey / 10).count()
    val fullRows = spark.read.parquet(s"$out/data")
      .filter(col("l_orderkey") <= maxKey / 10).count()
    assert(prunedRows == fullRows && fullRows > 0)
  }

  test("field ids survive write→read; eq-deletes resolve by id across renames (§1.3)") {
    val dir = tmpDir("graft-fieldid")
    import spark.implicits._
    // data file: columns (k, v) stamped with ids 1, 2
    val data = (1L to 100L).map(i => (i, i % 10)).toDF("k", "v")
    FieldIds.withFieldIds(data).write.mode("overwrite").parquet(s"$dir/data")
    // ids persisted to the parquet footer and surfaced on read
    val readBack = spark.read.parquet(s"$dir/data").schema
    assert(FieldIds.nameById(readBack, 1).contains("k"), s"id 1 lost: $readBack")
    assert(FieldIds.nameById(readBack, 2).contains("v"), s"id 2 lost: $readBack")
    // delete file: the id-2 column RENAMED v → v_renamed (same field id)
    val meta2 = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(FieldIds.MetaKey, 2L).build()
    Seq(3L, 7L).toDF("x").select(col("x").as("v_renamed", meta2))
      .write.mode("overwrite").parquet(s"$dir/del")
    def fileIn(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq
    val scan = scanWithHiddenCols(spark,
      fileIn(s"$dir/data").map(DataFileTask(_, 1L)))
    val groups = readEqualityDeletes(spark,
      fileIn(s"$dir/del").map(EqDeleteTask(_, 10L, Nil, equalityIds = Seq(2))),
      Some(scan.schema))
    // the delete column re-aliased to the DATA name for id 2
    assert(groups.head.equalityCols == Seq("v"))
    val merged = MorPlanner.merge(scan, None, groups)
    // v ∈ {3, 7} → 20 of 100 rows deleted despite the rename
    assert(merged.count() == 80)
    // name fallback still works for id-less delete files
    Seq(1L, 2L).toDF("v").write.mode("overwrite").parquet(s"$dir/del-plain")
    val plainGroups = readEqualityDeletes(spark,
      fileIn(s"$dir/del-plain").map(EqDeleteTask(_, 10L, Seq("v"))),
      Some(scan.schema))
    assert(MorPlanner.merge(scan, None, plainGroups).count() == 80)
  }

  test("end-to-end compaction: merge, partitioned write, stats, manifest") {
    val table = tmpDir("graft-table")
    val deletes = tmpDir("graft-deletes")
    val out = tmpDir("graft-out")
    Tables.lineitem(spark, sfDir).repartition(3).write.mode("overwrite").parquet(table)
    val files = new java.io.File(table).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    val dataTasks = files.zipWithIndex.map { case (p, i) => DataFileTask(p, i + 1L) }.toSeq

    // position deletes: every (file,pos) of rows with l_orderkey % 10 == 3
    val scan = scanWithHiddenCols(spark, dataTasks)
    scan.filter(col("l_orderkey") % 10 === 3)
      .select(col(MorPlanner.FilePathCol).as("file_path"),
        col(MorPlanner.PosCol).as("pos"))
      .write.mode("overwrite").parquet(s"$deletes/pos")
    // equality deletes on (l_orderkey, l_linenumber), seq above all data seqs
    Tables.lineitem(spark, sfDir).filter(col("l_partkey") % 13 === 1)
      .select(col("l_orderkey"), col("l_linenumber")).distinct()
      .write.mode("overwrite").parquet(s"$deletes/eq")
    def parquetsIn(dir: String): Seq[String] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq

    val manifest = compact(spark, dataTasks,
      parquetsIn(s"$deletes/pos").map(PosDeleteTask(_)),
      parquetsIn(s"$deletes/eq").map(EqDeleteTask(_, 10L, Seq("l_orderkey", "l_linenumber"))),
      out,
      CompactionConfig(
        targetPartitions = 4,
        partitionTransforms =
          Seq("p_ship_year" -> IcebergTransforms.yearsT(col("l_shipdate"))),
        statsCols = Seq("l_quantity", "l_orderkey")))

    // independent expectation: planner applied directly to the same scan
    val expected = MorPlanner.merge(
      scanWithHiddenCols(spark, dataTasks),
      readPositionDeletes(spark, parquetsIn(s"$deletes/pos").map(PosDeleteTask(_))),
      readEqualityDeletes(spark, parquetsIn(s"$deletes/eq")
        .map(EqDeleteTask(_, 10L, Seq("l_orderkey", "l_linenumber"))))).count()
    assert(manifest.outputRecordCount == expected)
    assert(expected < 6000 && expected > 0)

    // written table: readable, row count matches, hidden cols gone, fanout dirs exist
    val written = spark.read.parquet(s"$out/data")
    assert(written.count() == expected)
    assert(!written.columns.exists(MorPlanner.HiddenCols.contains))
    assert(written.columns.contains("p_ship_year"))
    assert(new java.io.File(s"$out/data").listFiles()
      .exists(_.getName.startsWith("p_ship_year=")))

    // stats: per-file record counts sum to total; min<=max on a stats col
    assert(manifest.addedFiles.nonEmpty)
    assert(manifest.addedFiles.map(_.recordCount).sum == expected)
    manifest.addedFiles.foreach { f =>
      assert(f.sizeBytes > 0)
      assert(f.colMins("l_quantity").toDouble <= f.colMaxs("l_quantity").toDouble)
      assert(f.nullCounts("l_quantity") == 0)
    }
    assert(manifest.removedDataFiles.size == 3)

    // manifest JSON committed and parseable-ish, with RewriteFilesStat counters
    val json = Files.readString(Paths.get(s"$out/_graft_manifest.json"))
    assert(json.contains("\"added_files\"") && json.contains("\"output_record_count\""))
    assert(json.contains("\"rewritten_files_count\": 3"))
    assert(manifest.rewrittenBytes > 0 &&
      manifest.addedFilesCount == manifest.addedFiles.size &&
      manifest.failedFilesCount == 0)
  }

  test("data_file_prefix renames outputs; batch_parallelism scopes shuffle partitions") {
    val table = tmpDir("graft-prefix")
    val out = tmpDir("graft-prefix-out")
    Tables.lineitem(spark, sfDir).limit(200).write.mode("overwrite").parquet(table)
    val tasks = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => DataFileTask(f.getPath, 1L)).toSeq
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val manifest = compact(spark, tasks, Nil, Nil, out,
      CompactionConfig(targetPartitions = 2, statsCols = Seq("l_orderkey"),
        batchParallelism = Some(3), dataFilePrefix = Some("graft-00042")))
    // shuffle-partition override is scoped to the compact call
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prevShuffle)
    // every output data file carries the prefix, none keep Spark's part- name
    val outFiles = new java.io.File(s"$out/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq
    assert(outFiles.nonEmpty && outFiles.forall(_.startsWith("graft-00042-")))
    // manifest paths point at the RENAMED files and still read correctly
    assert(manifest.addedFiles.map(_.path).forall(
      _.split('/').last.startsWith("graft-00042-")))
    assert(spark.read.parquet(s"$out/data").count() == 200L)
    assert(manifest.outputRecordCount == 200L)
  }
}
