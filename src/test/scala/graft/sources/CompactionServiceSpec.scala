package graft.sources

import graft.{SparkSpec, Tables}
import graft.operators.MorPlanner
import graft.sources.CompactionRunner._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CompactionServiceSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def parquetsIn(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.toSeq

  test("EP2 façade: JSON request runs a full compaction, response is the manifest") {
    val table = tmpDir("graft-svc")
    val deletes = tmpDir("graft-svc-del")
    val out = tmpDir("graft-svc-out")
    Tables.lineitem(spark, sfDir).repartition(2).write.mode("overwrite").parquet(table)
    Tables.lineitem(spark, sfDir).filter(col("l_partkey") % 11 === 2)
      .select(col("l_orderkey"), col("l_linenumber")).distinct()
      .write.mode("overwrite").parquet(s"$deletes/eq")
    val dataJson = parquetsIn(table).zipWithIndex
      .map { case (p, i) => s"""{"path":"$p","seq":${i + 1}}""" }
      .mkString("[", ",", "]")
    val eqJson = parquetsIn(s"$deletes/eq")
      .map(p => s"""{"path":"$p","seq":9,"equality_cols":["l_orderkey","l_linenumber"]}""")
      .mkString("[", ",", "]")
    val request =
      s"""{"data_files":$dataJson,"equality_deletes":$eqJson,
         |"output_dir":"$out","target_partitions":2,"stats_cols":["l_orderkey"]}""".stripMargin
    val response = CompactionService.rewriteFiles(spark, request)
    // response is the commit manifest: added files + stats + removed inputs
    assert(response.contains("\"added_files\"") && response.contains("\"min_l_orderkey\"")
      || response.contains("\"col_mins\""))
    assert(response.contains("\"output_record_count\""))
    val expected = MorPlanner.merge(
      scanWithHiddenCols(spark,
        parquetsIn(table).zipWithIndex.map { case (p, i) => DataFileTask(p, i + 1L) }),
      None,
      readEqualityDeletes(spark, parquetsIn(s"$deletes/eq")
        .map(EqDeleteTask(_, 9L, Seq("l_orderkey", "l_linenumber"))))).count()
    assert(spark.read.parquet(s"$out/data").count() == expected && expected > 0)
  }

  test("request partition_spec decodes to iceberg transforms and fans out the write") {
    val table = tmpDir("graft-svc-pspec")
    val out = tmpDir("graft-svc-pspec-out")
    Tables.lineitem(spark, sfDir).limit(500).write.mode("overwrite").parquet(table)
    val dataJson = parquetsIn(table)
      .map(p => s"""{"path":"$p","seq":1}""").mkString("[", ",", "]")
    val request =
      s"""{"data_files":$dataJson,"output_dir":"$out","target_partitions":2,
         |"partition_spec":[{"name":"p_year","transform":"year","source":"l_shipdate"},
         |                  {"name":"p_bkt","transform":"bucket[4]","source":"l_orderkey"}]}""".stripMargin
    CompactionService.rewriteFiles(spark, request)
    // fanout directories exist for both transform columns, nested
    val yearDirs = new java.io.File(s"$out/data").listFiles()
      .filter(_.getName.startsWith("p_year="))
    assert(yearDirs.nonEmpty)
    assert(yearDirs.head.listFiles().exists(_.getName.startsWith("p_bkt=")))
    // written data still reads and carries the partition columns
    val written = spark.read.parquet(s"$out/data")
    assert(written.count() == 500)
    assert(written.columns.contains("p_year") && written.columns.contains("p_bkt"))
    // bucket values inside [0, 4)
    assert(written.filter(col("p_bkt") < 0 || col("p_bkt") >= 4).count() == 0)
  }

  test("malformed requests fail with named errors, not NPEs") {
    val e1 = intercept[IllegalArgumentException](
      CompactionService.rewriteFiles(spark, "{}"))
    assert(e1.getMessage.contains("data_files"))
    val e2 = intercept[IllegalArgumentException](
      CompactionService.rewriteFiles(spark,
        """{"data_files":[{"path":"/x.parquet"}]}"""))
    assert(e2.getMessage.contains("output_dir"))
  }

  test("truncate transform picks string-prefix vs numeric form by column type") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val df = Seq((47L, "ALPHA BRAVO")).toDF("n", "s")
    val sCol = CompactionService.partitionTransform("truncate[4]", "s", StringType)
    val nCol = CompactionService.partitionTransform("truncate[10]", "n", LongType)
    val r = df.select(sCol.as("ts"), nCol.as("tn")).head
    assert(r.getString(0) == "ALPH") // prefix form, not a null from a numeric cast
    assert(r.getLong(1) == 40L) // floor-to-width form
  }

  test("Iceberg-shaped avro manifest round-trips and drives complete pruning") {
    val table = tmpDir("graft-man")
    val out = tmpDir("graft-man-out")
    Tables.lineitem(spark, sfDir).repartition(2).write.mode("overwrite").parquet(table)
    val tasks = parquetsIn(table).zipWithIndex
      .map { case (p, i) => DataFileTask(p, i + 1L) }
    val manifest = compact(spark, tasks, Nil, Nil, out,
      CompactionConfig(targetPartitions = 4,
        statsCols = Seq("l_orderkey"), clusterBy = Seq("l_orderkey")))
    val schema = spark.read.parquet(s"$out/data").schema
    val entries = IcebergManifest.read(s"$out/_graft_manifest.avro", schema)
    // ADDED entries mirror the JSON manifest's added files, field-id-keyed
    val added = entries.filter(_.status == IcebergManifest.StatusAdded).map(_.file)
    assert(added.map(_.path).toSet == manifest.addedFiles.map(_.path).toSet)
    assert(added.map(_.recordCount).sum == manifest.outputRecordCount)
    // DELETED entries carry the compacted inputs
    assert(entries.filter(_.status == IcebergManifest.StatusDeleted).map(_.file.path)
      == manifest.removedDataFiles)
    // pruning over the avro-manifest entries is COMPLETE (no matching row lost)
    val maxKey = added.flatMap(_.colMaxs.get("l_orderkey")).map(_.toDouble).max
    val pruned = pruneByStats(added, "l_orderkey", 0, maxKey / 10)
    assert(pruned.size < added.size)
    val prunedRows = spark.read.parquet(pruned.map(_.path): _*)
      .filter(col("l_orderkey") <= maxKey / 10).count()
    val fullRows = spark.read.parquet(s"$out/data")
      .filter(col("l_orderkey") <= maxKey / 10).count()
    assert(prunedRows == fullRows && fullRows > 0)
  }
}
