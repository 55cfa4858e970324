package graft.sources

import graft.SparkSpec
import graft.sources.CompactionRunner.DataFileTask
import java.nio.file.Files

import org.apache.spark.sql.functions.{col, concat, lit}

/** MERGE INTO (`GraftCatalog.mergeInto`) — conditional upsert compiled to
  * one MoR commit: eq-deletes over matched keys + a data file of updated
  * versions and not-matched inserts.
  */
class MergeIntoSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(Files.createTempDirectory("graft-merge-cat").toString)

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(t => (t._1, t._2))

  private def freshTable(cat: GraftCatalog): Unit = {
    val base = Files.createTempDirectory("graft-merge-base").toString
    (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/b0")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$base/b0").map(DataFileTask(_, 1L)))
  }

  test("update + insert + delete clauses in one commit; source columns via _src_") {
    val cat = newCatalog()
    freshTable(cat)
    val out = Files.createTempDirectory("graft-merge-out").toString
    // source: k=2 updated (suffix from source), k=5 deleted, k=30 inserted
    val source = Seq(
      (2L, "TWO", "update"), (5L, "ignored", "delete"), (30L, "THIRTY", "insert"))
      .toDF("k", "v", "action")

    val snap = cat.mergeInto(spark, "t", source, Seq("k"),
      whenMatchedSet = Map("v" -> concat(col("v"), lit("+"), col("_src_v"))),
      outDir = out,
      whenNotMatchedInsert = true,
      whenMatchedDelete = Some(col("_src_action") === "delete"))
    assert(snap == 2L)

    val expected = ((1L to 20L).filterNot(k => k == 2 || k == 5)
      .map(k => (k, s"v$k")) ++ Seq((2L, "v2+TWO"), (30L, "THIRTY")))
      .sortBy(t => (t._1, t._2))
    assert(rowsOf(cat.scanTable(spark, "t")) == expected)

    // one commit: eqdel + data entries at the same advanced seq
    val entries = cat.loadEntries("t")
    val seqs = entries.filter(e => e.kind == "eqdel" || e.seqNum > 1L).map(_.seqNum)
    assert(seqs.nonEmpty && seqs.forall(_ == 2L))
    assert(entries.exists(_.kind == "eqdel"))

    // compaction makes the merge physical; results identical
    cat.compactTable(spark, "t", s"$out/cmp")
    assert(cat.loadEntries("t").forall(_.kind == "data"))
    assert(rowsOf(cat.scanTable(spark, "t")) == expected)
  }

  test("duplicate target keys: every version is updated; duplicate source keys rejected") {
    val cat = newCatalog()
    val base = Files.createTempDirectory("graft-merge-dup").toString
    Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/b0")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$base/b0").map(DataFileTask(_, 1L)))
    val out = Files.createTempDirectory("graft-merge-out").toString

    cat.mergeInto(spark, "t", Seq((1L, "X")).toDF("k", "nv"), Seq("k"),
      whenMatchedSet = Map("v" -> concat(col("v"), col("_src_nv"))),
      outDir = out, whenNotMatchedInsert = false)
    assert(rowsOf(cat.scanTable(spark, "t")) ==
      Seq((1L, "aX"), (1L, "bX"), (2L, "c")))

    intercept[IllegalArgumentException] {
      cat.mergeInto(spark, "t", Seq((1L, "X"), (1L, "Y")).toDF("k", "nv"),
        Seq("k"), Map("v" -> col("_src_nv")), out, whenNotMatchedInsert = false)
    }
  }

  test("no-op source commits nothing; insert-only source needs full target columns") {
    val cat = newCatalog()
    freshTable(cat)
    val out = Files.createTempDirectory("graft-merge-out").toString
    val head = cat.currentSnapshotId("t")

    // no matches and insert disabled → no commit
    assert(cat.mergeInto(spark, "t", Seq((99L, "X")).toDF("k", "nv"), Seq("k"),
      Map("v" -> col("_src_nv")), out, whenNotMatchedInsert = false) == head)

    // insert clause with a source missing target columns is rejected up front
    intercept[IllegalArgumentException] {
      cat.mergeInto(spark, "t", Seq((99L, "X")).toDF("k", "nv"), Seq("k"),
        Map("v" -> col("_src_nv")), out, whenNotMatchedInsert = true)
    }
  }

  test("merge equals upsert when matched rows are replaced by source values") {
    val cat1 = newCatalog(); freshTable(cat1)
    val cat2 = newCatalog(); freshTable(cat2)
    val out = Files.createTempDirectory("graft-merge-out").toString
    val source = Seq((3L, "NEW3"), (21L, "NEW21")).toDF("k", "v")

    cat1.mergeInto(spark, "t", source, Seq("k"),
      whenMatchedSet = Map("v" -> col("_src_v")), outDir = s"$out/m")
    cat2.upsert(spark, "t", source, Seq("k"), s"$out/u")
    assert(rowsOf(cat1.scanTable(spark, "t")) == rowsOf(cat2.scanTable(spark, "t")))
  }

  test("merge on a field-id canonical schema keeps ids: no NULL-out on id-resolved reads") {
    // regression twin of UpdateWhereSpec's: SET/inserted columns lose
    // their field-id metadata through `.as` and the merge writer must
    // re-align before writing, or an id-resolving scan serves NULL
    import org.apache.spark.sql.types._
    def idField(name: String, dt: DataType, id: Long) =
      StructField(name, dt, nullable = true,
        metadata = new MetadataBuilder().putLong(FieldIds.MetaKey, id).build())
    val cat = newCatalog()
    cat.createTable("t", Nil, Some(StructType(Seq(
      idField("k", LongType, 1L), idField("v", StringType, 2L)))))
    val base = Files.createTempDirectory("graft-merge-fid").toString
    cat.appendFiles(spark, "t",
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"), s"$base/a")
    val source = Seq((3L, "m3"), (11L, "m11")).toDF("k", "v")
    cat.mergeInto(spark, "t", source, Seq("k"),
      Map("v" -> col(GraftCatalog.MergeSrcPrefix + "v")), s"$base/out")
    assert(rowsOf(cat.scanTable(spark, "t")) ==
      ((1L to 10L).map(k => (k, if (k == 3) "m3" else s"v$k")) :+ (11L, "m11"))
        .sortBy(_._1),
      "matched SET and inserted columns must survive the id-resolved read")
  }
}
