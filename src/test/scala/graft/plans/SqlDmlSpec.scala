package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.sources.{CompactionRunner, GraftCatalog}
import graft.sources.CompactionRunner.DataFileTask

/** Plain-SQL row-level DML over graft tables ([[GraftSqlDml]]): DELETE /
  * UPDATE / MERGE statements against a temp view registered over
  * `spark.read.format("graft")`, rewritten by the injected resolution rule
  * into the catalog's native MoR DML. The shared test session is built
  * with `spark.sql.extensions=graft.plans.GraftExtensions` — the exact
  * config a user sets — so these specs also pin the config-time injection
  * path.
  */
class SqlDmlSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(rows: Seq[(Long, String, Long)]): (GraftCatalog, String) = {
    val root = Files.createTempDirectory("graft-sqldml").toString
    val cat = new GraftCatalog(root)
    rows.toDF("k", "v", "qty").coalesce(1).write.parquet(s"$root/stage")
    cat.createTable("t",
      CompactionRunner.listParquet(s"$root/stage").map(DataFileTask(_, 1L)))
    (cat, root)
  }

  private def view(root: String, name: String, pin: Option[Long] = None): Unit = {
    val r = spark.read.format("graft").option("root", root).option("table", "t")
    pin.foreach(id => r.option("snapshot", id.toString))
    pin.fold(r)(id => spark.read.format("graft").option("root", root)
      .option("table", "t").option("snapshot", id.toString))
      .load().createOrReplaceTempView(name)
  }

  private def state(cat: GraftCatalog): Seq[(Long, String, Long)] =
    cat.scanTable(spark, "t").select("k", "v", "qty").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sortBy(_._1)

  private val base = (1L to 10L).map(k => (k, s"v$k", k * 10))

  test("SQL DELETE lands as a MoR position-delete commit") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_del")
    val dataFiles = cat.loadEntries("t").filter(_.kind == "data").map(_.path)
    val mtimes = dataFiles.map(p => p -> new java.io.File(p).lastModified()).toMap

    spark.sql("DELETE FROM sqldml_del WHERE k % 2 = 0 AND qty < 90")

    assert(state(cat) == base.filterNot(r => r._1 % 2 == 0 && r._3 < 90))
    // MoR, not copy-on-write: data files untouched, posdel entries added
    dataFiles.foreach(p =>
      assert(new java.io.File(p).lastModified() == mtimes(p), s"$p rewritten"))
    assert(cat.loadEntries("t").exists(_.kind == "posdel"))
  }

  test("write.delete.mode / write.update.mode properties drive SQL DML layout") {
    val (cat, root) = freshTable(base)
    cat.updateTableProperties("t",
      Map("write.delete.mode" -> "copy-on-write",
        "write.update.mode" -> "copy-on-write"), Set.empty)
    view(root, "sqldml_cow")

    spark.sql("DELETE FROM sqldml_cow WHERE k <= 2")
    assert(state(cat) == base.filterNot(_._1 <= 2))
    assert(!cat.loadEntries("t").exists(_.kind != "data"),
      "copy-on-write DELETE must leave no delete entries")

    spark.sql("UPDATE sqldml_cow SET qty = qty + 1 WHERE k = 5")
    assert(state(cat).find(_._1 == 5L).map(_._3).contains(51L))
    assert(!cat.loadEntries("t").exists(_.kind != "data"),
      "copy-on-write UPDATE must leave no delete entries")

    // a typo'd mode fails loudly instead of silently writing MoR
    cat.updateTableProperties("t",
      Map("write.delete.mode" -> "cow"), Set.empty)
    val bad = intercept[Exception](
      spark.sql("DELETE FROM sqldml_cow WHERE k = 9"))
    assert(bad.getMessage.contains("write.delete.mode"), bad.getMessage)
    assert(state(cat).exists(_._1 == 9L), "failed DELETE must not commit")

    // MERGE is eq-delete (merge-on-read) by construction: a declared CoW
    // merge mode is refused loudly, never silently written MoR
    cat.updateTableProperties("t",
      Map("write.merge.mode" -> "copy-on-write"), Set.empty)
    spark.range(1).selectExpr("5L AS k", "'m' AS v", "0L AS qty")
      .createOrReplaceTempView("sqldml_cow_src")
    val badMerge = intercept[Exception](spark.sql(
      """MERGE INTO sqldml_cow t USING sqldml_cow_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin))
    assert(badMerge.getMessage.contains("write.merge.mode"), badMerge.getMessage)
  }

  test("SQL DELETE without WHERE empties the table") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_delall")
    spark.sql("DELETE FROM sqldml_delall")
    assert(state(cat).isEmpty)
  }

  test("SQL UPDATE applies expression SETs to matching rows only") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_up")
    spark.sql(
      "UPDATE sqldml_up SET qty = qty + 1000, v = concat(v, '!') WHERE k > 8")
    assert(state(cat) == base.map {
      case (k, v, q) if k > 8 => (k, v + "!", q + 1000)
      case r => r
    })
  }

  test("SQL UPDATE without WHERE touches every row") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_upall")
    spark.sql("UPDATE sqldml_upall SET qty = 0")
    assert(state(cat) == base.map { case (k, v, _) => (k, v, 0L) })
  }

  test("SQL MERGE: update matched, insert star for unmatched") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_m1")
    Seq((9L, "nine", 1L), (10L, "ten", 2L), (11L, "eleven", 3L))
      .toDF("k", "v", "qty").createOrReplaceTempView("sqldml_m1_src")
    spark.sql(
      """MERGE INTO sqldml_m1 t USING sqldml_m1_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v, qty = t.qty + s.qty
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val expected = base.map {
      case (9L, _, q) => (9L, "nine", q + 1)
      case (10L, _, q) => (10L, "ten", q + 2)
      case r => r
    } :+ (11L, "eleven", 3L)
    assert(state(cat) == expected.sortBy(_._1))
  }

  test("SQL MERGE: UPDATE SET * expands to all columns") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_mstar")
    Seq((1L, "one", 111L)).toDF("k", "v", "qty")
      .createOrReplaceTempView("sqldml_mstar_src")
    spark.sql(
      """MERGE INTO sqldml_mstar t USING sqldml_mstar_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(state(cat) == ((1L, "one", 111L) +: base.tail).sortBy(_._1))
  }

  test("SQL MERGE: delete action with condition, ordered after update") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_m2")
    // rows 1-4 matched: update wins where qty < 25 (rows 1,2); delete takes
    // the rest of the matched set (rows 3,4 — update listed first, so its
    // condition excludes them from the delete only when it fired)
    Seq(1L, 2L, 3L, 4L).toDF("k").createOrReplaceTempView("sqldml_m2_src")
    spark.sql(
      """MERGE INTO sqldml_m2 t USING sqldml_m2_src s ON t.k = s.k
        |WHEN MATCHED AND t.qty < 25 THEN UPDATE SET qty = -1
        |WHEN MATCHED THEN DELETE""".stripMargin)
    val expected = base.collect {
      case (k, v, _) if k <= 2 => (k, v, -1L)
      case r @ (k, _, _) if k >= 5 => r
    }
    assert(state(cat) == expected.sortBy(_._1))
  }

  test("SQL MERGE: delete-only merge removes matched keys") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_m3")
    Seq(2L, 4L, 99L).toDF("k").createOrReplaceTempView("sqldml_m3_src")
    spark.sql(
      """MERGE INTO sqldml_m3 t USING sqldml_m3_src s ON t.k = s.k
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(state(cat) == base.filterNot(r => r._1 == 2 || r._1 == 4))
  }

  test("SQL MERGE: explicit INSERT assignments with a computed value") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_m4")
    Seq((20L, "twenty"), (21L, "twentyone")).toDF("k", "name")
      .createOrReplaceTempView("sqldml_m4_src")
    spark.sql(
      """MERGE INTO sqldml_m4 t USING sqldml_m4_src s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, v, qty) VALUES (s.k, upper(s.name), s.k * 2)""".stripMargin)
    val expected = base ++ Seq((20L, "TWENTY", 40L), (21L, "TWENTYONE", 42L))
    assert(state(cat) == expected.sortBy(_._1))
  }

  test("SQL DML matches the direct catalog calls (equivalence)") {
    val (catA, rootA) = freshTable(base)
    val (catB, rootB) = freshTable(base)
    view(rootA, "sqldml_eq")
    spark.sql("DELETE FROM sqldml_eq WHERE qty >= 80")
    spark.sql("UPDATE sqldml_eq SET v = 'x' WHERE k <= 2")
    val out = Files.createTempDirectory("graft-sqldml-eq").toString
    catB.deleteWhere(spark, "t", col("qty") >= 80, out)
    catB.updateWhere(spark, "t", col("k") <= 2, Map("v" -> org.apache.spark.sql.functions.lit("x")), out)
    assert(state(catA) == state(catB))
  }

  test("rejections: subquery, not-matched-by-source, conditional insert, key rename, pinned view") {
    val (cat, root) = freshTable(base)
    view(root, "sqldml_rej")
    Seq((1L, "a", 1L)).toDF("k", "v", "qty").createOrReplaceTempView("sqldml_rej_src")

    val subq = intercept[Exception](spark.sql(
      "DELETE FROM sqldml_rej WHERE k IN (SELECT k FROM sqldml_rej_src)"))
    assert(subq.getMessage.contains("subquer"))

    val nmbs = intercept[Exception](spark.sql(
      """MERGE INTO sqldml_rej t USING sqldml_rej_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin))
    assert(nmbs.getMessage.contains("NOT MATCHED BY SOURCE"))

    val condIns = intercept[Exception](spark.sql(
      """MERGE INTO sqldml_rej t USING sqldml_rej_src s ON t.k = s.k
        |WHEN NOT MATCHED AND s.qty > 0 THEN INSERT *""".stripMargin))
    assert(condIns.getMessage.contains("conditional"))

    val rename = intercept[Exception](spark.sql(
      """MERGE INTO sqldml_rej t USING (SELECT k AS kk, v, qty FROM sqldml_rej_src) s
        |ON t.k = s.kk
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin))
    assert(rename.getMessage.contains("share a name"))

    // snapshot-pinned view refuses writes
    val head = cat.currentSnapshotId("t")
    spark.read.format("graft").option("root", root).option("table", "t")
      .option("snapshot", head.toString).load()
      .createOrReplaceTempView("sqldml_pinned")
    val pinned = intercept[Exception](
      spark.sql("DELETE FROM sqldml_pinned WHERE k = 1"))
    assert(pinned.getMessage.contains("pinned"))

    // a non-identity INSERT on the key column breaks the join contract
    val keyIdent = intercept[Exception](spark.sql(
      """MERGE INTO sqldml_rej t USING sqldml_rej_src s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, v, qty) VALUES (s.k + 1, s.v, s.qty)""".stripMargin))
    assert(keyIdent.getMessage.contains("identity"))

    assert(state(cat) == base) // nothing committed by any rejection
  }

  test("non-graft targets are left to Spark's own error") {
    val df: DataFrame = Seq((1L, "a")).toDF("k", "v")
    df.createOrReplaceTempView("sqldml_plain")
    val e = intercept[Exception](spark.sql("DELETE FROM sqldml_plain WHERE k = 1"))
    // Spark's v2-only error, not a graft message
    assert(!e.getMessage.contains("graft"))
  }
}
