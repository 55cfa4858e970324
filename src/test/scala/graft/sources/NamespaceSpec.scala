package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Catalog namespaces — marker directories with `/`-joined table names:
  * CRUD rules, table creation inside namespaces, name/namespace collision
  * and traversal rejection, and full table operations (append, scan,
  * compact, time travel) on a namespaced table.
  */
class NamespaceSpec extends SparkSpec {

  import spark.implicits._

  test("create / list / drop with parent, emptiness, and collision rules") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-ns-cat").toString)
    assert(cat.namespaces().isEmpty)
    cat.createNamespace("demo_db", Map("owner" -> "pipeline"))
    cat.createNamespace("demo_db/curated")
    assert(cat.namespaces() == Seq("demo_db", "demo_db/curated"))
    assert(cat.namespaceProperties("demo_db") == Map("owner" -> "pipeline"))
    assert(cat.namespaceProperties("demo_db/curated").isEmpty)
    // duplicate / missing parent / traversal / reserved names
    intercept[IllegalArgumentException](cat.createNamespace("demo_db"))
    intercept[IllegalArgumentException](cat.createNamespace("nope/child"))
    intercept[IllegalArgumentException](cat.createNamespace(".."))
    intercept[IllegalArgumentException](cat.createNamespace(".hidden"))
    intercept[IllegalArgumentException](cat.createNamespace("_data"))
    intercept[IllegalArgumentException](cat.createNamespace("a@b"))
    // a table and a namespace cannot share a name, in either order
    cat.createTable("flat", Nil)
    intercept[IllegalArgumentException](cat.createNamespace("flat"))
    intercept[IllegalArgumentException](cat.createTable("demo_db", Nil))
    // drop: refuses non-empty (child namespace), then succeeds bottom-up
    intercept[IllegalArgumentException](cat.dropNamespace("demo_db"))
    cat.dropNamespace("demo_db/curated")
    cat.dropNamespace("demo_db")
    assert(cat.namespaces().isEmpty)
    intercept[IllegalArgumentException](cat.dropNamespace("demo_db"))
  }

  test("namespaced tables: full lifecycle, listing, isolation from flat tables") {
    val root = Files.createTempDirectory("graft-ns-life").toString
    val out = Files.createTempDirectory("graft-ns-out").toString
    val cat = new GraftCatalog(root)
    cat.createNamespace("demo_db")
    // creation requires the namespace to exist — no implicit namespaces
    intercept[IllegalArgumentException](cat.createTable("other_db/t", Nil))
    cat.createTable("demo_db/t", Nil)
    cat.createTable("t", Nil) // flat table with the same leaf name
    assert(cat.tables() == Seq("demo_db/t", "t"))
    // the two tables are fully independent
    cat.appendFiles(spark, "demo_db/t", Seq((1L, "ns"), (2L, "ns")).toDF("k", "v"), out)
    cat.appendFiles(spark, "t", Seq((9L, "flat")).toDF("k", "v"), out)
    assert(cat.scanTable(spark, "demo_db/t").count() == 2)
    assert(cat.scanTable(spark, "t").count() == 1)
    // MoR delete + compaction work through the namespaced name
    cat.deleteWhere(spark, "demo_db/t",
      org.apache.spark.sql.functions.col("k") === 1L, s"$root/_del")
    assert(cat.scanTable(spark, "demo_db/t").count() == 1)
    cat.compactTable(spark, "demo_db/t", s"$root/_data/demo_db/t/gen1")
    assert(cat.scanTable(spark, "demo_db/t").count() == 1)
    assert(cat.scanTableAt(spark, "demo_db/t", 2L).count() == 2,
      "time travel through the namespaced name")
    // a namespace with live tables refuses to drop; after the table drops it works
    intercept[IllegalArgumentException](cat.dropNamespace("demo_db"))
    cat.dropTable("demo_db/t")
    cat.dropNamespace("demo_db")
    assert(cat.tables() == Seq("t"))
  }

  test("rename moves across namespaces; destination namespace must exist") {
    val root = Files.createTempDirectory("graft-ns-ren").toString
    val out = Files.createTempDirectory("graft-ns-ren-out").toString
    val cat = new GraftCatalog(root)
    cat.createNamespace("a")
    cat.createTable("src", Nil)
    cat.appendFiles(spark, "src", Seq((1L, "x")).toDF("k", "v"), out)
    intercept[IllegalArgumentException](cat.renameTable("src", "missing/dst"))
    cat.renameTable("src", "a/dst")
    assert(cat.tables() == Seq("a/dst"))
    assert(cat.scanTable(spark, "a/dst").count() == 1)
    // and back out to the flat root
    cat.renameTable("a/dst", "back")
    assert(cat.tables() == Seq("back"))
  }
}
