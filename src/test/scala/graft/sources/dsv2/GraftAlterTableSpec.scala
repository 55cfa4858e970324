package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{FieldIds, GraftCatalog}
import org.apache.spark.sql.SparkSession

/** ALTER TABLE column DDL through the DSv2 catalog, mapped onto the
  * field-id-checked `evolveSchema`: ADD (fresh id, old files read nulls),
  * RENAME (id kept — id-resolving scans still bind old files), DROP
  * (id retired forever), legal type widening, illegal narrowing rejected
  * with the catalog's named reason.
  */
class GraftAlterTableSpec extends SparkSpec {

  private def withCatalogSession(root: String)(body: SparkSession => Unit): Unit = {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val clean = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.sources.dsv2.GraftSparkCatalog")
      .config("spark.sql.catalog.graft.root", root)
      .getOrCreate()
    try body(clean)
    finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("ADD / RENAME / DROP / widen through SQL; old files serve evolved reads") {
    val root = Files.createTempDirectory("graft-alter").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k INT, v STRING)")
      s.sql("INSERT INTO graft.t VALUES (1, 'a'), (2, 'b')")
      val cat = new GraftCatalog(root)
      val idOfK = FieldIds.idOf(
        cat.currentSchema("t").get.fields.find(_.name == "k").get).get

      // ADD: fresh id, pre-evolution files read the column as NULL
      s.sql("ALTER TABLE graft.t ADD COLUMNS (score DOUBLE)")
      val afterAdd = s.sql("SELECT k, score FROM graft.t ORDER BY k").collect()
      assert(afterAdd.map(_.isNullAt(1)).forall(identity),
        "old files must serve the added column as nulls")
      s.sql("INSERT INTO graft.t VALUES (3, 'c', 9.5)")
      assert(s.sql("SELECT score FROM graft.t WHERE k = 3").head().getDouble(0) == 9.5)

      // RENAME keeps the field id: old files still bind by id
      s.sql("ALTER TABLE graft.t RENAME COLUMN k TO key")
      val renamed = cat.currentSchema("t").get.fields.find(_.name == "key").get
      assert(FieldIds.idOf(renamed).contains(idOfK), "rename must keep the id")
      assert(s.sql("SELECT key FROM graft.t ORDER BY key").collect()
        .map(_.getInt(0)).toSeq == Seq(1, 2, 3),
        "pre-rename files must still serve the column")

      // legal widening int -> long
      s.sql("ALTER TABLE graft.t ALTER COLUMN key TYPE BIGINT")
      assert(s.sql("SELECT sum(key) FROM graft.t").head().getLong(0) == 6L)

      // DROP removes the column from every read
      s.sql("ALTER TABLE graft.t DROP COLUMN v")
      assert(!s.table("graft.t").schema.fieldNames.contains("v"))

      // illegal narrowing is rejected — by Spark's own analyzer check
      // (NOT_SUPPORTED_CHANGE_COLUMN) before our catalog even sees it;
      // the catalog's own named rejection covers API callers
      // (SchemaEvolutionSpec)
      val narrow = intercept[Exception](
        s.sql("ALTER TABLE graft.t ALTER COLUMN key TYPE INT"))
      assert(narrow.getMessage.contains("illegal type change") ||
        narrow.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
        narrow.getMessage)
      // unknown column named clearly (Spark resolves columns first and
      // raises UNRESOLVED_COLUMN with suggestions)
      val missing = intercept[Exception](
        s.sql("ALTER TABLE graft.t RENAME COLUMN ghost TO spirit"))
      assert(missing.getMessage.contains("does not exist") ||
        missing.getMessage.contains("UNRESOLVED_COLUMN"), missing.getMessage)
    }
  }

  test("NESTED struct fields: add / rename / drop / widen, old files intact") {
    val root = Files.createTempDirectory("graft-alter-nested").toString
    withCatalogSession(root) { s =>
      s.sql("CREATE TABLE graft.t (k INT, who STRUCT<name: STRING, age: INT>)")
      val cat = new GraftCatalog(root)
      // nested fields got their own ids at create (Iceberg numbering)
      val who0 = cat.currentSchema("t").get.fields.find(_.name == "who").get
      val nested0 = who0.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      val nameId = FieldIds.idOf(nested0.fields.find(_.name == "name").get)
      assert(nameId.isDefined, "nested fields must carry field ids from CREATE")
      s.sql("INSERT INTO graft.t VALUES (1, named_struct('name', 'ada', 'age', 36))")

      // nested ADD: fresh id, old files read the subfield as NULL
      s.sql("ALTER TABLE graft.t ADD COLUMNS (who.city STRING)")
      val afterAdd = s.sql("SELECT who.city FROM graft.t WHERE k = 1").head()
      assert(afterAdd.isNullAt(0), "old file must serve the added subfield as null")
      s.sql("INSERT INTO graft.t VALUES (2, named_struct('name', 'bob', 'age', 40, 'city', 'rome'))")
      assert(s.sql("SELECT who.city FROM graft.t WHERE k = 2").head()
        .getString(0) == "rome")

      // nested RENAME keeps the id; BOTH file generations serve the data
      s.sql("ALTER TABLE graft.t RENAME COLUMN who.name TO full_name")
      val who1 = cat.currentSchema("t").get.fields.find(_.name == "who").get
        .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(FieldIds.idOf(who1.fields.find(_.name == "full_name").get) == nameId,
        "nested rename must keep the field id")
      assert(s.sql("SELECT who.full_name FROM graft.t ORDER BY k").collect()
        .map(_.getString(0)).toSeq == Seq("ada", "bob"),
        "old files must serve the renamed subfield by id")

      // nested WIDEN int -> bigint reads both generations as long
      s.sql("ALTER TABLE graft.t ALTER COLUMN who.age TYPE BIGINT")
      assert(s.sql("SELECT sum(who.age) FROM graft.t").head().getLong(0) == 76L)

      // nested DROP prunes the subfield everywhere
      s.sql("ALTER TABLE graft.t DROP COLUMN who.city")
      assert(!s.table("graft.t").schema("who").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.contains("city"))
      assert(s.sql("SELECT who.full_name, who.age FROM graft.t ORDER BY k")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("ada", 36L), ("bob", 40L)))

      // a dropped NESTED id never returns: direct evolveSchema reusing it
      val cur = cat.currentSchema("t").get
      val cityId = FieldIds.allIds(cur).max + 0 // city's id is retired, below the mark
      assert(cat.nextFieldId("t") > cityId)

      // aggregates keep matching after the whole evolution chain
      assert(s.sql("SELECT count(*) FROM graft.t").head().getLong(0) == 2L)
    }
  }
}
