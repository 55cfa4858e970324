package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.GraftCatalog



/** `ALTER TABLE … ADD/DROP/REPLACE PARTITION FIELD` — Iceberg's
  * partition-spec-evolution DDL, injected by [[GraftSqlParser]]. The gate
  * shape: create through the doorway, write, evolve the spec in SQL,
  * write again, and prove point-lookup pruning across BOTH specs.
  */
class PartitionFieldSqlSpec extends SparkSpec {

  import GraftPartitionFieldSql.{parseTransform, RawTransform}

  test("transform parsing: spellings, args, and rejects") {
    assert(parseTransform("bucket(8, k)") ==
      Some(RawTransform("bucket", Some(8), "k")))
    assert(parseTransform(" truncate( 100 , `v` ) ") ==
      Some(RawTransform("truncate", Some(100), "v")))
    assert(parseTransform("days(ts)") == Some(RawTransform("days", None, "ts")))
    assert(parseTransform("k") == Some(RawTransform("identity", None, "k")))
    assert(parseTransform("`weird`") == Some(RawTransform("identity", None, "weird")))
    assert(parseTransform("bucket(8, a.b)").isEmpty, "no nested refs")
    assert(parseTransform("bucket(, k)").isEmpty)
  }

  test("only the exact DDL shape intercepts; everything else delegates") {
    assert(GraftPartitionFieldSql.parse("SELECT 1").isEmpty)
    assert(GraftPartitionFieldSql.parse(
      "ALTER TABLE t ADD COLUMN c INT").isEmpty)
    assert(GraftPartitionFieldSql.parse(
      "ALTER TABLE t ADD PARTITION (p=1)").isEmpty,
      "Spark's own Hive-partition DDL must pass through")
    val p = GraftPartitionFieldSql.parse(
      "ALTER TABLE g.db.t ADD PARTITION FIELD bucket(8, k)")
    assert(p.exists {
      case GraftAlterPartitionFieldCommand(parts, "add", f, None) =>
        parts == Seq("g", "db", "t") && f == RawTransform("bucket", Some(8), "k")
      case _ => false
    }, p)
    val r = GraftPartitionFieldSql.parse(
      "alter table g.t replace partition field bucket(4, k) with bucket(8, k)")
    assert(r.exists {
      case GraftAlterPartitionFieldCommand(parts, "replace", f, Some(w)) =>
        parts == Seq("g", "t") && f.arg.contains(4) && w.arg.contains(8)
      case _ => false
    }, r)
    // the plain parser still parses ordinary SQL through the injected
    // wrapper (the session uses it for every statement in this suite)
    assert(spark.sql("SELECT 41 + 1").head().getInt(0) == 42)
  }

  private def mount(root: String): String = {
    val g = s"gp_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$g", "graft.sources.dsv2.GraftSparkCatalog")
    spark.conf.set(s"spark.sql.catalog.$g.root", root)
    g
  }

  test("evolve bucket(4)->bucket(8) in SQL; point lookup prunes across BOTH specs") {
    val root = Files.createTempDirectory("graft-pfsql").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, v STRING) PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $g.t SELECT id, concat('old', id) FROM range(0, 400)")

    spark.sql(s"ALTER TABLE $g.t REPLACE PARTITION FIELD bucket(4, k) WITH bucket(8, k)")
    val cat = new GraftCatalog(root)
    assert(cat.partitionSpec("t") ==
      Seq(GraftCatalog.PartitionFieldDef("k_bucket", "bucket[8]", "k")))

    spark.sql(s"INSERT INTO $g.t SELECT id, concat('new', id) FROM range(1000, 1400)")
    val data = cat.loadEntries("t").filter(_.kind == "data")
    val oldFiles = data.filter(_.partitionTransforms.get("k_bucket").contains("bucket[4]|k"))
    val newFiles = data.filter(_.partitionTransforms.get("k_bucket").contains("bucket[8]|k"))
    assert(oldFiles.nonEmpty && newFiles.nonEmpty,
      "both spec generations must coexist in the snapshot")
    assert(newFiles.map(_.partitionVals("k_bucket")).distinct.size == 8)

    // rows: nothing lost, both generations readable
    assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 800L)

    // the point lookup prunes THROUGH the evolution: old files via their
    // recorded bucket[4] binding, new files via bucket[8]
    val key = 123L
    val b4 = graft.functions.IcebergMurmur3.bucketLong(key, 4)
    val b8 = graft.functions.IcebergMurmur3.bucketLong(key, 8)
    val expected =
      oldFiles.count(_.partitionVals("k_bucket").toInt == b4) +
        newFiles.count(_.partitionVals("k_bucket").toInt == b8)
    assert(expected < data.size, "fixture must actually prune")
    // the library pruner the doorway's point lookups route through must
    // bind each file against ITS recorded spec generation
    val pruned = cat.scanTableWhere(spark, "t", "k", key.toDouble, key.toDouble)
    assert(pruned.inputFiles.length == expected,
      s"lookup must open $expected files (old-spec bucket $b4 + new-spec " +
        s"bucket $b8), got ${pruned.inputFiles.length} of ${data.size}")
    assert(spark.sql(s"SELECT v FROM $g.t WHERE k = $key").head().getString(0)
      == "old123")
  }

  test("ADD on an unpartitioned table; DROP by name back to unpartitioned") {
    val root = Files.createTempDirectory("graft-pfsql2").toString
    val g = mount(root)
    spark.sql(s"CREATE TABLE $g.t (k BIGINT, grp STRING)")
    val cat = new GraftCatalog(root)
    assert(cat.partitionSpec("t").isEmpty)

    spark.sql(s"ALTER TABLE $g.t ADD PARTITION FIELD grp")
    assert(cat.partitionSpec("t") ==
      Seq(GraftCatalog.PartitionFieldDef("grp", "identity", "grp")))
    spark.sql(s"INSERT INTO $g.t VALUES (1, 'a'), (2, 'b')")
    assert(cat.loadEntries("t").filter(_.kind == "data")
      .forall(_.partitionVals.contains("grp")))

    spark.sql(s"ALTER TABLE $g.t ADD PARTITION FIELD bucket(4, k)")
    assert(cat.partitionSpec("t").map(_.name) == Seq("grp", "k_bucket"))
    // duplicate add fails loudly
    val dup = intercept[Exception](
      spark.sql(s"ALTER TABLE $g.t ADD PARTITION FIELD bucket(16, k)"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    // unknown source column fails loudly
    val bad = intercept[Exception](
      spark.sql(s"ALTER TABLE $g.t ADD PARTITION FIELD days(nope)"))
    assert(bad.getMessage.contains("nope"), bad.getMessage)

    // DROP by field NAME and by transform spelling
    spark.sql(s"ALTER TABLE $g.t DROP PARTITION FIELD k_bucket")
    assert(cat.partitionSpec("t").map(_.name) == Seq("grp"))
    spark.sql(s"ALTER TABLE $g.t DROP PARTITION FIELD grp")
    assert(cat.partitionSpec("t").isEmpty,
      "dropping the last field evolves the table back to unpartitioned")
    // writes keep working unpartitioned; earlier tuples still recorded
    spark.sql(s"INSERT INTO $g.t VALUES (3, 'c')")
    assert(spark.sql(s"SELECT count(*) FROM $g.t").head().getLong(0) == 3L)
  }
}
