package graft.sources

import graft.SparkSpec
import org.apache.avro.SchemaBuilder
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Property-style round-trip (seeded random rows): whatever the avro writer
  * can produce over the supported wire types, [[AvroScan]] must read back
  * value-exactly, with dense per-file positions, across multiple files and
  * nullable unions.
  */
class AvroScanPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)

  private case class R(
      id: Long,
      s: Option[String],
      dbl: Option[Double],
      flag: Option[Boolean],
      arr: Seq[Long])

  private def randRow(id: Long): R = R(
    id,
    if (rnd.nextBoolean()) Some(rnd.alphanumeric.take(rnd.nextInt(12)).mkString) else None,
    if (rnd.nextBoolean()) Some(rnd.nextDouble() * 1e6 - 5e5) else None,
    if (rnd.nextBoolean()) Some(rnd.nextBoolean()) else None,
    Seq.fill(rnd.nextInt(5))(rnd.nextLong()))

  test("avro round-trip preserves values, nulls, arrays, and positions across files") {
    val dir = Files.createTempDirectory("graft-avro-prop").toString
    val schema = SchemaBuilder.record("r").fields()
      .requiredLong("id")
      .optionalString("s")
      .optionalDouble("dbl")
      .optionalBoolean("flag")
      .name("arr").`type`().array().items().longType().noDefault()
      .endRecord()
    val rows = (0L until 300L).map(randRow)
    val files = rows.grouped(100).zipWithIndex.map { case (chunk, fi) =>
      val path = s"$dir/part-$fi.avro"
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(path))
      chunk.foreach { r =>
        val rec = new GenericData.Record(schema)
        rec.put("id", r.id)
        rec.put("s", r.s.orNull)
        rec.put("dbl", r.dbl.map(Double.box).orNull)
        rec.put("flag", r.flag.map(Boolean.box).orNull)
        rec.put("arr", java.util.Arrays.asList(r.arr.map(Long.box): _*))
        w.append(rec)
      }
      w.close()
      path
    }.toSeq

    val df = AvroScan.readWithHiddenCols(spark, files).cache()
    assert(df.count() == 300)
    // value-exact round trip, keyed by id
    val got = df.collect().map { row =>
      R(row.getAs[Long]("id"),
        Option(row.getAs[String]("s")),
        Option(row.getAs[Any]("dbl")).map(_.asInstanceOf[Double]),
        Option(row.getAs[Any]("flag")).map(_.asInstanceOf[Boolean]),
        row.getSeq[Long](row.fieldIndex("arr")).toList)
    }.sortBy(_.id).toSeq
    assert(got == rows.map(r => r.copy(arr = r.arr.toList)))
    // dense 0-based positions per file, and ids 0..99 / 100..199 / 200..299
    // land in their writing files (positions follow write order)
    import graft.operators.MorPlanner
    val bad = df.groupBy(MorPlanner.FilePathCol)
      .agg(min(col(MorPlanner.PosCol)).as("mn"), max(col(MorPlanner.PosCol)).as("mx"),
        count(lit(1)).as("n"), min(col("id")).as("mnid"), max(col("id")).as("mxid"))
      .filter(col("mn") =!= 0 || col("mx") =!= 99 || col("n") =!= 100 ||
        col("mxid") - col("mnid") =!= 99)
    assert(bad.count() == 0)
    // position equals the row's offset within its file (id % 100 here)
    assert(df.filter(col(MorPlanner.PosCol) =!= col("id") % 100).count() == 0)
    df.unpersist()
  }
}
