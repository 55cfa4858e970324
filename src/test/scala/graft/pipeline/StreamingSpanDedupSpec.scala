package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming span-audit loop must be EXACTLY the sequential batch
  * loop: same per-doc counts per batch, same final inventory — streaming
  * adds delivery mechanics, never semantics.
  */
class StreamingSpanDedupSpec extends SparkSpec {

  test("stream-through ≡ sequential batch loop: counts and final inventory") {
    val dir = Files.createTempDirectory("graft_sspan_").toString
    val c = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), lower(col("text")).as("text"))
    // incoming docs include full copies of corpus docs (every span dup),
    // tailed copies (mostly dup), and untouched originals
    val additions = c.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" graft dup tail")).as("text"))
    val isNewOrig = col("doc_id") % 10 === 7
    val old = c.filter(!isNewOrig)
    val incoming = c.filter(isNewOrig).unionAll(additions)
    val batches = (0 to 2).map(i => incoming.filter(col("doc_id") % 3 === i))

    val sIdx = SpanIndex.create(spark, "ssx_stream", dir + "/s", old)
    val bIdx = SpanIndex.create(spark, "ssx_batch", dir + "/b", old)
    try {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[StreamedDoc]
      val got = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
      val ckpt = dir + "/ckpt"
      batches.foreach { b =>
        input.addData(b.as[StreamedDoc].collect().toSeq.sortBy(_.doc_id))
        val q = StreamingSpanDedup.run("ssx_stream", input.toDF(), v =>
          got ++= v.as[(Long, Long, Long)].collect(), checkpoint = Some(ckpt))
        q.awaitTermination()
      }
      val want = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
      batches.foreach { b =>
        want ++= bIdx.probe(b).as[(Long, Long, Long)].collect()
        bIdx.append(b)
      }
      assert(got.sorted == want.sorted,
        s"streaming counts diverge: ${(got.toSet -- want.toSet).take(5)} / " +
          s"${(want.toSet -- got.toSet).take(5)}")
      // the appends actually landed: re-probing an already-drained batch
      // reports every span duplicated
      val re = SpanIndex.open(spark, "ssx_stream").probe(batches(0))
        .as[(Long, Long, Long)].collect()
      assert(re.nonEmpty && re.forall { case (_, n, d) => n == d },
        s"drained batch not fully duplicated on re-probe: ${re.take(5).toSeq}")
      // final inventory identical (row sets)
      val s = spark.table("ssx_stream_spans")
      val b = spark.table("ssx_batch_spans")
      assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty,
        "inventory diverges between stream and batch loops")
    } finally {
      sIdx.drop(); bIdx.drop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
