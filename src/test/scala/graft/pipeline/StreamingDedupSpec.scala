package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The production streaming-dedup loop must be EXACTLY the sequential
  * batch loop: same verdicts per batch, same final index state — streaming
  * adds delivery mechanics, never semantics.
  */
case class StreamedDoc(doc_id: Long, text: String)

class StreamingDedupSpec extends SparkSpec {

  test("stream-through ≡ sequential batch loop: verdicts and final index state") {
    val dir = Files.createTempDirectory("graft_sdedup_").toString
    val c = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), lower(col("text")).as("text"))
    val additions = c.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" graft dup tail")).as("text"))
    val isNewOrig = col("doc_id") % 10 === 7
    val old = c.filter(!isNewOrig)
    val incoming = c.filter(isNewOrig).unionAll(additions)
    // three deterministic micro-batches
    val batches = (0 to 2).map(i => incoming.filter(col("doc_id") % 3 === i))

    val sIdx = DedupIndex.create(spark, "sdx_stream", dir + "/s", old)
    val bIdx = DedupIndex.create(spark, "sdx_batch", dir + "/b", old)
    try {
      // streaming side: MemoryStream drained batch-by-batch (one
      // addData + AvailableNow run per batch pins batch boundaries so the
      // comparison is batch-exact, not scheduler-dependent)
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[StreamedDoc]
      val got = scala.collection.mutable.ListBuffer[(Long, String)]()
      val ckpt = dir + "/ckpt"
      batches.foreach { b =>
        input.addData(b.as[StreamedDoc].collect().toSeq.sortBy(_.doc_id))
        val q = StreamingDedup.run("sdx_stream", input.toDF(), v =>
          got ++= v.select(col("doc_id"), col("verdict")).as[(Long, String)]
            .collect(), checkpoint = Some(ckpt))
        q.awaitTermination()
      }
      // batch side: the plain sequential loop
      val want = scala.collection.mutable.ListBuffer[(Long, String)]()
      batches.foreach { b =>
        val v = bIdx.dedupBatch(b)
        bIdx.append(v)
        want ++= v.select(col("doc_id"), col("verdict")).as[(Long, String)]
          .collect()
      }
      assert(got.sorted == want.sorted,
        s"streaming verdicts diverge: ${(got.toSet -- want.toSet).take(5)} / " +
          s"${(want.toSet -- got.toSet).take(5)}")
      // final index state identical table-by-table (row sets)
      Seq("keys", "bands", "docs").foreach { t =>
        val s = spark.table(s"sdx_stream_$t")
        val b = spark.table(s"sdx_batch_$t")
        assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty,
          s"index table $t diverges between stream and batch loops")
      }
    } finally {
      sIdx.drop(); bIdx.drop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
