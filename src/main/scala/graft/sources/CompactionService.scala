package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.CompactionRunner._
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** EP2 façade: the "planner elsewhere, executor here" entry point — a JSON
  * request describing file-scan tasks is decoded and executed as one
  * compaction, returning the new `DataFile`s + stats as the JSON manifest.
  * Mirrors the reference's `rewrite_file_proto` default trait method
  * (`core/src/executor/mod.rs:39-47`) and the tonic handler it backs
  * (`services/compactor/src/rpc.rs:31-47`); the wire is JSON instead of
  * protobuf per the round-1 scope decision (`SparkEntry` is the API
  * surface; this is the service-shaped doorway to the same executor).
  *
  * Request shape (all fields but `data_files` / `output_dir` optional):
  * {{{
  * {"data_files":[{"path":"/f0.parquet","seq":1,"format":"parquet"}],
  *  "position_deletes":[{"path":"/pd.parquet"}],
  *  "equality_deletes":[{"path":"/ed.parquet","seq":9,
  *                       "equality_cols":["k"],"equality_ids":[1]}],
  *  "output_dir":"/out","target_partitions":4,
  *  "stats_cols":["k"],"cluster_by":["k"],
  *  "partition_spec":[{"name":"p_year","transform":"year","source":"ts"},
  *                    {"name":"p_b","transform":"bucket[16]","source":"k"}]}
  * }}}
  * `partition_spec` mirrors the reference's wire PartitionSpec decode
  * (`parser/proto.rs:295-328`): transforms identity / year / month / day /
  * hour / bucket[n] / truncate[w] / void, resolved against
  * [[graft.functions.IcebergTransforms]] and fanned out by the writer.
  * Like the reference, the caller commits: the response carries the added
  * files + removed inputs; no catalog mutation happens here.
  */
object CompactionService {

  private val mapper = new ObjectMapper()

  private def strings(n: JsonNode): Seq[String] =
    if (n == null) Nil else n.elements().asScala.map(_.asText()).toSeq

  private def ints(n: JsonNode): Seq[Int] =
    if (n == null) Nil else n.elements().asScala.map(_.asInt()).toSeq

  private def elems(n: JsonNode): Seq[JsonNode] =
    if (n == null) Nil else n.elements().asScala.toSeq

  def rewriteFiles(spark: SparkSession, requestJson: String): String = {
    val req = mapper.readTree(requestJson)
    val dataTasks = elems(req.get("data_files")).map { f =>
      DataFileTask(
        path = f.get("path").asText(),
        seqNum = if (f.has("seq")) f.get("seq").asLong() else 0L,
        format = if (f.has("format")) f.get("format").asText() else "parquet")
    }
    val posDeletes = elems(req.get("position_deletes"))
      .map(f => PosDeleteTask(f.get("path").asText()))
    val eqDeletes = elems(req.get("equality_deletes")).map { f =>
      EqDeleteTask(
        path = f.get("path").asText(),
        seqNum = if (f.has("seq")) f.get("seq").asLong() else 0L,
        equalityCols = strings(f.get("equality_cols")),
        equalityIds = ints(f.get("equality_ids")))
    }
    val outDir = req.get("output_dir").asText()
    val transforms = elems(req.get("partition_spec")).map { spec =>
      spec.get("name").asText() ->
        partitionTransform(spec.get("transform").asText(),
          spec.get("source").asText())
    }
    val config = CompactionConfig(
      targetPartitions =
        if (req.has("target_partitions")) req.get("target_partitions").asInt() else 4,
      partitionTransforms = transforms,
      statsCols = strings(req.get("stats_cols")),
      clusterBy = strings(req.get("cluster_by")))
    val manifest = compact(spark, dataTasks, posDeletes, eqDeletes, outDir, config)
    CompactionRunner.manifestJson(manifest)
  }

  private val Parameterized = """([a-z]+)\[(\d+)\]""".r

  /** Wire transform name → transform column (T1–T8, §2.6). */
  private[sources] def partitionTransform(
      transform: String, source: String): org.apache.spark.sql.Column = {
    import graft.functions.IcebergTransforms._
    import org.apache.spark.sql.functions.col
    transform match {
      case "identity" => identityT(col(source))
      case "year" => yearsT(col(source))
      case "month" => monthsT(col(source))
      case "day" => daysT(col(source))
      case "hour" => hoursT(col(source))
      case Parameterized("bucket", n) => bucketT(n.toInt, col(source))
      case Parameterized("truncate", w) =>
        // width-w truncation; string sources take the prefix form
        truncateT(w.toInt, col(source), isString = false)
      case "void" => voidT(col(source))
      case other =>
        throw new IllegalArgumentException(s"unknown partition transform: $other")
    }
  }
}
