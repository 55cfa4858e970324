package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF ANN index — the [[DedupIndex]] discipline applied to the
  * q44/q102 vector tier: the corpus-side assignment lives as a BUCKETED
  * table so batch after batch of queries probes it with no shuffle on the
  * index side (the 100 TB invariant: query batches are small, the corpus
  * is not):
  *
  *   - `<name>_ivf`   (vec_id, embedding, nrm, cid) — bucketed by cid
  *   - `<name>_cents` (cid, cv, cnrm)               — tiny, broadcast at probe
  *
  * Probing reproduces the in-memory q44 pipeline expression-for-expression
  * (same kernel dot products, same operand order, same tie-breakers), so
  * persistence provably does not change results — `VectorIndexSpec` asserts
  * byte-identical outputs against the declared q44/q102, which is the audit
  * a production deployment needs before swapping the in-memory path out.
  * Bucket count is the scale knob: at 100 TB it rises with the centroid
  * count (buckets are the unit of index-side parallelism).
  */
final class VectorIndex private (spark: SparkSession, name: String) {

  import VectorIndex._

  private def ivf = spark.table(s"${name}_ivf")
  private def cents = spark.table(s"${name}_cents")

  /** Own-bucket IVF probe, k nearest per query — q44 semantics against the
    * persisted tables. `queries` needs (qid, qe); assignment of the query
    * to its centroid uses the same expressions as the index build, so a
    * corpus vector probes exactly the bucket it was assigned to.
    */
  def probe(queries: DataFrame, k: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    val assigned = queries
      .select(col("qid"), col("qe"), normD(col("qe")).as("qnrm"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qe"), col("qnrm"), col("cid"),
        (dotD(col("cv"), col("qe")) / (col("qnrm") * col("cnrm"))).as("qcos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") === 1)
      .select(col("qid"), col("qe"), col("qnrm"), col("cid"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(ivf, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cid"),
        (dotD(col("qe"), col("embedding")) / (col("nrm") * col("qnrm"))).as("cos"))
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter(col("rn") <= k)
  }

  /** recall@k of the persisted probe against the exact brute-force top-k —
    * q102 semantics: (qid, n_hits, recall) per query.
    */
  def recallAt(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val approx = probe(queries, k).select(col("qid"), col("vec_id"))
    val e = corpus.select(col("vec_id"), col("embedding"),
      normD(col("embedding")).as("nrm"))
    val qs = queries.select(col("qid"), col("qe"), normD(col("qe")).as("qnrm"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (dotD(col("qe"), col("embedding")) / (col("nrm") * col("qnrm"))).as("cos"))
      .withColumn("rn", row_number().over(wTop)).filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
    val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    qs.select(col("qid"))
      .join(hits, Seq("qid"), "left_outer")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / k.toDouble)
  }

  /** The probe join in isolation — exposed so tests can assert the plan
    * shape (index side consumes its bucket layout, no exchange).
    */
  def probePlan(queries: DataFrame): DataFrame =
    probe(queries, 3)

  def drop(): Unit =
    Seq("ivf", "cents").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t"))
}

object VectorIndex {

  private def dotD(a: Column, b: Column): Column =
    graft.functions.VectorOps.dotC(a, b)

  private def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Build the persisted index: assign every corpus vector to its nearest
    * centroid seed (one pass, broadcast centroids — the ivfAssign shape)
    * and land the assignment bucketed by cid. `corpus` needs
    * (vec_id, embedding); centroid seeds are the first `numCentroids`
    * vec_ids, mirroring the declared q44 so outputs are comparable.
    */
  def create(
      spark: SparkSession,
      name: String,
      dir: String,
      corpus: DataFrame,
      numCentroids: Int = 4,
      numBuckets: Int = 4): VectorIndex = {
    val e = corpus.select(col("vec_id"), col("embedding"),
      normD(col("embedding")).as("nrm"))
    val cents = e.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("nrm").as("cnrm"))
    cents.write.mode("overwrite")
      .option("path", s"$dir/${name}_cents").saveAsTable(s"${name}_cents")
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"),
        (dotD(col("cv"), col("embedding")) / (col("nrm") * col("cnrm"))).as("ccos"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
      .write.mode("overwrite").bucketBy(numBuckets, "cid")
      .option("path", s"$dir/${name}_ivf").saveAsTable(s"${name}_ivf")
    new VectorIndex(spark, name)
  }

  /** Reopen previously created tables. */
  def open(spark: SparkSession, name: String): VectorIndex =
    new VectorIndex(spark, name)
}
