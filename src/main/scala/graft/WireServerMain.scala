package graft

import org.apache.spark.sql.SparkSession

/** Launchable wire-compaction service — the counterpart of the reference's
  * `services/compactor` binary (tonic server on :7777,
  * `services/compactor/src/server.rs:24-34`, port from
  * `docker/compactor/config.yaml`). One long-lived Spark session serves
  * RewriteFiles/Echo frames until killed.
  *
  *   GRAFT_WIRE_PORT  listen port (default 7777, the reference's)
  *   SPARK_GRAFT_CPUS local parallelism (default: host cores, capped at 32)
  */
object WireServerMain {
  def main(args: Array[String]): Unit = {
    val port = sys.env.get("GRAFT_WIRE_PORT").map(_.toInt).getOrElse(7777)
    val avail = Runtime.getRuntime.availableProcessors()
    val cpus = math.min(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(math.min(32, avail)),
      avail)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-wire-server")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new graft.wire.WireCompactionServer(spark, port)
    // stderr: sbt passes it through unwrapped (same reasoning as Bench)
    System.err.println(
      s"graft wire compaction server listening on 127.0.0.1:${server.boundPort}")
    server.serveLoop()
  }
}
