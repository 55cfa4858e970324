package graft

import org.apache.spark.sql.SparkSession

/** Launchable wire-compaction service — the counterpart of the reference's
  * `services/compactor` binary (tonic server on :7777,
  * `services/compactor/src/server.rs:24-34`, port from
  * `docker/compactor/config.yaml`). One long-lived Spark session serves
  * `compactor.CompactorService` until killed — by default over REAL gRPC
  * (HTTP/2 cleartext, [[graft.wire.GrpcCompactionServer]]), exactly the
  * doorway a tonic/stock client dials; the legacy framed-TCP transport
  * stays selectable for zero-netty environments.
  *
  *   GRAFT_WIRE_PORT       listen port (default 7777, the reference's)
  *   GRAFT_WIRE_TRANSPORT  "grpc" (default) | "framed"
  *   SPARK_GRAFT_CPUS      local parallelism (default: host cores, cap 32)
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
    sys.env.getOrElse("GRAFT_WIRE_TRANSPORT", "grpc") match {
      case "framed" =>
        val server = new graft.wire.WireCompactionServer(spark, port)
        // stderr: sbt passes it through unwrapped (same reasoning as Bench)
        System.err.println(
          s"graft framed-TCP compaction server on 127.0.0.1:${server.boundPort}")
        server.serveLoop()
      case "grpc" =>
        val server = new graft.wire.GrpcCompactionServer(spark, port)
        System.err.println(
          s"graft gRPC (h2c) compaction server on 127.0.0.1:${server.boundPort} " +
            s"serving ${graft.wire.GrpcCompactionServer.PathRewriteFiles}")
        // netty owns the event loop; park the main thread until killed
        new java.util.concurrent.CountDownLatch(1).await()
      case other =>
        // fail at startup, not with opaque frame errors at the first client
        // connection speaking the wrong protocol
        System.err.println(
          s"unknown GRAFT_WIRE_TRANSPORT '$other' (expected: grpc | framed)")
        sys.exit(2)
    }
  }
}
