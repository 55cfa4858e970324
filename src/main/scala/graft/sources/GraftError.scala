package graft.sources

/** Typed error model mirroring the reference's `CompactionError` enum
  * (`core/src/error/mod.rs:19-36`): one variant per failure domain, each
  * rendering with the same message prefix the reference's `thiserror`
  * derive produces. The service boundaries classify arbitrary engine
  * throwables through [[GraftError.classify]] so a wire client sees the
  * same stable, prefix-tagged strings the reference's tonic handler emits
  * (`services/compactor/src/rpc.rs:41` wraps them as `Internal error: …`).
  */
sealed abstract class GraftError(prefix: String, detail: String,
    cause: Throwable) extends RuntimeException(s"$prefix: $detail", cause)

object GraftError {

  /** IO error — file/socket/filesystem failures (`Io(#[from] io::Error)`). */
  final case class Io(detail: String, cause: Throwable = null)
      extends GraftError("IO error", detail, cause)

  /** Invalid configuration or request shape (`Config(String)`). */
  final case class Config(detail: String, cause: Throwable = null)
      extends GraftError("Invalid configuration", detail, cause)

  /** Execution failure — the catch-all the reference uses for runtime
    * failures it raised itself (`Execution(String)`).
    */
  final case class Execution(detail: String, cause: Throwable = null)
      extends GraftError("Execution failed", detail, cause)

  /** Table-format/metadata failures — manifest, snapshot, schema
    * resolution (`Iceberg(#[from] iceberg::Error)`).
    */
  final case class Metadata(detail: String, cause: Throwable = null)
      extends GraftError("Iceberg error", detail, cause)

  /** Engine failures bubbling up from Spark — the analog of the
    * reference's `DataFusion(#[from] DataFusionError)`.
    */
  final case class Engine(detail: String, cause: Throwable = null)
      extends GraftError("DataFusion error", detail, cause)

  /** Map an arbitrary throwable to its failure domain. Order matters:
    * already-typed errors pass through; request/argument problems are
    * Config (the `require(...)` convention across the runner and bridge);
    * IO before engine because Spark wraps task IO failures in
    * `SparkException` chains whose ROOT cause is the IOException.
    */
  def classify(t: Throwable): GraftError = t match {
    case g: GraftError => g
    case e: IllegalArgumentException => Config(String.valueOf(e.getMessage), e)
    case e =>
      // both domain probes walk the full cause chain: Spark wraps task IO
      // failures, and plumbing (ExecutionException etc.) wraps Spark ones
      if (rootChain(e).exists(_.isInstanceOf[java.io.IOException]))
        Io(String.valueOf(rootMessage(e)), e)
      else if (rootChain(e).exists(_.getClass.getName.startsWith("org.apache.spark")))
        Engine(String.valueOf(rootMessage(e)), e)
      else Execution(String.valueOf(rootMessage(e)), e)
  }

  private def rootChain(t: Throwable): List[Throwable] = {
    val b = List.newBuilder[Throwable]
    var cur = t
    var depth = 0
    while (cur != null && depth < 16) { b += cur; cur = cur.getCause; depth += 1 }
    b.result()
  }

  private def rootMessage(t: Throwable): String = {
    val chain = rootChain(t)
    val root = chain.last
    if (root.getMessage != null) root.getMessage else t.toString
  }
}
