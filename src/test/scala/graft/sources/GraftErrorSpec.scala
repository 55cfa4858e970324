package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class GraftErrorSpec extends AnyFunSuite {

  test("variants render with the reference's thiserror prefixes") {
    assert(GraftError.Io("disk gone").getMessage == "IO error: disk gone")
    assert(GraftError.Config("no dir_path").getMessage ==
      "Invalid configuration: no dir_path")
    assert(GraftError.Execution("boom").getMessage == "Execution failed: boom")
    assert(GraftError.Metadata("bad manifest").getMessage ==
      "Iceberg error: bad manifest")
    assert(GraftError.Engine("task died").getMessage ==
      "DataFusion error: task died")
  }

  test("classify routes by failure domain") {
    assert(GraftError.classify(new IllegalArgumentException("requirement failed: x"))
      .isInstanceOf[GraftError.Config])
    assert(GraftError.classify(new java.io.FileNotFoundException("gone"))
      .isInstanceOf[GraftError.Io])
    // Spark wraps task IO failures; the ROOT cause decides
    assert(GraftError.classify(new RuntimeException("outer",
      new java.io.IOException("root"))).isInstanceOf[GraftError.Io])
    assert(GraftError.classify(
      new org.apache.spark.SparkException("stage failed"))
      .isInstanceOf[GraftError.Engine])
    assert(GraftError.classify(new RuntimeException("other"))
      .isInstanceOf[GraftError.Execution])
    // already-typed errors pass through unchanged
    val m = GraftError.Metadata("m")
    assert(GraftError.classify(m) eq m)
  }
}
