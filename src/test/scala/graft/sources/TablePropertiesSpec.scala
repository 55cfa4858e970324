package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Table properties (Iceberg's key/value metadata map): set/merge/remove
  * semantics, fork carry, and survival across drop-unrelated operations.
  */
class TablePropertiesSpec extends SparkSpec {

  test("set, merge (last-writer-wins per key), remove, odd characters") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-props-cat").toString)
    cat.createTable("t", Nil)
    assert(cat.tableProperties("t").isEmpty)
    cat.updateTableProperties("t",
      Map("write.target-file-size" -> "134217728", "owner" -> "pipeline"))
    cat.updateTableProperties("t",
      Map("owner" -> "curation", "note" -> "tab\tand=eq chars"))
    assert(cat.tableProperties("t") == Map(
      "write.target-file-size" -> "134217728",
      "owner" -> "curation",
      "note" -> "tab\tand=eq chars"))
    cat.updateTableProperties("t", Map.empty, removals = Set("owner"))
    assert(!cat.tableProperties("t").contains("owner"))
    // a key in both sets is removed (removal is the later intent)
    cat.updateTableProperties("t", Map("x" -> "1"), removals = Set("x"))
    assert(!cat.tableProperties("t").contains("x"))
    // unknown table rejected
    intercept[IllegalArgumentException](
      cat.updateTableProperties("nope", Map("a" -> "b")))
  }

  test("forks inherit properties at fork time; later edits stay independent") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-props-cat").toString)
    cat.createTable("t", Nil)
    cat.updateTableProperties("t", Map("k" -> "v"))
    val fork = cat.forkTable("t", "audit")
    assert(cat.tableProperties(fork) == Map("k" -> "v"))
    cat.updateTableProperties(fork, Map("k" -> "w"))
    assert(cat.tableProperties("t") == Map("k" -> "v"))
    assert(cat.tableProperties(fork) == Map("k" -> "w"))
  }

  test("rename carries properties; drop removes them with the metadata") {
    val cat = new GraftCatalog(
      Files.createTempDirectory("graft-props-cat").toString)
    cat.createTable("t", Nil)
    cat.updateTableProperties("t", Map("k" -> "v"))
    cat.renameTable("t", "t2")
    assert(cat.tableProperties("t2") == Map("k" -> "v"))
    cat.dropTable("t2")
    cat.createTable("t2", Nil)
    assert(cat.tableProperties("t2").isEmpty,
      "a re-created table must not inherit the dropped one's properties")
  }
}
