package graft.sources

import graft.wire.PgWireClient

/** The catalog pointer on a REAL postgres — the reference's deployed
  * `SqlCatalog` shape (`core/src/compaction/mod.rs:183-202`: an
  * `iceberg-catalog-sql` instance over postgres), previously proven only
  * on embedded Derby ([[JdbcHeadStore]]). Same Iceberg `JdbcCatalog`
  * table layout, same single-row compare-and-swap commit:
  *
  * {{{ UPDATE iceberg_tables SET metadata_location = :new
  *     WHERE ... AND metadata_location = :old }}}
  *
  * An autocommitted single-row UPDATE either wins (`UPDATE 1`) or loses
  * (`UPDATE 0`), never both — postgres' row atomicity serializes
  * concurrent drivers across hosts, which is the whole reason production
  * deployments keep the pointer in SQL.
  *
  * Speaks the public v3 wire protocol directly ([[PgWireClient]] — the
  * sandbox has postgres but no JDBC driver jar). All methods synchronize
  * on the single connection, exactly like the Derby store; cross-process
  * safety comes from the database, not this lock.
  */
final class PgHeadStore(
    host: String,
    port: Int,
    user: String,
    database: String,
    catalogName: String,
    namespace: String = "default") extends GraftCatalog.HeadStore {

  private val conn = new PgWireClient(host, port, user, database)

  conn.synchronized {
    conn.query(
      "CREATE TABLE IF NOT EXISTS iceberg_tables (" +
        "catalog_name VARCHAR(255) NOT NULL, " +
        "table_namespace VARCHAR(255) NOT NULL, " +
        "table_name VARCHAR(255) NOT NULL, " +
        "metadata_location VARCHAR(1000), " +
        "previous_metadata_location VARCHAR(1000), " +
        "PRIMARY KEY (catalog_name, table_namespace, table_name))")
  }

  private def location(id: Long) = s"snap-$id.tsv"

  private def parseId(location: String): Long =
    location.stripPrefix("snap-").stripSuffix(".tsv").toLong

  /** Simple-query strings carry literals inline; standard SQL quoting
    * (doubled single quotes). Identifiers here are catalog-controlled
    * table names, but the escaping keeps any name safe.
    */
  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def keyWhere(table: String): String =
    s"catalog_name = ${lit(catalogName)} AND " +
      s"table_namespace = ${lit(namespace)} AND table_name = ${lit(table)}"

  override def exists(table: String): Boolean = conn.synchronized {
    conn.query(
      s"SELECT 1 FROM iceberg_tables WHERE ${keyWhere(table)}").rows.nonEmpty
  }

  override def create(table: String, id: Long): Unit = conn.synchronized {
    try {
      conn.query(
        "INSERT INTO iceberg_tables (catalog_name, table_namespace, " +
          "table_name, metadata_location, previous_metadata_location) " +
          s"VALUES (${lit(catalogName)}, ${lit(namespace)}, ${lit(table)}, " +
          s"${lit(location(id))}, NULL)")
      ()
    } catch {
      // unique_violation — the same "already exists" contract the file
      // store's require() and the Derby store's 23505 mapping give
      case e: PgWireClient.PgError if e.sqlState == "23505" =>
        throw new IllegalArgumentException(s"table $table already exists", e)
    }
  }

  override def read(table: String): Long = conn.synchronized {
    val rows = conn.query(
      s"SELECT metadata_location FROM iceberg_tables " +
        s"WHERE ${keyWhere(table)}").rows
    require(rows.nonEmpty, s"table $table not found in catalog $catalogName")
    parseId(rows.head.head.getOrElse(
      throw new IllegalStateException(s"NULL metadata_location for $table")))
  }

  override def cas(table: String, expected: Long, next: Long): Boolean =
    conn.synchronized {
      conn.query(
        s"UPDATE iceberg_tables SET metadata_location = ${lit(location(next))}, " +
          s"previous_metadata_location = ${lit(location(expected))} " +
          s"WHERE ${keyWhere(table)} AND " +
          s"metadata_location = ${lit(location(expected))}")
        .commandTag == "UPDATE 1"
    }

  override def remove(table: String): Unit = conn.synchronized {
    // 0 rows = already gone: drops are replayable
    conn.query(s"DELETE FROM iceberg_tables WHERE ${keyWhere(table)}")
    ()
  }

  def close(): Unit = conn.synchronized(conn.close())
}
