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
  * on this store (one live connection at a time, exactly like the Derby
  * store); cross-process safety comes from the database, not this lock.
  *
  * Connection loss is RECOVERABLE: the store is memoized process-wide per
  * catalog root, so a dropped socket (postgres restart, idle timeout,
  * network blip) that permanently failed every subsequent call would brick
  * the root until JVM restart. Instead each operation reopens the socket
  * and retries ONCE on IOException. The two non-idempotent retries resolve
  * their own ambiguity ("did the lost first attempt apply?") from the
  * database state — see [[create]] and [[cas]].
  */
final class PgHeadStore(
    host: String,
    port: Int,
    user: String,
    database: String,
    catalogName: String,
    namespace: String = "default") extends GraftCatalog.HeadStore {

  private var conn = new PgWireClient(host, port, user, database)

  /** Run `body` on the live connection; on IOException reopen and retry
    * once. Synchronized on the store — the connection swap and the query
    * serialize together.
    */
  private def retried[A](body: PgWireClient => A): A = synchronized {
    try body(conn)
    catch {
      case _: java.io.IOException =>
        try conn.close() catch { case _: Exception => () }
        conn = new PgWireClient(host, port, user, database)
        body(conn)
    }
  }

  retried { c =>
    c.query(
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

  private def locationOf(c: PgWireClient, table: String): Option[String] =
    c.query(
      s"SELECT metadata_location FROM iceberg_tables " +
        s"WHERE ${keyWhere(table)}").rows.headOption.flatMap(_.head)

  override def exists(table: String): Boolean = retried { c =>
    c.query(
      s"SELECT 1 FROM iceberg_tables WHERE ${keyWhere(table)}").rows.nonEmpty
  }

  override def create(table: String, id: Long): Unit = synchronized {
    def insert(c: PgWireClient): Unit = {
      c.query(
        "INSERT INTO iceberg_tables (catalog_name, table_namespace, " +
          "table_name, metadata_location, previous_metadata_location) " +
          s"VALUES (${lit(catalogName)}, ${lit(namespace)}, ${lit(table)}, " +
          s"${lit(location(id))}, NULL)")
      ()
    }
    def exists(e: PgWireClient.PgError): Nothing =
      // unique_violation — the same "already exists" contract the file
      // store's require() and the Derby store's 23505 mapping give
      throw new IllegalArgumentException(s"table $table already exists", e)
    try insert(conn)
    catch {
      case e: PgWireClient.PgError if e.sqlState == "23505" => exists(e)
      case _: java.io.IOException =>
        try conn.close() catch { case _: Exception => () }
        conn = new PgWireClient(host, port, user, database)
        // the lost first attempt may have applied before its response was
        // read: a retry 23505 whose row already points at OUR location is
        // our own insert landing — success, not "already exists"
        try insert(conn)
        catch {
          case e: PgWireClient.PgError if e.sqlState == "23505" =>
            if (!locationOf(conn, table).contains(location(id))) exists(e)
        }
    }
  }

  override def read(table: String): Long = retried { c =>
    val rows = c.query(
      s"SELECT metadata_location FROM iceberg_tables " +
        s"WHERE ${keyWhere(table)}").rows
    require(rows.nonEmpty, s"table $table not found in catalog $catalogName")
    parseId(rows.head.head.getOrElse(
      throw new IllegalStateException(s"NULL metadata_location for $table")))
  }

  override def cas(table: String, expected: Long, next: Long): Boolean =
    synchronized {
      def upd(c: PgWireClient): Boolean =
        c.query(
          s"UPDATE iceberg_tables SET metadata_location = ${lit(location(next))}, " +
            s"previous_metadata_location = ${lit(location(expected))} " +
            s"WHERE ${keyWhere(table)} AND " +
            s"metadata_location = ${lit(location(expected))}")
          .commandTag == "UPDATE 1"
      try upd(conn)
      catch {
        case _: java.io.IOException =>
          try conn.close() catch { case _: Exception => () }
          conn = new PgWireClient(host, port, user, database)
          // the lost first attempt may have applied: a retry UPDATE 0
          // where the pointer now reads `next` means OUR swap landed —
          // no other driver can have committed the same id, because the
          // snap-`next` document install is first-writer-wins and ours
          // won before this cas was reached
          upd(conn) || locationOf(conn, table).contains(location(next))
      }
    }

  override def remove(table: String): Unit = retried { c =>
    // 0 rows = already gone: drops are replayable
    c.query(s"DELETE FROM iceberg_tables WHERE ${keyWhere(table)}")
    ()
  }

  def close(): Unit = synchronized(conn.close())
}
