package graft.sources

import java.sql.{Connection, DriverManager, SQLException}

/** SQL-backed catalog pointer — the deployment shape of the reference's
  * `SqlCatalog` (`core/src/compaction/mod.rs:183-202`, an
  * `iceberg-catalog-sql` instance over postgres), rebuilt on the embedded
  * Derby engine that ships on the Spark classpath.
  *
  * Schema is Iceberg's public `JdbcCatalog` layout: one row per table in
  * `iceberg_tables(catalog_name, table_namespace, table_name,
  * metadata_location, previous_metadata_location)`, where
  * `metadata_location` points at the current metadata document (here: the
  * catalog's `snap-<id>.tsv`) and every commit is a compare-and-swap
  * `UPDATE … SET metadata_location = :new WHERE metadata_location = :old`.
  * The database's row atomicity is what serializes concurrent drivers —
  * an autocommitted single-row UPDATE either wins (1 row) or loses (0
  * rows), never both — which is the whole reason production deployments
  * put the pointer in SQL instead of a filesystem.
  *
  * All methods are synchronized on the shared connection (Derby embedded
  * connections are not thread-safe for concurrent statements); cross-
  * PROCESS safety comes from the database, not this lock.
  */
final class JdbcHeadStore(
    jdbcUrl: String,
    catalogName: String,
    namespace: String = "default") extends GraftCatalog.HeadStore {

  private val conn: Connection = JdbcHeadStore.connect(jdbcUrl)

  JdbcHeadStore.ensureSchema(conn)

  private def location(id: Long) = s"snap-$id.tsv"

  private def parseId(location: String): Long =
    location.stripPrefix("snap-").stripSuffix(".tsv").toLong

  override def exists(table: String): Boolean = conn.synchronized {
    val ps = conn.prepareStatement(
      "SELECT 1 FROM iceberg_tables WHERE catalog_name = ? AND " +
        "table_namespace = ? AND table_name = ?")
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      ps.setString(3, table)
      val rs = ps.executeQuery()
      try rs.next() finally rs.close()
    } finally ps.close()
  }

  override def create(table: String, id: Long): Unit = conn.synchronized {
    val ps = conn.prepareStatement(
      "INSERT INTO iceberg_tables (catalog_name, table_namespace, " +
        "table_name, metadata_location, previous_metadata_location) " +
        "VALUES (?, ?, ?, ?, NULL)")
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      ps.setString(3, table); ps.setString(4, location(id))
      ps.executeUpdate()
    } catch {
      // Derby's duplicate-key SQLState — surface as the same
      // "already exists" contract the file store's require() gives
      case e: SQLException if e.getSQLState == "23505" =>
        throw new IllegalArgumentException(s"table $table already exists", e)
    } finally ps.close()
  }

  override def read(table: String): Long = conn.synchronized {
    val ps = conn.prepareStatement(
      "SELECT metadata_location FROM iceberg_tables WHERE catalog_name = ? " +
        "AND table_namespace = ? AND table_name = ?")
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      ps.setString(3, table)
      val rs = ps.executeQuery()
      try {
        require(rs.next(), s"table $table not found in catalog $catalogName")
        parseId(rs.getString(1))
      } finally rs.close()
    } finally ps.close()
  }

  override def cas(table: String, expected: Long, next: Long): Boolean =
    conn.synchronized {
      val ps = conn.prepareStatement(
        "UPDATE iceberg_tables SET metadata_location = ?, " +
          "previous_metadata_location = ? WHERE catalog_name = ? AND " +
          "table_namespace = ? AND table_name = ? AND metadata_location = ?")
      try {
        ps.setString(1, location(next)); ps.setString(2, location(expected))
        ps.setString(3, catalogName); ps.setString(4, namespace)
        ps.setString(5, table); ps.setString(6, location(expected))
        ps.executeUpdate() == 1
      } finally ps.close()
    }

  override def remove(table: String): Unit = conn.synchronized {
    val ps = conn.prepareStatement(
      "DELETE FROM iceberg_tables WHERE catalog_name = ? AND " +
        "table_namespace = ? AND table_name = ?")
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      ps.setString(3, table)
      ps.executeUpdate() // 0 rows = already gone: drops are replayable
      ()
    } finally ps.close()
  }

  def close(): Unit = conn.synchronized(conn.close())
}

object JdbcHeadStore {

  /** Derby 10.16 splits the embedded JDBC driver into derbytools; JDBC-4
    * autoloading usually finds it, but an explicit registration keeps the
    * store working when the ServiceLoader path is shadowed.
    */
  private def connect(jdbcUrl: String): Connection =
    try DriverManager.getConnection(jdbcUrl)
    catch {
      case _: SQLException =>
        Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        DriverManager.getConnection(jdbcUrl)
    }

  /** Create `iceberg_tables` if absent (Derby has no IF NOT EXISTS; the
    * table-exists SQLState X0Y32 is the idempotence signal).
    */
  private def ensureSchema(conn: Connection): Unit = conn.synchronized {
    val st = conn.createStatement()
    try st.executeUpdate(
      "CREATE TABLE iceberg_tables (" +
        "catalog_name VARCHAR(255) NOT NULL, " +
        "table_namespace VARCHAR(255) NOT NULL, " +
        "table_name VARCHAR(255) NOT NULL, " +
        "metadata_location VARCHAR(1000), " +
        "previous_metadata_location VARCHAR(1000), " +
        "PRIMARY KEY (catalog_name, table_namespace, table_name))")
    catch {
      case e: SQLException if e.getSQLState == "X0Y32" => () // already there
    } finally st.close()
  }
}
