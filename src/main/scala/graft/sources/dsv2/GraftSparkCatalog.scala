package graft.sources.dsv2

import java.util

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{FieldIds, GraftCatalog}

import scala.jdk.CollectionConverters._

/** Spark DSv2 `TableCatalog` over [[GraftCatalog]] — the doorway the
  * Iceberg-Spark ecosystem itself uses to mount tables
  * (`spark.sql.catalog.<name>`; the reference deploys into exactly this
  * shape, `core/src/compaction/mod.rs:183-202`):
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.sources.dsv2.GraftSparkCatalog")
  * spark.conf.set("spark.sql.catalog.graft.root", "/path/to/catalog")
  * spark.sql("SELECT * FROM graft.demo_db.events")
  * spark.sql("DELETE FROM graft.demo_db.events WHERE k = 1")
  * }}}
  *
  * Identifiers map onto the catalog's names: `graft.t` is the flat root
  * (the implicit `default` namespace), `graft.ns.t` is the namespaced
  * table `ns/t`. SELECT plans through a [[GraftV2Table]] scan; INSERT
  * appends through a native parquet `BatchWrite`; DELETE/UPDATE/MERGE go
  * through Spark's OWN row-level-operation planning
  * (`RewriteDeleteFromTable` / `RewriteUpdateTable` /
  * `RewriteMergeIntoTable` — core analyzer rules, NO session extensions
  * required) against [[GraftV2Table]]'s copy-on-write
  * `SupportsRowLevelOperations` implementation. `VERSION AS OF` time
  * travel resolves snapshot ids and tags via `loadTable(ident, version)`.
  */
class GraftSparkCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with FunctionCatalog {

  private var catalogName: String = _
  private var root: String = _

  private[dsv2] def cat = new GraftCatalog(root)

  /** The configured catalog root — the partition-evolution DDL
    * ([[graft.plans.GraftSqlParser]]) resolves its target table's
    * library catalog through this.
    */
  private[graft] def catalogRoot: String = root

  /** Spark name parts (after the catalog name) → library table name,
    * the same mapping [[toName]] applies to resolved identifiers.
    */
  private[graft] def tableNameOf(parts: Seq[String]): String =
    toName(Identifier.of(parts.init.toArray, parts.last))

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog '$name' requires spark.sql.catalog.$name.root=<catalog dir>")
    // pluggable current-snapshot POINTER (the production deployment knob):
    //   spark.sql.catalog.<g>.headstore = pg | jdbc   (absent = HEAD file)
    //   pg:   .pg.host/.pg.port/.pg.user/.pg.database/.pg.catalog
    //   jdbc: .jdbc.url/.jdbc.catalog
    // bound process-wide by root, so every internal `new GraftCatalog(root)`
    // — per-statement, all over the doorway — resolves the same store; the
    // config tuple is the idempotence key (same mount re-initializes free)
    def opt(k: String, default: String): String =
      Option(options.get(k)).map(_.trim).filter(_.nonEmpty).getOrElse(default)
    Option(options.get("headstore")).map(_.trim.toLowerCase).foreach {
      case "pg" | "postgres" | "postgresql" =>
        val host = opt("pg.host", "127.0.0.1")
        val port = opt("pg.port", "5432").toInt
        val user = opt("pg.user", "postgres")
        val db = opt("pg.database", "postgres")
        val cat = opt("pg.catalog", name)
        graft.sources.GraftCatalog.bindHeadStore(root,
          ("pg", host, port, user, db, cat),
          () => new graft.sources.PgHeadStore(host, port, user, db, cat))
      case "jdbc" | "derby" =>
        val url = Option(options.get("jdbc.url")).filter(_.nonEmpty)
          .getOrElse(throw new IllegalArgumentException(
            s"catalog '$name' headstore=jdbc requires " +
              s"spark.sql.catalog.$name.jdbc.url"))
        val cat = opt("jdbc.catalog", name)
        graft.sources.GraftCatalog.bindHeadStore(root, ("jdbc", url, cat),
          () => new graft.sources.JdbcHeadStore(url, cat))
      case "file" => graft.sources.GraftCatalog.unbindHeadStore(root)
      case other => throw new IllegalArgumentException(
        s"catalog '$name': unknown headstore '$other' (pg | jdbc | file)")
    }
  }

  override def name(): String = catalogName

  /** Spark identifier → catalog table name (`ns/t`). An empty or
    * `default` namespace addresses the flat root.
    */
  private def toName(ident: Identifier): String = {
    val ns = ident.namespace.toSeq
    if (ns.isEmpty || ns == Seq("default")) ident.name
    else (ns :+ ident.name).mkString("/")
  }

  private def isRootNs(ns: Array[String]): Boolean =
    ns.isEmpty || ns.toSeq == Seq("default")

  private def requireNs(ns: Array[String]): Unit =
    if (!isRootNs(ns) && !cat.namespaceExists(ns.mkString("/")))
      throw new NoSuchNamespaceException(ns)

  // ---- tables ------------------------------------------------------------

  override def listTables(ns: Array[String]): Array[Identifier] = {
    requireNs(ns)
    val prefix = if (isRootNs(ns)) "" else ns.mkString("/") + "/"
    cat.tables()
      .filter(t => t.startsWith(prefix) && !t.drop(prefix.length).contains("/"))
      .map(t => Identifier.of(ns, t.drop(prefix.length)))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    cat.tableExists(toName(ident))

  /** The session's `spark.wap.branch` — Iceberg's write-audit-publish
    * session routing: when set, loads of a MAIN table serve its branch
    * fork if one exists (reads audit the branch), and otherwise serve
    * main with lazy fork-on-write (the first write creates the branch;
    * pure reads never do). `VERSION AS OF 'main'` always bypasses it.
    */
  private def wapBranchConf(): Option[String] =
    try Option(org.apache.spark.sql.SparkSession.active.conf
      .get("spark.wap.branch", null)).map(_.trim).filter(_.nonEmpty)
    catch { case _: Throwable => None }

  override def loadTable(ident: Identifier): Table = {
    val t = toName(ident)
    if (cat.tableExists(t)) {
      wapBranchConf() match {
        case Some(b) if !t.contains("@") =>
          if (cat.tableExists(s"$t@$b"))
            new GraftV2Table(root, s"$t@$b", asOf = None)
          else new GraftV2Table(root, t, asOf = None, wapBranch = Some(b))
        case _ => new GraftV2Table(root, t, asOf = None)
      }
    }
    else {
      // Iceberg's metadata-table spelling: `graft.db.t.files` /
      // `.partitions` / `.snapshots` / `.history` — the trailing name
      // selects the metadata view of the PARENT table (a real table of
      // the full name, checked above, always wins)
      val kind = ident.name.toLowerCase(java.util.Locale.ROOT)
      val parent = ident.namespace.lastOption.map(last =>
        toName(Identifier.of(ident.namespace.init, last)))
      if (GraftMetadataV2Table.Kinds(kind) &&
          parent.exists(cat.tableExists))
        new GraftMetadataV2Table(root, parent.get, kind)
      // `graft.db.t.changes` — the streaming changelog (CDC) source
      else if (kind == "changes" && parent.exists(cat.tableExists))
        new GraftChangesV2Table(root, parent.get)
      else throw new NoSuchTableException(ident)
    }
  }

  /** `VERSION AS OF` — a snapshot id, a tag name, or a branch name
    * (`'main'` is the reserved name for the main branch itself — the
    * escape hatch for reading main while `spark.wap.branch` is set).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = toName(ident)
    if (!cat.tableExists(t)) throw new NoSuchTableException(ident)
    if (version == "main") return new GraftV2Table(root, t, asOf = None)
    val sid = version.toLongOption
      .orElse(cat.tags(t).get(version))
      .getOrElse {
        // a BRANCH name reads the fork's current state (Iceberg's
        // `VERSION AS OF 'branch'` — the branch head, not a pinned id)
        if (cat.tableExists(s"$t@$version"))
          return new GraftV2Table(root, s"$t@$version", asOf = None)
        throw new IllegalArgumentException(
          s"version '$version' of $t is neither a snapshot id, a tag, " +
            s"nor a branch (tags: " +
            s"${cat.tags(t).keys.toSeq.sorted.mkString(", ")})")
      }
    require(cat.snapshotIds(t).contains(sid),
      s"snapshot $sid of $t does not exist (expired or never committed)")
    new GraftV2Table(root, t, asOf = Some(sid))
  }

  /** `TIMESTAMP AS OF` — Spark hands the instant as MICROseconds since
    * epoch; resolve it to the latest snapshot committed at or before it
    * (the same lookup the library's `loadTableAsOf`/REST surface uses).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val t = toName(ident)
    if (!cat.tableExists(t)) throw new NoSuchTableException(ident)
    val sid = cat.snapshotIdAsOf(t, timestampMicros / 1000L)
    new GraftV2Table(root, t, asOf = Some(sid))
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val t = toName(ident)
    requireNs(ident.namespace)
    if (cat.tableExists(t)) throw new TableAlreadyExistsException(ident)
    // `PARTITIONED BY (days(ts), bucket(16, id), ...)` maps one-to-one
    // onto the catalog's hidden partition spec (T1–T8 transforms) —
    // validated BEFORE the table exists so a bad spec leaves nothing
    val spec = GraftSparkCatalog.toPartitionFields(partitions, schema)
    // field ids are the catalog's column identity; a DSv2 CREATE has none,
    // so stamp fresh sequential ids exactly like the library's create path
    try cat.createTable(t, Nil, Some(FieldIds.stamp(schema)))
    catch { case e: IllegalArgumentException
        if Option(e.getMessage).exists(_.contains("already exists")) =>
      throw new TableAlreadyExistsException(ident)
    }
    // CREATE must be all-or-nothing: a failure applying the spec or
    // properties after the table committed would otherwise leave a
    // created-but-unpartitioned table behind, and later INSERTs would
    // silently write unpartitioned data instead of failing
    try {
      if (spec.nonEmpty) cat.setPartitionSpec(t, spec)
      val user = properties.asScala.toMap -- GraftSparkCatalog.ReservedProps
      if (user.nonEmpty) cat.updateTableProperties(t, user)
    } catch { case e: Throwable =>
      try cat.dropTable(t)
      catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
      throw e
    }
    new GraftV2Table(root, t, asOf = None)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = toName(ident)
    if (!cat.tableExists(t)) throw new NoSuchTableException(ident)
    val sets = changes.collect {
      case s: TableChange.SetProperty => s.property -> s.value
    }.toMap
    val removes = changes.collect {
      case r: TableChange.RemoveProperty => r.property
    }.toSet
    val columnChanges = changes.collect {
      case c: TableChange.ColumnChange => c
    }
    val unsupported = changes.filterNot(c =>
      c.isInstanceOf[TableChange.SetProperty] ||
        c.isInstanceOf[TableChange.RemoveProperty] ||
        c.isInstanceOf[TableChange.ColumnChange])
    if (unsupported.nonEmpty)
      throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE changes for graft: ${unsupported.mkString(", ")}")
    if (columnChanges.nonEmpty) {
      // column DDL maps onto the catalog's field-id-checked evolveSchema:
      // ADD mints a fresh id past the historical high-water mark (old
      // files read the column as nulls), RENAME keeps its id (invisible
      // to id-resolving readers), DROP removes it (the id never returns),
      // type/nullability changes go through the same legal-promotion
      // checks every other evolution does
      val cur = cat.currentSchema(t).getOrElse(
        throw new UnsupportedOperationException(
          s"$t has no canonical schema to evolve — column DDL needs one " +
            "(tables created through this catalog always have it; register " +
            "one on externally-created tables via GraftCatalog.evolveSchema)"))
      import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}
      var schema: StructType = cur
      var nextId = cat.nextFieldId(t)

      /** Mint fresh ids for a brand-new field AND every struct field
        * nested inside its type (Iceberg numbers nested fields from the
        * same global sequence).
        */
      def stampNew(f: StructField): StructField = {
        def mint(): Int = { val id = nextId; nextId += 1; id }
        def stampType(dt: DataType): DataType = dt match {
          case s: StructType => StructType(s.fields.map(sf =>
            FieldIds.withFieldId(sf.copy(dataType = stampType(sf.dataType)), mint())))
          case a: ArrayType => a.copy(elementType = stampType(a.elementType))
          case m: MapType => m.copy(valueType = stampType(m.valueType))
          case other => other
        }
        val fid = mint()
        FieldIds.withFieldId(f, fid).copy(dataType = stampType(f.dataType))
      }

      /** Apply `edit` to the struct at `parents` (dotted-path navigation;
        * every intermediate segment must be a struct field — array
        * element / map value paths are not addressable here).
        */
      def mapStructAt(s: StructType, parents: Seq[String], what: String)(
          edit: StructType => StructType): StructType =
        parents match {
          case Seq() => edit(s)
          case head +: rest =>
            val i = s.fields.indexWhere(_.name == head)
            if (i < 0) throw new IllegalArgumentException(
              s"column '$head' does not exist in $t " +
                s"(columns: ${s.fieldNames.mkString(", ")})")
            s.fields(i).dataType match {
              case inner: StructType => StructType(s.fields.updated(i,
                s.fields(i).copy(dataType = mapStructAt(inner, rest, what)(edit))))
              case other => throw new UnsupportedOperationException(
                s"$what: '$head' is ${other.catalogString}, not a struct — " +
                  "only struct field paths can be altered")
            }
        }

      def exists(path: Seq[String]): Boolean = {
        def walk(s: StructType, p: Seq[String]): Boolean = p match {
          case Seq(last) => s.fieldNames.contains(last)
          case head +: rest => s.fields.find(_.name == head).exists(_.dataType match {
            case inner: StructType => walk(inner, rest)
            case _ => false
          })
          case _ => false
        }
        walk(schema, path)
      }

      /** Replace (Some) or remove (None) the field at `path`. */
      def editLeaf(path: Seq[String], what: String)(
          f: StructField => Option[StructField]): Unit =
        schema = mapStructAt(schema, path.init, what) { s =>
          val i = s.fields.indexWhere(_.name == path.last)
          if (i < 0) throw new IllegalArgumentException(
            s"column '${path.mkString(".")}' does not exist in $t " +
              s"(columns: ${s.fieldNames.mkString(", ")})")
          f(s.fields(i)) match {
            case Some(nf) => StructType(s.fields.updated(i, nf))
            case None => StructType(s.fields.patch(i, Nil, 1))
          }
        }

      columnChanges.foreach {
        case a: TableChange.AddColumn =>
          val path = a.fieldNames().toSeq
          schema = mapStructAt(schema, path.init, "ADD COLUMNS") { s =>
            if (s.fieldNames.contains(path.last))
              throw new IllegalArgumentException(
                s"column '${path.mkString(".")}' already exists in $t")
            StructType(s.fields :+
              stampNew(StructField(path.last, a.dataType(), a.isNullable)))
          }
        case r: TableChange.RenameColumn =>
          editLeaf(r.fieldNames().toSeq, "RENAME COLUMN")(f =>
            Some(f.copy(name = r.newName())))
        case d: TableChange.DeleteColumn =>
          val path = d.fieldNames().toSeq
          if (!exists(path)) {
            if (d.ifExists() == null || !d.ifExists())
              throw new IllegalArgumentException(
                s"column '${path.mkString(".")}' does not exist in $t")
          } else editLeaf(path, "DROP COLUMN")(_ => None)
        case u: TableChange.UpdateColumnType =>
          editLeaf(u.fieldNames().toSeq, "ALTER COLUMN TYPE")(f =>
            Some(f.copy(dataType = u.newDataType())))
        case n: TableChange.UpdateColumnNullability =>
          editLeaf(n.fieldNames().toSeq, "ALTER COLUMN NULLABILITY")(f =>
            Some(f.copy(nullable = n.nullable())))
        case other =>
          throw new UnsupportedOperationException(
            s"unsupported column change for graft: $other")
      }
      // illegal evolutions (narrowing, nullability tightening, id reuse,
      // non-null nested adds) fail HERE with the catalog's named reasons
      cat.evolveSchema(t, schema)
    }
    if (sets.nonEmpty || removes.nonEmpty)
      cat.updateTableProperties(t, sets, removes)
    new GraftV2Table(root, t, asOf = None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val t = toName(ident)
    if (!cat.tableExists(t)) false
    else { cat.dropTable(t); true }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    requireNs(to.namespace)
    cat.renameTable(toName(from), toName(to))
  }

  // ---- procedures (CALL graft.system.<proc>) ----------------------------

  override def listProcedures(
      ns: Array[String]): Array[Identifier] =
    if (ns.sameElements(GraftProcedures.SystemNamespace))
      GraftProcedures.names.map(Identifier.of(ns, _)).toArray
    else Array.empty

  override def loadProcedure(
      ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!ident.namespace.sameElements(GraftProcedures.SystemNamespace))
      throw new UnsupportedOperationException(
        s"procedures live in the 'system' namespace " +
          s"(CALL $catalogName.system.<proc>), got ${ident.namespace.mkString(".")}")
    GraftProcedures.load(root, ident.name).getOrElse(
      throw new UnsupportedOperationException(
        s"unknown procedure '${ident.name}' " +
          s"(available: ${GraftProcedures.names.mkString(", ")})"))
  }

  // ---- functions (the partition transforms as V2 catalog functions) ------

  /** Transforms resolve from the `system` namespace (the Iceberg-Spark
    * spelling, `graft.system.bucket(4, k)`) AND the empty namespace —
    * which is where the engine itself looks them up when resolving a
    * reported `KeyGroupedPartitioning` for storage-partitioned joins.
    */
  override def listFunctions(ns: Array[String]): Array[Identifier] =
    if (ns.isEmpty || ns.sameElements(GraftProcedures.SystemNamespace))
      GraftV2Functions.names.map(Identifier.of(ns, _)).toArray
    else if (namespaceExists(ns)) Array.empty
    else throw new NoSuchNamespaceException(ns)

  override def loadFunction(
      ident: Identifier): org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    val inScope = ident.namespace.isEmpty ||
      ident.namespace.sameElements(GraftProcedures.SystemNamespace)
    if (inScope) GraftV2Functions.load(ident.name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident))
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
  }

  // ---- namespaces --------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    Array(Array("default")) ++
      cat.namespaces().filterNot(_.contains("/")).map(n => Array(n))

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (isRootNs(ns)) return Array.empty // `default` has no children
    requireNs(ns)
    val prefix = ns.mkString("/") + "/"
    cat.namespaces()
      .filter(n => n.startsWith(prefix) && !n.drop(prefix.length).contains("/"))
      .map(_.split('/')).toArray
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    isRootNs(ns) || cat.namespaceExists(ns.mkString("/"))

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (isRootNs(ns)) return Map.empty[String, String].asJava
    requireNs(ns)
    cat.namespaceProperties(ns.mkString("/")).asJava
  }

  override def createNamespace(
      ns: Array[String], metadata: util.Map[String, String]): Unit = {
    if (isRootNs(ns))
      throw new NamespaceAlreadyExistsException(ns)
    try cat.createNamespace(ns.mkString("/"), metadata.asScala.toMap)
    catch {
      case e: IllegalArgumentException
          if Option(e.getMessage).exists(_.contains("already exists")) =>
        throw new NamespaceAlreadyExistsException(ns)
    }
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit = {
    requireNs(ns)
    if (isRootNs(ns))
      throw new UnsupportedOperationException(
        "the implicit 'default' namespace carries no properties")
    val sets = changes.collect {
      case s: NamespaceChange.SetProperty => s.property -> s.value
    }.toMap
    val removes = changes.collect {
      case r: NamespaceChange.RemoveProperty => r.property
    }.toSet
    cat.updateNamespaceProperties(ns.mkString("/"), sets, removes)
  }

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (isRootNs(ns))
      throw new UnsupportedOperationException(
        "the implicit 'default' namespace cannot be dropped")
    if (!cat.namespaceExists(ns.mkString("/"))) return false
    val name = ns.mkString("/")
    if (cascade) {
      // bottom-up: tables first, then child namespaces deepest-first
      cat.tables().filter(_.startsWith(name + "/")).foreach(cat.dropTable)
      cat.namespaces().filter(_.startsWith(name + "/"))
        .sortBy(-_.count(_ == '/')).foreach(cat.dropNamespace)
    }
    try { cat.dropNamespace(name); true }
    catch { case e: IllegalArgumentException =>
      throw new NonEmptyNamespaceException(ns)
    }
  }
}

object GraftSparkCatalog {
  /** DSv2 engine-managed properties that must not leak into the catalog's
    * user property map.
    */
  private val ReservedProps: Set[String] = Set(
    TableCatalog.PROP_LOCATION, TableCatalog.PROP_PROVIDER,
    TableCatalog.PROP_OWNER, TableCatalog.PROP_COMMENT,
    TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_IS_MANAGED_LOCATION,
    TableCatalog.PROP_TABLE_TYPE, TableCatalog.PROP_COLLATION)

  /** Spark `Transform[]` (`CREATE TABLE ... PARTITIONED BY`) → the
    * catalog's partition-spec fields. Exactly the T1–T8 transform set
    * (reference partition-spec decode `core/src/parser/proto.rs:295-328`);
    * field names follow Iceberg's convention (`<src>_bucket`, `<src>_day`,
    * identity keeps the source name).
    */
  private[dsv2] def toPartitionFields(
      partitions: Array[Transform],
      schema: StructType): Seq[GraftCatalog.PartitionFieldDef] = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
    partitions.toSeq.map { t =>
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames().length == 1,
        s"partition transform ${t.describe()} must reference exactly one " +
          "top-level column")
      val src = refs.head.fieldNames().head
      require(schema.fieldNames.contains(src),
        s"partition source column '$src' is not in the table schema " +
          s"(${schema.fieldNames.mkString(", ")})")
      val intArg: Option[Int] = t.arguments().collectFirst {
        case l: V2Literal[_] if l.value().isInstanceOf[Number] =>
          l.value().asInstanceOf[Number].intValue()
      }
      partitionFieldOf(t.name(), intArg, src)
    }
  }

  /** One transform spelling → its catalog `PartitionFieldDef`, shared by
    * CREATE-time `PARTITIONED BY` and the partition-evolution DDL
    * ([[graft.plans.GraftSqlParser]]) so both derive the SAME field names.
    */
  private[graft] def partitionFieldOf(
      fn: String, arg: Option[Int], src: String): GraftCatalog.PartitionFieldDef = {
    def need: Int = arg.getOrElse(throw new IllegalArgumentException(
      s"partition transform $fn needs an integer argument"))
    fn.toLowerCase match {
      case "identity" => GraftCatalog.PartitionFieldDef(src, "identity", src)
      case "years" | "year" =>
        GraftCatalog.PartitionFieldDef(s"${src}_year", "year", src)
      case "months" | "month" =>
        GraftCatalog.PartitionFieldDef(s"${src}_month", "month", src)
      case "days" | "day" =>
        GraftCatalog.PartitionFieldDef(s"${src}_day", "day", src)
      case "hours" | "hour" =>
        GraftCatalog.PartitionFieldDef(s"${src}_hour", "hour", src)
      case "bucket" =>
        GraftCatalog.PartitionFieldDef(s"${src}_bucket", s"bucket[$need]", src)
      case "truncate" =>
        GraftCatalog.PartitionFieldDef(s"${src}_trunc", s"truncate[$need]", src)
      case "void" =>
        GraftCatalog.PartitionFieldDef(s"${src}_void", "void", src)
      case other => throw new UnsupportedOperationException(
        s"unsupported partition transform '$other' for graft " +
          "(supported: identity, years, months, days, hours, " +
          "bucket(n, col), truncate(w, col), void)")
    }
  }
}
