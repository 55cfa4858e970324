package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.GraftCatalog
import graft.sources.dsv2.GraftSparkCatalog

/** Iceberg's partition-spec-evolution DDL — the SQL spelling Spark's own
  * grammar lacks:
  *
  * {{{
  * ALTER TABLE cat.db.t ADD PARTITION FIELD bucket(8, k)
  * ALTER TABLE cat.db.t DROP PARTITION FIELD bucket(8, k)     -- or: k_bucket
  * ALTER TABLE cat.db.t REPLACE PARTITION FIELD bucket(4, k) WITH bucket(8, k)
  * }}}
  *
  * Injected AHEAD of the delegate parser by [[GraftExtensions]]; any
  * statement that is not exactly this shape delegates untouched. Known
  * limitation (shared with other extension-provided grammars): the parse
  * claims these spellings for EVERY catalog — executing one against a
  * non-graft catalog fails at run time with a named error rather than
  * delegating, because catalog resolution happens after parsing. The
  * evolution itself is the library's [[GraftCatalog.setPartitionSpec]]:
  * existing files keep the tuple binding they were recorded under and
  * stay prunable through it (per-file old-spec pruning —
  * `PartitionPruneSpec`); only subsequent writes fan out under the new
  * spec. (Reference: partition-spec wire model
  * `core/src/parser/proto.rs:295-328`; roadmap `README.md:36`.)
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftPartitionFieldSql.parse(sqlText)
      .orElse(GraftAnalyzeSql.parse(sqlText, delegate))
      .getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(s: String): Expression =
    delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType =
    delegate.parseRoutineParam(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseTableSchema(s: String): StructType =
    delegate.parseTableSchema(s)
}

object GraftPartitionFieldSql {

  /** A transform as spelled in the DDL, unresolved: `bucket(8, k)` →
    * ("bucket", Some(8), "k"); a bare identifier is identity over that
    * column OR (for DROP) a partition-field NAME.
    */
  final case class RawTransform(fn: String, arg: Option[Int], source: String) {
    def toField: GraftCatalog.PartitionFieldDef =
      GraftSparkCatalog.partitionFieldOf(fn, arg, source)
  }

  private val Ident = """`?([A-Za-z_][\w]*)`?"""
  private val TransformRe =
    s"""(?i)\\s*([A-Za-z_]\\w*)\\s*\\(\\s*(?:(\\d+)\\s*,\\s*)?$Ident\\s*\\)\\s*""".r
  private val IdentRe = s"""\\s*$Ident\\s*""".r

  private[plans] def parseTransform(s: String): Option[RawTransform] = s match {
    case TransformRe(fn, arg, col) =>
      Some(RawTransform(fn.toLowerCase, Option(arg).map(_.toInt), col))
    case IdentRe(col) => Some(RawTransform("identity", None, col))
    case _ => None
  }

  private val Table = """((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)"""
  private val AddRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Table\\s+ADD\\s+PARTITION\\s+FIELD\\s+(.+?)\\s*;?\\s*""".r
  private val DropRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Table\\s+DROP\\s+PARTITION\\s+FIELD\\s+(.+?)\\s*;?\\s*""".r
  private val ReplaceRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Table\\s+REPLACE\\s+PARTITION\\s+FIELD\\s+(.+?)\\s+WITH\\s+(.+?)\\s*;?\\s*""".r

  // snapshot refs + write order (Iceberg's extension DDL): tag/branch
  // names are identifiers, optionally backtick- or single-quoted
  private val Ref = """(?:`([^`]+)`|'([^']+)'|([A-Za-z_][\w.-]*))"""
  private val CreateTagRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Table\\s+CREATE\\s+TAG\\s+$Ref(?:\\s+AS\\s+OF\\s+VERSION\\s+(\\d+))?\\s*;?\\s*""".r
  private val DropTagRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Table\\s+DROP\\s+TAG\\s+$Ref\\s*;?\\s*""".r
  private val CreateBranchRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Table\\s+CREATE\\s+BRANCH\\s+$Ref\\s*;?\\s*""".r
  private val WriteOrderedRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Table\\s+WRITE\\s+ORDERED\\s+BY\\s+(.+?)\\s*;?\\s*""".r
  private val WriteUnorderedRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Table\\s+WRITE\\s+UNORDERED\\s*;?\\s*""".r

  private def refName(a: String, b: String, c: String): String =
    Option(a).orElse(Option(b)).getOrElse(c)

  private def nameParts(ident: String): Seq[String] =
    // split on dots OUTSIDE backticks, then strip the quoting
    ident.split("""\.(?=(?:[^`]*`[^`]*`)*[^`]*$)""").toSeq
      .map(_.stripPrefix("`").stripSuffix("`"))

  /** Some(command) iff the statement is this DDL; a malformed transform
    * inside an otherwise-matching statement fails loudly rather than
    * falling through to the delegate's confusing generic parse error.
    */
  def parse(sqlText: String): Option[LogicalPlan] = {
    def transform(s: String): RawTransform =
      parseTransform(s).getOrElse(throw new IllegalArgumentException(
        s"cannot parse partition transform '${s.trim}' (expected " +
          "identity column, years/months/days/hours(col), bucket(n, col), " +
          "truncate(w, col), or void(col))"))
    sqlText match {
      case ReplaceRe(t, oldT, newT) => Some(GraftAlterPartitionFieldCommand(
        nameParts(t), "replace", transform(oldT), Some(transform(newT))))
      case AddRe(t, tr) => Some(GraftAlterPartitionFieldCommand(
        nameParts(t), "add", transform(tr), None))
      case DropRe(t, tr) => Some(GraftAlterPartitionFieldCommand(
        nameParts(t), "drop", transform(tr), None))
      case CreateTagRe(t, a, b, c, ver) => Some(GraftAlterRefCommand(
        nameParts(t), "create_tag", refName(a, b, c),
        Option(ver).map(_.toLong)))
      case DropTagRe(t, a, b, c) => Some(GraftAlterRefCommand(
        nameParts(t), "drop_tag", refName(a, b, c), None))
      case CreateBranchRe(t, a, b, c) => Some(GraftAlterRefCommand(
        nameParts(t), "create_branch", refName(a, b, c), None))
      case WriteOrderedRe(t, cols) => Some(GraftAlterWriteOrderCommand(
        nameParts(t),
        cols.split(",").toSeq.map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)))
      case WriteUnorderedRe(t) =>
        Some(GraftAlterWriteOrderCommand(nameParts(t), Nil))
      case _ => None
    }
  }

  /** Resolve `nameParts` through the session's V2 catalog manager to the
    * owning [[GraftSparkCatalog]] and the catalog-internal table name —
    * shared by every command this parser produces.
    */
  private[plans] def resolveGraftTable(
      spark: SparkSession, nameParts: Seq[String], what: String)
      : (GraftSparkCatalog, String) = {
    val cm = spark.sessionState.catalogManager
    val (plugin, tableParts) =
      if (nameParts.length > 1 && cm.isCatalogRegistered(nameParts.head))
        (cm.catalog(nameParts.head), nameParts.tail)
      else (cm.currentCatalog, nameParts)
    val gcat = plugin match {
      case g: GraftSparkCatalog => g
      case other => throw new UnsupportedOperationException(
        s"$what targets a graft catalog table; " +
          s"'${other.name()}' is ${other.getClass.getName}")
    }
    val table = gcat.tableNameOf(tableParts)
    require(new GraftCatalog(gcat.catalogRoot).tables().contains(table),
      s"table $table does not exist in catalog '${gcat.name()}'")
    (gcat, table)
  }
}

/** `ANALYZE TABLE cat.db.t COMPUTE STATISTICS [INCREMENTAL]` — the SQL
  * spelling of [[GraftCatalog.computeTableStats]] (stock Spark REFUSES
  * ANALYZE on V2 tables, so without this the only surfaces are CALL and
  * REST). Unlike the ALTER grammar above, the plain spelling is ALSO
  * valid stock SQL on session-catalog tables — so the command captures
  * the DELEGATE's parse as a thunk and runs it whenever the resolved
  * catalog is not a graft one: `ANALYZE TABLE hive_t COMPUTE STATISTICS`
  * keeps working exactly as before. `INCREMENTAL` (an extension word no
  * stock grammar accepts) requires a graft table and runs the delta
  * union.
  */
object GraftAnalyzeSql {
  private val Table = """((?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)"""
  private val AnalyzeRe =
    s"""(?is)\\s*ANALYZE\\s+TABLE\\s+$Table\\s+COMPUTE\\s+STATISTICS(\\s+INCREMENTAL)?\\s*;?\\s*""".r

  def parse(sqlText: String, delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case AnalyzeRe(t, inc) =>
        Some(GraftAnalyzeTableCommand(
          nameParts(t),
          incremental = inc != null,
          fallback = () => delegate.parsePlan(sqlText)))
      case _ => None
    }

  private[plans] def nameParts(ident: String): Seq[String] =
    ident.split("""\.(?=(?:[^`]*`[^`]*`)*[^`]*$)""").toSeq
      .map(_.stripPrefix("`").stripSuffix("`"))
}

final case class GraftAnalyzeTableCommand(
    nameParts: Seq[String],
    incremental: Boolean,
    fallback: () => LogicalPlan)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val cm = spark.sessionState.catalogManager
    val isGraft =
      (nameParts.length > 1 && cm.isCatalogRegistered(nameParts.head) &&
        cm.catalog(nameParts.head).isInstanceOf[GraftSparkCatalog]) ||
        // a bare table name under a graft CURRENT catalog is ours too
        (!(nameParts.length > 1 && cm.isCatalogRegistered(nameParts.head)) &&
          cm.currentCatalog.isInstanceOf[GraftSparkCatalog])
    if (isGraft) {
      val (gcat, table) = GraftPartitionFieldSql.resolveGraftTable(
        spark, nameParts, "ANALYZE TABLE")
      new GraftCatalog(gcat.catalogRoot)
        .computeTableStats(spark, table, incremental)
      Nil
    } else if (incremental)
      throw new UnsupportedOperationException(
        "ANALYZE TABLE ... COMPUTE STATISTICS INCREMENTAL requires a " +
          "graft catalog table; stock ANALYZE has no incremental mode")
    else {
      // not ours: execute the delegate's own parse of the SAME statement
      // (stock ANALYZE on session-catalog tables keeps working) —
      // executedPlan forces the eager command execution chain
      spark.sessionState.executePlan(fallback()).executedPlan.executeCollect()
      Nil
    }
  }
}

/** Snapshot-ref DDL: `ALTER TABLE t CREATE TAG name [AS OF VERSION n]` /
  * `DROP TAG name` / `CREATE BRANCH name` — tags pin retained snapshots
  * against expiry ([[GraftCatalog.tagSnapshot]], readable via `VERSION AS
  * OF 'name'`); a branch is a WAP fork ([[GraftCatalog.forkTable]],
  * `<table>@<branch>`) taking normal reads/writes until published.
  */
final case class GraftAlterRefCommand(
    nameParts: Seq[String],
    action: String,
    refName: String,
    asOfVersion: Option[Long])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val (gcat, table) = GraftPartitionFieldSql.resolveGraftTable(
      spark, nameParts, "ALTER TABLE ... TAG/BRANCH")
    val cat = new GraftCatalog(gcat.catalogRoot)
    action match {
      case "create_tag" =>
        cat.tagSnapshot(table, refName,
          asOfVersion.getOrElse(cat.currentSnapshotId(table)))
      case "drop_tag" => cat.dropTag(table, refName)
      case "create_branch" => cat.forkTable(table, refName)
    }
    Nil
  }
}

/** Write-order DDL: `ALTER TABLE t WRITE ORDERED BY c1, c2` declares the
  * table's write order ([[GraftCatalog.setSortOrder]] — subsequent doorway
  * INSERTs range-cluster on it via `RequiresDistributionAndOrdering`, which
  * feeds stats pruning); `WRITE UNORDERED` clears it. Metadata only:
  * existing files keep their layout until the next rewrite.
  */
final case class GraftAlterWriteOrderCommand(
    nameParts: Seq[String],
    cols: Seq[String])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val (gcat, table) = GraftPartitionFieldSql.resolveGraftTable(
      spark, nameParts, "ALTER TABLE ... WRITE ORDERED BY")
    val cat = new GraftCatalog(gcat.catalogRoot)
    cat.currentSchema(table).foreach { s =>
      cols.foreach(c => require(s.fieldNames.contains(c),
        s"sort column '$c' is not in $table's schema " +
          s"(${s.fieldNames.mkString(", ")})"))
    }
    cat.setSortOrder(table, cols)
    spark.catalog.refreshTable(nameParts.mkString("."))
    Nil
  }
}

/** The evolution command: resolves the target through the session's V2
  * catalog manager (the named catalog must be a [[GraftSparkCatalog]]) and
  * commits the new spec via [[GraftCatalog.setPartitionSpec]] — or
  * [[GraftCatalog.clearPartitionSpec]] when the last field is dropped.
  */
final case class GraftAlterPartitionFieldCommand(
    nameParts: Seq[String],
    action: String,
    field: GraftPartitionFieldSql.RawTransform,
    withField: Option[GraftPartitionFieldSql.RawTransform])
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val (gcat, table) = GraftPartitionFieldSql.resolveGraftTable(
      spark, nameParts, "ALTER TABLE ... PARTITION FIELD")
    val cat = new GraftCatalog(gcat.catalogRoot)
    val cur = cat.partitionSpec(table)
    def resolved(t: GraftPartitionFieldSql.RawTransform): GraftCatalog.PartitionFieldDef = {
      val f = t.toField
      cat.currentSchema(table).foreach(s => require(
        s.fieldNames.contains(f.source),
        s"partition source column '${f.source}' is not in $table's schema " +
          s"(${s.fieldNames.mkString(", ")})"))
      f
    }
    /** The spec entries a DROP/REPLACE names: by exact transform spelling
      * when one is given, by partition-field NAME for a bare identifier
      * (Iceberg accepts both; a bare name that IS an identity field of
      * that column matches it too).
      */
    def locate(t: GraftPartitionFieldSql.RawTransform): GraftCatalog.PartitionFieldDef = {
      val byShape =
        if (t.fn == "identity")
          cur.find(f => f.name == t.source ||
            (f.transform == "identity" && f.source == t.source))
        else {
          val want = t.toField
          cur.find(f => f.transform == want.transform && f.source == want.source)
        }
      byShape.getOrElse(throw new IllegalArgumentException(
        s"no partition field matching '${t.fn}(${t.source})' on $table " +
          s"(current spec: ${cur.map(f => s"${f.name}=${f.transform}(${f.source})")
            .mkString(", ")})"))
    }
    val next: Seq[GraftCatalog.PartitionFieldDef] = action match {
      case "add" =>
        val f = resolved(field)
        require(!cur.exists(_.name == f.name),
          s"partition field '${f.name}' already exists on $table")
        cur :+ f
      case "drop" => cur.filterNot(_ == locate(field))
      case "replace" =>
        val victim = locate(field)
        val f = resolved(withField.get)
        require(f.name == victim.name || !cur.exists(_.name == f.name),
          s"partition field '${f.name}' already exists on $table")
        // Iceberg appends the replacement at the end of the spec
        cur.filterNot(_ == victim) :+ f
    }
    if (next.isEmpty) cat.clearPartitionSpec(table)
    else cat.setPartitionSpec(table, next)
    // the doorway caches Table objects per identifier in some Spark code
    // paths; invalidate so the next DESCRIBE/INSERT sees the new spec
    spark.catalog.refreshTable(nameParts.mkString("."))
    Nil
  }
}
