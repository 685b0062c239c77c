package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}

import graft.operators.TxLog

/** Maintenance-statement SQL, injected via
  * `SparkSessionExtensions.injectParser` ([[GraftExtensions]]) — the
  * idiom every lake format uses for the statements vanilla Spark has no
  * grammar for (Delta's VACUUM/OPTIMIZE/RESTORE precedent):
  *
  * {{{
  * VACUUM graft.ns.t [RETAIN 5 GENERATIONS]
  * OPTIMIZE graft.ns.t [ZORDER BY (c1, c2)]
  * RESTORE TABLE graft.ns.t TO VERSION AS OF 3
  * }}}
  *
  * The target is a catalog-qualified table of a registered
  * [[graft.sources.GraftCatalog]] (resolved through the catalog's own
  * warehouse mapping) or a quoted zone path (`VACUUM '/lake/events'`) —
  * the path form serves zones living outside any catalog warehouse.
  * Each statement compiles to a [[LeafRunnableCommand]] running the
  * library's own maintenance primitive ([[TxLog.vacuum]] /
  * [[TxLog.compact]] / [[TxLog.compactClustered]] / [[TxLog.restore]])
  * and returns its stats as the command's result rows, so `spark.sql`
  * callers see exactly what an API caller gets.
  *
  * Everything that is not one of the three statements delegates to the
  * session parser untouched (including statements merely CONTAINING the
  * keywords — the grammar is anchored and must consume the whole text). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  /** Either a literal zone path or catalog-resolved identifier parts. */
  private type Target = Either[String, Seq[String]]

  // target: '<path>' | "<path>" | multipart identifier. Backquoted
  // segments are an explicit alternative (`[^`]+`) rather than backquote-
  // in-a-char-class, so `my-table`/`my table` segments match — a char
  // class can't span the quoted content, and a non-matching target would
  // silently fall through to the delegate parser and die with an
  // unrelated syntax error (round-10 advice).
  private val Seg = """(?:`[^`]+`|\w+)"""
  private val T = s"""(?:'([^']+)'|"([^"]+)"|($Seg(?:\\.$Seg)*))"""
  private val Vacuum =
    ("""(?is)^\s*VACUUM\s+""" + T + """(?:\s+RETAIN\s+(\d+)\s+GENERATIONS)?\s*;?\s*$""").r
  private val Optimize =
    ("""(?is)^\s*OPTIMIZE\s+""" + T +
      """(?:\s+ZORDER\s+BY\s+\(?\s*((?:[\w,\s]|`[^`]+`)+?)\s*\)?)?\s*;?\s*$""").r
  private val Restore =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + T + """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r

  private def target(p1: String, p2: String, ident: String,
                     delegate: ParserInterface): Target =
    if (p1 != null) Left(p1)
    else if (p2 != null) Left(p2)
    else Right(delegate.parseMultipartIdentifier(ident))

  private[graft] def maintenancePlan(sqlText: String,
                                     delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case Vacuum(p1, p2, ident, retain) =>
        Some(GraftVacuumCommand(target(p1, p2, ident, delegate),
          Option(retain).map(_.toInt).getOrElse(2)))
      case Optimize(p1, p2, ident, zorder) =>
        Some(GraftOptimizeCommand(target(p1, p2, ident, delegate),
          Option(zorder).map(_.split(",").toSeq
            .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
            .getOrElse(Nil)))
      case Restore(p1, p2, ident, gen) =>
        Some(GraftRestoreCommand(target(p1, p2, ident, delegate), gen.toLong))
      case _ => None
    }

  /** Resolve a statement target to its zone path: a literal path as-is;
    * identifier parts through the session's REGISTERED catalog instance
    * (the exact object SELECT resolves through — never a re-derived
    * conf mapping, which could diverge if the warehouse conf changed
    * after the catalog's first use). */
  private[graft] def resolveZone(spark: SparkSession, t: Target): String = t match {
    case Left(path) => path
    case Right(parts) =>
      require(parts.length >= 2,
        s"maintenance target '${parts.mkString(".")}' must be " +
          "catalog-qualified (catalog.ns….table) or a quoted zone path")
      val cat = parts.head
      val plugin =
        try org.apache.spark.sql.graft.PlanBridge.catalogPlugin(spark, cat)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"'$cat' is not a registered catalog", e)
        }
      plugin match {
        case g: graft.sources.GraftCatalog => g.zonePathOf(parts.tail)
        case other => throw new IllegalArgumentException(
          s"'$cat' is not a graft catalog (${other.getClass.getName}) — " +
            "maintenance statements act on graft tables or quoted zone paths")
      }
  }

  private[plans] def attr(name: String, dt: DataType): Attribute =
    AttributeReference(name, dt, nullable = false)()
}

/** `VACUUM t [RETAIN n GENERATIONS]` → [[TxLog.vacuum]]: fold history to
  * the newest n generations and delete unreferenced data files (past the
  * crash-grace window). Returns the count of deleted files. The grace
  * window keeps its 15-minute default; `spark.graft.vacuum.grace.ms`
  * overrides it (the Delta retention-check-override idiom — tests and
  * break-glass ops only; a small window can delete files a mid-publish
  * crash still needs). */
final case class GraftVacuumCommand(
    t: Either[String, Seq[String]], keepGens: Int) extends LeafRunnableCommand {
  import GraftSqlParser.{attr => a}
  override val output: Seq[Attribute] =
    Seq(a("zone", StringType), a("deleted_files", LongType),
      a("kept_generations", LongType))
  override def run(spark: SparkSession): Seq[Row] = {
    val zone = GraftSqlParser.resolveZone(spark, t)
    val grace = spark.conf.getOption("spark.graft.vacuum.grace.ms")
      .map(_.toLong).getOrElse(15L * 60L * 1000L)
    val deleted = TxLog.vacuum(spark, zone, keepGens, graceMs = grace)
    Seq(Row(zone, deleted, keepGens.toLong))
  }
}

/** `OPTIMIZE t [ZORDER BY (cols)]` → [[TxLog.compact]] (bin-pack small
  * files) or [[TxLog.compactClustered]] (rewrite in Z-order so the
  * committed stats prune multi-column ranges). The output-file size
  * target keeps the library's 128 MB default;
  * `spark.graft.optimize.target.bytes` overrides it (per-deployment
  * tuning, same conf idiom as the vacuum grace). */
final case class GraftOptimizeCommand(
    t: Either[String, Seq[String]], zorderBy: Seq[String])
    extends LeafRunnableCommand {
  import GraftSqlParser.{attr => a}
  override val output: Seq[Attribute] =
    Seq(a("zone", StringType), a("gen", LongType),
      a("files_before", LongType), a("files_after", LongType),
      a("rewritten", BooleanType))
  override def run(spark: SparkSession): Seq[Row] = {
    val zone = GraftSqlParser.resolveZone(spark, t)
    val target = spark.conf.getOption("spark.graft.optimize.target.bytes")
      .map(_.toLong).getOrElse(128L << 20)
    val st =
      if (zorderBy.isEmpty) TxLog.compact(spark, zone, targetBytes = target)
      else TxLog.compactClustered(spark, zone, zorderBy, targetBytes = target)
    Seq(Row(zone, st.gen, st.filesBefore, st.filesAfter, st.rewritten))
  }
}

/** `RESTORE TABLE t TO VERSION AS OF g` → [[TxLog.restore]]: manifest-
  * level rollback referencing generation g's immutable files as a NEW
  * commit — no data copied, history intact. */
final case class GraftRestoreCommand(
    t: Either[String, Seq[String]], gen: Long) extends LeafRunnableCommand {
  import GraftSqlParser.{attr => a}
  override val output: Seq[Attribute] =
    Seq(a("zone", StringType), a("restored_to", LongType),
      a("new_gen", LongType))
  override def run(spark: SparkSession): Seq[Row] = {
    val zone = GraftSqlParser.resolveZone(spark, t)
    val snap = TxLog.restore(spark, zone, gen)
    Seq(Row(zone, gen, snap.gen))
  }
}
