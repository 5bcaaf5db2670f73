package graft.sql

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import graft.recdb.{EventCols, RecCatalog, Recommender}

/** The RecDB SQL surface, re-expressed as a Spark session extension
  * (SURVEY.md §7.3 / §3.1):
  *
  *   SELECT … FROM <events> RECOMMEND <item> TO <user> ON <event>
  *     USING <method> [WHERE …] [ORDER BY …] [LIMIT n]       (gram.y:8934-8944)
  *   CREATE RECOMMENDER <name> ON <tbl> USERS FROM <u> ITEMS FROM <i>
  *     EVENTS FROM <e> [USING <method>]                      (gram.y:2444-2474)
  *   DROP RECOMMENDER <name>                                 (gram.y:2482-2488)
  *
  * Enable with:
  *   .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
  *   .config("spark.graft.catalogDir", …).config("spark.graft.modelsDir", …)
  *
  * Mechanics mirror the reference's transform pipeline: the injected parser
  * recognizes the clause, binds it to the FROM table (getEventsTable,
  * parse_rec.c:187-297), replaces the scan with the scoring subplan (the
  * RecScan substitution of allpaths.c:395), and hands the REMAINING query —
  * WHERE / ORDER BY / LIMIT / joins — to the delegate Spark parser, so all
  * relational composition stays on the stock Catalyst path. Synthesized-tuple
  * quirks preserved: the predicted score lands in the event column and every
  * other column of the events table reads 0 (§2.3 #2, execRecommend.c:398-405).
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    GraftSql.nativeFunctions.foreach(e.injectFunction)
  }
}

object GraftSql {
  val CatalogDirKey = "spark.graft.catalogDir"
  val ModelsDirKey = "spark.graft.modelsDir"

  /** The engine's native codegen expressions as SQL functions, so the pure
    * SQL surface reaches them too:
    *   graft_word_shingles(text, n), graft_simhash63(text),
    *   graft_dot(a, b), graft_dense_from_entries(entries, dims).
    * Int parameters must be literals (they parameterize codegen).
    */
  val nativeFunctions: Seq[(FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
    import graft.functions.{DenseFromEntries, DotProduct, SimHash63, WordShingles}
    def litInt(e: Expression, fn: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: expected an integer literal, got $other")
    }
    def info(name: String, usage: String) =
      new ExpressionInfo("graft.functions", name, usage)
    Seq(
      (FunctionIdentifier("graft_word_shingles"),
        info("graft_word_shingles", "distinct word n-grams of split-on-space text"),
        (args: Seq[Expression]) => args match {
          case Seq(text, n) => WordShingles(text, litInt(n, "graft_word_shingles"))
          case _ => throw new IllegalArgumentException(
            "graft_word_shingles(text, n) takes 2 arguments")
        }),
      (FunctionIdentifier("graft_simhash63"),
        info("graft_simhash63", "63-bit SimHash signature of text"),
        (args: Seq[Expression]) => args match {
          case Seq(text) => SimHash63(text)
          case _ => throw new IllegalArgumentException(
            "graft_simhash63(text) takes 1 argument")
        }),
      (FunctionIdentifier("graft_dot"),
        info("graft_dot", "dense dot product of two ARRAY<DOUBLE>"),
        (args: Seq[Expression]) => args match {
          case Seq(a, b) => DotProduct(a, b)
          case _ => throw new IllegalArgumentException(
            "graft_dot(a, b) takes 2 arguments")
        }),
      (FunctionIdentifier("graft_dense_from_entries"),
        info("graft_dense_from_entries",
          "scatter ARRAY<STRUCT<i INT, v DOUBLE>> into a dense vector"),
        (args: Seq[Expression]) => args match {
          case Seq(entries, dims) =>
            DenseFromEntries(entries, litInt(dims, "graft_dense_from_entries"))
          case _ => throw new IllegalArgumentException(
            "graft_dense_from_entries(entries, dims) takes 2 arguments")
        }))
  }

  def catalog(session: SparkSession): RecCatalog =
    new RecCatalog(session.conf.get(CatalogDirKey, "/tmp/graft/catalog"))
  def modelsDir(session: SparkSession): String =
    session.conf.get(ModelsDirKey, "/tmp/graft/models")

  private[sql] val RecommendRe =
    ("""(?is)\bFROM\s+([\w.]+)\s+RECOMMEND\s+(\w+)\s+TO\s+(\w+)\s+ON\s+(\w+)""" +
      """\s+USING\s+(\w+)""").r
  // the older Recathon workload syntax the reference's experiments issue
  // (rec_workload.c:226): SELECT itemid FROM <rec> RECOMMEND(10) userid = 42
  private[sql] val LegacyRecommendRe =
    """(?is)\bFROM\s+([\w.]+)\s+RECOMMEND\s*\(\s*(\d+)\s*\)\s+(\w+)\s*=\s*(\d+)""".r
  private[sql] val CreateRe =
    ("""(?is)^\s*CREATE\s+RECOMMENDER\s+(\w+)\s+ON\s+([\w.]+)\s+USERS\s+FROM\s+(\w+)""" +
      """\s+ITEMS\s+FROM\s+(\w+)\s+EVENTS\s+FROM\s+(\w+)(?:\s+USING\s+(\w+))?\s*;?\s*$""").r
  private[sql] val DropRe =
    """(?is)^\s*DROP\s+RECOMMENDER\s+(\w+)\s*;?\s*$""".r

  // deterministic per-statement view name: re-issuing the same RECOMMEND
  // statement replaces its view instead of leaking a fresh one per parse
  private def viewName(sqlText: String): String =
    "graft_rec_" + Integer.toHexString(
      java.util.Arrays.hashCode(sqlText.trim.getBytes("UTF-8")))

  private val WhereRe =
    """(?is)\bWHERE\s+(.*?)(?=\bORDER\s+BY\b|\bLIMIT\b|\bGROUP\s+BY\b|\bHAVING\b|$)""".r

  /** The reference's user-WHERE extraction (parse_rec.c:1100-1211): keep only
    * conjuncts that reference the user column alone — an over-approximation
    * used purely to prune the user×item expansion early; the FULL WHERE
    * clause still applies above the scoring view, so results are identical
    * either way (SURVEY.md §2.3 #8).
    */
  private[sql] def userQual(session: SparkSession, sqlText: String,
      userCol: String): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    try WhereRe.findFirstMatchIn(sqlText).flatMap { m =>
      val parsed = session.sessionState.sqlParser.parseExpression(m.group(1))
      val userOnly = conjuncts(parsed).filter { c =>
        val refs = c.references.map(_.name.toLowerCase).toSet
        refs.nonEmpty && refs == Set(userCol.toLowerCase) && c.deterministic
      }
      userOnly.reduceOption(CAnd(_, _))
        .map(org.apache.spark.sql.graft.ColumnShim.column)
    } catch { case _: Exception => None } // prune is best-effort, never fatal
  }

  /** Rewrite the legacy `FROM <rec> RECOMMEND(k) <user> = <id>` workload
    * form: resolve the NAMED recommender from the catalog (it must exist —
    * this syntax queries a created recommender, rec_workload.c's setup), and
    * splice in a view of that user's top-k rows (user, item, score-as-event)
    * ordered by score with the item tie-break.
    */
  def rewriteLegacyRecommend(session: SparkSession,
      sqlText: String): Option[String] =
    LegacyRecommendRe.findFirstMatchIn(sqlText).map { m =>
      val (recName, k, userColq, userId) =
        (m.group(1), m.group(2).toInt, m.group(3), m.group(4).toLong)
      val cat = catalog(session)
      val e = cat.get(recName).getOrElse(throw new IllegalArgumentException(
        s"recommender $recName does not exist (utility.c:968)"))
      require(userColq.equalsIgnoreCase(e.userCol),
        s"legacy RECOMMEND qualifier '$userColq' must be the recommender's " +
          s"user column '${e.userCol}'")
      val events = session.table(e.eventsTag)
      val c = EventCols(e.userCol, e.itemCol, e.ratingCol)
      val users = events.select(col(e.userCol))
        .where(col(e.userCol) === userId).distinct()
      val top = Recommender
        .recommend(session, events, e.eventsTag, c, e.method.name,
          Some(cat), Some(users))
        .orderBy(col("score").desc, col(e.itemCol))
        .limit(k)
        .select(col(e.userCol), col(e.itemCol), col("score").as(e.ratingCol))
      val view = viewName(sqlText)
      top.createOrReplaceTempView(view)
      sqlText.substring(0, m.start) + s"FROM $view" + sqlText.substring(m.end)
    }

  /** Rewrite a RECOMMEND query: build the scoring DataFrame, register it as a
    * temp view carrying the full events-table schema (score in the event
    * column, other columns zeroed), splice the view name into the SQL.
    */
  def rewriteRecommend(session: SparkSession, sqlText: String): Option[String] =
    RecommendRe.findFirstMatchIn(sqlText).map { m =>
      val (table, item, user, event, method) =
        (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5))
      val events = session.table(table)
      val c = EventCols(user, item, event)
      // user-qual pre-filter: prune qualifying users BEFORE scoring
      // (execRecommend.c:442-468) — the full WHERE still applies on top
      val users = userQual(session, sqlText, user)
        .map(p => events.select(col(user)).where(p).distinct())
      val scored = Recommender.recommend(session, events, table, c, method,
        Some(catalog(session)), users)
      // Output schema per SURVEY.md §2.3: materialized recommenders return
      // ONLY the three clause columns (README.md:110, quirk #3); on-the-fly
      // queries carry the full events schema with non-clause columns reading
      // 0 (execRecommend.c:398-405, quirk #2). Identifier comparison is
      // case-insensitive like Spark SQL resolution.
      val materialized = catalog(session)
        .findByTagAndMethod(table, graft.recdb.RecMethod.parse(method)).isDefined
      val clauseCols = Seq(user, item, event).map(_.toLowerCase)
      val others =
        if (materialized) Array.empty[String]
        else events.columns.filterNot(c => clauseCols.contains(c.toLowerCase))
      val full = scored.select(
        col(user) +: col(item) +: col("score").as(event) +:
          others.map(o => lit(0).cast(events.schema(o).dataType).as(o)).toSeq: _*)
      val view = viewName(sqlText)
      full.createOrReplaceTempView(view)
      sqlText.substring(0, m.start) + s"FROM $view" + sqlText.substring(m.end)
    }
}

final case class CreateRecommenderCommand(name: String, table: String,
    user: String, item: String, event: String, method: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    Recommender.create(session, name, session.table(table), table,
      EventCols(user, item, event), method, GraftSql.catalog(session),
      GraftSql.modelsDir(session))
    Seq(Row(s"created recommender $name"))
  }
}

final case class DropRecommenderCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val ok = Recommender.drop(name, GraftSql.catalog(session))
    if (!ok) throw new IllegalArgumentException(
      s"recommender $name does not exist (utility.c:968)")
    Seq(Row(s"dropped recommender $name"))
  }
}

class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case GraftSql.CreateRe(name, table, user, item, event, method) =>
      CreateRecommenderCommand(name, table, user, item, event,
        Option(method).getOrElse(""))
    case GraftSql.DropRe(name) =>
      DropRecommenderCommand(name)
    case _ =>
      rewrite(sqlText) match {
        case Some(rewritten) => delegate.parsePlan(rewritten)
        case None => delegate.parsePlan(sqlText)
      }
  }

  private def rewrite(sqlText: String): Option[String] =
    GraftSql.rewriteRecommend(session, sqlText)
      .orElse(GraftSql.rewriteLegacyRecommend(session, sqlText))

  @throws[ParseException]
  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(sqlText) match {
      case Some(rewritten) => delegate.parseQuery(rewritten)
      case None => delegate.parseQuery(sqlText)
    }

  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(s)
  override def parseRoutineParam(s: String): StructType =
    delegate.parseRoutineParam(s)
}
