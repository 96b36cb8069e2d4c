package graft.sources

import graft.mergetree.ColumnarMergeTree
import graft.mergetree.ColumnarMergeTree.TableDef

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

import java.nio.file.Paths

/** ClickHouse's maintenance verbs for the SQL face, as a delegating parser
  * (registered by GraftExtensions via injectParser):
  *
  * {{{
  *   OPTIMIZE TABLE t [FINAL] [DEDUPLICATE [BY c1, c2]]
  *   ALTER TABLE t DETACH PARTITION 'v'
  *   ALTER TABLE t ATTACH PARTITION 'v'
  *   ALTER TABLE t DROP PARTITION 'v'
  *   ALTER TABLE t REPLACE PARTITION 'v' FROM t2
  *   ALTER TABLE t MATERIALIZE TTL
  *   ALTER TABLE t UPDATE c1 = expr1, c2 = expr2 WHERE pred
  *   ALTER TABLE t DELETE WHERE pred
  * }}}
  *
  * `t` is either a GraftCatalog identifier (`graft.ns.tbl`) or a quoted
  * table directory (`'/data/tbl'`) — the same two addressing modes the rest
  * of the SQL face supports. Anything not matching these exact shapes
  * falls through to Spark's parser untouched, so no standard SQL changes
  * meaning. Each verb delegates to the corresponding ColumnarMergeTree
  * API, which owns the locking, atomic manifest swap, and GC semantics —
  * the SQL face adds syntax, never a second implementation.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftSqlParser._

  /** ClickHouse `SELECT … FROM t SAMPLE k` (0 < k < 1): rewrites each
    * `FROM <graft table> SAMPLE <k>` into a filtered subquery carrying the
    * table's deterministic sampling predicate
    * (ColumnarMergeTree.samplePredicateSql — a prunable range on the
    * declared SAMPLE BY column, or the md5 lead-key slice), aliased to the
    * table's last name segment so column references keep resolving. A
    * target that doesn't resolve to a graft table leaves the text
    * untouched (Spark then reports its own error — no standard SQL changes
    * meaning, since `FROM t SAMPLE 0.1` parses nowhere else).
    */
  private def rewriteSamples(sqlText: String): String =
    if (!SampleProbeRe.pattern.matcher(sqlText).find()) sqlText
    else SampleRe.replaceAllIn(sqlText, m => {
      val ident = m.group(1)
      val frac = m.group(2).toDouble
      val off = Option(m.group(3)).map(_.toDouble).getOrElse(0.0)
      val rewritten = scala.util.Try {
        val dir = resolveDir(session, IdentTarget(delegate.parseMultipartIdentifier(ident)))
        val defn = TableDef.load(dir).get
        val pred = ColumnarMergeTree.samplePredicateSql(defn.sampleBy, defn.orderBy, frac, off)
        val alias = ident.split('.').last.replace("`", "")
        s"FROM (SELECT * FROM $ident WHERE $pred) $alias"
      }.getOrElse(m.matched)
      java.util.regex.Matcher.quoteReplacement(rewritten)
    })

  /** ClickHouse `SELECT … FROM t FINAL [SAMPLE k [OFFSET m]]`: the
    * per-STATEMENT collapse spelling (the per-table default is the
    * catalog's `final 'true'` property; the per-read form is the DSv2
    * option). The target rewrites to a session temp view over the
    * final-read connector table — MergeTreeFinalRule then collapses it
    * exactly as the option form — and an attached SAMPLE applies AFTER
    * the collapse (a sample of the live rows, ClickHouse's order). A
    * target that doesn't resolve to a graft table leaves the text
    * untouched.
    */
  private def rewriteFinal(sqlText: String): String =
    if (!FinalProbeRe.pattern.matcher(sqlText).find()) sqlText
    else FinalRe.replaceAllIn(sqlText, m => {
      val ident = m.group(1)
      val rewritten = scala.util.Try {
        val dir = resolveDir(session, IdentTarget(delegate.parseMultipartIdentifier(ident)))
        val v = "graft_final_" + Integer.toHexString(dir.hashCode & 0x7fffffff)
        session.read.format("mergetree").option("final", "true").load(dir)
          .createOrReplaceTempView(v)
        val alias = ident.split('.').last.replace("`", "")
        Option(m.group(2)) match {
          case Some(fracS) =>
            val defn = TableDef.load(dir).get
            val off = Option(m.group(3)).map(_.toDouble).getOrElse(0.0)
            val pred = ColumnarMergeTree.samplePredicateSql(
              defn.sampleBy, defn.orderBy, fracS.toDouble, off)
            s"FROM (SELECT * FROM $v WHERE $pred) $alias"
          case None => s"FROM $v $alias"
        }
      }.getOrElse(m.matched)
      java.util.regex.Matcher.quoteReplacement(rewritten)
    })

  /** ClickHouse `PREWHERE cond`: in ClickHouse an explicit early-filter
    * stage (read the predicate's columns first, skip the rest of the row
    * on a miss); Spark's scan already evaluates pushed filters before
    * materializing the remaining columns, so the clause rewrites to the
    * semantically identical WHERE — pasted ClickHouse queries keep
    * working, and the optimization they asked for is what the engine was
    * going to do anyway. A statement carrying BOTH `PREWHERE` and `WHERE`
    * anywhere (same block or nested) would need block-aware predicate
    * merging this textual rewrite doesn't attempt — it is refused loudly
    * rather than mis-parsed.
    */
  private def rewritePrewhere(sqlText: String): String = {
    if (!PrewhereProbeRe.pattern.matcher(sqlText).find()) return sqlText
    require(!WhereProbeRe.pattern.matcher(sqlText).find(),
      "PREWHERE alongside WHERE is not supported — merge the predicates " +
        "into one WHERE (Spark evaluates pushed filters early regardless)")
    PrewhereProbeRe.replaceAllIn(sqlText, "WHERE")
  }

  override def parsePlan(sqlText0: String): LogicalPlan = {
    val sqlText = rewriteSamples(rewriteFinal(rewritePrewhere(sqlText0)))
    sqlText match {
      case WithFillRe(prefix, fcol, fromD, fromI, toD, toI, stepS, interpS) =>
        withFillPlan(prefix, fcol,
          Option(fromD).orElse(Option(fromI)), Option(toD).orElse(Option(toI)),
          Option(stepS), Option(interpS))
      case LimitByRe(stmt, orderList, nS, byCols) =>
        limitByPlan(stmt, orderList, nS.toInt, byCols)
      case _ => parseRewritten(sqlText)
    }
  }

  /** ClickHouse `… ORDER BY o1[, o2…] LIMIT n BY c1[, c2…]`: the first n
    * rows of EACH (c1, c2, …) group under the query's own ORDER BY —
    * "top-n per key" as one clause instead of a hand-written rank window.
    * The de-LIMIT-BY'd statement parses through the delegate; the clause
    * adds a row_number window partitioned by the BY columns and ordered by
    * the statement's ORDER BY list (which is REQUIRED — ClickHouse permits
    * an arbitrary-order LIMIT BY, this engine refuses the
    * nondeterminism), then re-sorts by the same list. `LIMIT n` alone
    * never matches (no BY), so standard SQL is untouched.
    */
  private def limitByPlan(stmt: String, orderList: String, n: Int,
      byColsS: String): LogicalPlan = {
    import org.apache.spark.sql.functions._
    require(n > 0, s"LIMIT $n BY: n must be positive")
    val inner = org.apache.spark.sql.graft.PlanBridge.ofRows(session,
      delegate.parsePlan(stmt))
    val by = byColsS.split(',').map(s => stripTicks(s.trim)).filter(_.nonEmpty).toSeq
    require(by.nonEmpty, "LIMIT n BY needs at least one column")
    by.foreach(c => require(inner.schema.fieldNames.contains(c),
      s"LIMIT BY column '$c' is not in the result"))
    val orderCols = splitTopLevel(orderList).map(_.trim).filter(_.nonEmpty).map { item =>
      val up = item.toUpperCase
      if (up.endsWith(" DESC")) expr(item.dropRight(5).trim).desc
      else if (up.endsWith(" ASC")) expr(item.dropRight(4).trim).asc
      else expr(item).asc
    }
    require(orderCols.nonEmpty, "LIMIT n BY requires an ORDER BY")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(by.map(col): _*).orderBy(orderCols: _*)
    inner.withColumn("__lb_rn", row_number().over(w))
      .filter(col("__lb_rn") <= n).drop("__lb_rn")
      .orderBy(orderCols: _*)
      .queryExecution.logical
  }

  /** ClickHouse `ORDER BY <col> WITH FILL [FROM a] [TO b] [STEP s]` — gap
    * filling over an integral sort column: the result gains one row per
    * missing grid point (FROM inclusive, TO exclusive, ClickHouse's
    * contract; absent bounds default to the result's own min/max,
    * inclusive), with non-fill columns taking their type defaults (0, '',
    * false — ClickHouse fills defaults, not NULLs). Composes with the rest
    * of the statement (and with SAMPLE): the de-FILLed text parses through
    * the delegate, then the plan is original-rows UNION missing-grid-rows,
    * re-sorted — original rows OFF the grid survive, exactly ClickHouse.
    */
  // `INTERPOLATE (c1, c2, …)` — ClickHouse's fill interpolation, the
  // CARRY-FORWARD form (`c` / `c AS c`): listed columns take the last
  // REAL row's value on fill rows instead of the type default (a running
  // `last(…, ignoreNulls)` window over the fill order; fill rows before
  // the first real row keep the default, like ClickHouse). Arbitrary
  // `c AS expr` interpolation is rejected loudly rather than half
  // supported. The interpolation window is unpartitioned — fine for
  // grid-sized outputs, which gap filling produces by construction.
  private def withFillPlan(prefix: String, fcolRaw: String,
      fromS: Option[String], toS: Option[String], stepS: Option[String],
      interpS: Option[String] = None): LogicalPlan = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val fc = stripTicks(fcolRaw.trim)
    val step = stepS.map(_.toLong).getOrElse(1L)
    require(step > 0, s"WITH FILL STEP must be positive, got $step")
    val inner = org.apache.spark.sql.graft.PlanBridge.ofRows(session,
      delegate.parsePlan(prefix + fcolRaw))
    require(inner.schema.fieldNames.contains(fc),
      s"WITH FILL column '$fc' is not in the result")
    val dt = inner.schema(fc).dataType
    val isDate = dt == DateType
    require(isDate || Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"WITH FILL supports integral or DATE sort columns, got $dt for '$fc'")
    def isDateLit(s: String) = s.contains("-") && s.length == 10
    for (b <- fromS ++ toS)
      require(isDateLit(b) == isDate,
        s"WITH FILL bound '$b' does not match the $dt fill column '$fc'")
    for (f <- fromS; t <- toS)
      require(if (isDate) f < t else f.toLong < t.toLong,
        s"WITH FILL FROM $f must be below TO $t")
    // bound expressions in the fill column's own type; TO is EXCLUSIVE
    // (ClickHouse), so the inclusive grid top is TO - 1 unit
    def loLit(f: String): Column = if (isDate) to_date(lit(f)) else lit(f.toLong)
    def hiLit(t: String): Column =
      if (isDate) date_sub(to_date(lit(t)), 1) else lit(t.toLong - 1)
    val stepExpr: Column =
      if (isDate) expr(s"interval $step day") else lit(step)
    // bounds row: both literals → a standalone one-row frame (an empty
    // result still fills the full grid, like ClickHouse); any derived
    // bound → the result's own min/max, lazily (one aggregate in the
    // plan, no parse-time execution; empty result → no grid)
    val boundsRow = (fromS, toS) match {
      case (Some(f), Some(t)) =>
        session.range(1).select(loLit(f).as("__lo"), hiLit(t).as("__hi"))
      case _ =>
        val lo = fromS.map(f => max(loLit(f))).getOrElse(
          if (isDate) min(col(fc)) else min(col(fc)).cast("long"))
        val hi = toS.map(t => max(hiLit(t))).getOrElse(
          if (isDate) max(col(fc)) else max(col(fc)).cast("long"))
        inner.agg(lo.as("__lo"), hi.as("__hi"))
    }
    val grid = boundsRow
      .where(col("__lo").isNotNull && col("__hi").isNotNull && col("__lo") <= col("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"), stepExpr)).as("__fill"))
      .select(col("__fill").cast(dt).as(fc))
    def dflt(f: StructField): Column = f.dataType match {
      case _: NumericType => lit(0).cast(f.dataType)
      case StringType     => lit("")
      case BooleanType    => lit(false)
      case other          => lit(null).cast(other)
    }
    val missing = grid.join(inner.select(col(fc)).distinct(), Seq(fc), "left_anti")
    val fillRows = missing.select(inner.schema.fields.toSeq.map { f =>
      if (f.name == fc) col(fc) else dflt(f).as(f.name)
    }: _*)
    val interpCols: Seq[String] = interpS.toSeq.flatMap(_.split(','))
      .map(_.trim).filter(_.nonEmpty).map { spec =>
        val parts = spec.split("(?i)\\s+AS\\s+").map(s => stripTicks(s.trim))
        require(parts.length <= 2 && parts.forall(_.nonEmpty),
          s"bad INTERPOLATE entry '$spec'")
        require(parts.length == 1 || parts(0) == parts(1),
          s"INTERPOLATE supports carry-forward only ('c' or 'c AS c'); got '$spec'")
        val c = parts(0)
        require(inner.schema.fieldNames.contains(c),
          s"INTERPOLATE column '$c' is not in the result")
        require(c != fc, s"cannot INTERPOLATE the fill column '$fc'")
        c
      }
    val unioned = if (interpCols.isEmpty)
      inner.unionByName(fillRows)
    else {
      val marked = inner.withColumn("__fillmark", lit(false))
        .unionByName(fillRows.withColumn("__fillmark", lit(true)))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(fc))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      interpCols.foldLeft(marked) { (df, c) =>
        df.withColumn(c, when(col("__fillmark"),
            coalesce(
              last(when(!col("__fillmark"), col(c)), ignoreNulls = true).over(w),
              dflt(inner.schema(c))))
          .otherwise(col(c)))
      }.drop("__fillmark")
    }
    unioned.orderBy(col(fc)).queryExecution.logical
  }

  private def parseRewritten(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeRe(q, id, fin, dedup, cols) =>
      val by = Option(cols).toSeq
        .flatMap(_.split(',')).map(c => stripTicks(c.trim)).filter(_.nonEmpty)
      OptimizeTableCommand(target(q, id), fin != null, dedup != null, by)
    // Spark's own Hive-style `DROP PARTITION (col=val, …)` spec must fall
    // through to the delegate — ClickHouse values are scalars, never
    // parenthesized.
    case PartitionVerbRe(q, id, verb, vq, vb) if vq != null || !vb.startsWith("(") =>
      PartitionVerbCommand(target(q, id), verb.toUpperCase, value(vq, vb))
    case ReplacePartitionRe(q, id, vq, vb, q2, id2) =>
      ReplacePartitionCommand(target(q, id), value(vq, vb), target(q2, id2))
    case MaterializeTtlRe(q, id) =>
      MaterializeTtlCommand(target(q, id))
    case FreezeRe(q, id, nm) =>
      FreezeCommand(target(q, id), Option(nm))
    case SystemMergesRe(verb, q, id) =>
      SystemMergesCommand(target(q, id), verb.equalsIgnoreCase("STOP"))
    case ModifyTtlRe(q, id, ttl) =>
      ModifyTtlCommand(target(q, id), Some(ttl))
    case RemoveTtlRe(q, id) =>
      ModifyTtlCommand(target(q, id), None)
    case AlterUpdateRe(q, id, tail) =>
      val (assigns, cond) = splitLastTopLevelWhere(tail).getOrElse(
        throw new IllegalArgumentException(
          s"ALTER TABLE … UPDATE requires a WHERE predicate: $sqlText"))
      val sets = splitTopLevel(assigns).map {
        case AssignRe(c, e) => stripTicks(c.trim) -> e.trim
        case bad => throw new IllegalArgumentException(
          s"malformed UPDATE assignment '$bad' in: $sqlText")
      }
      MutationUpdateCommand(target(q, id), sets, cond.trim)
    case AlterDeleteRe(q, id, cond) =>
      MutationDeleteCommand(target(q, id), cond.trim)
    case _ => delegate.parsePlan(sqlText)
  }

  /** The delegate parses identifier text so backticked segments keep their
    * exact dotted/quoted semantics — no second identifier grammar here.
    */
  private def target(quoted: String, id: String): MtTarget =
    if (quoted != null) PathTarget(quoted)
    else IdentTarget(delegate.parseMultipartIdentifier(id))

  private def value(quoted: String, bare: String): String =
    if (quoted != null) quoted else bare

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

  // `… ORDER BY <col> WITH FILL [FROM a] [TO b] [STEP s]
  //  [INTERPOLATE (c1[, c2…])]` at statement end. Bounds are integers for
  // integral fill columns or 'yyyy-MM-dd' literals for DATE ones.
  private val FB = "(?:'(\\d{4}-\\d{2}-\\d{2})'|(-?\\d+))"
  private[sources] val WithFillRe =
    ("(?is)^(.*\\bORDER\\s+BY\\s+)([`\\w.]+)\\s+WITH\\s+FILL" +
      s"(?:\\s+FROM\\s+$FB)?(?:\\s+TO\\s+$FB)?(?:\\s+STEP\\s+(\\d+))?" +
      "(?:\\s+INTERPOLATE\\s*\\(([^)]*)\\))?\\s*;?\\s*$").r

  // `… ORDER BY <list> LIMIT n BY c1[, c2…]` at statement end (plain
  // `LIMIT n` has no BY and never matches).
  private[sources] val LimitByRe =
    ("(?is)^(.*\\bORDER\\s+BY\\s+(.*?))\\s+LIMIT\\s+(\\d+)\\s+BY\\s+" +
      "([`\\w.]+(?:\\s*,\\s*[`\\w.]+)*)\\s*;?\\s*$").r

  // Cheap containment probe before paying the full SAMPLE regex.
  private[sources] val SampleProbeRe = "(?i)\\bSAMPLE\\b".r
  private[sources] val FinalProbeRe = "(?i)\\bFINAL\\b".r
  private[sources] val PrewhereProbeRe = "(?i)\\bPREWHERE\\b".r
  private[sources] val WhereProbeRe = "(?i)\\bWHERE\\b".r
  // `FROM <ident> FINAL [SAMPLE k [OFFSET m]]` — ClickHouse's
  // per-statement collapse (+ post-collapse sampling).
  private[sources] val FinalRe =
    ("(?is)\\bFROM\\s+([`\\w][\\w.`]*)\\s+FINAL\\b" +
      "(?:\\s+SAMPLE\\s+(\\d*\\.\\d+|\\d+\\.?\\d*)" +
      "(?:\\s+OFFSET\\s+(\\d*\\.\\d+|\\d+\\.?\\d*))?)?").r
  // `FROM <ident> SAMPLE <fraction> [OFFSET <fraction>]` — the ClickHouse
  // sampling clause.
  private[sources] val SampleRe =
    ("(?is)\\bFROM\\s+([`\\w][\\w.`]*)\\s+SAMPLE\\s+(\\d*\\.\\d+|\\d+\\.?\\d*)" +
      "(?:\\s+OFFSET\\s+(\\d*\\.\\d+|\\d+\\.?\\d*))?").r

  // Target: quoted directory path | dotted (possibly backticked) identifier.
  private val T = "(?:'([^']+)'|([`\\w][\\w.`]*))"
  // Partition value: quoted string | bare token (numbers, canonical forms).
  // The bare form excludes ';' so a statement-terminating semicolon is
  // stripped by the grammar's ;? instead of silently joining the value.
  private val V = "(?:'([^']*)'|([^\\s;]+))"

  private[sources] val OptimizeRe =
    ("(?is)^\\s*OPTIMIZE\\s+TABLE\\s+" + T +
      "(?:\\s+(FINAL))?(?:\\s+(DEDUPLICATE)(?:\\s+BY\\s+(.+?))?)?\\s*;?\\s*$").r
  private[sources] val PartitionVerbRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T +
      "\\s+(DETACH|ATTACH|DROP)\\s+PARTITION\\s+" + V + "\\s*;?\\s*$").r
  private[sources] val ReplacePartitionRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T +
      "\\s+REPLACE\\s+PARTITION\\s+" + V + "\\s+FROM\\s+" + T + "\\s*;?\\s*$").r
  private[sources] val MaterializeTtlRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+MATERIALIZE\\s+TTL\\s*;?\\s*$").r
  private[sources] val FreezeRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T +
      "\\s+FREEZE(?:\\s+WITH\\s+NAME\\s+'([^']+)')?\\s*;?\\s*$").r
  private[sources] val SystemMergesRe =
    ("(?is)^\\s*SYSTEM\\s+(STOP|START)\\s+MERGES\\s+" + T + "\\s*;?\\s*$").r
  private[sources] val ModifyTtlRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+MODIFY\\s+TTL\\s+'([^']+)'\\s*;?\\s*$").r
  private[sources] val RemoveTtlRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+REMOVE\\s+TTL\\s*;?\\s*$").r
  // Captures everything after UPDATE; the assignments/predicate split
  // happens in splitLastTopLevelWhere (quote-aware — a regex split would
  // mis-handle ' WHERE ' inside a string literal).
  private[sources] val AlterUpdateRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+UPDATE\\s+(.+?)\\s*;?\\s*$").r
  private[sources] val AlterDeleteRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+DELETE\\s+WHERE\\s+(.+?)\\s*;?\\s*$").r
  private[sources] val AssignRe = "(?s)^\\s*([`\\w.]+)\\s*=\\s*(.+)$".r

  /** Split `assignments WHERE predicate` at the LAST `WHERE` keyword that
    * sits outside string literals and parentheses — `' WHERE '` inside a
    * string literal must not split, and the last-match rule keeps an
    * assignment expression like `CASE … END` intact. Returns None when no
    * splittable WHERE exists.
    */
  private[sources] def splitLastTopLevelWhere(s: String): Option[(String, String)] = {
    var inStr = false
    var depth = 0
    var idx = -1
    var i = 0
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      // same escape handling as splitTopLevel: \x and '' inside a literal
      if (inStr && c == '\\' && i + 1 < s.length) i += 1
      else if (inStr && c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
      else if (c == '\'') inStr = !inStr
      else if (!inStr) {
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (depth == 0 && (c == 'w' || c == 'W') &&
          s.regionMatches(true, i, "WHERE", 0, 5) &&
          (i == 0 || !isWordChar(s.charAt(i - 1))) &&
          (i + 5 >= s.length || !isWordChar(s.charAt(i + 5)))) idx = i
      }
      i += 1
    }
    if (idx <= 0) None
    else Some((s.substring(0, idx).trim, s.substring(idx + 5).trim))
      .filter(p => p._1.nonEmpty && p._2.nonEmpty)
  }

  /** Split an assignment list on top-level commas only — commas inside
    * function calls, array literals, or string literals stay put.
    */
  private[sources] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // Escapes INSIDE a literal must not toggle the tracker: Spark
      // accepts both backslash ('don\'t') and doubled-quote ('don''t')
      // escaping — either would desync the scanner and mis-split.
      if (inStr && c == '\\' && i + 1 < s.length) {
        cur += c; cur += s.charAt(i + 1); i += 2
      } else if (inStr && c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
        cur += c; cur += '\''; i += 2
      } else {
        c match {
          case '\'' => inStr = !inStr; cur += c
          case '(' | '[' if !inStr => depth += 1; cur += c
          case ')' | ']' if !inStr => depth -= 1; cur += c
          case ',' if !inStr && depth == 0 => out += cur.toString; cur.clear()
          case _ => cur += c
        }
        i += 1
      }
    }
    out += cur.toString
    out.toSeq
  }

  private def stripTicks(s: String): String = s.replace("`", "")

  sealed trait MtTarget
  final case class PathTarget(path: String) extends MtTarget
  final case class IdentTarget(parts: Seq[String]) extends MtTarget

  /** Resolve a target to its table directory. Catalog identifiers resolve
    * through the session conf (the catalog's state IS its warehouse
    * layout), so maintenance works even before Spark has instantiated the
    * catalog plugin.
    */
  private[sources] def resolveDir(spark: SparkSession, t: MtTarget): String = {
    val dir = t match {
      case PathTarget(p) => MergeTreeTableProvider.localPath(p)
      case IdentTarget(parts) =>
        require(parts.length >= 2,
          s"maintenance target '${parts.mkString(".")}' must be " +
            "catalog.[ns.]table or a quoted directory path")
        val cat = parts.head
        val impl = spark.conf.getOption(s"spark.sql.catalog.$cat")
        require(impl.contains(classOf[GraftCatalog].getName),
          s"'$cat' is not a registered graft catalog " +
            s"(spark.sql.catalog.$cat=${impl.getOrElse("<unset>")})")
        // Resolve through the INSTANTIATED catalog: its warehouse is pinned
        // at initialize, and a conf re-pointed afterwards must not make the
        // maintenance verbs target a different directory than name
        // resolution does (catalogManager caches the plugin).
        val g = spark.sessionState.catalogManager.catalog(cat) match {
          case g: GraftCatalog => g
          case other => throw new IllegalArgumentException(
            s"'$cat' resolved to ${other.getClass.getName}, not a graft catalog")
        }
        // Shared resolve: same segment validation AND extloc following as
        // name resolution — external-LOCATION tables are maintainable.
        g.resolveTableDir(parts.tail).toString
    }
    require(TableDef.load(dir).isDefined, s"no mergetree table at $dir")
    dir
  }

  private def open(spark: SparkSession, t: MtTarget): ColumnarMergeTree =
    ColumnarMergeTree.open(spark, resolveDir(spark, t))

  private def affected: Seq[Attribute] =
    Seq(AttributeReference("rows_affected", LongType, nullable = false)())

  /** `OPTIMIZE TABLE … [FINAL [DEDUPLICATE [BY …]]]` → optimize() /
    * optimizeFinal(): bin-packed concurrent compaction, or the
    * one-part-per-partition full rewrite with optional row dedup.
    */
  final case class OptimizeTableCommand(
      t: MtTarget, finalMode: Boolean, dedup: Boolean, dedupBy: Seq[String])
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val tbl = open(spark, t)
      if (finalMode || dedup) tbl.optimizeFinal(dedup, dedupBy)
      else tbl.optimize()
      Nil
    }
  }

  /** `ALTER TABLE … DETACH/ATTACH/DROP PARTITION v` — O(manifest) partition
    * quarantine / re-link / unlink; returns the row count moved.
    */
  final case class PartitionVerbCommand(t: MtTarget, verb: String, value: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = affected
    override def run(spark: SparkSession): Seq[Row] = {
      val tbl = open(spark, t)
      val n = verb match {
        case "DETACH" => tbl.detachPartition(value)
        case "ATTACH" => tbl.attachPartition(value)
        case "DROP"   => tbl.dropPartition(value)
      }
      Seq(Row(n))
    }
  }

  /** `ALTER TABLE … FREEZE [WITH NAME 'x']` → freeze(): zero-copy
    * (hard-link) backup under `<table>/backups/<name>/`, independently
    * openable; returns the backup path and part count.
    */
  final case class FreezeCommand(t: MtTarget, name: Option[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("backup_path", StringType, nullable = false)(),
      AttributeReference("parts", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val (p, n) = open(spark, t).freeze(name)
      Seq(Row(p, n.toLong))
    }
  }

  /** `ALTER TABLE … MODIFY TTL 'expr'` / `REMOVE TTL` → modifyTtl():
    * retention policy changed as pure metadata; the next merge or
    * MATERIALIZE TTL enforces the new predicate.
    */
  final case class ModifyTtlCommand(t: MtTarget, ttl: Option[String])
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      open(spark, t).modifyTtl(ttl)
      Nil
    }
  }

  /** `SYSTEM STOP|START MERGES t` → stopMerges()/startMerges(): pause or
    * resume background maintenance on the table (marker file — binds every
    * instance/process; explicit OPTIMIZE stays available, ClickHouse
    * semantics).
    */
  final case class SystemMergesCommand(t: MtTarget, stop: Boolean)
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val tbl = open(spark, t)
      if (stop) tbl.stopMerges() else tbl.startMerges()
      Nil
    }
  }

  /** `ALTER TABLE … REPLACE PARTITION v FROM src` — atomically swap the
    * partition's content with the source table's same-partition rows
    * (ClickHouse's backfill op). The source is read through its
    * partition-pruned scan; for a merge-mode source that is the collapsed
    * view — equivalent at read time, and the only sane copy semantics
    * across tables that may collapse on different schedules.
    */
  final case class ReplacePartitionCommand(t: MtTarget, value: String, src: MtTarget)
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      val dst = open(spark, t)
      val from = open(spark, src)
      dst.replacePartition(value, from.scanPartitions(Seq(value)))
      Nil
    }
  }

  /** `ALTER TABLE … MATERIALIZE TTL` → applyTtl(): eagerly drop every
    * currently-expired row (the lazy path only cleans parts that merge).
    */
  final case class MaterializeTtlCommand(t: MtTarget)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = affected
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(open(spark, t).applyTtl()))
  }

  /** ClickHouse's mutation spelling `ALTER TABLE … UPDATE c = e, … WHERE p`
    * → updateWhere(): only hit parts are rewritten, ORDER BY columns are
    * rejected (a key change is a delete+insert, as in ClickHouse).
    * Assignment and predicate text parse through Catalyst (`expr`), so the
    * full scalar expression surface is available on both sides of `=`.
    */
  final case class MutationUpdateCommand(
      t: MtTarget, sets: Seq[(String, String)], cond: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = affected
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.expr
      val tbl = open(spark, t)
      val setMap = sets.map { case (c, e) => c -> expr(e) }.toMap
      // `SET spark.graft.lightweightUpdate=true` routes the mutation to
      // the O(manifest) patch path (ClickHouse lightweight update): rows
      // patch at read, the next merge materializes. No count — counting
      // would cost the scan the fast path exists to avoid.
      val lightweight = try {
        spark.conf.get("spark.graft.lightweightUpdate", "false").toBoolean
      } catch { case scala.util.control.NonFatal(_) => false }
      if (lightweight) { tbl.updateLightweight(expr(cond), setMap); Seq(Row(-1L)) }
      else Seq(Row(tbl.updateWhere(expr(cond), setMap)))
    }
  }

  /** ClickHouse's mutation spelling `ALTER TABLE … DELETE WHERE p` →
    * deleteWhere(): whole-match parts drop O(manifest), partial-match parts
    * rewrite. (Standard SQL `DELETE FROM … WHERE` also works, via DSv2.)
    */
  final case class MutationDeleteCommand(t: MtTarget, cond: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = affected
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.expr
      Seq(Row(open(spark, t).deleteWhere(expr(cond))))
    }
  }
}
