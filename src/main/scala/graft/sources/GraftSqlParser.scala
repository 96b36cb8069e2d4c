package graft.sources

import graft.mergetree.ColumnarMergeTree
import graft.mergetree.ColumnarMergeTree.TableDef

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression}
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
  *   ALTER TABLE t ADD INDEX name col TYPE kind [GRANULARITY g]
  *   ALTER TABLE t DROP INDEX col
  *   ALTER TABLE t MATERIALIZE INDEX col
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

  /** ClickHouse `SELECT … FROM t SAMPLE k` (a fraction in (0, 1] or an
    * absolute row count; also on JOIN targets): rewrites each
    * `FROM|JOIN <graft table> SAMPLE <k>` into a filtered subquery carrying the
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
    else replaceOutsideQuotes(sqlText, SampleRe) { m =>
      val kw = m.group(1)
      val ident = m.group(2)
      scala.util.Try {
        val dir = resolveDir(session, IdentTarget(delegate.parseMultipartIdentifier(ident)))
        val defn = TableDef.load(dir).get
        val off = Option(m.group(4)).map(_.toDouble).getOrElse(0.0)
        val pred = ColumnarMergeTree.samplePredicateSql(
          defn.sampleBy, defn.orderBy, sampleFraction(m.group(3), dir), off)
        val alias = ident.split('.').last.replace("`", "")
        s"$kw (SELECT * FROM $ident WHERE $pred) $alias"
      }.getOrElse(m.matched)
    }

  /** `SAMPLE k` accepts ClickHouse's two spellings: a fraction in (0, 1]
    * ("0.1", "0.5"), or an ABSOLUTE row count ("SAMPLE 10000" — any
    * dot-less integer above 1). The absolute form derives its fraction
    * from the manifest's row count — metadata only, no counting scan — so
    * the yield is ≈n (hash-uniform, deterministic, still nested: a larger
    * n is a superset of a smaller one). n at or above the table size
    * degenerates to the full scan, like sampleScanRows.
    */
  private def sampleFraction(kRaw: String, dir: String): Double =
    if (kRaw.contains('.') || kRaw.toLong <= 1L) kRaw.toDouble
    else {
      val n = kRaw.toLong
      val total = ColumnarMergeTree.GManifest.load(dir)
        .map(_.parts.map(_.rowCount).sum).getOrElse(0L)
      if (total == 0L || n >= total) 1.0 else n.toDouble / total
    }

  /** ClickHouse `SELECT … FROM t FINAL [SAMPLE k [OFFSET m]]` (also on
    * JOIN targets — ClickHouse allows FINAL on any table expression): the
    * per-STATEMENT collapse spelling (the per-table default is the
    * catalog's `final 'true'` property; the per-read form is the DSv2
    * option). The target rewrites to the `mergetree_final('<dir>')` table
    * function — resolved at ANALYSIS time like any relation, so parsing a
    * statement never mutates the session catalog or touches storage (an
    * EXPLAIN or a dry-run lint of the text is side-effect free) — and
    * MergeTreeFinalRule then collapses the read exactly as the option
    * form. An attached SAMPLE applies AFTER the collapse (a sample of the
    * live rows, ClickHouse's order). A target that doesn't resolve to a
    * graft table leaves the text untouched; `FROM t AS final` keeps
    * `final` as an ordinary alias (the AS spelling is the escape hatch,
    * as in ClickHouse, where bare FINAL is always the modifier).
    */
  private def rewriteFinal(sqlText: String): String =
    if (!FinalProbeRe.pattern.matcher(sqlText).find()) sqlText
    else replaceOutsideQuotes(sqlText, FinalRe) { m =>
      val kw = m.group(1)
      val ident = m.group(2)
      scala.util.Try {
        val dir = resolveDir(session, IdentTarget(delegate.parseMultipartIdentifier(ident)))
        require(!dir.contains("'"), s"table directory with a quote: $dir")
        val rel = s"mergetree_final('$dir')"
        val alias = ident.split('.').last.replace("`", "")
        Option(m.group(3)) match {
          case Some(fracS) =>
            val defn = TableDef.load(dir).get
            val off = Option(m.group(4)).map(_.toDouble).getOrElse(0.0)
            val pred = ColumnarMergeTree.samplePredicateSql(
              defn.sampleBy, defn.orderBy, fracS.toDouble, off)
            s"$kw (SELECT * FROM $rel WHERE $pred) $alias"
          case None => s"$kw $rel $alias"
        }
      }.getOrElse(m.matched)
    }

  /** ClickHouse `PREWHERE cond`: in ClickHouse an explicit early-filter
    * stage (read the predicate's columns first, skip the rest of the row
    * on a miss); Spark's scan already evaluates pushed filters before
    * materializing the remaining columns, so the clause rewrites to the
    * semantically identical WHERE — pasted ClickHouse queries keep
    * working, and the optimization they asked for is what the engine was
    * going to do anyway. `PREWHERE p … WHERE w` — the combination real
    * ClickHouse queries routinely carry — AND-merges when the WHERE
    * belongs to the PREWHERE's own block: `WHERE (p) AND (w)`, both sides
    * parenthesized so operator precedence is preserved. The scan is
    * quote-aware (a PREWHERE inside a string literal is data, and a
    * `WHERE msg = 'PREWHERE'` statement is untouched); only a statement
    * with MULTIPLE PREWHERE clauses is refused loudly — merging across
    * blocks is genuinely ambiguous in a textual rewrite.
    */
  private def rewritePrewhere(sqlText: String): String = {
    if (!PrewhereProbeRe.pattern.matcher(sqlText).find()) return sqlText
    val spans = quotedSpans(sqlText)
    val pres = PrewhereProbeRe.findAllMatchIn(sqlText)
      .filter(m => !inSpan(spans, m.start)).toList
    if (pres.isEmpty) return sqlText // PREWHERE appears only as literal text
    require(pres.length == 1,
      "multiple PREWHERE clauses in one statement are not supported — " +
        "merge each block's predicates into its own WHERE")
    val p = pres.head
    val depths = parenDepths(sqlText)
    val base = depths(p.start)
    // The PREWHERE block's own WHERE: the first WHERE token after the
    // predicate at the same paren depth, with the depth never dropping
    // below it in between (a drop means the PREWHERE's block closed — a
    // later WHERE belongs to an OUTER block and must stay).
    val sameBlockWhere = WhereProbeRe.findAllMatchIn(sqlText).toList
      .find(m => m.start > p.end && !inSpan(spans, m.start) &&
        depths(m.start) == base &&
        (p.end until m.start).forall(i => depths(i) >= base))
    sameBlockWhere match {
      case None =>
        // no WHERE in the PREWHERE's own block: the clause rewrites 1:1
        sqlText.substring(0, p.start) + "WHERE" + sqlText.substring(p.end)
      case Some(w) =>
        val pre = sqlText.substring(p.end, w.start).trim
        val condEnd = clauseEnd(sqlText, w.end, base, depths, spans)
        val cond = sqlText.substring(w.end, condEnd).trim
        require(pre.nonEmpty && cond.nonEmpty,
          s"malformed PREWHERE/WHERE combination in: $sqlText")
        sqlText.substring(0, p.start) +
          s"WHERE ($pre) AND ($cond)" + sqlText.substring(condEnd)
    }
  }

  /** ClickHouse `SETTINGS k = v[, …]` at statement end: per-query knobs.
    * EXECUTION-TUNING settings are accepted and ignored — Spark owns
    * thread counts, memory budgets, and spill thresholds, and the pasted
    * query should run rather than die on its tuning tail — while settings
    * that would CHANGE RESULTS (join_use_nulls, final, limit, …: anything
    * off the allowlist) are refused loudly rather than silently dropped.
    * Stripped FIRST so the statement-end clauses (WITH FILL, LIMIT BY)
    * compose with a trailing SETTINGS. Quote-aware; a tail that is not
    * actually the clause shape is left for the delegate's own error.
    */
  private def rewriteSettings(sqlText: String): String = {
    if (!SettingsProbeRe.pattern.matcher(sqlText).find()) return sqlText
    val spans = quotedSpans(sqlText)
    val depths = parenDepths(sqlText)
    SettingsProbeRe.findAllMatchIn(sqlText).toList
      .filter(m => !inSpan(spans, m.start) && depths(m.start) == 0)
      .lastOption match {
      case Some(m) =>
        val tail = sqlText.substring(m.end).replaceFirst("(?s)\\s*;\\s*$", "")
        val pairs = splitTopLevel(tail).map(_.trim)
        if (pairs.isEmpty || !pairs.forall(SettingPairRe.pattern.matcher(_).matches()))
          sqlText // not the clause shape — leave for the delegate
        else {
          pairs.foreach { p =>
            val k = p.takeWhile(_ != '=').trim.toLowerCase
            require(IgnorableSettings.contains(k),
              s"SETTINGS '$k' could change query results and is not supported — " +
                "only execution-tuning settings are accepted (and ignored): " +
                IgnorableSettings.toSeq.sorted.mkString(", "))
          }
          sqlText.substring(0, m.start).trim
        }
      case None => sqlText
    }
  }

  /** ClickHouse `FORMAT <name>` at statement end: the client-side
    * serialization directive. Results here are DataFrames — serialization
    * is the caller's concern — so a KNOWN ClickHouse format name strips
    * and the pasted query runs; any other trailing word is left alone (a
    * column named `format` stays a column). Statement-end anchoring makes
    * this literal-safe without a scanner: a string literal always ends
    * with a quote, which the word-then-end pattern cannot match. Stripped
    * before SETTINGS in the chain mirror-imaging ClickHouse's
    * `[SETTINGS …] [FORMAT f]` clause order.
    */
  private def rewriteFormat(sqlText: String): String = sqlText match {
    case FormatRe(stmt, fmt) if KnownFormats.contains(fmt.toLowerCase) => stmt
    case _ => sqlText
  }

  /** ClickHouse `GLOBAL JOIN` / `GLOBAL [NOT] IN`: the distributed
    * broadcast-the-right-side spelling. On this engine every join and IN
    * subquery already plans against the WHOLE table (Spark owns
    * distribution and picks broadcast itself), so GLOBAL is the identity
    * — the token drops (quote-aware) and the plain form parses. GLOBAL as
    * an ordinary identifier is untouched (the drop requires a following
    * join/IN keyword).
    */
  private def rewriteGlobal(sqlText: String): String =
    if (!GlobalProbeRe.pattern.matcher(sqlText).find()) sqlText
    else replaceOutsideQuotes(sqlText, GlobalRe)(m => m.group(1))

  /** ClickHouse's EXPRESSION-alias WITH items — `WITH <expr> AS <ident>`
    * (constants, per-row expressions, aggregates, scalar subqueries) —
    * the macro CTE form Spark's grammar lacks: each use of the ident in
    * the rest of the statement means the expression, evaluated AT THE USE
    * SITE. Implemented as textual macro expansion: the WITH list splits
    * top-level, items whose LAST top-level AS is followed by a bare
    * identifier are macros (standard `ident AS (subquery)` items are
    * untouched and stay in the WITH clause — the two forms mix, as in
    * ClickHouse), and each macro substitutes `(expr)` for word-boundary
    * uses of the ident in later items and the statement body
    * (quote-aware; `x.ident`, `ident(`, and backticked names never
    * substitute). Statements with no macro items pass through BYTE-exact,
    * so no standard SQL changes meaning. Top-level WITH only — the
    * documented scope (a parenthesized subquery's own WITH re-enters the
    * parser only via the statement-end clause extraction). Divergence
    * from ClickHouse (documented): substitution is textual, so a macro
    * ident that collides with a column name inside a nested derived table
    * is substituted there too, where ClickHouse scopes per-query.
    */
  private def rewriteWithMacros(sqlText: String): String = {
    val m = WithHeadRe.findFirstMatchIn(sqlText).getOrElse(return sqlText)
    val after = sqlText.substring(m.end)
    val spans0 = quotedSpans(after)
    val depths0 = parenDepths(after)
    val sel = "(?i)\\bSELECT\\b".r.findAllMatchIn(after)
      .find(u => depths0(u.start) == 0 && !inSpan(spans0, u.start))
      .getOrElse(return sqlText)
    val items = splitTopLevel(after.substring(0, sel.start))
      .map(_.trim).filter(_.nonEmpty).toArray
    if (items.isEmpty) return sqlText
    var body = after.substring(sel.start)
    val StandardCte = "(?is)^[`\\w]+\\s+AS\\s*\\(.*\\)\\s*$".r
    val kept = scala.collection.mutable.Buffer.empty[String]
    var anyMacro = false
    def substitute(text: String, ident: String, expr: String): String =
      replaceOutsideQuotes(text, ("(?i)(?<![.\\w`])" +
        java.util.regex.Pattern.quote(ident) + "(?![\\w`(])").r)(_ => s"($expr)")
    var i = 0
    while (i < items.length) {
      val it = items(i)
      val asMacro: Option[(String, String)] =
        if (StandardCte.pattern.matcher(it).matches()) None
        else {
          val sp = quotedSpans(it)
          val dp = parenDepths(it)
          "(?i)\\bAS\\b".r.findAllMatchIn(it).toSeq.reverseIterator
            .find(a => dp(a.start) == 0 && !inSpan(sp, a.start))
            .flatMap { a =>
              val ident = it.substring(a.end).trim
              val expr = it.substring(0, a.start).trim
              if (expr.nonEmpty && "^[`\\w]+$".r.pattern.matcher(ident).matches())
                Some((stripTicks(ident), expr))
              else None
            }
        }
      asMacro match {
        case Some((ident, expr)) =>
          anyMacro = true
          var j = i + 1
          while (j < items.length) {
            items(j) = substitute(items(j), ident, expr); j += 1
          }
          body = substitute(body, ident, expr)
        case None => kept += it
      }
      i += 1
    }
    if (!anyMacro) sqlText
    else if (kept.isEmpty) body
    else s"WITH ${kept.mkString(", ")} $body"
  }

  /** ClickHouse's collection literals — `[1, 2, 3]` arrays and
    * `{'k': v}` maps — rewritten onto Spark's `array(…)` / `map(k, v, …)`
    * constructors. A `[` opens a LITERAL exactly when the previous
    * non-space character cannot end a primary expression (identifier,
    * `)`, `]`, `'…'`, backticked name) — otherwise it is Spark's own
    * subscript and stays; this is the same disambiguation every
    * bracket-literal dialect uses. Nested literals resolve by iterating
    * leftmost-outermost for arrays (the inner `[` then follows `(` or `,`
    * and qualifies on the next pass) and innermost-first for maps (so the
    * top-level `:` split never sees a nested brace). Quote-aware
    * throughout — `'[1,2]'` is data. Empty `[]` becomes `array()`
    * (Spark types it array<void>, usable wherever ClickHouse's
    * emptyArray* family would be).
    */
  private def rewriteCollectionLiterals(sqlText: String): String = {
    if (sqlText.indexOf('[') < 0 && sqlText.indexOf('{') < 0) return sqlText
    var cur = sqlText
    var guard = 0
    var changed = true
    while (changed && guard < 256) {
      changed = false; guard += 1
      val spans = quotedSpans(cur)
      // leftmost literal-open '['
      var i = 0
      var hit = -1
      while (i < cur.length && hit < 0) {
        if (cur.charAt(i) == '[' && !inSpan(spans, i)) {
          var p = i - 1
          while (p >= 0 && cur.charAt(p).isWhitespace) p -= 1
          val prev = if (p < 0) ' ' else cur.charAt(p)
          val subscript =
            if (prev == ')' || prev == ']' || prev == '}' || prev == '\'' ||
              prev == '`') true
            else if (prev.isLetterOrDigit || prev == '_') {
              // a word ends the preceding token: an identifier/number takes
              // a subscript; a KEYWORD is followed by a literal
              var w = p
              while (w >= 0 && (cur.charAt(w).isLetterOrDigit ||
                cur.charAt(w) == '_')) w -= 1
              !LiteralLeadKeywords.contains(
                cur.substring(w + 1, p + 1).toUpperCase)
            } else false
          if (!subscript) hit = i
        }
        i += 1
      }
      if (hit >= 0) {
        val close = matchBracketQ(cur, hit, '[', ']')
        cur = cur.substring(0, hit) + "array(" +
          cur.substring(hit + 1, close) + ")" + cur.substring(close + 1)
        changed = true
      } else {
        // innermost '{…}' (no nested brace inside)
        var j = 0
        var open = -1
        var innermost = -1
        while (j < cur.length) {
          if (!inSpan(spans, j)) {
            if (cur.charAt(j) == '{') open = j
            else if (cur.charAt(j) == '}' && open >= 0 && innermost < 0)
              innermost = open
          }
          j += 1
        }
        if (innermost >= 0) {
          val close = matchBracketQ(cur, innermost, '{', '}')
          val body = cur.substring(innermost + 1, close).trim
          val pairs = splitTopLevel(body).map(_.trim).filter(_.nonEmpty)
          val args = pairs.map { p =>
            val sp = quotedSpans(p)
            val at = Iterator.range(0, p.length)
              .find(k => p.charAt(k) == ':' && !inSpan(sp, k))
              .getOrElse(throw new IllegalArgumentException(
                s"map literal entry needs 'key: value', got: $p"))
            s"${p.substring(0, at).trim}, ${p.substring(at + 1).trim}"
          }
          cur = cur.substring(0, innermost) + "map(" + args.mkString(", ") +
            ")" + cur.substring(close + 1)
          changed = true
        }
      }
    }
    cur
  }

  /** ClickHouse's ternary operator `cond ? a : b` → `if((cond), (a), (b))`.
    * Spark has no `?:`; the operands are recovered by a quote- and
    * depth-aware scan around the leftmost `?`:
    *
    *   - `cond` extends LEFT to the nearest enclosing `(`, a depth-0
    *     comma, or a depth-0 clause/expression-head keyword (SELECT,
    *     WHERE, WHEN, THEN, …). AND/OR stay INSIDE the condition —
    *     ClickHouse parses `a AND b ? x : y` as `(a AND b) ? x : y`
    *     (ternary binds loosest).
    *   - the matching `:` is found RIGHT of `?` at the same depth,
    *     counting nested `?` (each consumes one `:` first); `::` casts
    *     never match.
    *   - `b` extends RIGHT symmetrically (enclosing `)`, depth-0 comma,
    *     or clause keyword — FROM, AS, ORDER, ASC/DESC, …). A nested
    *     ternary inside `b` rides along textually and resolves on the
    *     next pass (leftmost-first to fixpoint).
    *
    * Runs AFTER the collection-literal rewrite, so map-literal colons are
    * gone before this scan. `?` inside string literals is data.
    */
  private def rewriteTernary(sqlText: String): String = {
    if (sqlText.indexOf('?') < 0) return sqlText
    var cur = sqlText
    var from = 0
    var guard = 0
    while (guard < 64) {
      guard += 1
      val spans = quotedSpans(cur)
      val q = Iterator.range(from, cur.length)
        .find(i => cur.charAt(i) == '?' && !inSpan(spans, i))
        .getOrElse(return cur)
      // ---- matching ':' to the right
      var i = q + 1
      var depth = 0
      var nested = 0
      var colon = -1
      while (i < cur.length && colon < 0) {
        if (!inSpan(spans, i)) {
          cur.charAt(i) match {
            case '(' | '[' => depth += 1
            case ')' | ']' => depth -= 1
            case '?' if depth == 0 => nested += 1
            case ':' if depth == 0 &&
              (i + 1 >= cur.length || cur.charAt(i + 1) != ':') &&
              cur.charAt(i - 1) != ':' =>
              if (nested == 0) colon = i else nested -= 1
            case _ =>
          }
        }
        i += 1
      }
      if (colon < 0) {
        // no ternary here — a bare '?' is Spark's positional parameter
        // marker; leave it for the delegate and look past it
        from = q + 1
      } else {
      // ---- left boundary of cond
      var l = q - 1
      depth = 0
      var condStart = 0
      while (l >= 0 && condStart == 0) {
        if (!inSpan(spans, l)) {
          val c = cur.charAt(l)
          if (c == ')' || c == ']') depth += 1
          else if (c == '(' || c == '[') {
            if (depth == 0) condStart = l + 1 else depth -= 1
          } else if (depth == 0 && c == ',') condStart = l + 1
          else if (depth == 0 && (c.isLetter || c == '_')) {
            var w = l
            while (w >= 0 && (cur.charAt(w).isLetterOrDigit ||
              cur.charAt(w) == '_')) w -= 1
            val word = cur.substring(w + 1, l + 1).toUpperCase
            if (TernaryLeftKeywords.contains(word)) condStart = l + 1
            else l = w + 1 // skip the whole word
          }
        }
        l -= 1
      }
      // ---- right boundary of b
      var r = colon + 1
      depth = 0
      var bEnd = cur.length
      while (r < cur.length && bEnd == cur.length) {
        if (!inSpan(spans, r)) {
          val c = cur.charAt(r)
          if (c == '(' || c == '[') depth += 1
          else if (c == ')' || c == ']') {
            if (depth == 0) bEnd = r else depth -= 1
          } else if (depth == 0 && (c == ',' || c == ';')) bEnd = r
          else if (depth == 0 && (c.isLetter || c == '_')) {
            var w = r
            while (w < cur.length && (cur.charAt(w).isLetterOrDigit ||
              cur.charAt(w) == '_')) w += 1
            val word = cur.substring(r, w).toUpperCase
            if (TernaryRightKeywords.contains(word)) bEnd = r
            else r = w - 1 // skip the whole word
          }
        }
        r += 1
      }
      val cond = cur.substring(condStart, q).trim
      val a = cur.substring(q + 1, colon).trim
      val b = cur.substring(colon + 1, bEnd).trim
      require(cond.nonEmpty && a.nonEmpty && b.nonEmpty,
        s"malformed ternary around '?' in: $cur")
      cur = cur.substring(0, condStart) +
        s" if(($cond), ($a), ($b)) " + cur.substring(bEnd)
      from = 0
      }
    }
    cur
  }

  /** ClickHouse's `numbers(N)` / `numbers(offset, N)` table function (and
    * the `numbers_mt` spelling — parallelism is Spark's concern either
    * way): rewritten onto Spark's own `range` TVF with the column renamed
    * to ClickHouse's `number`. `numbers(N)` yields 0…N-1,
    * `numbers(o, N)` yields o…o+N-1 — both as BIGINT (ClickHouse's UInt64
    * has no Spark counterpart; the usual signedness divergence,
    * documented). A trailing alias is kept; without one the subquery is
    * aliased `numbers` so qualified references (`numbers.number`) resolve
    * exactly as they do in ClickHouse. The alias capture refuses clause
    * keywords, so `FROM numbers(3) WHERE …` aliases correctly.
    */
  private def rewriteNumbers(sqlText: String): String =
    if (!NumbersProbeRe.pattern.matcher(sqlText).find()) sqlText
    else replaceOutsideQuotes(sqlText, NumbersRe) { m =>
      val kw = m.group(1)
      val (start, end) = Option(m.group(3)) match {
        case Some(n) => (BigInt(m.group(2)), BigInt(m.group(2)) + BigInt(n))
        case None => (BigInt(0), BigInt(m.group(2)))
      }
      val alias = Option(m.group(4)).getOrElse("numbers")
      s"$kw (SELECT id AS number FROM range($start, $end)) $alias"
    }

  /** ClickHouse's star modifiers and regex column selector, the two
    * select-list shapes Spark's grammar lacks:
    *
    *   - `[t.]* [EXCEPT (c1, …)] REPLACE (expr AS c1[, …])` — star
    *     expansion with listed columns replaced IN PLACE by expressions
    *     (Spark parses `* EXCEPT` natively, but not REPLACE, and not the
    *     combination);
    *   - `COLUMNS('regex')` — every column whose name matches the
    *     pattern (ClickHouse's re2 dialect read as Java regex, the SQL
    *     face's documented regex posture).
    *
    * Each occurrence is cut out of the TEXT and a marker identifier left
    * in the hole; after the statement parses, the marker attribute is
    * spliced to a [[graft.plans.ChStarReplace]] /
    * [[graft.plans.ChColumnsRegex]] — Catalyst [[Star]]s carrying the
    * exact ClickHouse contract (in-place replacement, partial-match
    * regex, loud on unknown/empty). Stars also expand as FUNCTION
    * arguments (`hash(COLUMNS('^k'))`), ClickHouse's other use of
    * COLUMNS. The `APPLY` modifier is not supported (no analyzer
    * counterpart) and falls through to a loud parse error.
    */
  private def extractStarMods(
      sqlText0: String): (String, Map[String, Expression]) = {
    var cur = sqlText0
    val out = scala.collection.mutable.Map.empty[String, Expression]
    var guard = 0
    var changed = true
    while (changed && guard < 32) {
      changed = false; guard += 1
      val spans = quotedSpans(cur)
      StarReplaceHeadRe.findAllMatchIn(cur)
        .find(m => !inSpan(spans, m.start)).foreach { m =>
          val qual = Option(m.group(1)).map(q => Seq(stripTicks(q)))
          val excepts: Seq[String] = Option(m.group(2)).toSeq.flatMap(
            _.split(',').map(s => stripTicks(s.trim)).toSeq)
          val close = matchParenQ(cur, m.end - 1)
          val items = splitTopLevel(cur.substring(m.end, close))
            .map(_.trim).filter(_.nonEmpty)
          require(items.nonEmpty, "star REPLACE needs at least one item")
          val repls = items.map { it =>
            delegate.parseExpression(it) match {
              case a: Alias => a.name -> (a: NamedExpression)
              case other => throw new IllegalArgumentException(
                s"star REPLACE items must be `expr AS column`, got: " +
                  other.sql)
            }
          }
          val marker = s"__graft_star_${out.size}_${math.abs(cur.hashCode).toHexString}"
          out(marker.toLowerCase) = graft.plans.ChStarReplace(qual, excepts, repls)
          cur = cur.substring(0, m.start) + s" $marker " + cur.substring(close + 1)
          changed = true
        }
      if (!changed) {
        val spans2 = quotedSpans(cur)
        ColumnsSelectorRe.findAllMatchIn(cur)
          .find(m => !inSpan(spans2, m.start)).foreach { m =>
            val marker = s"__graft_cols_${out.size}_${math.abs(cur.hashCode).toHexString}"
            out(marker.toLowerCase) = graft.plans.ChColumnsRegex(m.group(1))
            cur = cur.substring(0, m.start) + s" $marker " + cur.substring(m.end)
            changed = true
          }
      }
    }
    (cur, out.toMap)
  }

  /** ClickHouse `SELECT DISTINCT ON (c1[, c2…]) …`: the first row of each
    * (c1, c2, …) group — by ClickHouse's own documented equivalence,
    * exactly `LIMIT 1 BY c1, c2…` — so the clause FOLDS onto the LIMIT BY
    * machinery textually and inherits its discipline: the statement must
    * carry an ORDER BY (ClickHouse permits an arbitrary pick per group;
    * this engine refuses the nondeterminism loudly) and the ON columns
    * must be in the result. A trailing plain `LIMIT k` moves AFTER the
    * folded clause (`… LIMIT 1 BY cols LIMIT k`), ClickHouse's clause
    * order, which limitByPlan applies post-sort. Only the statement's own
    * head is folded here — a parenthesized DISTINCT ON subquery re-enters
    * parsePlan through extractClauseSubqueries. Top-level set operations
    * under DISTINCT ON are refused (the fold would mis-scope the clause).
    */
  private def rewriteDistinctOn(sqlText: String): String = {
    val m = DistinctOnHeadRe.findFirstMatchIn(sqlText).getOrElse(return sqlText)
    val open = m.end - 1
    val close = matchParenQ(sqlText, open)
    val cols = sqlText.substring(open + 1, close).trim
    require(cols.nonEmpty, s"DISTINCT ON needs at least one column: $sqlText")
    val rest0 = sqlText.substring(close + 1)
    // a top-level set operation would make the fold's scope ambiguous
    val depths = parenDepths(rest0)
    val spans = quotedSpans(rest0)
    "(?i)\\b(UNION|EXCEPT|INTERSECT)\\b".r.findAllMatchIn(rest0).foreach { u =>
      require(depths(u.start) > 0 || inSpan(spans, u.start),
        "DISTINCT ON over a set operation is not supported — " +
          "parenthesize the DISTINCT ON branch")
    }
    // a trailing plain LIMIT k (no BY / WITH TIES) moves after the fold;
    // the span check keeps a statement ENDING in a string literal intact
    val trail = "(?is)\\s+LIMIT\\s+(\\d+)\\s*;?\\s*$".r.findFirstMatchIn(rest0)
      .filterNot(mm => inSpan(spans, mm.start(1)))
    val (rest, tail) = trail match {
      case Some(mm) => (rest0.substring(0, mm.start), s" LIMIT ${mm.group(1)}")
      case None => (rest0.replaceAll("(?s)[;\\s]+$", ""), "")
    }
    s"SELECT $rest LIMIT 1 BY $cols$tail"
  }

  /** `INSERT INTO t FORMAT JSONEachRow {…} {…}` → an INSERT…SELECT that
    * parses each object with from_json against the TARGET's schema
    * (resolved read-only at parse time — the same posture as the SAMPLE
    * rewrite's TableDef lookup). Lines split on top-level braces, so
    * nested objects and brace characters inside string values survive.
    */
  private def rewriteInsertJsonRows(head: String, ident: String,
      lines0: String): String = {
    val schema = org.apache.spark.sql.graft.PlanBridge
      .ofRows(session, delegate.parsePlan(s"SELECT * FROM $ident"))
      .schema
    val ddl = schema.toDDL.replace("'", "''")
    // each top-level {...} is one row
    val lines = scala.collection.mutable.Buffer.empty[String]
    var i = 0
    val s = lines0
    while (i < s.length) {
      if (s.charAt(i) == '{') {
        val close = matchBracketQ(s, i, '{', '}')
        lines += s.substring(i, close + 1)
        i = close + 1
      } else {
        require(s.charAt(i).isWhitespace || s.charAt(i) == ',' ||
          s.charAt(i) == ';',
          s"JSONEachRow: unexpected text outside objects: ${s.substring(i)}")
        i += 1
      }
    }
    require(lines.nonEmpty, "JSONEachRow: no rows")
    val vals = lines.map(l => s"('${l.replace("'", "''")}')").mkString(", ")
    s"$head SELECT j.* FROM (SELECT from_json(col1, '$ddl') AS j " +
      s"FROM (VALUES $vals))"
  }

  /** ClickHouse's `QUALIFY <pred>` (filter over window-function results —
    * the clause between HAVING and ORDER BY): rewritten by wrapping the
    * de-QUALIFY'd select in a derived table and filtering OUTSIDE it —
    * `SELECT … QUALIFY p ORDER BY o LIMIT n` becomes `SELECT * FROM
    * (SELECT …) WHERE p ORDER BY o LIMIT n` — so the predicate sees the
    * select list's ALIASES (the idiomatic `QUALIFY rn = 1` shape). A
    * predicate spelling a NEW window function inline is refused by
    * Spark's own window-in-WHERE error (loud, not silent). Top-level
    * statements only; the clause is cut at the first top-level QUALIFY
    * outside quotes, the tail (ORDER BY/LIMIT/set-op …) stays outside
    * the wrap.
    */
  private def rewriteQualify(sqlText: String): String = {
    if (!QualifyProbeRe.pattern.matcher(sqlText).find()) return sqlText
    val spans = quotedSpans(sqlText)
    val depths = parenDepths(sqlText)
    val m = "(?i)\\bQUALIFY\\b".r.findAllMatchIn(sqlText)
      .find(u => depths(u.start) == 0 && !inSpan(spans, u.start))
      .getOrElse(return sqlText)
    val head = sqlText.substring(0, m.start).trim
    require("(?is)^\\s*(SELECT|WITH)\\b".r.findFirstIn(head).isDefined,
      s"QUALIFY outside a SELECT statement: $sqlText")
    val rest = sqlText.substring(m.end)
    // the predicate runs to the next top-level clause keyword (or end)
    val rSpans = quotedSpans(rest)
    val rDepths = parenDepths(rest)
    val cut = ("(?i)\\b(ORDER|LIMIT|UNION|EXCEPT|INTERSECT|SETTINGS|" +
      "FORMAT|INTO)\\b").r.findAllMatchIn(rest)
      .find(u => rDepths(u.start) == 0 && !inSpan(rSpans, u.start))
      .map(_.start).getOrElse(rest.length)
    val pred = rest.substring(0, cut).trim
    val tail = rest.substring(cut)
    require(pred.nonEmpty, s"QUALIFY with no predicate: $sqlText")
    s"SELECT * FROM ($head) __graft_qualify WHERE $pred $tail"
  }

  /** ClickHouse's EXPLAIN variants → Spark's: `EXPLAIN AST|SYNTAX` →
    * `EXPLAIN EXTENDED` (the closest "show me the rewritten/parsed form"),
    * `EXPLAIN PLAN` → plain `EXPLAIN`, `EXPLAIN PIPELINE` → `EXPLAIN
    * FORMATTED` (the physical/operator view), `EXPLAIN ESTIMATE` →
    * `EXPLAIN COST`. Output is Spark's, not ClickHouse's — EXPLAIN text is
    * engine-specific everywhere; the point is the verb parsing instead of
    * erroring. Spark's own EXPLAIN words are untouched.
    */
  private def rewriteExplain(sqlText: String): String =
    ExplainChRe.findFirstMatchIn(sqlText) match {
      case Some(m) =>
        val word = m.group(1).toUpperCase match {
          case "AST" | "SYNTAX" => "EXTENDED"
          case "PLAN" => ""
          case "PIPELINE" => "FORMATTED"
          case "ESTIMATE" => "COST"
        }
        s"EXPLAIN $word ${sqlText.substring(m.end)}"
      case None => sqlText
    }

  /** `system.one` (the 1-row dummy table ClickHouse cross-joins constants
    * against) and `system.numbers` (the unbounded integer stream, always
    * used under LIMIT) as FROM targets: rewritten to a 1-row relation and
    * a Long.MaxValue range (Spark's range iterates lazily, so `FROM
    * system.numbers LIMIT 10` stops after 10). Same alias discipline as
    * numbers().
    */
  private def rewriteSystemTables(sqlText: String): String =
    if (!SystemTableProbeRe.pattern.matcher(sqlText).find()) sqlText
    else replaceOutsideQuotes(sqlText, SystemTableRe) { m =>
      val kw = m.group(1)
      val alias = Option(m.group(3))
      m.group(2).toLowerCase match {
        case "one" =>
          s"$kw (SELECT CAST(0 AS TINYINT) AS dummy) ${alias.getOrElse("one")}"
        case "numbers" =>
          s"$kw (SELECT id AS number FROM range(0, 9223372036854775807)) " +
            alias.getOrElse("numbers")
      }
    }

  /** ClickHouse word order `SEMI LEFT JOIN` / `ANTI LEFT JOIN` → Spark's
    * `LEFT SEMI JOIN` / `LEFT ANTI JOIN` — identical semantics, swapped
    * keywords. The RIGHT-side variants have no Spark counterpart and fall
    * through to Spark's own parse error.
    */
  private def rewriteJoinWords(sqlText: String): String =
    if (!SemiAntiProbeRe.pattern.matcher(sqlText).find()) sqlText
    else replaceOutsideQuotes(sqlText, SemiAntiRe)(m =>
      s"LEFT ${m.group(1).toUpperCase} JOIN")

  /** ClickHouse PARAMETRIC aggregates — `name(params)(args)`, a call shape
    * Spark's grammar cannot parse — rewritten to flat Spark calls:
    *
    *   - `quantile(p)(x)` / `quantileExact(p)(x)` → `percentile(x, p)`
    *     (exact interpolated — a deterministic superset of ClickHouse's
    *     sampling approximation, documented); `quantiles(p…)(x)` → the
    *     array form; `quantileTDigest(p)(x)` → `percentile_approx(x, p)`
    *     (Spark's mergeable sketch, same accuracy class).
    *   - `topK(k)(x)` / `topKWeighted(k)(x, w)` → a slice of the engine's
    *     SpaceSaving UDAFs (capacity 4096, k ≤ 50 — the registered sketch
    *     width; exact when nothing evicts, same as q63's contract).
    *   - `uniqUpTo(n)(x)`, n ≤ 100 → `least(uniq_up_to_100(x), n+1)` —
    *     the saturating distinct count (exact ≤ n, n+1 past it) from the
    *     bounded-state aggregator.
    *   - `groupArray(n)(x)` / `groupUniqArray(n)(x)` → a slice of the
    *     unbounded forms.
    *
    * Scanner, not regex-only: the two groups are balanced-paren matched
    * (quote-aware), leftmost occurrence per pass until fixpoint, so nested
    * parametrics in arguments resolve too. A name WITHOUT a second group
    * (plain `groupArray(x)`) is untouched — that is the registry alias.
    */
  private def rewriteParametrics(sqlText: String): String = {
    if (!ParametricHeadRe.pattern.matcher(sqlText).find()) return sqlText
    var cur = sqlText
    var guard = 0
    while (guard < 64) {
      guard += 1
      val spans = quotedSpans(cur)
      val hit = ParametricHeadRe.findAllMatchIn(cur)
        .filter(m => !inSpan(spans, m.start))
        .flatMap { m =>
          val open1 = m.end - 1 // the regex ends at '('
          scala.util.Try {
            val close1 = matchParenQ(cur, open1)
            var j = close1 + 1
            while (j < cur.length && cur.charAt(j).isWhitespace) j += 1
            if (j >= cur.length || cur.charAt(j) != '(') None
            else {
              val close2 = matchParenQ(cur, j)
              Some((m.start, close2 + 1, m.group(1),
                cur.substring(open1 + 1, close1).trim,
                cur.substring(j + 1, close2).trim))
            }
          }.toOption.flatten
        }.toStream.headOption
      hit match {
        case Some((start, end, name, params, args)) =>
          cur = cur.substring(0, start) +
            parametricCall(name, params, args) + cur.substring(end)
        case None => return cur
      }
    }
    cur
  }

  private def parametricCall(name: String, params: String, args: String): String = {
    require(params.nonEmpty, s"$name(…)(…): empty parameter list")
    require(args.nonEmpty, s"$name(…)(…): empty argument list")
    def intParam(lo: Int, hi: Int): Int = {
      val n = scala.util.Try(params.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"$name($params): the parameter must be an integer literal"))
      require(n >= lo && n <= hi, s"$name($params): parameter out of [$lo, $hi]")
      n
    }
    name.toLowerCase match {
      // quantileTiming/Deterministic/Interpolated: ClickHouse's variant
      // zoo differs in SAMPLING strategy, not in what is asked — the
      // exact interpolated percentile is a deterministic superset of all
      // of them (same posture as quantileExact).
      case "quantile" | "quantileexact" | "median" | "quantiletiming" |
           "quantiledeterministic" | "quantileinterpolatedweighted" =>
        s"percentile($args, $params)"
      case "quantiles" | "quantilesexact" | "quantilestiming" =>
        s"percentile($args, array($params))"
      case "quantiletdigest" | "quantilebfloat16" =>
        s"percentile_approx($args, $params)"
      case "topk" =>
        val k = intParam(1, 50)
        s"slice(transform(topk_approx($args), ch_t -> ch_t.term), 1, $k)"
      case "topkweighted" =>
        val k = intParam(1, 50)
        s"slice(transform(topk_weighted($args), ch_t -> ch_t.term), 1, $k)"
      case "uniqupto" =>
        val n = intParam(1, 100)
        s"least(uniq_up_to_100($args), ${n + 1})"
      case "grouparray"     => s"slice(groupArray($args), 1, ${intParam(1, 1 << 20)})"
      case "groupuniqarray" => s"slice(groupUniqArray($args), 1, ${intParam(1, 1 << 20)})"
      case other => throw new IllegalStateException(s"unhandled parametric $other")
    }
  }

  /** ClickHouse spells datetime units as STRING literals —
    * `dateDiff('day', a, b)`, `dateAdd('hour', 3, t)` — where Spark's
    * grammar wants the bare keyword (`datediff(day, a, b)`). Unquote the
    * first argument when it is a known unit; any other quoted first
    * argument (for example date_add('2024-01-01', 3)) is data and stays.
    */
  private def rewriteDateDiffUnit(sqlText: String): String =
    if (!DateUnitCallRe.pattern.matcher(sqlText).find()) sqlText
    else replaceOutsideQuotes(sqlText, DateUnitCallRe) { m =>
      if (DatetimeUnits.contains(m.group(2).toLowerCase))
        s"${m.group(1)}(${m.group(2)}, "
      else m.matched
    }

  /** ClickHouse `FROM l [la] ASOF [LEFT] JOIN r [ra] ON eq… AND ineq` —
    * for every left row, the single right row with the matching equality
    * keys and the CLOSEST time satisfying the inequality (`ra.t <= la.t`
    * picks the latest-at-or-before; the other three operators analogous).
    * `ANY [LEFT] JOIN` is the same top-1 shape with equality-only ON and
    * an ARBITRARY pick among matches (ClickHouse's contract —
    * deterministic only when matches are unique; a constant window
    * ordering says exactly that).
    * Spark has no such join; the clause is cut out of the text (a marker
    * relation takes its place so the REST of the statement parses through
    * the delegate untouched) and replaced at plan level by:
    *
    *   Project(la.*, ra.*,                       ← exactly both sides' columns
    *     Filter(__asof_rn = 1,
    *       Project(*, row_number over (partition by __asof_id
    *                                   order by <right time> closest-first),
    *         Join(Project(*, monotonically_increasing_id as __asof_id,
    *                SubqueryAlias(la, l)),       ← id OUTSIDE the alias, so
    *              SubqueryAlias(ra, r),            la.* never includes it
    *              INNER | LEFT OUTER, eq AND ineq))))
    *
    * Pure plan construction — no catalog touch, no view, EXPLAIN-safe.
    * Both aliases survive (the spliced Project preserves qualifiers), so
    * `SELECT la.x, ra.y` and `SELECT *` resolve exactly as in ClickHouse
    * (both sides' columns, helpers invisible). ASOF LEFT keeps unmatched
    * left rows with NULL right columns (ClickHouse fills type defaults —
    * documented divergence, same as LEFT ARRAY JOIN).
    *
    * Contract, each refusal loud: ONE ASOF JOIN per statement; plain
    * table/view identifiers as sides; ON must be equality conjuncts plus
    * EXACTLY ONE inequality whose sides are qualified by the two aliases
    * (ClickHouse's own requirement modulo the qualifiers); USING is not
    * supported (spell the ON form). Ties on the time expression pick one
    * row nondeterministically (document ClickHouse: undefined too).
    *
    * Scale: the eq-join shuffles on the keys, the per-left-row top-1 is a
    * window partitioned by __asof_id — rows multiply only within each
    * key's time neighborhood. The Scala-face composition (q39) trades the
    * window for a map-side-partial max_by; both avoid a cartesian.
    */
  private def extractAsof(sqlText: String): (String, Option[(String, LogicalPlan)]) = {
    val spans = quotedSpans(sqlText)
    val asofProbes = AsofProbeRe.findAllMatchIn(sqlText).toList
      .filter(m => !inSpan(spans, m.start))
    val anyProbes = AnyProbeRe.findAllMatchIn(sqlText).toList
      .filter(m => !inSpan(spans, m.start))
    if (asofProbes.isEmpty && anyProbes.isEmpty) return (sqlText, None)
    require(asofProbes.size + anyProbes.size == 1,
      "only one ASOF/ANY JOIN per statement is supported — nest the others " +
        "in subqueries")
    val isAny = anyProbes.nonEmpty
    val kw = if (isAny) "ANY" else "ASOF"
    val re = if (isAny) AnyRe else AsofRe
    val m = re.findFirstMatchIn(sqlText).getOrElse(
      throw new IllegalArgumentException(
        s"unsupported $kw JOIN shape — supported: FROM <table> [alias] " +
          s"$kw [LEFT] JOIN <table> [alias] ON <conditions> (if '$kw' here " +
          s"is a TABLE named ${kw.toLowerCase}, backquote it): " + sqlText))
    val lIdent = m.group(1); val lAlias0 = Option(m.group(2))
    val isLeft = m.group(3) != null
    val rIdent = m.group(4); val rAlias0 = Option(m.group(5))
    val conds = m.group(6).trim
    def lastSeg(id: String) = stripTicks(id.split('.').last)
    val lAlias = lAlias0.getOrElse(lastSeg(lIdent))
    val rAlias = rAlias0.getOrElse(lastSeg(rIdent))

    // split the ON conjuncts: ASOF wants exactly one inequality among
    // equalities; ANY wants equalities only (the pick is arbitrary)
    val conjuncts = splitTopLevelAnd(conds)
    val (ineqs, eqs) = conjuncts.partition(c => IneqOpRe.findFirstMatchIn(
      maskQuoted(c)).isDefined)
    val orderSpec: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
      if (isAny) {
        require(ineqs.isEmpty,
          s"ANY JOIN takes only equality conditions (use ASOF JOIN for the " +
            s"closest-time pick): $conds")
        require(eqs.nonEmpty, s"ANY JOIN needs at least one equality: $conds")
        // ClickHouse ANY: an ARBITRARY single match — a constant ordering
        // says exactly that (deterministic only when matches are unique)
        Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
          org.apache.spark.sql.catalyst.expressions.Literal(1),
          org.apache.spark.sql.catalyst.expressions.Ascending))
      } else {
        require(ineqs.size == 1,
          s"ASOF JOIN needs exactly ONE inequality in ON, got ${ineqs.size}: $conds")
        require(eqs.nonEmpty,
          s"ASOF JOIN needs at least one equality conjunct in ON: $conds")
        val ineq = ineqs.head
        val im = IneqOpRe.findFirstMatchIn(maskQuoted(ineq)).get
        val (lhs, op, rhs) =
          (ineq.substring(0, im.start).trim, im.group(1), ineq.substring(im.end).trim)
        // which side is the RIGHT relation's time — by alias qualification
        def belongsTo(e: String, alias: String) =
          ("(?i)\\b" + java.util.regex.Pattern.quote(alias) + "\\s*\\.").r
            .findFirstIn(e).isDefined
        val rightExprS =
          if (belongsTo(lhs, rAlias) && !belongsTo(rhs, rAlias)) lhs
          else if (belongsTo(rhs, rAlias) && !belongsTo(lhs, rAlias)) rhs
          else throw new IllegalArgumentException(
            s"ASOF inequality must compare a $rAlias.-qualified expression " +
              s"against a $lAlias.-qualified one: $ineq")
        // normalize to rightExpr REL leftExpr: <=/< → pick MAX right (DESC)
        val rel = if (rightExprS == lhs) op else op match {
          case "<=" => ">="
          case ">=" => "<="
          case "<"  => ">"
          case ">"  => "<"
        }
        val direction =
          if (rel == "<=" || rel == "<")
            org.apache.spark.sql.catalyst.expressions.Descending
          else org.apache.spark.sql.catalyst.expressions.Ascending
        Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
          delegate.parseExpression(rightExprS), direction))
      }

    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, CurrentRow, EqualTo, Literal, MonotonicallyIncreasingID, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join, JoinHint, Project, SubqueryAlias}
    def rel0(id: String) =
      UnresolvedRelation(delegate.parseMultipartIdentifier(id))
    val leftQ = SubqueryAlias(lAlias, rel0(lIdent))
    val leftId = Project(Seq(UnresolvedStar(None),
      Alias(MonotonicallyIncreasingID(), "__asof_id")()), leftQ)
    val rightQ = SubqueryAlias(rAlias, rel0(rIdent))
    val joined = Join(leftId, rightQ, if (isLeft) LeftOuter else Inner,
      Some(delegate.parseExpression(conds)), JoinHint.NONE)
    val rn = WindowExpression(RowNumber(), WindowSpecDefinition(
      Seq(UnresolvedAttribute("__asof_id")), orderSpec,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)))
    val withRn = Project(Seq(UnresolvedStar(None), Alias(rn, "__asof_rn")()), joined)
    val filtered = LFilter(
      EqualTo(UnresolvedAttribute("__asof_rn"), Literal(1)), withRn)
    val out = Project(Seq(UnresolvedStar(Some(Seq(lAlias))),
      UnresolvedStar(Some(Seq(rAlias)))), filtered)

    val marker = s"__graft_asof_${math.abs(sqlText.hashCode).toHexString}"
    val replaced = sqlText.substring(0, m.start) +
      s" FROM $marker " + sqlText.substring(m.end)
    (replaced, Some((marker, out)))
  }

  /** Top-level AND split (quote- and paren-aware) for the ASOF ON list. */
  private def splitTopLevelAnd(s: String): Seq[String] = {
    val masked = maskQuoted(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var last = 0
    val re = "(?i)\\bAND\\b".r
    re.findAllMatchIn(masked).foreach { m =>
      depth = masked.substring(0, m.start).count(_ == '(') -
        masked.substring(0, m.start).count(_ == ')')
      if (depth == 0) { out += s.substring(last, m.start); last = m.end }
    }
    out += s.substring(last)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Replace quoted spans with spaces so operators inside literals never
    * match (length-preserving — offsets stay valid on the original).
    */
  private def maskQuoted(s: String): String = {
    val spans = quotedSpans(s)
    val b = s.toCharArray
    spans.foreach { case (a, z) =>
      var i = a
      while (i < z && i < b.length) { b(i) = ' '; i += 1 }
    }
    new String(b)
  }

  /** ClickHouse `FROM t [LEFT] ARRAY JOIN arr [AS e]` — per-element row
    * expansion, the clause ClickHouse uses where Spark says LATERAL VIEW
    * explode. Rewrites to a subquery exploding the array:
    *   - bare `ARRAY JOIN arr`: the array column is REPLACED by its
    *     element under the same name (ClickHouse's contract) —
    *     `SELECT * EXCEPT (arr), explode(arr) AS arr`;
    *   - `ARRAY JOIN arr AS e`: the array column stays, the element rides
    *     alongside as `e`;
    *   - `LEFT ARRAY JOIN` keeps empty/NULL-array rows (explode_outer;
    *     DOCUMENTED DIVERGENCE: the element is NULL on such rows where
    *     ClickHouse emits the type default);
    *   - the MULTI-array form (`ARRAY JOIN a, b AS e`) ZIPS the arrays
    *     positionally — row i carries (a[i], b[i]), ClickHouse's
    *     parallel-arrays contract — via one `explode(arrays_zip(…))`
    *     (DOCUMENTED DIVERGENCE: unequal lengths NULL-pad the shorter
    *     array where ClickHouse errors).
    * A genuine join whose LEFT side is aliased `array`
    * (`FROM t array JOIN u [x] ON …`) is protected by the ON/USING
    * lookahead.
    */
  private def rewriteArrayJoin(sqlText: String): String =
    if (!ArrayJoinProbeRe.pattern.matcher(sqlText).find()) sqlText
    else replaceOutsideQuotes(sqlText, ArrayJoinRe) { m =>
      val ident = m.group(1)
      val left = m.group(2) != null
      val items: Seq[(String, Option[String])] =
        splitTopLevel(m.group(3)).map(_.trim).filter(_.nonEmpty).map { it =>
          val parts = it.split("(?i)\\s+AS\\s+")
          (stripTicks(parts(0).trim),
            if (parts.length > 1) Some(stripTicks(parts(1).trim)) else None)
        }
      require(items.map(_._1).distinct.size == items.size,
        s"duplicate ARRAY JOIN column in '${m.group(3)}'")
      val fn = if (left) "explode_outer" else "explode"
      val tAlias = ident.split('.').last.replace("`", "")
      items match {
        case Seq((arr, Some(e))) =>
          s"FROM (SELECT *, $fn(`$arr`) AS `$e` FROM $ident) $tAlias"
        case Seq((arr, None)) =>
          s"FROM (SELECT * EXCEPT (`$arr`), $fn(`$arr`) AS `$arr` FROM $ident) $tAlias"
        case many =>
          val zipped = many.map(i => s"`${i._1}`").mkString(", ")
          // bare entries are REPLACED (dropped then re-emitted under the
          // same name); AS entries keep their array column
          val except = (many.collect { case (c, None) => s"`$c`" } :+ "`__aj_z`")
            .mkString(", ")
          val outs = many.map { case (c, al) =>
            s"__aj_z.`$c` AS `${al.getOrElse(c)}`"
          }.mkString(", ")
          s"FROM (SELECT * EXCEPT ($except), $outs FROM " +
            s"(SELECT *, $fn(arrays_zip($zipped)) AS __aj_z FROM $ident) __aj_in) $tAlias"
      }
    }

  override def parsePlan(sqlText0: String): LogicalPlan = {
    // ClickHouse-native CREATE TABLE (ENGINE = *MergeTree) → the Spark DDL
    // face; recognized by its ENGINE clause, so no Spark DDL changes meaning
    ChCreateTable.rewrite(sqlText0) match {
      case Some(ddl) => return delegate.parsePlan(ddl)
      case None =>
    }
    // `SELECT … INTO OUTFILE 'path' [FORMAT f]` — matched BEFORE the
    // rewrite chain (rewriteFormat would strip the trailing FORMAT word).
    // The inner statement text is kept verbatim and parsed/executed only
    // when the command RUNS — parsing stays side-effect free.
    (if (OutfileProbeRe.pattern.matcher(sqlText0).find())
      OutfileRe.findFirstMatchIn(sqlText0) else None)
      // the INTO keyword must be SYNTAX, not text inside a literal
      .filterNot(m => inSpan(quotedSpans(sqlText0), m.end(1) + 1))
      .foreach { m =>
        val fmt = Option(m.group(4)).map(_.toLowerCase).getOrElse("tabseparated")
        require(OutfileFormats.contains(fmt),
          s"INTO OUTFILE: unsupported FORMAT '$fmt' " +
            s"(supported: ${OutfileFormats.keys.toSeq.sorted.mkString(", ")})")
        return OutfileCommand(m.group(1), m.group(2), fmt, m.group(3) != null)
      }
    // ClickHouse INSERT spellings: `INSERT INTO t FORMAT Values (…), (…)`
    // is Spark's own VALUES form one keyword apart; `FORMAT JSONEachRow
    // {…} {…}` parses each JSON object against the TARGET's schema
    // (from_json over the catalog/table-def schema — a read-only lookup).
    val sqlText1 = sqlText0 match {
      case InsertFormatValuesRe(head, tuples) => s"$head VALUES $tuples"
      case InsertJsonRowsRe(head, ident, lines) =>
        rewriteInsertJsonRows(head, ident, lines)
      case _ => sqlText0
    }
    val rewritten0 = rewriteDistinctOn(rewriteSamples(rewriteFinal(
      rewritePrewhere(rewriteArrayJoin(rewriteJoinWords(rewriteGlobal(
        rewriteNumbers(rewriteSystemTables(rewriteSettings(rewriteFormat(
          rewriteParametrics(rewriteDateDiffUnit(rewriteTernary(
            rewriteCollectionLiterals(rewriteQualify(rewriteWithMacros(
              rewriteExplain(sqlText1))))))))))))))))))
    // Star modifiers (`* REPLACE`, `COLUMNS('re')`): cut from the text
    // here, spliced into the parsed plan at the end of this method.
    val (rewritten, starSplices) =
      if (!StarModProbeRe.pattern.matcher(rewritten0).find())
        (rewritten0, Map.empty[String, Expression])
      else extractStarMods(rewritten0)
    // Subqueries carrying the statement-END clauses (WITH FILL, LIMIT BY,
    // LIMIT WITH TIES — the three whose grammar anchors at the end): each
    // is cut out of the TEXT, recursively parsed as its own statement (so
    // every clause composes at any depth), and spliced back as a marker
    // relation — the same discipline as ASOF below.
    val (deSubbed, subSplices) = extractClauseSubqueries(rewritten)
    // ASOF/ANY JOIN: the clause is cut out of the TEXT (replaced by a
    // marker relation) and its plan spliced back into whatever the
    // statement parses to — transformUp reaches the marker inside
    // WITH FILL / LIMIT BY wrappings too.
    val (sqlText, asofSub) = extractAsof(deSubbed)
    val plan0 = sqlText match {
      case WithFillStmtRe(prefix, items, interpS) =>
        withFillPlan(prefix, items, Option(interpS))
      case LimitByRe(stmt, orderList, offS, nS, byCols, finalLimS) =>
        limitByPlan(stmt, orderList,
          Option(offS).map(_.toInt).getOrElse(0), nS.toInt, byCols,
          Option(finalLimS).map(_.toInt))
      case LimitWithTiesRe(stmt, orderList, nS) =>
        limitWithTiesPlan(stmt, orderList, nS.toInt)
      case _ => parseRewritten(sqlText)
    }
    val splices = subSplices ++ asofSub.toSeq
    val plan1 = if (splices.isEmpty) plan0
    else {
      val byMarker = splices.toMap
      plan0 transformUp {
        case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if r.multipartIdentifier.size == 1 &&
            byMarker.contains(r.multipartIdentifier.head.toLowerCase) =>
          byMarker(r.multipartIdentifier.head.toLowerCase)
      }
    }
    if (starSplices.isEmpty) plan1
    else plan1 transformAllExpressions {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        if a.nameParts.size == 1 &&
          starSplices.contains(a.nameParts.head.toLowerCase) =>
        starSplices(a.nameParts.head.toLowerCase)
    }
  }

  /** Find parenthesized SUBQUERIES whose inner statement ends in one of
    * the statement-end clauses (WITH FILL / LIMIT BY / LIMIT n WITH TIES)
    * and cut each out: the inner text recursively re-enters [[parsePlan]]
    * (every rewrite and clause applies at any depth), the hole gets a
    * marker relation (any alias after the parens keeps working — Spark
    * aliases the marker, the splice replaces only the relation). Ordinary
    * parenthesized expressions are untouched (the inner must START with
    * SELECT/WITH and MATCH a clause at its own end).
    */
  private def extractClauseSubqueries(
      sqlText0: String): (String, Seq[(String, LogicalPlan)]) = {
    var cur = sqlText0
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, LogicalPlan)]
    var guard = 0
    var changed = true
    while (changed && guard < 16) {
      changed = false; guard += 1
      val spans = quotedSpans(cur)
      val starts = "\\(".r.findAllMatchIn(cur).map(_.start).toList
        .filter(i => !inSpan(spans, i))
      val hit = starts.iterator.flatMap { open =>
        scala.util.Try(matchParenQ(cur, open)).toOption.flatMap { close =>
          val inner = cur.substring(open + 1, close).trim
          val isStmt = "(?is)^(SELECT|WITH)\\b".r.findFirstIn(inner).isDefined
          val hasClause = isStmt && (inner match {
            case WithFillStmtRe(_, _, _) => true
            case LimitByRe(_, _, _, _, _, _) => true
            case _ if DistinctOnHeadRe.findFirstIn(inner).isDefined => true
            case LimitWithTiesRe(_, _, _) => true
            case _ => false
          })
          if (hasClause) Some((open, close, inner)) else None
        }
      }.find(_ => true)
      hit.foreach { case (open, close, inner) =>
        val marker = s"__graft_sub_${out.size}_${math.abs(inner.hashCode).toHexString}"
        out += ((marker.toLowerCase, parsePlan(inner)))
        cur = cur.substring(0, open) + s" $marker " + cur.substring(close + 1)
        changed = true
      }
    }
    (cur, out.toSeq)
  }

  /** ClickHouse `… ORDER BY o1[, o2…] LIMIT [o,] n BY c1[, c2…]`: the
    * first n rows of EACH (c1, c2, …) group under the query's own ORDER
    * BY — "top-n per key" as one clause instead of a hand-written rank
    * window; the optional OFFSET form (`LIMIT 2, 3 BY g` — ClickHouse's
    * full grammar) skips each group's first o rows and returns the next n
    * (pagination per key). The de-LIMIT-BY'd statement parses through the
    * delegate; the clause adds a row_number window partitioned by the BY
    * columns and ordered by the statement's ORDER BY list (which is
    * REQUIRED — ClickHouse permits an arbitrary-order LIMIT BY, this
    * engine refuses the nondeterminism), then re-sorts by the same list.
    * `LIMIT n` alone never matches (no BY), so standard SQL is untouched.
    * ClickHouse's full clause order allows a plain row limit AFTER the
    * per-group one (`LIMIT 1 BY g LIMIT 10`) — `finalLimit` applies it on
    * the re-sorted result, deterministic because the sort already happened.
    */
  private def limitByPlan(stmt: String, orderList: String, off: Int, n: Int,
      byColsS: String, finalLimit: Option[Int] = None): LogicalPlan = {
    import org.apache.spark.sql.functions._
    require(n > 0, s"LIMIT $n BY: n must be positive")
    require(off >= 0, s"LIMIT $off, $n BY: the offset must not be negative")
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
    val limited = inner.withColumn("__lb_rn", row_number().over(w))
      .filter(col("__lb_rn") > off && col("__lb_rn") <= off + n).drop("__lb_rn")
      .orderBy(orderCols: _*)
    finalLimit.fold(limited)(limited.limit).queryExecution.logical
  }

  /** ClickHouse/standard-SQL `ORDER BY … LIMIT n WITH TIES`: the first n
    * rows PLUS every row tying with the n-th on the ORDER BY key — which
    * is exactly `rank() <= n` over the statement's own ORDER BY (rank
    * repeats on ties and jumps past them, so row n's whole tie-group
    * survives and the next distinct key does not). The de-TIES'd statement
    * parses through the delegate; the clause adds the rank window and
    * re-sorts. The window is UNPARTITIONED by construction — a LIMIT-shaped
    * result is small, and the statement's global ORDER BY already paid the
    * total sort; Spark's own LIMIT keywords never carry WITH TIES, so no
    * standard SQL changes meaning.
    */
  private def limitWithTiesPlan(stmt: String, orderList: String, n: Int): LogicalPlan = {
    import org.apache.spark.sql.functions._
    require(n > 0, s"LIMIT $n WITH TIES: n must be positive")
    val inner = org.apache.spark.sql.graft.PlanBridge.ofRows(session,
      delegate.parsePlan(stmt))
    val orderCols = splitTopLevel(orderList).map(_.trim).filter(_.nonEmpty).map { item =>
      val up = item.toUpperCase
      if (up.endsWith(" DESC")) expr(item.dropRight(5).trim).desc
      else if (up.endsWith(" ASC")) expr(item.dropRight(4).trim).asc
      else expr(item).asc
    }
    require(orderCols.nonEmpty, "LIMIT WITH TIES requires an ORDER BY")
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderCols: _*)
    inner.withColumn("__lt_rk", rank().over(w))
      .filter(col("__lt_rk") <= n).drop("__lt_rk")
      .orderBy(orderCols: _*)
      .queryExecution.logical
  }

  /** ClickHouse `ORDER BY <c1> WITH FILL [FROM a] [TO b] [STEP s]
    * [, <c2> WITH FILL …] [INTERPOLATE (…)]` — gap filling over one or
    * more integral/DATE sort columns: the result gains one row per
    * missing grid point (FROM inclusive, TO exclusive, ClickHouse's
    * contract; absent bounds default to the result's own min/max,
    * inclusive), with non-fill columns taking their type defaults (0, '',
    * false, epoch for date/time — ClickHouse fills defaults, not NULLs).
    * With SEVERAL fill columns the grid is their CROSS PRODUCT — the
    * (day, bucket) dense frame a time-series readout wants — and a row is
    * missing when its full fill-key tuple is absent. Composes with the
    * rest of the statement (and with SAMPLE): the de-FILLed text parses
    * through the delegate, then the plan is original-rows UNION
    * missing-grid-rows, re-sorted — original rows OFF the grid survive,
    * exactly ClickHouse.
    */
  // `INTERPOLATE (c1 [AS expr1], c2, …)` — ClickHouse's fill
  // interpolation: on fill rows a listed column takes the last REAL row's
  // value (`c` / `c AS c`, plain carry) or an EXPRESSION EVALUATED OVER
  // THE CARRIED ROW (`c AS expr` — column references in expr resolve to
  // the last real row's values; a running `last(…, ignoreNulls)` window
  // over the fill order carries the evaluated value). Fill rows before
  // the first real row keep the type default, like ClickHouse. DOCUMENTED
  // DIVERGENCE: ClickHouse re-evaluates the expression per consecutive
  // fill row (iteratively, over the previous OUTPUT row); this engine
  // evaluates it once over the last REAL row — identical for the common
  // single-gap and carry cases, simpler (and windowable) for runs. The
  // interpolation window is unpartitioned — fine for grid-sized outputs,
  // which gap filling produces by construction.
  private def withFillPlan(prefix: String, itemsS: String,
      interpS: Option[String]): LogicalPlan = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    case class FillItem(col: String, from: Option[String], to: Option[String],
        step: Long, desc: Boolean)
    val items: Seq[FillItem] = splitTopLevel(itemsS).map(_.trim)
      .filter(_.nonEmpty).map {
        case FillItemRe(c, descS, fromD, fromI, toD, toI, stepS) =>
          val desc = descS != null && descS.trim.equalsIgnoreCase("DESC")
          val step = Option(stepS).map(_.toLong).getOrElse(if (desc) -1L else 1L)
          // ClickHouse's grammar: a DESC fill takes a NEGATIVE step
          // (`ORDER BY n DESC WITH FILL FROM 10 TO 0 STEP -2`)
          require(if (desc) step < 0 else step > 0,
            s"WITH FILL STEP must be ${if (desc) "negative with DESC" else "positive"}, got $step")
          FillItem(stripTicks(c), Option(fromD).orElse(Option(fromI)),
            Option(toD).orElse(Option(toI)), step, desc)
        case bad => throw new IllegalArgumentException(
          s"malformed WITH FILL item '$bad'")
      }
    require(items.map(_.col).distinct.size == items.size,
      s"duplicate WITH FILL column in '$itemsS'")
    val inner = org.apache.spark.sql.graft.PlanBridge.ofRows(session,
      delegate.parsePlan(prefix + items.map(it =>
        it.col + (if (it.desc) " DESC" else "")).mkString(", ")))
    def isDate(it: FillItem): Boolean = inner.schema(it.col).dataType == DateType
    items.foreach { it =>
      require(inner.schema.fieldNames.contains(it.col),
        s"WITH FILL column '${it.col}' is not in the result")
      val dt = inner.schema(it.col).dataType
      require(dt == DateType ||
        Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"WITH FILL supports integral or DATE sort columns, got $dt for '${it.col}'")
      def isDateLit(s: String) = s.contains("-") && s.length == 10
      for (b <- it.from ++ it.to)
        require(isDateLit(b) == (dt == DateType),
          s"WITH FILL bound '$b' does not match the $dt fill column '${it.col}'")
      for (f <- it.from; t <- it.to) {
        val ok = (it.desc, dt == DateType) match {
          case (false, true)  => f < t
          case (false, false) => f.toLong < t.toLong
          case (true, true)   => f > t
          case (true, false)  => f.toLong > t.toLong
        }
        require(ok, s"WITH FILL FROM $f must be ${if (it.desc) "above" else "below"} TO $t")
      }
    }
    // bound expressions in each fill column's own type. The grid runs
    // START → END in the item's direction: FROM is the inclusive start;
    // TO is EXCLUSIVE (ClickHouse), so the inclusive end is TO ∓ 1 unit.
    def startLit(it: FillItem, f: String): Column =
      if (isDate(it)) to_date(lit(f)) else lit(f.toLong)
    def endLit(it: FillItem, t: String): Column = {
      val adj = if (it.desc) 1 else -1
      if (isDate(it)) date_add(to_date(lit(t)), adj) else lit(t.toLong + adj)
    }
    def stepExpr(it: FillItem): Column =
      if (isDate(it)) expr(s"interval ${it.step} day") else lit(it.step)
    // ONE bounds row carrying every column's [start, end]: all bounds
    // literal → a standalone one-row frame (an empty result still fills
    // the full grid, like ClickHouse); any derived bound → the result's
    // own min/max, lazily (a single aggregate in the plan, no parse-time
    // execution; empty result → no grid)
    val allLiteral = items.forall(it => it.from.isDefined && it.to.isDefined)
    val boundCols: Seq[Column] = items.zipWithIndex.flatMap { case (it, i) =>
      if (allLiteral)
        Seq(startLit(it, it.from.get).as(s"__lo_$i"),
          endLit(it, it.to.get).as(s"__hi_$i"))
      else {
        def extreme(wantMax: Boolean) =
          if (isDate(it)) { if (wantMax) max(col(it.col)) else min(col(it.col)) }
          else { if (wantMax) max(col(it.col)).cast("long")
                 else min(col(it.col)).cast("long") }
        val lo = it.from.map(f => max(startLit(it, f))).getOrElse(extreme(it.desc))
        val hi = it.to.map(t => max(endLit(it, t))).getOrElse(extreme(!it.desc))
        Seq(lo.as(s"__lo_$i"), hi.as(s"__hi_$i"))
      }
    }
    val boundsRow =
      if (allLiteral) session.range(1).select(boundCols: _*)
      else inner.agg(boundCols.head, boundCols.tail: _*)
    val usable = items.zipWithIndex.map { case (it, i) =>
      col(s"__lo_$i").isNotNull && col(s"__hi_$i").isNotNull &&
        (if (it.desc) col(s"__lo_$i") >= col(s"__hi_$i")
         else col(s"__lo_$i") <= col(s"__hi_$i"))
    }.reduce(_ && _)
    // the grid is the cross product of the per-column sequences: each
    // explode multiplies the one-row frame — grid-sized, never data-sized
    val grid = items.zipWithIndex.foldLeft(boundsRow.where(usable)) {
      case (df, (it, i)) => df.withColumn(it.col,
        explode(sequence(col(s"__lo_$i"), col(s"__hi_$i"), stepExpr(it))))
    }.select(items.map(it =>
      col(it.col).cast(inner.schema(it.col).dataType).as(it.col)): _*)
    def dflt(f: StructField): Column = f.dataType match {
      case _: NumericType => lit(0).cast(f.dataType)
      case StringType     => lit("")
      case BooleanType    => lit(false)
      // ClickHouse fills TYPE DEFAULTS: epoch for date/time columns
      case DateType       => to_date(lit("1970-01-01"))
      case TimestampType  => timestamp_seconds(lit(0))
      case other          => lit(null).cast(other)
    }
    val fillKey = items.map(_.col)
    val missing = grid.join(
      inner.select(fillKey.map(col): _*).distinct(), fillKey, "left_anti")
    val fillRows = missing.select(inner.schema.fields.toSeq.map { f =>
      if (fillKey.contains(f.name)) col(f.name) else dflt(f).as(f.name)
    }: _*)
    // INTERPOLATE entries: (column, expression to carry). splitTopLevel,
    // not split(',') — an expression may contain commas.
    val interps: Seq[(String, Column)] = interpS.toSeq
      .flatMap(s => splitTopLevel(s)).map(_.trim).filter(_.nonEmpty).map { spec =>
        val parts = spec.split("(?i)\\s+AS\\s+", 2)
        val c = stripTicks(parts(0).trim)
        require(c.nonEmpty, s"bad INTERPOLATE entry '$spec'")
        require(inner.schema.fieldNames.contains(c),
          s"INTERPOLATE column '$c' is not in the result")
        require(!fillKey.contains(c), s"cannot INTERPOLATE the fill column '$c'")
        val src: Column =
          if (parts.length == 1 || stripTicks(parts(1).trim) == c) col(c)
          else expr(parts(1).trim)
        (c, src)
      }
    val sortCols = items.map(it =>
      if (it.desc) col(it.col).desc else col(it.col).asc)
    val unioned = if (interps.isEmpty)
      inner.unionByName(fillRows)
    else {
      val marked = inner.withColumn("__fillmark", lit(false))
        .unionByName(fillRows.withColumn("__fillmark", lit(true)))
      val w = org.apache.spark.sql.expressions.Window.orderBy(sortCols: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      interps.foldLeft(marked) { case (df, (c, src)) =>
        df.withColumn(c, when(col("__fillmark"),
            coalesce(
              last(when(!col("__fillmark"), src), ignoreNulls = true).over(w)
                .cast(inner.schema(c).dataType),
              dflt(inner.schema(c))))
          .otherwise(col(c)))
      }.drop("__fillmark")
    }
    unioned.orderBy(sortCols: _*).queryExecution.logical
  }

  private def parseRewritten(sqlText: String): LogicalPlan = sqlText match {
    // ClickHouse TRUNCATE on a graft target (dir path, or an ident that
    // resolves to a graft table); other idents fall to Spark's own verb.
    case TruncateRe(q, id) if q != null ||
        scala.util.Try(resolveDir(session,
          IdentTarget(delegate.parseMultipartIdentifier(id)))).isSuccess =>
      TruncateTableCommand(target(q, id))
    // ClickHouse `MODIFY COLUMN c <ChType>` → Spark `ALTER COLUMN c TYPE`
    // with the type mapped; non-ClickHouse type names pass through as-is
    // (Spark validates).
    case ModifyColumnRe(id, col, chType) =>
      val sparkT = scala.util.Try(ChCreateTable.chTypeToSpark(chType))
        .getOrElse(chType)
      delegate.parsePlan(s"ALTER TABLE $id ALTER COLUMN $col TYPE $sparkT")
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
    case AddIndexRe(q, id, col, kind) =>
      AddIndexCommand(target(q, id), stripTicks(col), kind)
    case DropIndexRe(q, id, col) =>
      DropIndexCommand(target(q, id), stripTicks(col))
    case MaterializeIndexRe(q, id, col) =>
      MaterializeIndexCommand(target(q, id), stripTicks(col))
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

  // `… ORDER BY <c1> WITH FILL [FROM a] [TO b] [STEP s][, <c2> WITH FILL …]
  //  [INTERPOLATE (c [AS expr][, …])]` at statement end. Bounds are
  // integers for integral fill columns or 'yyyy-MM-dd' literals for DATE
  // ones. The statement regex captures the whole fill-item list (bounds
  // non-capturing); FillItemRe re-parses each comma-separated item.
  private val FB = "(?:'(\\d{4}-\\d{2}-\\d{2})'|(-?\\d+))"
  private val FBn = "(?:'\\d{4}-\\d{2}-\\d{2}'|-?\\d+)"
  private val FI = "[`\\w.]+(?:\\s+DESC)?\\s+WITH\\s+FILL" +
    s"(?:\\s+FROM\\s+$FBn)?(?:\\s+TO\\s+$FBn)?(?:\\s+STEP\\s+-?\\d+)?"
  // INTERPOLATE's body captures greedily to the LAST ')' — the clause is
  // statement-end by construction, and entries may contain nested calls
  // (`v AS greatest(v, 20)`), which a [^)]* body would cut short.
  private[sources] val WithFillStmtRe =
    (s"(?is)^(.*\\bORDER\\s+BY\\s+)($FI(?:\\s*,\\s*$FI)*)" +
      "(?:\\s+INTERPOLATE\\s*\\((.*)\\))?\\s*;?\\s*$").r
  private[sources] val FillItemRe =
    ("(?is)^([`\\w.]+)(\\s+DESC)?\\s+WITH\\s+FILL" +
      s"(?:\\s+FROM\\s+$FB)?(?:\\s+TO\\s+$FB)?(?:\\s+STEP\\s+(-?\\d+))?\\s*$$").r

  // `… ORDER BY <list> LIMIT [o,] n BY c1[, c2…]` at statement end (plain
  // `LIMIT n` has no BY and never matches).
  private[sources] val LimitByRe =
    ("(?is)^(.*\\bORDER\\s+BY\\s+(.*?))\\s+LIMIT\\s+(?:(\\d+)\\s*,\\s*)?(\\d+)\\s+BY\\s+" +
      "([`\\w.]+(?:\\s*,\\s*[`\\w.]+)*)(?:\\s+LIMIT\\s+(\\d+))?\\s*;?\\s*$").r
  // `ORDER BY … LIMIT n WITH TIES` — statement-end, like LIMIT BY
  private[sources] val LimitWithTiesRe =
    ("(?is)^(.*\\bORDER\\s+BY\\s+(.*?))\\s+LIMIT\\s+(\\d+)\\s+WITH\\s+TIES" +
      "\\s*;?\\s*$").r

  // `FORMAT <name>` at statement end; names are ClickHouse output formats.
  private[sources] val FormatRe = "(?is)^(.*?)\\s+FORMAT\\s+(\\w+)\\s*;?\\s*$".r
  private[sources] val KnownFormats: Set[String] = Set(
    "json", "jsoneachrow", "jsoncompact", "jsoncompacteachrow",
    "csv", "csvwithnames", "tsv", "tabseparated", "tabseparatedwithnames",
    "pretty", "prettycompact", "prettyspace", "values", "vertical",
    "parquet", "arrow", "native", "rowbinary", "orc", "avro")

  // `SETTINGS k = v[, …]` at statement end; each pair `ident = literal`.
  private[sources] val SettingsProbeRe = "(?i)\\bSETTINGS\\b".r
  private[sources] val SettingPairRe =
    "(?s)^[\\w.]+\\s*=\\s*(?:'[^']*'|[\\w.+-]+)$".r
  /** Per-query knobs safe to IGNORE: pure execution tuning — thread/batch
    * sizing, memory/spill budgets, time guards, caching, logging. Nothing
    * here changes what rows come back.
    */
  private[sources] val IgnorableSettings: Set[String] = Set(
    "max_threads", "max_insert_threads", "max_block_size",
    "max_insert_block_size", "max_memory_usage", "max_execution_time",
    "max_bytes_before_external_sort", "max_bytes_before_external_group_by",
    "use_query_cache", "enable_reads_from_query_cache",
    "enable_writes_to_query_cache", "log_queries", "send_logs_level",
    "optimize_read_in_order", "prefer_localhost_replica",
    "distributed_product_mode", "network_compression_method", "priority")

  private[sources] val GlobalProbeRe = "(?i)\\bGLOBAL\\b".r
  private[sources] val GlobalRe =
    ("(?is)\\bGLOBAL\\s+((?:NOT\\s+)?IN\\b|" +
      "(?:ANY\\s+|ALL\\s+)?(?:INNER\\s+|LEFT\\s+|RIGHT\\s+|FULL\\s+|" +
      "CROSS\\s+|SEMI\\s+|ANTI\\s+|OUTER\\s+)*JOIN\\b)").r

  private[sources] val AsofProbeRe =
    "(?i)\\bASOF\\s+(?:LEFT\\s+)?(?:INNER\\s+)?JOIN\\b".r
  private[sources] val SemiAntiProbeRe = "(?i)\\b(SEMI|ANTI)\\s+LEFT\\s+JOIN\\b".r
  private[sources] val SemiAntiRe = "(?i)\\b(SEMI|ANTI)\\s+LEFT\\s+JOIN\\b".r
  private[sources] val AnyProbeRe =
    "(?i)\\bANY\\s+(?:LEFT\\s+)?(?:INNER\\s+)?JOIN\\b".r
  private[sources] val AnyRe =
    ("(?is)\\bFROM\\s+([`\\w.]+)(?:\\s+(?:AS\\s+)?(?!ANY\\b)(\\w+))?" +
      "\\s+ANY\\s+(LEFT\\s+)?(?:INNER\\s+)?JOIN\\s+([`\\w.]+)" +
      "(?:\\s+(?:AS\\s+)?(?!ON\\b)(\\w+))?\\s+ON\\s+(.+?)" +
      "(?=\\s+(?:WHERE|GROUP|ORDER|LIMIT|HAVING|WINDOW|UNION|EXCEPT|" +
      "INTERSECT|QUALIFY|JOIN|LEFT|RIGHT|INNER|FULL|CROSS|SETTINGS)\\b" +
      "|\\s*;?\\s*$)").r
  // FROM <ident> [alias] ASOF [LEFT] JOIN <ident> [alias] ON <conds>;
  // conds run lazily to the next top-level clause keyword or statement end
  private[sources] val AsofRe =
    ("(?is)\\bFROM\\s+([`\\w.]+)(?:\\s+(?:AS\\s+)?(?!ASOF\\b)(\\w+))?" +
      "\\s+ASOF\\s+(LEFT\\s+)?(?:INNER\\s+)?JOIN\\s+([`\\w.]+)" +
      "(?:\\s+(?:AS\\s+)?(?!ON\\b)(\\w+))?\\s+ON\\s+(.+?)" +
      "(?=\\s+(?:WHERE|GROUP|ORDER|LIMIT|HAVING|WINDOW|UNION|EXCEPT|" +
      "INTERSECT|QUALIFY|JOIN|LEFT|RIGHT|INNER|FULL|CROSS|SETTINGS)\\b" +
      "|\\s*;?\\s*$)").r
  // comparison operators that make a conjunct the ASOF inequality;
  // <> (not-equal) must NOT match — its '<' is followed by '>', its '>'
  // preceded by '<'
  private[sources] val IneqOpRe = "(<=|>=|<(?![=>])|(?<!<)>(?!=))".r

  private[sources] val ParametricHeadRe =
    ("(?i)\\b(quantile|quantileExact|quantiles|quantilesExact|" +
      "quantileTDigest|quantileTiming|quantilesTiming|" +
      "quantileDeterministic|quantileInterpolatedWeighted|" +
      "quantileBFloat16|median|topK|topKWeighted|uniqUpTo|groupArray|" +
      "groupUniqArray)\\s*\\(").r

  private[sources] val DateUnitCallRe =
    ("(?i)\\b(dateDiff|date_diff|timestampDiff|timestamp_diff|dateAdd|" +
      "date_add|timestampAdd|timestamp_add|datediff|dateadd)\\s*\\(\\s*" +
      "'([A-Za-z]+)'\\s*,").r
  private[sources] val DatetimeUnits = Set(
    "microsecond", "millisecond", "second", "minute", "hour",
    "day", "dayofyear", "week", "month", "quarter", "year")

  /** Index of the ')' matching the '(' at `open`, skipping quoted spans. */
  private[sources] def matchParenQ(s: String, open: Int): Int =
    matchBracketQ(s, open, '(', ')')

  /** Index of the bracket closing the one at `open` (quote-aware), for any
    * open/close pair — parens, square brackets, braces.
    */
  private[sources] def matchBracketQ(s: String, open: Int, oc: Char,
      cc: Char): Int = {
    require(s.charAt(open) == oc, s"expected '$oc' at $open")
    var depth = 0
    var i = open
    var inQ = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ != ' ') { if (c == inQ) inQ = ' ' }
      else if (c == '\'' || c == '"' || c == '`') inQ = c
      else if (c == oc) depth += 1
      else if (c == cc) {
        depth -= 1
        if (depth == 0) return i
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced '$oc$cc' in: $s")
  }

  // `FROM <ident> [LEFT] ARRAY JOIN <col> [AS <e>][, <col> [AS <e>]…]` —
  // unqualified array columns. The identifier tokens are POSSESSIVE
  // (++/?+/*+): backtracking would otherwise shorten them by a character
  // to slip past the negative lookahead (matching `aj_othe` out of
  // `aj_other o ON …`), which protects a genuine join aliased `array`
  // (followed by an optional alias then ON/USING).
  private[sources] val ArrayJoinProbeRe = "(?i)\\bARRAY\\s+JOIN\\b".r
  private val AJI = "[`\\w]++(?:\\s+AS\\s+[`\\w]++)?+"
  private[sources] val ArrayJoinRe =
    ("(?is)\\bFROM\\s+([`\\w][\\w.`]*)\\s+(LEFT\\s+)?ARRAY\\s+JOIN\\s+" +
      s"($AJI(?:\\s*,\\s*$AJI)*+)" +
      "(?!(?:\\s+(?:AS\\s+)?[`\\w]+)?\\s+(?:ON|USING)\\b)").r

  // `FROM|JOIN numbers[_mt](N | o, N) [alias]` — ClickHouse's integer
  // sequence table function. The alias token refuses clause keywords so
  // `FROM numbers(3) WHERE x` gets the implicit `numbers` alias and the
  // WHERE stays a clause.
  private[sources] val NumbersProbeRe = "(?i)\\bnumbers(?:_mt)?\\s*\\(".r
  private[sources] val NumbersRe =
    ("(?is)\\b(FROM|JOIN)\\s+numbers(?:_mt)?\\s*\\(\\s*(\\d+)\\s*" +
      "(?:,\\s*(\\d+)\\s*)?\\)" +
      "(?:\\s+(?:AS\\s+)?(?!(?:WHERE|GROUP|ORDER|LIMIT|HAVING|WINDOW|" +
      "UNION|EXCEPT|INTERSECT|JOIN|LEFT|RIGHT|INNER|FULL|CROSS|ASOF|ANY|" +
      "SEMI|ANTI|ON|USING|SETTINGS|FORMAT|AS|SAMPLE|FINAL|PREWHERE|ARRAY|" +
      "NATURAL|LATERAL)\\b)(`?\\w+`?))?").r

  // `SELECT DISTINCT ON (cols) …` at the statement's own head; the paren
  // is balance-matched from the match end (cols may carry backticks).
  private[sources] val DistinctOnHeadRe =
    "(?is)^\\s*SELECT\\s+DISTINCT\\s+ON\\s*\\(".r

  // `WITH [RECURSIVE] <item list> SELECT …` at the statement head; the
  // RECURSIVE keyword stays with Spark's own grammar (no macro there).
  private[sources] val WithHeadRe = "(?is)^\\s*WITH\\s+(?!RECURSIVE\\b)".r

  // Ternary operand boundaries: keywords that can't be part of the
  // CONDITION (left) or the ELSE value (right). AND/OR are in neither set
  // — ClickHouse's ternary binds loosest, so they stay inside operands.
  private[sources] val TernaryLeftKeywords: Set[String] = Set(
    "SELECT", "WHERE", "PREWHERE", "HAVING", "WHEN", "THEN", "ELSE", "ON",
    "BY", "SET", "ALL", "DISTINCT", "UNION", "EXCEPT", "INTERSECT",
    "VALUES", "RETURN")
  private[sources] val TernaryRightKeywords: Set[String] = Set(
    "FROM", "WHERE", "PREWHERE", "GROUP", "ORDER", "HAVING", "LIMIT",
    "UNION", "EXCEPT", "INTERSECT", "SETTINGS", "FORMAT", "AS", "WHEN",
    "THEN", "ELSE", "END", "ASC", "DESC", "BY", "INTO", "WINDOW", "JOIN",
    "LEFT", "RIGHT", "INNER", "FULL", "CROSS", "ON", "USING", "NULLS")

  // Words after which a `[` opens an ARRAY LITERAL (a keyword cannot take
  // a subscript); after an identifier/number/`)`/`]`/literal, `[` is
  // Spark's subscript and stays.
  private[sources] val LiteralLeadKeywords: Set[String] = Set(
    "SELECT", "WHERE", "AND", "OR", "NOT", "IN", "AS", "ON", "WHEN",
    "THEN", "ELSE", "END", "BY", "HAVING", "ALL", "DISTINCT", "UNION",
    "EXCEPT", "INTERSECT", "VALUES", "IS", "BETWEEN", "LIKE", "RLIKE",
    "ILIKE", "RETURN", "IF", "CASE", "ARRAY", "USING", "FILL", "TO",
    "FROM", "STEP", "INTERPOLATE", "LIMIT", "SETTINGS", "PREWHERE",
    "WITH", "OVER", "PARTITION", "ORDER", "GROUP", "SET", "ELSEIF")

  // `[t.]* [EXCEPT (cols)] REPLACE (` — the head of ClickHouse's star
  // REPLACE modifier; the REPLACE body is balance-matched from the match
  // end. The EXCEPT group is regex-captured (bare column names only, per
  // both dialects' grammar).
  private[sources] val StarReplaceHeadRe =
    ("(?is)(?:([`\\w]+)\\s*\\.\\s*)?\\*\\s+(?:EXCEPT\\s*\\(([^)]*)\\)\\s+)?" +
      "REPLACE\\s*\\(").r
  // `COLUMNS('regex')` — ClickHouse's regex column selector.
  private[sources] val ColumnsSelectorRe =
    "(?is)\\bCOLUMNS\\s*\\(\\s*'([^']+)'\\s*\\)".r
  // Cheap containment probe before paying the star-mod scanner.
  private[sources] val StarModProbeRe =
    "(?i)\\*\\s+(?:EXCEPT\\b|REPLACE\\b)|\\bCOLUMNS\\s*\\(\\s*'".r

  // `<stmt> INTO OUTFILE 'path' [TRUNCATE] [FORMAT f]` at statement end.
  private[sources] val OutfileProbeRe = "(?i)\\bOUTFILE\\b".r
  private[sources] val OutfileRe =
    ("(?is)^(.*\\S)\\s+INTO\\s+OUTFILE\\s+'([^']+)'" +
      "(?:\\s+(TRUNCATE))?(?:\\s+FORMAT\\s+(\\w+))?\\s*;?\\s*$").r
  /** INTO OUTFILE format word → (Spark writer format, options). */
  private[sources] val OutfileFormats: Map[String, (String, Map[String, String])] =
    Map(
      "csv" -> (("csv", Map("header" -> "false"))),
      "csvwithnames" -> (("csv", Map("header" -> "true"))),
      "tsv" -> (("csv", Map("header" -> "false", "sep" -> "\t"))),
      "tabseparated" -> (("csv", Map("header" -> "false", "sep" -> "\t"))),
      "tabseparatedwithnames" ->
        (("csv", Map("header" -> "true", "sep" -> "\t"))),
      "jsoneachrow" -> (("json", Map.empty[String, String])),
      "parquet" -> (("parquet", Map.empty[String, String])))
  // `INSERT INTO t [(cols)] FORMAT Values (…), …` — one keyword from
  // Spark's own VALUES form.
  private[sources] val InsertFormatValuesRe =
    ("(?is)^(\\s*INSERT\\s+INTO\\s+[`'\\w][\\w.`']*\\s*(?:\\([^)]*\\))?)" +
      "\\s+FORMAT\\s+VALUES\\s+(.+)$").r
  private[sources] val InsertJsonRowsRe =
    ("(?is)^(\\s*INSERT\\s+INTO\\s+([`\\w][\\w.`]*))" +
      "\\s+FORMAT\\s+JSONEachRow\\s+(.+)$").r

  private[sources] val QualifyProbeRe = "(?i)\\bQUALIFY\\b".r

  // `EXPLAIN <ch-word> …` at the statement head (ClickHouse's verbs only —
  // Spark's own EXTENDED/CODEGEN/COST/FORMATTED words never match).
  private[sources] val ExplainChRe =
    "(?is)^\\s*EXPLAIN\\s+(AST|SYNTAX|PLAN|PIPELINE|ESTIMATE)\\b".r
  private[sources] val SystemTableProbeRe = "(?i)\\bsystem\\s*\\.".r
  private[sources] val SystemTableRe =
    ("(?is)\\b(FROM|JOIN)\\s+system\\s*\\.\\s*(one|numbers)\\b" +
      "(?:\\s+(?:AS\\s+)?(?!(?:WHERE|GROUP|ORDER|LIMIT|HAVING|WINDOW|" +
      "UNION|EXCEPT|INTERSECT|JOIN|LEFT|RIGHT|INNER|FULL|CROSS|ASOF|ANY|" +
      "SEMI|ANTI|ON|USING|SETTINGS|FORMAT|AS|SAMPLE|FINAL|PREWHERE|ARRAY|" +
      "NATURAL|LATERAL)\\b)(`?\\w+`?))?").r

  // Cheap containment probe before paying the full SAMPLE regex.
  private[sources] val SampleProbeRe = "(?i)\\bSAMPLE\\b".r
  private[sources] val FinalProbeRe = "(?i)\\bFINAL\\b".r
  private[sources] val PrewhereProbeRe = "(?i)\\bPREWHERE\\b".r
  private[sources] val WhereProbeRe = "(?i)\\bWHERE\\b".r
  // `FROM|JOIN <ident> FINAL [SAMPLE k [OFFSET m]]` — ClickHouse's
  // per-statement collapse (+ post-collapse sampling). JOIN targets take
  // the clause too (ClickHouse allows FINAL on any table expression).
  private[sources] val FinalRe =
    ("(?is)\\b(FROM|JOIN)\\s+([`\\w][\\w.`]*)\\s+FINAL\\b" +
      "(?:\\s+SAMPLE\\s+(\\d*\\.\\d+|\\d+\\.?\\d*)" +
      "(?:\\s+OFFSET\\s+(\\d*\\.\\d+|\\d+\\.?\\d*))?)?").r
  // `FROM|JOIN <ident> SAMPLE <k> [OFFSET <m>]` — the ClickHouse sampling
  // clause (k a fraction in (0,1] or an absolute row count).
  private[sources] val SampleRe =
    ("(?is)\\b(FROM|JOIN)\\s+([`\\w][\\w.`]*)\\s+SAMPLE\\s+(\\d*\\.\\d+|\\d+\\.?\\d*)" +
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
  private[sources] val TruncateRe =
    ("(?is)^\\s*TRUNCATE\\s+TABLE\\s+(?:IF\\s+EXISTS\\s+)?" + T + "\\s*;?\\s*$").r
  // ClickHouse `ALTER TABLE t MODIFY COLUMN c <Type>` — Spark spells it
  // `ALTER COLUMN c TYPE <type>`; the ClickHouse type name maps through
  // ChCreateTable's one type table.
  private[sources] val ModifyColumnRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+([`\\w][\\w.`]*)\\s+MODIFY\\s+COLUMN\\s+" +
      "(`?\\w+`?)\\s+(\\w+(?:\\([^)]*\\))?)\\s*;?\\s*$").r
  private[sources] val SystemMergesRe =
    ("(?is)^\\s*SYSTEM\\s+(STOP|START)\\s+MERGES\\s+" + T + "\\s*;?\\s*$").r
  private[sources] val ModifyTtlRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+MODIFY\\s+TTL\\s+'([^']+)'\\s*;?\\s*$").r
  private[sources] val RemoveTtlRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+REMOVE\\s+TTL\\s*;?\\s*$").r
  // ADD INDEX <name> <column> TYPE <kind[(args)]> [GRANULARITY n] — the
  // name is cosmetic (indexes are column-addressed), kind args and
  // GRANULARITY are sizing tuning (accepted, ignored — fixed-size
  // sidecars); the expression must be a plain column (loud otherwise,
  // via the \w+ capture refusing expressions).
  private[sources] val AddIndexRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T +
      "\\s+ADD\\s+INDEX\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?[`\\w]+\\s+(`?\\w+`?)" +
      "\\s+TYPE\\s+(\\w+\\s*(?:\\([^)]*\\))?)" +
      "(?:\\s+GRANULARITY\\s+\\d+)?\\s*;?\\s*$").r
  private[sources] val DropIndexRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T +
      "\\s+DROP\\s+INDEX\\s+(?:IF\\s+EXISTS\\s+)?(`?\\w+`?)\\s*;?\\s*$").r
  private[sources] val MaterializeIndexRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T +
      "\\s+MATERIALIZE\\s+INDEX\\s+(`?\\w+`?)\\s*;?\\s*$").r
  // Captures everything after UPDATE; the assignments/predicate split
  // happens in splitLastTopLevelWhere (quote-aware — a regex split would
  // mis-handle ' WHERE ' inside a string literal).
  private[sources] val AlterUpdateRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+UPDATE\\s+(.+?)\\s*;?\\s*$").r
  private[sources] val AlterDeleteRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+" + T + "\\s+DELETE\\s+WHERE\\s+(.+?)\\s*;?\\s*$").r
  private[sources] val AssignRe = "(?s)^\\s*([`\\w.]+)\\s*=\\s*(.+)$".r

  /** Spans (start, end-exclusive) of single-quoted string literals and
    * backtick-quoted identifiers — the regions where clause keywords are
    * TEXT, not syntax. Same escape rules as splitTopLevel: `\x` and `''`
    * inside a literal, doubled backticks inside an identifier. The textual
    * SAMPLE/FINAL/PREWHERE rewrites consult these so a query SELECTING the
    * literal `'FROM t SAMPLE 0.5'` returns it verbatim instead of being
    * silently rewritten.
    */
  private[sources] def quotedSpans(s: String): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.Buffer.empty[(Int, Int)]
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          val start = i
          i += 1
          var open = true
          while (i < s.length && open) {
            val c = s.charAt(i)
            if (c == '\\' && i + 1 < s.length) i += 2
            else if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
            else if (c == '\'') { open = false; i += 1 }
            else i += 1
          }
          out += ((start, i))
        case '`' =>
          val start = i
          i += 1
          var open = true
          while (i < s.length && open) {
            if (s.charAt(i) == '`') {
              if (i + 1 < s.length && s.charAt(i + 1) == '`') i += 2
              else { open = false; i += 1 }
            } else i += 1
          }
          out += ((start, i))
        case _ => i += 1
      }
    }
    out.toSeq
  }

  private[sources] def inSpan(spans: Seq[(Int, Int)], pos: Int): Boolean =
    spans.exists(sp => pos >= sp._1 && pos < sp._2)

  /** Regex replace that leaves matches STARTING inside quoted spans
    * verbatim. Replacement strings are appended literally (no
    * group-reference semantics, so no quoteReplacement dance).
    */
  private[sources] def replaceOutsideQuotes(text: String,
      re: scala.util.matching.Regex)(
      f: scala.util.matching.Regex.Match => String): String = {
    val spans = quotedSpans(text)
    val sb = new java.lang.StringBuilder
    var last = 0
    re.findAllMatchIn(text).foreach { m =>
      if (m.start >= last) {
        sb.append(text, last, m.start)
        sb.append(if (inSpan(spans, m.start)) m.matched else f(m))
        last = m.end
      }
    }
    sb.append(text, last, text.length)
    sb.toString
  }

  /** Parenthesis/bracket depth immediately BEFORE each character (index
    * s.length = depth at end). Quoted spans are neutral — a paren inside a
    * string literal never changes the depth.
    */
  private[sources] def parenDepths(s: String): Array[Int] = {
    val spans = quotedSpans(s)
    val d = new Array[Int](s.length + 1)
    var cur = 0
    var si = 0
    var i = 0
    while (i < s.length) {
      d(i) = cur
      if (si < spans.length && spans(si)._1 == i) {
        var j = i + 1
        while (j < spans(si)._2) { d(j) = cur; j += 1 }
        i = spans(si)._2
        si += 1
      } else {
        val c = s.charAt(i)
        if (c == '(' || c == '[') cur += 1
        else if (c == ')' || c == ']') cur -= 1
        i += 1
      }
    }
    d(s.length) = cur
    d
  }

  // Keywords that terminate a WHERE clause's expression at its own depth.
  private[sources] val ClauseKwRe =
    ("(?i)\\b(GROUP\\s+BY|ORDER\\s+BY|HAVING|LIMIT|WINDOW|QUALIFY|" +
      "UNION|EXCEPT|INTERSECT|SETTINGS|FORMAT)\\b").r

  /** End (exclusive) of a clause expression starting at `from` in a block
    * at paren depth `base`: the first same-depth clause keyword, top-level
    * ';', or closing bracket that exits the block — whichever comes first.
    */
  private[sources] def clauseEnd(s: String, from: Int, base: Int,
      depths: Array[Int], spans: Seq[(Int, Int)]): Int = {
    var end = s.length
    var i = from
    while (i < end) {
      if (!inSpan(spans, i)) {
        val c = s.charAt(i)
        if (((c == ')' || c == ']') && depths(i + 1) < base) ||
            (c == ';' && depths(i) == base)) end = i
      }
      i += 1
    }
    ClauseKwRe.findAllMatchIn(s)
      .filter(m => m.start >= from && m.start < end &&
        !inSpan(spans, m.start) && depths(m.start) == base)
      .map(_.start).foldLeft(end)(math.min)
  }

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
      case IdentTarget(parts) if parts.length == 1 =>
        // a session-catalog (V1) table born from `CREATE TABLE t USING
        // mergetree LOCATION '<dir>'` — resolve through its own metadata,
        // so FINAL/SAMPLE and the maintenance verbs work on unqualified
        // names exactly as on catalog identifiers
        val meta = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(parts.head))
        require(meta.provider.exists(_.equalsIgnoreCase("mergetree")),
          s"'${parts.head}' is not a mergetree table (provider " +
            s"${meta.provider.getOrElse("<none>")})")
        MergeTreeTableProvider.localPath(meta.location.toString)
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

  /** `ALTER TABLE … ADD INDEX name col TYPE kind` → addIndexColumn: a
    * metadata-only tabledef update (new parts build the sidecar; existing
    * parts need MATERIALIZE INDEX or a merge — the table's Scaladoc).
    */
  final case class AddIndexCommand(t: MtTarget, column: String, kind: String)
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      open(spark, t).addIndexColumn(kind, column)
      Nil
    }
  }

  final case class DropIndexCommand(t: MtTarget, column: String)
      extends LeafRunnableCommand {
    override def run(spark: SparkSession): Seq[Row] = {
      open(spark, t).dropIndexColumn(column)
      Nil
    }
  }

  /** `ALTER TABLE … MATERIALIZE INDEX col` → materializeIndex: retrofit
    * file-backed sidecars onto pre-existing parts; returns the build count.
    */
  final case class MaterializeIndexCommand(t: MtTarget, column: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = affected
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(open(spark, t).materializeIndex(column).toLong))
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

  /** `SELECT … INTO OUTFILE 'path' [TRUNCATE] [FORMAT f]` — ClickHouse's
    * export verb: the inner statement (kept as TEXT; parsed and executed
    * only here, so parse time stays pure) writes ONE file at exactly
    * `path` — Spark's directory-shaped output is written to a temp dir,
    * then its single part moves to the requested name. The file existing
    * is loud unless TRUNCATE (ClickHouse's contract). Returns the row
    * count. Single-file export is a driver-funnel by design — the verb is
    * for extracts, not datasets; the dataset path is the engine's own
    * write surface.
    */
  final case class OutfileCommand(innerSql: String, path: String, fmt: String,
      truncate: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = affected
    override def run(spark: SparkSession): Seq[Row] = {
      import java.nio.file.{Files => JFiles, Paths => JPaths, StandardCopyOption}
      val target = JPaths.get(path)
      require(truncate || !JFiles.exists(target),
        s"INTO OUTFILE: '$path' already exists (add TRUNCATE to overwrite)")
      val (fmtName, opts) = OutfileFormats(fmt)
      val df = spark.sql(innerSql)
      val n = df.count()
      val tmp = JFiles.createTempDirectory("graft_outfile_")
      try {
        df.coalesce(1).write.options(opts).format(fmtName)
          .mode("overwrite").save(tmp.toString)
        val part = JFiles.list(tmp).toArray.map(_.toString)
          .filter(p => p.contains("/part-") && !p.endsWith(".crc"))
        require(part.length == 1, s"expected one part file, got ${part.toSeq}")
        Option(target.getParent).foreach(JFiles.createDirectories(_))
        JFiles.move(JPaths.get(part.head), target,
          StandardCopyOption.REPLACE_EXISTING)
      } finally graft.mergetree.MergeTreeTable.deleteRecursively(tmp)
      Seq(Row(n))
    }
  }

  /** ClickHouse `TRUNCATE TABLE` → truncate(): every live part retired in
    * one manifest swap — O(manifest), schema and tabledef kept.
    */
  final case class TruncateTableCommand(t: MtTarget)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = affected
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(open(spark, t).truncate()))
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
