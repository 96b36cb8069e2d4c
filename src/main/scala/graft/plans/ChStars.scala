package graft.plans

import org.apache.spark.sql.catalyst.analysis.{ExpandStarParameters, Star,
  UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{LeafExpression,
  NamedExpression, Unevaluable}

/** ClickHouse's select-list star modifier `[t.]* [EXCEPT (…)] REPLACE
  * (expr AS c, …)` as a Catalyst [[Star]]: the analyzer calls
  * [[expandStar]] wherever a star is legal (select-list top level AND
  * function arguments), so the modifier composes exactly like `*` itself.
  * Expansion delegates to [[UnresolvedStar]] for the base column list —
  * one source of truth for qualifier handling — then drops the EXCEPT
  * names and substitutes each REPLACE expression IN PLACE of the column
  * it names (ClickHouse keeps the replaced column's position; Spark's own
  * `UnresolvedStarExceptOrReplace` cannot carry an except list and a
  * replacement list of different lengths, hence this node). Unknown names
  * are loud, like both dialects. Reference behavior:
  * ClickHouse SELECT modifiers, docs/sql-reference/statements/select.
  */
case class ChStarReplace(target: Option[Seq[String]], excepts: Seq[String],
    replacements: Seq[(String, NamedExpression)])
  extends LeafExpression with Star with Unevaluable {

  override def expandStar(params: ExpandStarParameters): Seq[NamedExpression] = {
    val base = UnresolvedStar(target).expandStar(params)
    val eq = params.resolver
    (excepts ++ replacements.map(_._1)).foreach { n =>
      require(base.exists(c => eq(c.name, n)),
        s"star modifier names unknown column '$n' (have: " +
          base.map(_.name).mkString(", ") + ")")
    }
    base.flatMap { c =>
      if (excepts.exists(e => eq(c.name, e))) None
      else replacements.collectFirst {
        case (n, r) if eq(c.name, n) => r
      }.orElse(Some(c))
    }
  }
}

/** ClickHouse `COLUMNS('regex')`: every input column whose name CONTAINS a
  * match of the pattern (re2 `PartialMatch` in ClickHouse — `find()`, not
  * the full-name match Spark's quoted-regex feature uses — read as Java
  * regex, the SQL face's documented dialect posture). A [[Star]], so it
  * expands in select lists and as function arguments
  * (`hash(COLUMNS('^k'))`). No matching column is a loud error, like
  * ClickHouse's empty-column-list refusal.
  */
case class ChColumnsRegex(pattern: String)
  extends LeafExpression with Star with Unevaluable {

  override def expandStar(params: ExpandStarParameters): Seq[NamedExpression] = {
    val re = java.util.regex.Pattern.compile(pattern)
    val out = UnresolvedStar(None).expandStar(params)
      .filter(c => re.matcher(c.name).find())
    require(out.nonEmpty, s"COLUMNS('$pattern') matches no column")
    out
  }
}
