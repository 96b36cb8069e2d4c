package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** The second ClickHouse function-name compatibility family (the first —
  * conversions, date parts, -If combinators — is
  * [[GraftFunctions.clickhouseAliases]]): aggregate names, higher-order
  * array functions in ClickHouse's LAMBDA-FIRST argument order, string /
  * arithmetic / date-arithmetic names, and the OrNull/OrZero conversion
  * variants. Every entry is a pure alias over Catalyst built-ins — codegen'd
  * expressions (or the analyzer's own aggregate machinery), never UDFs, so a
  * pasted ClickHouse query costs exactly what the spelled-out Spark form
  * costs and keeps whole-stage codegen intact.
  *
  * Naming rule (the posture the SQL face holds everywhere): an alias is
  * registered ONLY when Spark has no case-insensitive builtin of the same
  * name, so no standard Spark SQL changes meaning. Names whose ClickHouse
  * semantics CONFLICT with a same-named Spark builtin are deliberately
  * absent: `position` (swapped haystack/needle order), `any` (Spark:
  * bool_or; ClickHouse: first value), `xxHash64` (Spark seeds with 42,
  * ClickHouse with 0), `round` (half-up vs banker's — `roundBankers` is
  * provided instead). `dateDiff` needs no alias — Spark's own grammar
  * accepts datediff(unit, start, end); only ClickHouse's QUOTED unit
  * spelling differs, normalized by GraftSqlParser.rewriteDateDiffUnit.
  *
  * Documented divergences from ClickHouse, all inherent to the Spark value
  * model and stated per-function below: NULL where ClickHouse fills a type
  * default (arrayFirst with no match, empty-array arrayAvg), `any`-family
  * order sensitivity (first/last per partition order — deterministic only
  * under a single ordered input), and regex dialect (Java regex, not RE2).
  */
object ClickHouseNames {
  type Entry =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def entry(name: String, cls: Class[_], arities: Seq[Int])(
      f: Seq[Expression] => Expression): Entry =
    (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name),
      { children: Seq[Expression] =>
        require(arities.contains(children.size),
          s"$name takes ${arities.mkString(" or ")} argument(s), got ${children.size}")
        // children may arrive as a mutable ArraySeq through the registry's
        // erased signature; Catalyst nodes that keep the whole Seq require
        // an immutable one — copy once here for every builder.
        f(children.toList)
      })

  private val varCounter = new java.util.concurrent.atomic.AtomicLong(0)
  /** A fresh lambda variable (unique name — a builder-made lambda must not
    * capture a user variable of the same name in an enclosing lambda).
    */
  private def freshVar(): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq(s"ch_v${varCounter.incrementAndGet()}"))
  private def lambda1(body: Expression => Expression): LambdaFunction = {
    val v = freshVar()
    LambdaFunction(body(v), Seq(v))
  }
  private def lambda2(
      body: (Expression, Expression) => Expression): LambdaFunction = {
    val x = freshVar(); val i = freshVar()
    LambdaFunction(body(x, i), Seq(x, i))
  }
  private def requireLambda(name: String, e: Expression): LambdaFunction =
    e match {
      case l: LambdaFunction => l
      case _ => throw new IllegalArgumentException(
        s"$name expects a lambda as the first argument (ClickHouse order: " +
          s"$name(x -> …, arr)), got ${e.sql}")
    }

  // ------------------------------------------------------------ aggregates

  /** ClickHouse's aggregate vocabulary over Spark's aggregate machinery.
    * `uniqExact` returns the builder-level AggregateExpression with
    * isDistinct = true (count(DISTINCT …) has no function-name spelling);
    * `uniq`/`uniqCombined`/`uniqHLL12` all map to HyperLogLog++ at Spark's
    * default precision — a DIFFERENT sketch than ClickHouse's, so estimates
    * differ in the tails while both honor the same accuracy class
    * (documented; exact-oracle queries should use uniqExact).
    * `anyLast` (and Spark's own any_value) are order-dependent picks —
    * deterministic only under a single ordered partition.
    */
  private def aggregates: Seq[Entry] = Seq(
    entry("argMax", classOf[MaxBy], Seq(2))(cs => MaxBy(cs.head, cs(1))),
    entry("argMin", classOf[MinBy], Seq(2))(cs => MinBy(cs.head, cs(1))),
    entry("groupArray", classOf[CollectList], Seq(1))(cs => CollectList(cs.head)),
    entry("groupUniqArray", classOf[CollectSet], Seq(1))(cs => CollectSet(cs.head)),
    entry("uniq", classOf[HyperLogLogPlusPlus], Seq(1))(cs =>
      HyperLogLogPlusPlus(cs.head)),
    entry("uniqCombined", classOf[HyperLogLogPlusPlus], Seq(1))(cs =>
      HyperLogLogPlusPlus(cs.head)),
    entry("uniqCombined64", classOf[HyperLogLogPlusPlus], Seq(1))(cs =>
      HyperLogLogPlusPlus(cs.head)),
    entry("uniqHLL12", classOf[HyperLogLogPlusPlus], Seq(1))(cs =>
      HyperLogLogPlusPlus(cs.head)),
    entry("uniqExact", classOf[Count], (1 to 8))(cs =>
      AggregateExpression(Count(cs), Complete, isDistinct = true)),
    entry("anyLast", classOf[Last], Seq(1))(cs => Last(cs.head, true)),
    entry("stddevPop", classOf[StddevPop], Seq(1))(cs => StddevPop(cs.head)),
    entry("stddevSamp", classOf[StddevSamp], Seq(1))(cs => StddevSamp(cs.head)),
    entry("varPop", classOf[VariancePop], Seq(1))(cs => VariancePop(cs.head)),
    entry("varSamp", classOf[VarianceSamp], Seq(1))(cs => VarianceSamp(cs.head)),
    entry("covarPop", classOf[CovPopulation], Seq(2))(cs =>
      CovPopulation(cs.head, cs(1))),
    entry("covarSamp", classOf[CovSample], Seq(2))(cs =>
      CovSample(cs.head, cs(1))),
    // The -State/-Merge combinator pair — AggregatingMergeTree's
    // pre-aggregation vocabulary (partial per part/batch, merge at read).
    // uniq's state is a REAL mergeable sketch: DataSketches HLL binary via
    // Spark's hll_sketch_agg/hll_union_agg (exact while the sketch holds
    // coupons — low hundreds of distincts — estimating past that, the
    // same contract as ClickHouse's uniqState). For the MONOID aggregates
    // the state IS the value (sum's partial is a sum), so State maps to
    // the aggregate and Merge to its combiner — unlike ClickHouse's
    // opaque blobs, these states are readable columns, documented
    // divergence. avg/quantile States have non-scalar states and are
    // deliberately absent (loud unresolved-function error).
    entry("uniqState", classOf[HllSketchAgg], Seq(1))(cs =>
      new HllSketchAgg(cs.head)),
    entry("uniqMerge", classOf[HllUnionAgg], Seq(1))(cs =>
      HllSketchEstimate(AggregateExpression(new HllUnionAgg(cs.head),
        Complete, isDistinct = false))),
    entry("sumState", classOf[Sum], Seq(1))(cs => Sum(cs.head)),
    entry("sumMerge", classOf[Sum], Seq(1))(cs => Sum(cs.head)),
    entry("countState", classOf[Count], (1 to 8))(cs => Count(cs)),
    entry("countMerge", classOf[Sum], Seq(1))(cs => Sum(cs.head)),
    entry("minState", classOf[Min], Seq(1))(cs => Min(cs.head)),
    entry("minMerge", classOf[Min], Seq(1))(cs => Min(cs.head)),
    entry("maxState", classOf[Max], Seq(1))(cs => Max(cs.head)),
    entry("maxMerge", classOf[Max], Seq(1))(cs => Max(cs.head)),
    // avgWeighted(x, w) = sum(x*w)/sum(w) in Float64, rows with NULL x
    // excluded from BOTH sums (ClickHouse skips them entirely).
    entry("avgWeighted", classOf[Average], Seq(2)) { cs =>
      val x = Cast(cs.head, DoubleType)
      val w = Cast(cs(1), DoubleType)
      val wIfX = If(IsNull(x), Literal.create(null, DoubleType), w)
      Divide(
        AggregateExpression(Sum(Multiply(x, w)), Complete, isDistinct = false),
        AggregateExpression(Sum(wIfX), Complete, isDistinct = false))
    })

  // ------------------------------------- higher-order array functions

  /** ClickHouse array functions — the lambda-carrying family takes the
    * LAMBDA FIRST (`arrayMap(x -> x*2, arr)`), the reverse of Spark's
    * `transform(arr, x -> x*2)`; the builders swap, so both dialects meet
    * the same HigherOrderFunction expressions and the analyzer's lambda
    * binding. Multi-array arrayMap (2 arrays, 2-parameter lambda) maps to
    * zip_with. The lambda-less numeric forms (arrayCount/arrayExists/
    * arrayAll over "element is non-zero") build the predicate inline.
    */
  private def arrayHof: Seq[Entry] = Seq(
    entry("arrayMap", classOf[ArrayTransform], Seq(2, 3)) { cs =>
      val l = requireLambda("arrayMap", cs.head)
      cs.size match {
        case 2 => ArrayTransform(cs(1), l)
        case _ =>
          require(l.arguments.size == 2,
            "arrayMap over two arrays needs a two-parameter lambda")
          ZipWith(cs(1), cs(2), l)
      }
    },
    entry("arrayFilter", classOf[ArrayFilter], Seq(2))(cs =>
      ArrayFilter(cs(1), requireLambda("arrayFilter", cs.head))),
    entry("arrayExists", classOf[ArrayExists], Seq(1, 2)) {
      case Seq(arr) => ArrayExists(arr, lambda1(x => Not(EqualTo(x, Literal(0)))))
      case cs => ArrayExists(cs(1), requireLambda("arrayExists", cs.head))
    },
    entry("arrayAll", classOf[ArrayForAll], Seq(1, 2)) {
      case Seq(arr) => ArrayForAll(arr, lambda1(x => Not(EqualTo(x, Literal(0)))))
      case cs => ArrayForAll(cs(1), requireLambda("arrayAll", cs.head))
    },
    // NOTE on shapes: when the CALL carries a user lambda, the analyzer
    // requires the built expression's TOP node to be a HigherOrderFunction
    // (ResolveFunctions' NON_HIGHER_ORDER_FUNCTION check) — so every
    // lambda-form below is ONE ArrayAggregate/ArrayTransform, with the
    // composition folded into its merge/finish lambdas rather than wrapped
    // around it. The lambda-less forms are free to compose.
    entry("arrayCount", classOf[ArrayAggregate], Seq(1, 2)) {
      case Seq(arr) =>
        Size(ArrayFilter(arr, lambda1(x => Not(EqualTo(x, Literal(0))))), false)
      case cs =>
        val l = requireLambda("arrayCount", cs.head)
        val acc = freshVar()
        ArrayAggregate(cs(1), Literal(0L),
          LambdaFunction(If(Coalesce(Seq(l.function, Literal(false))),
            Add(acc, Literal(1L)), acc), acc +: l.arguments),
          lambda1(identity))
    },
    // arraySum(arr): typed zero (integral sums stay integral, like
    // ClickHouse); arraySum(λ, arr): the mapped element type is unknown
    // until lambda binding, so the sum runs in Float64 (documented).
    entry("arraySum", classOf[ArrayAggregate], Seq(1, 2)) {
      case Seq(arr) => arraySumExpr(arr)
      case cs =>
        val l = requireLambda("arraySum", cs.head)
        ArrayAggregate(ArrayTransform(cs(1), l), Literal(0.0),
          lambda2((acc, x) => Add(acc, x)), lambda1(identity))
    },
    // empty array → NULL (ClickHouse: NaN — documented divergence); the
    // lambda form runs sum and count in ONE aggregate pass, result Float64
    entry("arrayAvg", classOf[ArrayAggregate], Seq(1, 2)) {
      case Seq(arr) =>
        Divide(
          ArrayAggregate(arr, Literal(0.0), lambda2((acc, x) => Add(acc, x)),
            lambda1(identity)),
          Cast(Size(arr, false), DoubleType))
      case cs =>
        val l = requireLambda("arrayAvg", cs.head)
        val acc = freshVar()
        def fld(e: Expression, n: String) = UnresolvedExtractValue(e, Literal(n))
        ArrayAggregate(cs(1),
          CreateNamedStruct(Seq(Literal("s"), Literal(0.0),
            Literal("n"), Literal(0L))),
          LambdaFunction(CreateNamedStruct(Seq(
            Literal("s"), Add(fld(acc, "s"), Cast(l.function, DoubleType)),
            Literal("n"), Add(fld(acc, "n"), Literal(1L)))),
            acc +: l.arguments),
          lambda1(a => Divide(fld(a, "s"), Cast(fld(a, "n"), DoubleType))))
    },
    // λ forms reduce in Float64 (the mapped type is unknown until lambda
    // binding — documented); the plain forms keep the element type
    entry("arrayMin", classOf[ArrayMin], Seq(1, 2)) {
      case Seq(arr) => ArrayMin(arr)
      case cs => minMaxByLambda(requireLambda("arrayMin", cs.head), cs(1), LessThan)
    },
    entry("arrayMax", classOf[ArrayMax], Seq(1, 2)) {
      case Seq(arr) => ArrayMax(arr)
      case cs => minMaxByLambda(requireLambda("arrayMax", cs.head), cs(1), GreaterThan)
    },
    // first matching element, NULL when none (ClickHouse: type default —
    // documented): one aggregate pass keeping a 0/1-element carry array,
    // typed by an empty slice of the input so no type is guessed
    entry("arrayFirst", classOf[ArrayAggregate], Seq(2)) { cs =>
      val l = requireLambda("arrayFirst", cs.head)
      val acc = freshVar()
      val v = l.arguments.head.asInstanceOf[Expression]
      ArrayAggregate(cs(1), Slice(cs(1), Literal(1), Literal(0)),
        LambdaFunction(
          If(And(EqualTo(Size(acc, false), Literal(0)),
            Coalesce(Seq(l.function, Literal(false)))),
            CreateArray(Seq(v)), acc),
          acc +: l.arguments),
        lambda1(a => ElementAt(a, Literal(1), None, failOnError = false)))
    },
    // 1-based index of the first match, 0 when none — a (position, found)
    // running pair in one aggregate pass
    entry("arrayFirstIndex", classOf[ArrayAggregate], Seq(2)) { cs =>
      val l = requireLambda("arrayFirstIndex", cs.head)
      val acc = freshVar()
      def fld(e: Expression, n: String) = UnresolvedExtractValue(e, Literal(n))
      ArrayAggregate(cs(1),
        CreateNamedStruct(Seq(Literal("p"), Literal(0L),
          Literal("f"), Literal(0L))),
        LambdaFunction(
          If(GreaterThan(fld(acc, "f"), Literal(0L)), acc,
            CreateNamedStruct(Seq(
              Literal("p"), Add(fld(acc, "p"), Literal(1L)),
              Literal("f"), If(Coalesce(Seq(l.function, Literal(false))),
                Add(fld(acc, "p"), Literal(1L)), Literal(0L))))),
          acc +: l.arguments),
        lambda1(a => fld(a, "f")))
    },
    // key-lambda sort (ClickHouse) via the Schwartzian struct transform:
    // structs order by their fields in sequence, so (key, element) sorts
    // by key with the element riding along
    entry("arraySort", classOf[ArraySort], Seq(1, 2)) {
      case Seq(arr) => new ArraySort(arr)
      case cs =>
        keyedSort(cs(1), requireLambda("arraySort", cs.head), descending = false)
    },
    entry("arrayReverseSort", classOf[ArraySort], Seq(1, 2)) {
      case Seq(arr) => Reverse(new ArraySort(arr))
      case cs => keyedSort(cs(1), requireLambda("arrayReverseSort", cs.head),
        descending = true)
    })

  private def arraySumExpr(arr: Expression): Expression = {
    val zero = arr.dataType match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => Literal(0L)
      case ArrayType(d: DecimalType, _)  => Literal(Decimal(0), d)
      case _                             => Literal(0.0)
    }
    ArrayAggregate(arr, zero, lambda2((acc, x) => Add(acc, x)), lambda1(identity))
  }

  /** λ-form min/max as one aggregate pass in Float64: the key type is
    * unknown until lambda binding, so the reduction runs in double.
    */
  private def minMaxByLambda(l: LambdaFunction, arr: Expression,
      cmp: (Expression, Expression) => Expression): Expression = {
    val acc = freshVar()
    val keyD = Cast(l.function, DoubleType)
    ArrayAggregate(arr, Literal.create(null, DoubleType),
      LambdaFunction(
        If(Or(IsNull(acc), Coalesce(Seq(cmp(keyD, acc), Literal(false)))),
          keyD, acc),
        acc +: l.arguments),
      lambda1(identity))
  }

  /** ClickHouse's key-lambda sort via the Schwartzian struct transform:
    * structs order by their fields in sequence, so (key, element) sorts by
    * key with the element riding along; the descending form reverses INSIDE
    * the outer transform (the top node must stay a HigherOrderFunction).
    */
  private def keyedSort(arr: Expression, l: LambdaFunction,
      descending: Boolean): Expression = {
    require(l.arguments.size == 1, "arraySort key lambda takes one parameter")
    val v = l.arguments.head.asInstanceOf[Expression]
    val keyed = ArrayTransform(arr,
      LambdaFunction(CreateNamedStruct(Seq(
        Literal("k"), l.function, Literal("v"), v)), l.arguments))
    val sorted = new ArraySort(keyed)
    ArrayTransform(if (descending) Reverse(sorted) else sorted,
      lambda1(s => UnresolvedExtractValue(s, Literal("v"))))
  }

  // --------------------------------------------- plain array functions

  /** The lambda-less array vocabulary: pure renames (ClickHouse camelCase →
    * Spark snake_case built-ins) plus the compositions ClickHouse spells as
    * one call. `arrayJoin(arr)` is ClickHouse's in-SELECT explode — the
    * builder returns Spark's own Explode generator, so it carries the
    * standard generator placement rules (SELECT list or LATERAL VIEW).
    */
  private def arrayPlain: Seq[Entry] = Seq(
    // ClickHouse's FUNCTION-position row expansion (`SELECT arrayJoin(arr)`
    // duplicates the row per element) is exactly Spark's explode generator;
    // registering the name makes the pasted spelling work wherever Spark
    // allows a generator (select list, LATERAL VIEW) and fail loudly
    // elsewhere (ClickHouse additionally allows it in WHERE — out of the
    // generator model, refused by the analyzer rather than mis-evaluated).
    // No name clash: Spark's array_join (concat-with-separator) is a
    // different identifier; that semantics is arrayStringConcat here.
    entry("arrayJoin", classOf[Explode], Seq(1))(cs => Explode(cs.head)),
    entry("arrayConcat", classOf[Concat], (2 to 8))(cs => Concat(cs)),
    entry("arrayDistinct", classOf[ArrayDistinct], Seq(1))(cs =>
      ArrayDistinct(cs.head)),
    entry("arrayUniq", classOf[ArrayDistinct], Seq(1))(cs =>
      Size(ArrayDistinct(cs.head), false)),
    entry("arrayReverse", classOf[Reverse], Seq(1))(cs => Reverse(cs.head)),
    entry("arrayFlatten", classOf[Flatten], Seq(1))(cs => Flatten(cs.head)),
    entry("arrayIntersect", classOf[ArrayIntersect], Seq(2))(cs =>
      ArrayIntersect(cs.head, cs(1))),
    entry("arraySlice", classOf[Slice], Seq(2, 3)) { cs =>
      val len = if (cs.size == 3) cs(2) else Size(cs.head, false)
      Slice(cs.head, cs(1), len)
    },
    entry("arrayZip", classOf[ArraysZip], (2 to 8))(cs => ArraysZip(cs)),
    entry("arrayPushBack", classOf[Concat], Seq(2))(cs =>
      Concat(Seq(cs.head, CreateArray(Seq(cs(1)))))),
    entry("arrayPushFront", classOf[Concat], Seq(2))(cs =>
      Concat(Seq(CreateArray(Seq(cs(1))), cs.head))),
    entry("arrayPopBack", classOf[Slice], Seq(1))(cs =>
      Slice(cs.head, Literal(1), Greatest(Seq(
        Subtract(Size(cs.head, false), Literal(1)), Literal(0))))),
    entry("arrayPopFront", classOf[Slice], Seq(1))(cs =>
      Slice(cs.head, Literal(2), Greatest(Seq(
        Subtract(Size(cs.head, false), Literal(1)), Literal(0))))),
    // Running sums in ONE pass: aggregate() with a (sums, running) struct
    // accumulator — no O(n²) per-prefix re-reduction. Float64 result
    // (ClickHouse keeps the integer type for integer inputs — documented;
    // one numeric face keeps the expression monomorphic and codegen'd).
    entry("arrayCumSum", classOf[ArrayAggregate], Seq(1)) { cs =>
      val zero = CreateNamedStruct(Seq(
        Literal("a"), Literal.create(Array.empty[Double], ArrayType(DoubleType)),
        Literal("s"), Literal(0.0)))
      val merge = {
        val acc = freshVar(); val x = freshVar()
        val s2 = Add(UnresolvedExtractValue(acc, Literal("s")),
          Cast(x, DoubleType))
        LambdaFunction(CreateNamedStruct(Seq(
          Literal("a"), Concat(Seq(UnresolvedExtractValue(acc, Literal("a")),
            CreateArray(Seq(s2)))),
          Literal("s"), s2)), Seq(acc, x))
      }
      val finish = lambda1(acc => UnresolvedExtractValue(acc, Literal("a")))
      ArrayAggregate(cs.head, zero, merge, finish)
    },
    // Collapse CONSECUTIVE duplicates (ClickHouse arrayCompact): keep
    // element i when i is first or differs from its predecessor — the
    // (x, i) filter lambda reading the source array positionally.
    entry("arrayCompact", classOf[ArrayFilter], Seq(1)) { cs =>
      val x = freshVar(); val i = freshVar()
      ArrayFilter(cs.head, LambdaFunction(
        Or(EqualTo(i, Literal(0)),
          Not(EqualNullSafe(ElementAt(cs.head, i), x))), Seq(x, i)))
    },
    // [1..len(arr)] — the index array ClickHouse pairs with ARRAY JOIN
    entry("arrayEnumerate", classOf[Sequence], Seq(1)) { cs =>
      val n = Size(cs.head, false)
      CaseWhen(Seq((LessThanOrEqual(n, Literal(0)),
        Literal.create(Array.empty[Int], ArrayType(IntegerType)))),
        Some(new Sequence(Literal(1), n)))
    },
    // [0, a1-a0, a2-a1, …] via the 2-parameter (element, index) transform
    entry("arrayDifference", classOf[ArrayTransform], Seq(1)) { cs =>
      val arr = cs.head
      ArrayTransform(arr, lambda2((x, i) =>
        If(EqualTo(i, Literal(0)),
          Subtract(x, x), // typed zero without knowing the element type
          Subtract(x, ElementAt(arr, i)))))
    },
    entry("hasAll", classOf[ArrayExcept], Seq(2))(cs =>
      EqualTo(Size(ArrayExcept(cs(1), cs.head), false), Literal(0))),
    entry("hasAny", classOf[ArraysOverlap], Seq(2))(cs =>
      ArraysOverlap(cs.head, cs(1))),
    entry("arrayJoin", classOf[Explode], Seq(1))(cs => Explode(cs.head)))

  // ------------------------------------------------- string functions

  /** String names: positionUTF8/positionCaseInsensitive carry ClickHouse's
    * (haystack, needle) order into Spark's locate (bare `position` is NOT
    * aliased — Spark's builtin has the swapped order and must keep it);
    * `match` is Java-regex rlike (ClickHouse uses RE2 — the common syntax
    * is shared, lookarounds diverge, documented); replaceOne composes
    * locate+overlay (first occurrence only, which regexp_replace cannot
    * spell).
    */
  private def strings: Seq[Entry] = Seq(
    entry("positionUTF8", classOf[StringLocate], Seq(2))(cs =>
      new StringLocate(cs(1), cs.head)),
    entry("positionCaseInsensitive", classOf[StringLocate], Seq(2))(cs =>
      new StringLocate(Lower(cs(1)), Lower(cs.head))),
    entry("match", classOf[RLike], Seq(2))(cs => RLike(cs.head, cs(1))),
    entry("replaceAll", classOf[StringReplace], Seq(3))(cs =>
      StringReplace(cs.head, cs(1), cs(2))),
    entry("replaceRegexpAll", classOf[RegExpReplace], Seq(3))(cs =>
      RegExpReplace(cs.head, cs(1), cs(2))),
    entry("replaceOne", classOf[Overlay], Seq(3)) { cs =>
      val pos = new StringLocate(cs(1), cs.head)
      If(EqualTo(pos, Literal(0)), cs.head,
        new Overlay(cs.head, cs(2), pos, Length(cs(1))))
    },
    entry("lowerUTF8", classOf[Lower], Seq(1))(cs => Lower(cs.head)),
    entry("upperUTF8", classOf[Upper], Seq(1))(cs => Upper(cs.head)),
    entry("lengthUTF8", classOf[Length], Seq(1))(cs => Length(cs.head)),
    entry("substringUTF8", classOf[Substring], Seq(2, 3)) { cs =>
      val len = if (cs.size == 3) cs(2) else Literal(Int.MaxValue)
      Substring(cs.head, cs(1), len)
    },
    entry("trimBoth", classOf[StringTrim], Seq(1))(cs => StringTrim(cs.head)),
    entry("trimLeft", classOf[StringTrimLeft], Seq(1))(cs =>
      StringTrimLeft(cs.head)),
    entry("trimRight", classOf[StringTrimRight], Seq(1))(cs =>
      StringTrimRight(cs.head)),
    entry("leftPad", classOf[StringLPad], Seq(2, 3)) { cs =>
      val pad = if (cs.size == 3) cs(2) else Literal(" ")
      StringLPad(cs.head, cs(1), pad)
    },
    entry("rightPad", classOf[StringRPad], Seq(2, 3)) { cs =>
      val pad = if (cs.size == 3) cs(2) else Literal(" ")
      StringRPad(cs.head, cs(1), pad)
    },
    // empty/notEmpty: type-directed — strings by length, arrays/maps by
    // size (ClickHouse's polymorphic contract); NULL stays NULL
    entry("empty", classOf[Length], Seq(1))(cs => emptyTest(cs.head)),
    entry("notEmpty", classOf[Length], Seq(1))(cs => Not(emptyTest(cs.head))))

  private def emptyTest(e: Expression): Expression = e.dataType match {
    case _: ArrayType | _: MapType => EqualTo(Size(e, false), Literal(0))
    case _ => EqualTo(Length(Cast(e, StringType)), Literal(0))
  }

  // --------------------------------------------------------- arithmetic

  /** Operator names (ClickHouse exposes every operator as a function) and
    * the integer-division family. `divide` always returns Float64
    * (ClickHouse's contract — use intDiv for integer division); `intDiv`
    * truncates toward zero (Spark's `div`); the OrZero variants return 0
    * on a zero divisor instead of NULL/throwing. `roundBankers` is Spark's
    * bround (the bare `round` name keeps Spark's half-up).
    */
  private def arithmetic: Seq[Entry] = Seq(
    entry("plus", classOf[Add], Seq(2))(cs => Add(cs.head, cs(1))),
    entry("minus", classOf[Subtract], Seq(2))(cs => Subtract(cs.head, cs(1))),
    entry("multiply", classOf[Multiply], Seq(2))(cs => Multiply(cs.head, cs(1))),
    entry("divide", classOf[Divide], Seq(2))(cs =>
      Divide(Cast(cs.head, DoubleType), Cast(cs(1), DoubleType))),
    entry("negate", classOf[UnaryMinus], Seq(1))(cs => UnaryMinus(cs.head)),
    entry("intDiv", classOf[IntegralDivide], Seq(2))(cs =>
      IntegralDivide(cs.head, cs(1))),
    entry("intDivOrZero", classOf[IntegralDivide], Seq(2))(cs =>
      If(EqualTo(cs(1), Literal(0)), Literal(0L),
        IntegralDivide(cs.head, cs(1)))),
    entry("modulo", classOf[Remainder], Seq(2))(cs => Remainder(cs.head, cs(1))),
    entry("moduloOrZero", classOf[Remainder], Seq(2))(cs =>
      If(EqualTo(cs(1), Literal(0)), Literal(0L),
        Cast(Remainder(cs.head, cs(1)), LongType))),
    entry("roundBankers", classOf[BRound], Seq(1, 2)) { cs =>
      val scale = if (cs.size == 2) cs(1) else Literal(0)
      BRound(cs.head, scale)
    },
    entry("toTypeName", classOf[Literal], Seq(1))(cs =>
      Literal(cs.head.dataType.sql)),
    // multiIf(c1, v1, c2, v2, …, else) — ClickHouse's flat CASE spelling
    (FunctionIdentifier("multiIf"),
      new ExpressionInfo(classOf[CaseWhen].getName, "multiIf"),
      { children: Seq[Expression] =>
        require(children.size >= 3 && children.size % 2 == 1,
          s"multiIf takes (cond, value)… pairs plus an ELSE value, " +
            s"got ${children.size} argument(s)")
        val cs = children.toList
        CaseWhen(cs.dropRight(1).grouped(2).map(p => (p.head, p(1))).toSeq,
          Some(cs.last))
      }))

  // ----------------------------------------------------- date arithmetic

  /** Date arithmetic: the add/subtract family is type-directed (DATE
    * arguments stay DATE via date_add/add_months; TIMESTAMPs go through
    * timestampadd, sub-day units cast DATE up to TIMESTAMP first).
    * `dateDiff` is the one deliberate builtin override — 2 arguments keep
    * Spark's exact datediff(end, start), 3 arguments are ClickHouse's
    * dateDiff('unit', start, end); disjoint arities, no statement changes
    * meaning. formatDateTime translates the MySQL-style %-tokens ClickHouse
    * uses to a Java pattern at build time (literal format required),
    * refusing tokens without a faithful Java spelling.
    */
  private def dates: Seq[Entry] = {
    def isDate(e: Expression) = e.dataType == DateType
    def tsAdd(unit: String, n: Expression, d: Expression) =
      TimestampAdd(unit, n, Cast(d, TimestampType))
    def addUnit(name: String, unit: String, negateTs: Boolean,
        dateForm: Option[(Expression, Expression) => Expression]): Entry =
      entry(name, classOf[TimestampAdd], Seq(2)) { cs =>
        dateForm match {
          case Some(f) if isDate(cs.head) => f(cs.head, cs(1))
          case _ =>
            val n = if (negateTs) UnaryMinus(cs(1)) else cs(1)
            tsAdd(unit, n, cs.head)
        }
      }
    Seq(
      addUnit("addDays", "DAY", negateTs = false, Some((d, n) => DateAdd(d, n))),
      addUnit("subtractDays", "DAY", negateTs = true,
        Some((d, n) => DateSub(d, n))),
      addUnit("addWeeks", "WEEK", negateTs = false,
        Some((d, n) => DateAdd(d, Multiply(n, Literal(7))))),
      addUnit("subtractWeeks", "WEEK", negateTs = true,
        Some((d, n) => DateSub(d, Multiply(n, Literal(7))))),
      addUnit("addMonths", "MONTH", negateTs = false,
        Some((d, n) => AddMonths(d, n))),
      addUnit("subtractMonths", "MONTH", negateTs = true,
        Some((d, n) => AddMonths(d, UnaryMinus(n)))),
      addUnit("addYears", "YEAR", negateTs = false,
        Some((d, n) => AddMonths(d, Multiply(n, Literal(12))))),
      addUnit("subtractYears", "YEAR", negateTs = true,
        Some((d, n) => AddMonths(d, Multiply(UnaryMinus(n), Literal(12))))),
      addUnit("addHours", "HOUR", negateTs = false, None),
      addUnit("subtractHours", "HOUR", negateTs = true, None),
      addUnit("addMinutes", "MINUTE", negateTs = false, None),
      addUnit("subtractMinutes", "MINUTE", negateTs = true, None),
      addUnit("addSeconds", "SECOND", negateTs = false, None),
      addUnit("subtractSeconds", "SECOND", negateTs = true, None),
      // dateDiff is NOT registered: Spark's grammar already owns 3-argument
      // datediff(unit, start, end) with an UNQUOTED unit keyword (and the
      // 2-argument day form), intercepting the call before any registry
      // lookup — ClickHouse's quoted-unit spelling is normalized by the
      // parser face instead (GraftSqlParser.rewriteDateDiffUnit).
      entry("yesterday", classOf[CurrentDate], Seq(0))(_ =>
        DateSub(CurrentDate(), Literal(1))),
      entry("toMonday", classOf[TruncDate], Seq(1))(cs =>
        TruncDate(Cast(cs.head, DateType), Literal("week"))),
      entry("toYYYYMM", classOf[Year], Seq(1))(cs =>
        Add(Multiply(Year(cs.head), Literal(100)), Month(cs.head))),
      entry("toYYYYMMDD", classOf[Year], Seq(1))(cs =>
        Add(Multiply(Year(cs.head), Literal(10000)),
          Add(Multiply(Month(cs.head), Literal(100)), DayOfMonth(cs.head)))),
      entry("formatDateTime", classOf[DateFormatClass], Seq(2)) { cs =>
        require(cs(1).foldable && cs(1).dataType == StringType,
          "formatDateTime: the format must be a string literal")
        DateFormatClass(Cast(cs.head, TimestampType),
          Literal(chFormatToJava(String.valueOf(cs(1).eval()))))
      },
      entry("parseDateTimeBestEffort", classOf[Cast], Seq(1))(cs =>
        Cast(cs.head, TimestampType)),
      entry("parseDateTimeBestEffortOrNull", classOf[Cast], Seq(1))(cs =>
        Cast(cs.head, TimestampType, None, EvalMode.TRY)))
  }

  /** ClickHouse/MySQL %-format → Java DateTimeFormatter pattern. Letters
    * outside a %-token are quoted (Java treats bare letters as pattern
    * characters; ClickHouse passes them through). Tokens with no faithful
    * Java spelling are refused loudly — a silently-wrong timestamp format
    * is the worst failure mode a log pipeline can have.
    */
  private[functions] def chFormatToJava(fmt: String): String = {
    val out = new StringBuilder
    def lit(s: String): Unit = if (s.nonEmpty) {
      if (s.exists(_.isLetter) || s.contains('\'')) {
        out.append('\'').append(s.replace("'", "''")).append('\'')
      } else out.append(s)
    }
    val plain = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        lit(plain.result()); plain.clear()
        fmt.charAt(i + 1) match {
          case 'Y' => out.append("yyyy")
          case 'y' => out.append("yy")
          case 'm' => out.append("MM")
          case 'd' => out.append("dd")
          case 'H' => out.append("HH")
          case 'I' => out.append("hh")
          case 'i' => out.append("mm")
          case 'S' => out.append("ss")
          case 'p' => out.append("a")
          case 'j' => out.append("DDD")
          case 'F' => out.append("yyyy-MM-dd")
          case 'T' => out.append("HH:mm:ss")
          case '%' => out.append("'%'")
          case other => throw new IllegalArgumentException(
            s"formatDateTime: no faithful Java translation for %$other")
        }
        i += 2
      } else { plain.append(c); i += 1 }
    }
    lit(plain.result())
    out.result()
  }

  // ------------------------------------------------------- conversions

  /** The OrNull/OrZero conversion variants over Cast's TRY eval mode:
    * toInt64OrNull('bad') → NULL, toInt64OrZero('bad') → 0, toDateOrZero
    * falls back to epoch — ClickHouse's exact fallback values. Same
    * unsigned→wider-signed mapping as the base casts in
    * [[GraftFunctions.clickhouseAliases]].
    */
  private def conversions: Seq[Entry] = {
    val numeric: Seq[(String, DataType)] = Seq(
      "toInt8" -> ByteType, "toInt16" -> ShortType, "toInt32" -> IntegerType,
      "toInt64" -> LongType, "toUInt8" -> ShortType, "toUInt16" -> IntegerType,
      "toUInt32" -> LongType, "toUInt64" -> LongType,
      "toFloat32" -> FloatType, "toFloat64" -> DoubleType)
    val temporal: Seq[(String, DataType)] =
      Seq("toDate" -> DateType, "toDateTime" -> TimestampType)
    def tryCast(e: Expression, dt: DataType) = Cast(e, dt, None, EvalMode.TRY)
    (numeric ++ temporal).flatMap { case (base, dt) =>
      val orNull = entry(s"${base}OrNull", classOf[Cast], Seq(1))(cs =>
        tryCast(cs.head, dt))
      val zero: Expression = dt match {
        case DateType      => Literal.create(0, DateType)       // epoch day
        case TimestampType => Literal.create(0L, TimestampType) // epoch
        case d             => Cast(Literal(0), d)
      }
      val orZero = entry(s"${base}OrZero", classOf[Cast], Seq(1))(cs =>
        Coalesce(Seq(tryCast(cs.head, dt), zero)))
      Seq(orNull, orZero)
    }
  }

  // ------------------------------------------- JSON / bit / map / tuple

  /** The third vocabulary wave a pasted log-pipeline query hits: the
    * JSONExtract family over Spark's codegen'd get_json_object (the PATH
    * builds at registration from the literal key/index arguments —
    * ClickHouse's varargs `('a', 1, 'b')` become `$.a[0].b`, ClickHouse
    * indices are 1-based and negative-from-the-end, JsonPath's 0-based
    * non-negative only, so negatives refuse loudly); bitwise names over
    * the &,|,^,~,shift expressions; map/tuple accessors; the remaining
    * split/regexp names. `assumeNotNull` is the no-op nullability hint
    * (ClickHouse leaves NULL behavior undefined — this engine passes the
    * value through rather than inventing one).
    */
  private def jsonBitMap: Seq[Entry] = {
    def jsonPath(name: String, cs: Seq[Expression]): Expression = {
      require(cs.size >= 2, s"$name takes (json, key_or_index…)")
      val path = cs.tail.map { e =>
        require(e.foldable, s"$name: path arguments must be literals")
        (e.dataType, e.eval()) match {
          case (_, null) => throw new IllegalArgumentException(
            s"$name: NULL path argument")
          case (StringType, v) => s".${v}"
          case (ByteType | ShortType | IntegerType | LongType, v) =>
            val i = v.toString.toLong
            require(i >= 1, s"$name: ClickHouse 1-based positive indices " +
              s"only (JsonPath cannot count from the end), got $i")
            s"[${i - 1}]"
          case (dt, _) => throw new IllegalArgumentException(
            s"$name: path arguments are strings or integers, got ${dt.sql}")
        }
      }.mkString
      GetJsonObject(cs.head, Literal("$" + path))
    }
    def jsonAs(name: String, dt: DataType): Entry =
      (FunctionIdentifier(name), new ExpressionInfo(classOf[GetJsonObject].getName, name),
        { cs0: Seq[Expression] =>
          val cs = cs0.toList
          val raw = jsonPath(name, cs)
          dt match {
            case StringType => raw
            case BooleanType =>
              // ClickHouse: true/1 → true; anything else → false
              Coalesce(Seq(In(raw, Seq(Literal("true"), Literal("1"))),
                Literal(false)))
            case d => Coalesce(Seq(Cast(raw, d, None, EvalMode.TRY),
              Cast(Literal(0), d))) // ClickHouse returns 0 on absence/mismatch
          }
        })
    Seq(
      jsonAs("JSONExtractString", StringType),
      jsonAs("JSONExtractInt", LongType),
      jsonAs("JSONExtractUInt", LongType),
      jsonAs("JSONExtractFloat", DoubleType),
      jsonAs("JSONExtractBool", BooleanType),
      entry("JSONExtractRaw", classOf[GetJsonObject], (2 to 8))(cs =>
        jsonPath("JSONExtractRaw", cs)),
      entry("JSONHas", classOf[GetJsonObject], (2 to 8))(cs =>
        IsNotNull(jsonPath("JSONHas", cs))),
      entry("bitAnd", classOf[BitwiseAnd], Seq(2))(cs =>
        BitwiseAnd(cs.head, cs(1))),
      entry("bitOr", classOf[BitwiseOr], Seq(2))(cs => BitwiseOr(cs.head, cs(1))),
      entry("bitXor", classOf[BitwiseXor], Seq(2))(cs =>
        BitwiseXor(cs.head, cs(1))),
      entry("bitNot", classOf[BitwiseNot], Seq(1))(cs => BitwiseNot(cs.head)),
      entry("bitShiftLeft", classOf[ShiftLeft], Seq(2))(cs =>
        ShiftLeft(cs.head, Cast(cs(1), IntegerType))),
      entry("bitShiftRight", classOf[ShiftRight], Seq(2))(cs =>
        ShiftRight(cs.head, Cast(cs(1), IntegerType))),
      entry("mapKeys", classOf[MapKeys], Seq(1))(cs => MapKeys(cs.head)),
      entry("mapValues", classOf[MapValues], Seq(1))(cs => MapValues(cs.head)),
      entry("mapContains", classOf[MapContainsKey], Seq(2))(cs =>
        MapContainsKey(cs.head, cs(1))),
      // tupleElement(t, n) — 1-based ordinal into a STRUCT (children are
      // resolved at build time, so the field is known); or by name
      entry("tupleElement", classOf[GetStructField], Seq(2)) { cs =>
        require(cs(1).foldable, "tupleElement: the selector must be a literal")
        val st = cs.head.dataType match {
          case s: StructType => s
          case other => throw new IllegalArgumentException(
            s"tupleElement: first argument must be a Tuple/STRUCT, got ${other.sql}")
        }
        cs(1).dataType match {
          case StringType =>
            val nm = String.valueOf(cs(1).eval())
            val i = st.fieldNames.indexOf(nm)
            require(i >= 0, s"tupleElement: no field '$nm' in ${st.sql}")
            GetStructField(cs.head, i, Some(nm))
          case ByteType | ShortType | IntegerType | LongType =>
            val i = cs(1).eval().toString.toInt
            require(i >= 1 && i <= st.size,
              s"tupleElement: ordinal $i out of 1..${st.size}")
            GetStructField(cs.head, i - 1, Some(st.fieldNames(i - 1)))
          case other => throw new IllegalArgumentException(
            s"tupleElement: selector is a name or 1-based ordinal, got ${other.sql}")
        }
      },
      // splitByString(sep, s): any-length literal separator (splitByChar's
      // general form); splitByRegexp(re, s): the raw regex form
      entry("splitByString", classOf[StringSplit], Seq(2)) { cs =>
        require(cs.head.foldable && cs.head.dataType == StringType,
          "splitByString: the separator must be a string literal")
        val sep = String.valueOf(cs.head.eval())
        require(sep.nonEmpty, "splitByString: empty separator")
        StringSplit(cs(1), Literal(java.util.regex.Pattern.quote(sep)), Literal(-1))
      },
      entry("splitByRegexp", classOf[StringSplit], Seq(2))(cs =>
        StringSplit(cs(1), cs.head, Literal(-1))),
      entry("extractAll", classOf[RegExpExtractAll], Seq(2)) { cs =>
        // ClickHouse: matches of the first capture group when the regex
        // has one, whole matches otherwise — same static inspection as
        // the regex builders elsewhere require a literal pattern
        require(cs(1).foldable && cs(1).dataType == StringType,
          "extractAll: the pattern must be a string literal")
        val re = String.valueOf(cs(1).eval())
        val group = if (re.replace("\\\\", "").replace("\\(", "")
          .contains("(")) 1 else 0
        RegExpExtractAll(cs.head, cs(1), Literal(group))
      },
      entry("countMatches", classOf[RegExpCount], Seq(2))(cs =>
        RegExpCount(cs.head, cs(1))),
      entry("assumeNotNull", classOf[KnownNotNull], Seq(1))(cs =>
        KnownNotNull(cs.head)),
      // toStartOfWeek: ClickHouse's default mode 0 = SUNDAY-start week
      // (toMonday is the Monday form): the Sunday at or before d
      entry("toStartOfWeek", classOf[TruncDate], Seq(1))(cs =>
        DateSub(TruncDate(DateAdd(Cast(cs.head, DateType), Literal(1)),
          Literal("week")), Literal(1))))
  }

  // ------------------------------------------- windows & readability

  /** Window-function names, text tokenizers, and the human-readable
    * formatters ClickHouse tutorials lean on.
    */
  private def misc: Seq[Entry] = Seq(
    // lagInFrame/leadInFrame: ClickHouse's explicit-window lag/lead (its
    // bare lag/lead are aliases of these) — Spark's Lag/Lead directly;
    // the analyzer wraps them in the OVER clause's WindowExpression.
    entry("lagInFrame", classOf[Lag], Seq(1, 2, 3)) { cs =>
      val off = if (cs.size >= 2) cs(1) else Literal(1)
      val dflt = if (cs.size >= 3) cs(2) else Literal(null)
      new Lag(cs.head, off, dflt, false)
    },
    entry("leadInFrame", classOf[Lead], Seq(1, 2, 3)) { cs =>
      val off = if (cs.size >= 2) cs(1) else Literal(1)
      val dflt = if (cs.size >= 3) cs(2) else Literal(null)
      new Lead(cs.head, off, dflt, false)
    },
    // bar(x, min, max, width): width·(x−min)/(max−min) full blocks of
    // U+2588, clamped to [0, width]. ClickHouse draws fractional eighths
    // too — whole blocks only here (documented; the shape reads the same).
    entry("bar", classOf[StringRepeat], Seq(4)) { cs =>
      val x = Cast(cs.head, DoubleType)
      val lo = Cast(cs(1), DoubleType)
      val hi = Cast(cs(2), DoubleType)
      val w = Cast(cs(3), DoubleType)
      val n = Floor(Multiply(w,
        Divide(Subtract(x, lo), Subtract(hi, lo))))
      val clamped = Greatest(Seq(Literal(0L),
        Least(Seq(Cast(w, LongType), Cast(n, LongType)))))
      StringRepeat(Literal("█"), Cast(clamped, IntegerType))
    },
    // formatReadableSize: IEC units with two decimals, ClickHouse's print
    entry("formatReadableSize", classOf[FormatString], Seq(1)) { cs =>
      val b = Cast(cs.head, DoubleType)
      def tier(p: Int) = Literal(math.pow(1024.0, p))
      def fmt(unit: String, p: Int) =
        FormatString(Literal(s"%.2f $unit"), Divide(b, tier(p)))
      CaseWhen(Seq(
        (LessThan(b, tier(1)), fmt("B", 0)),
        (LessThan(b, tier(2)), fmt("KiB", 1)),
        (LessThan(b, tier(3)), fmt("MiB", 2)),
        (LessThan(b, tier(4)), fmt("GiB", 3)),
        (LessThan(b, tier(5)), fmt("TiB", 4)),
        (LessThan(b, tier(6)), fmt("PiB", 5))), Some(fmt("EiB", 6)))
    },
    entry("formatReadableQuantity", classOf[FormatString], Seq(1)) { cs =>
      val n = Cast(cs.head, DoubleType)
      def tier(p: Double) = Literal(p)
      def fmt(unit: String, p: Double) =
        FormatString(Literal(s"%.2f$unit"), Divide(n, tier(p)))
      CaseWhen(Seq(
        (LessThan(n, Literal(1e3)), FormatString(Literal("%.2f"), n)),
        (LessThan(n, Literal(1e6)), fmt(" thousand", 1e3)),
        (LessThan(n, Literal(1e9)), fmt(" million", 1e6)),
        (LessThan(n, Literal(1e12)), fmt(" billion", 1e9))),
        Some(fmt(" trillion", 1e12)))
    },
    // ngrams(s, n): the array of all length-n substrings (ClickHouse's
    // character n-grams); empty when the string is shorter than n.
    entry("ngrams", classOf[ArrayTransform], Seq(2)) { cs =>
      require(cs(1).foldable, "ngrams: n must be a literal")
      val n = cs(1)
      val count = Subtract(Add(Length(cs.head), Literal(1)), n)
      CaseWhen(Seq((LessThanOrEqual(count, Literal(0)),
        Literal.create(Array.empty[String], ArrayType(StringType)))),
        Some(ArrayTransform(new Sequence(Literal(1), count),
          lambda1(i => Substring(cs.head, Cast(i, IntegerType), Cast(n, IntegerType))))))
    },
    // base64 family: ClickHouse's names over Spark's Base64/UnBase64
    // (Spark decodes leniently where ClickHouse base64Decode throws on
    // malformed input — tryBase64Decode is therefore the exact match and
    // base64Decode a documented-lenient alias).
    entry("base64Encode", classOf[Base64], Seq(1))(cs =>
      Base64(Cast(cs.head, BinaryType))),
    entry("base64Decode", classOf[UnBase64], Seq(1))(cs =>
      Cast(UnBase64(cs.head), StringType)),
    entry("tryBase64Decode", classOf[UnBase64], Seq(1))(cs =>
      Cast(UnBase64(cs.head), StringType)),
    entry("generateUUIDv4", classOf[Uuid], Seq(0))(_ => Uuid()),
    // IPv4 dotted-quad <-> UInt32 (as BIGINT here; the standing
    // signedness divergence)
    entry("IPv4NumToString", classOf[FormatString], Seq(1)) { cs =>
      val n = Cast(cs.head, LongType)
      def oct(shift: Int) = Cast(BitwiseAnd(
        ShiftRight(n, Literal(shift)), Literal(255L)), IntegerType)
      FormatString(Literal("%d.%d.%d.%d"), oct(24), oct(16), oct(8), oct(0))
    },
    entry("IPv4StringToNum", classOf[StringSplit], Seq(1)) { cs =>
      val parts = StringSplit(cs.head, Literal("\\."), Literal(-1))
      def oct(i: Int) =
        Cast(GetArrayItem(parts, Literal(i)), LongType)
      Add(Add(Add(Multiply(oct(0), Literal(16777216L)),
        Multiply(oct(1), Literal(65536L))),
        Multiply(oct(2), Literal(256L))), oct(3))
    },
    // tokens(s): split on non-alphanumeric runs, no empty tokens —
    // ClickHouse's default tokenizer (Unicode letters/digits here, Java
    // regex classes; ClickHouse is byte-ASCII — documented).
    entry("tokens", classOf[StringSplit], Seq(1)) { cs =>
      val split = StringSplit(cs.head, Literal("[^\\p{L}\\p{N}]+"), Literal(-1))
      ArrayFilter(split, lambda1(x => GreaterThan(Length(x), Literal(0))))
    })

  /** Every entry, in one list for both registration faces (register() and
    * the spark.sql.extensions path) — the same no-drift discipline as
    * [[GraftFunctions.expressionFunctions]].
    */
  val all: Seq[Entry] =
    aggregates ++ arrayHof ++ arrayPlain ++ strings ++ arithmetic ++
      dates ++ conversions ++ jsonBitMap ++ misc
}
