package graft.sources

/** ClickHouse-native `CREATE TABLE` DDL → the engine's Spark DDL face.
  *
  * {{{
  *   CREATE TABLE [IF NOT EXISTS] t [ON CLUSTER c] (
  *     id UInt64,
  *     s  LowCardinality(String) CODEC(ZSTD),
  *     d  Date,
  *     v  Nullable(Float64) DEFAULT 0
  *   ) ENGINE = ReplacingMergeTree(ver)
  *   PARTITION BY toYYYYMM(d)
  *   ORDER BY (id, d)
  *   SAMPLE BY id
  *   TTL d + INTERVAL 90 DAY
  *   SETTINGS index_granularity = 8192
  * }}}
  *
  * rewrites to `CREATE TABLE t (…) USING mergetree OPTIONS (orderBy …,
  * mode …, …)` — the SAME options face ColumnarMergeTree.create persists,
  * so a ClickHouse-born table is indistinguishable from an API- or
  * Spark-DDL-born one. The statement is recognized ONLY by its
  * `ENGINE = <X>MergeTree` clause (no standard Spark DDL spells ENGINE =),
  * so no Spark statement changes meaning.
  *
  * Contract decisions, each loud or documented (never silently wrong):
  *   - types map per the engine's published unsigned→wider-signed rule
  *     (UInt8→SMALLINT … UInt64→BIGINT, values above 2⁶³−1 out of range);
  *     Nullable()/LowCardinality() unwrap (Spark columns are nullable by
  *     default; LowCardinality is an encoding hint); Enum8/16, UUID, IPv4/6
  *     and FixedString map to STRING; named Tuple→STRUCT, Map→MAP,
  *     Array→ARRAY; Int128/256, AggregateFunction, positional Tuple REFUSE.
  *   - ENGINE: MergeTree→plain; ReplacingMergeTree([ver])→replacing;
  *     SummingMergeTree([cols])→summing (no cols: every numeric non-key
  *     column, ClickHouse's own default); CollapsingMergeTree(sign) and
  *     VersionedCollapsingMergeTree(sign, ver)→collapsing. Keys = the
  *     ORDER BY columns, as in ClickHouse. AggregatingMergeTree and
  *     non-MergeTree engines refuse (the options face's mode 'aggregating'
  *     declares its per-column fns explicitly).
  *   - ORDER BY must be plain columns (the engine's sort key contract);
  *     PRIMARY KEY, when present, must be a prefix of ORDER BY (ClickHouse's
  *     own rule) and is then subsumed by it; ORDER BY tuple() refuses (the
  *     engine requires a sort key).
  *   - column DEFAULT clauses are accepted and DROPPED (inserts here always
  *     provide every column, so a default can never fire — documented);
  *     MATERIALIZED / ALIAS / EPHEMERAL / column-TTL refuse (they change
  *     SELECT results); CODEC/COMMENT are encoding/metadata hints (CODEC
  *     drops, COMMENT passes through).
  *   - table TTL `expr [DELETE]` becomes the options face's expired-when
  *     predicate `(expr) <= current_timestamp()`; TO DISK/VOLUME/GROUP BY/
  *     WHERE forms refuse.
  *   - SETTINGS: storage-tuning keys are accepted and ignored (the same
  *     posture as the query-side SETTINGS allowlist); anything else
  *     refuses loudly.
  *   - an unqualified table name needs a trailing LOCATION '<dir>' (the
  *     session-catalog path form) — a `graft.<ns>.<t>` catalog identifier
  *     carries its own directory. ON CLUSTER drops (single-driver engine).
  */
object ChCreateTable {

  private val HeadRe =
    ("(?is)^\\s*CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      "([\\w.`]+)\\s*(ON\\s+CLUSTER\\s+[\\w.`'\\\"]+\\s*)?\\(").r
  private val EngineProbeRe = "(?i)\\bENGINE\\s*=".r

  /** Some(spark DDL) when the statement is ClickHouse CREATE TABLE DDL
    * (recognized by ENGINE =), None otherwise. Throws loudly on a
    * recognized statement the engine cannot represent faithfully.
    */
  def rewrite(sqlText: String): Option[String] = {
    val m = HeadRe.findFirstMatchIn(sqlText).getOrElse(return None)
    if (!EngineProbeRe.findFirstMatchIn(sqlText).exists(e =>
      !GraftSqlParser.inSpan(GraftSqlParser.quotedSpans(sqlText), e.start)))
      return None
    val ifNotExists = Option(m.group(1)).isDefined
    val name = m.group(2)
    val colsStart = m.end - 1 // at the '('
    val colsEnd = matchParen(sqlText, colsStart)
    val defs = GraftSqlParser.splitTopLevel(
      sqlText.substring(colsStart + 1, colsEnd)).map(_.trim).filter(_.nonEmpty)
    require(defs.nonEmpty, "ClickHouse CREATE TABLE: empty column list")
    // ClickHouse's column list carries more than columns: INDEX entries
    // map to the engine's skip-index options; PROJECTION and CONSTRAINT
    // refuse (projections have their own options face; constraints have
    // no engine counterpart)
    defs.filter(d => "(?is)^(PROJECTION|CONSTRAINT)\\b".r
      .findFirstIn(d).isDefined).foreach { d =>
      val kw = d.split("\\s+").head.toUpperCase
      throw new IllegalArgumentException(
        if (kw == "PROJECTION")
          "in-list PROJECTION is not supported — declare alternate sort " +
            "orders via OPTIONS (projections 'name:cols')"
        else "CONSTRAINT has no engine counterpart and is not supported")
    }
    val (idxDefs, colDefs) =
      defs.partition(d => "(?is)^INDEX\\b".r.findFirstIn(d).isDefined)
    require(colDefs.nonEmpty, "ClickHouse CREATE TABLE: no columns declared")
    val cols = colDefs.map(parseColumn)
    val indexes = idxDefs.map(parseInListIndex)
    val clauses = parseClauses(sqlText.substring(colsEnd + 1))

    val engine = clauses.getOrElse("engine", throw new IllegalArgumentException(
      "ClickHouse CREATE TABLE: ENGINE clause required"))
    val orderByCols = orderKey(clauses)
    val colNames = cols.map(_._1)
    orderByCols.foreach(c => require(colNames.contains(c),
      s"ORDER BY column '$c' is not a declared column"))
    val opts = scala.collection.mutable.LinkedHashMap[String, String]()
    opts("orderBy") = orderByCols.mkString(",")
    engineOptions(engine, orderByCols, cols).foreach { case (k, v) => opts(k) = v }
    indexes.groupBy(_._1).foreach { case (optKey, entries) =>
      entries.map(_._2).foreach(c => require(colNames.contains(c),
        s"INDEX column '$c' is not a declared column"))
      opts(optKey) = entries.map(_._2).distinct.mkString(",")
    }
    clauses.get("partition by").foreach(e => opts("partitionBy") = e.trim)
    clauses.get("sample by").foreach { e =>
      val c = stripTicks(e.trim)
      require(c.matches("\\w+"), s"SAMPLE BY must name a plain column " +
        s"(got '$e'); materialize a hash column for expression sampling")
      require(colNames.contains(c), s"SAMPLE BY column '$c' is not declared")
      opts("sampleBy") = c
    }
    clauses.get("ttl").foreach(e => opts("ttl") = ttlPredicate(e))
    clauses.get("settings").foreach(checkSettings)
    val location = clauses.get("location").map { raw =>
      val t = raw.trim
      require(t.startsWith("'") && t.endsWith("'") && t.length > 2,
        s"LOCATION wants a quoted path, got $raw")
      t
    }
    if (!name.contains('.'))
      require(location.isDefined,
        "ClickHouse CREATE TABLE with an unqualified name needs a trailing " +
          "LOCATION '<dir>' (or use a catalog identifier like graft.ns.t)")

    val colDdl = cols.map { case (n, t, suffix) =>
      s"`$n` $t$suffix"
    }.mkString(", ")
    val optDdl = opts.map { case (k, v) =>
      s"$k '${v.replace("'", "''")}'"
    }.mkString(", ")
    Some(s"CREATE TABLE ${if (ifNotExists) "IF NOT EXISTS " else ""}$name " +
      s"($colDdl) USING mergetree OPTIONS ($optDdl)" +
      location.map(l => s" LOCATION $l").getOrElse(""))
  }

  // ------------------------------------------------------------- columns

  private val ColHeadRe = "(?s)^(`[^`]+`|\\w+)\\s+(.*)$".r
  private val ModifierRe =
    ("(?is)^(NOT\\s+NULL|NULL|DEFAULT|MATERIALIZED|ALIAS|EPHEMERAL|" +
      "CODEC|TTL|COMMENT)\\b\\s*").r

  /** (name, sparkType, ddlSuffix) — suffix carries NOT NULL / COMMENT. */
  private def parseColumn(def0: String): (String, String, String) = {
    val m = ColHeadRe.findFirstMatchIn(def0).getOrElse(
      throw new IllegalArgumentException(s"unparseable column definition: $def0"))
    val name = stripTicks(m.group(1))
    val rest0 = m.group(2).trim
    // the type is an identifier plus an optional balanced paren group
    val typeLen = {
      val idLen = rest0.takeWhile(c => c.isLetterOrDigit || c == '_').length
      require(idLen > 0, s"column '$name': missing type in: $def0")
      val afterId = rest0.drop(idLen)
      val wsLen = afterId.takeWhile(_.isWhitespace).length
      if (afterId.drop(wsLen).startsWith("("))
        idLen + wsLen + (matchParen(rest0, idLen + wsLen) - (idLen + wsLen)) + 1
      else idLen
    }
    val chType = rest0.take(typeLen)
    var tail = rest0.drop(typeLen).trim
    var notNull = false
    var comment = ""
    while (tail.nonEmpty) {
      val mm = ModifierRe.findFirstMatchIn(tail).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name': unsupported trailing clause '$tail'"))
      val kw = mm.group(1).toUpperCase.replaceAll("\\s+", " ")
      tail = tail.substring(mm.end).trim
      kw match {
        case "NOT NULL" => notNull = true
        case "NULL"     => // Spark columns are nullable by default
        case "DEFAULT" =>
          // accepted and dropped: inserts here always provide every column,
          // so a column default can never fire (documented in the Scaladoc)
          tail = dropExpr(tail)
        case "MATERIALIZED" | "ALIAS" | "EPHEMERAL" =>
          throw new IllegalArgumentException(
            s"column '$name': $kw columns change SELECT results and are " +
              "not supported — precompute the expression in the INSERT")
        case "CODEC" =>
          require(tail.startsWith("("), s"column '$name': CODEC wants (…)")
          tail = tail.substring(matchParen(tail, 0) + 1).trim
        case "TTL" =>
          throw new IllegalArgumentException(
            s"column '$name': per-column TTL is not supported (table TTL is)")
        case "COMMENT" =>
          require(tail.startsWith("'"), s"column '$name': COMMENT wants a string")
          val end = tail.indexOf('\'', 1)
          require(end > 0, s"column '$name': unterminated COMMENT")
          comment = s" COMMENT ${tail.substring(0, end + 1)}"
          tail = tail.substring(end + 1).trim
      }
    }
    (name, chTypeToSpark(chType),
      (if (notNull) " NOT NULL" else "") + comment)
  }

  private val InListIndexRe =
    ("(?is)^INDEX\\s+[`\\w]+\\s+(`?\\w+`?)\\s+TYPE\\s+" +
      "(\\w+\\s*(?:\\([^)]*\\))?)(?:\\s+GRANULARITY\\s+\\d+)?$").r

  /** One in-list `INDEX name col TYPE kind [GRANULARITY g]` → the option
    * key carrying that index family plus its column — the same contract as
    * ALTER TABLE ADD INDEX (name cosmetic, kind args/GRANULARITY sizing
    * tuning accepted and ignored, plain columns only).
    */
  private def parseInListIndex(d: String): (String, String) = {
    val m = InListIndexRe.findFirstMatchIn(d).getOrElse(
      throw new IllegalArgumentException(
        s"unsupported INDEX declaration '$d' — supported: INDEX name " +
          "<column> TYPE <kind[(args)]> [GRANULARITY g] (plain columns only)"))
    val optKey = graft.mergetree.ColumnarMergeTree
      .normalizeIndexKind(m.group(2)) match {
        case "bloom_filter" => "bloomFilterColumns"
        case "minmax"       => "minmaxColumns"
        case "tokenbf"      => "tokenBloomColumns"
        case "ngrambf"      => "ngramBloomColumns"
        case "set"          => "setIndexColumns"
      }
    (optKey, stripTicks(m.group(1)))
  }

  /** Drop one expression from the head of `s` — everything up to the next
    * top-level modifier keyword (or the end). Quote- and paren-aware.
    */
  private def dropExpr(s: String): String = {
    var i = 0
    var depth = 0
    var inQ = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ != ' ') { if (c == inQ) inQ = ' ' }
      else c match {
        case '\'' | '"' | '`' => inQ = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && c.isLetter =>
          val rem = s.substring(i)
          if (ModifierRe.findFirstMatchIn(rem).exists(_.start == 0) &&
            (i == 0 || !s.charAt(i - 1).isLetterOrDigit))
            return rem
        case _ =>
      }
      i += 1
    }
    ""
  }

  // --------------------------------------------------------------- types

  private[graft] def chTypeToSpark(t0: String): String = {
    val t = t0.trim
    val (base, argS) = t.indexOf('(') match {
      case -1 => (t, None)
      case i =>
        require(t.endsWith(")"), s"unbalanced type: $t")
        (t.take(i).trim, Some(t.substring(i + 1, t.length - 1)))
    }
    def args = GraftSqlParser.splitTopLevel(argS.getOrElse("")).map(_.trim)
    base match {
      case "Nullable" | "LowCardinality" =>
        chTypeToSpark(argS.getOrElse(throw new IllegalArgumentException(
          s"$base wants an inner type: $t")))
      case "Int8" => "TINYINT"
      case "Int16" => "SMALLINT"
      case "Int32" => "INT"
      case "Int64" => "BIGINT"
      case "UInt8" => "SMALLINT"
      case "UInt16" => "INT"
      case "UInt32" => "BIGINT"
      case "UInt64" => "BIGINT" // documented: >2^63-1 out of range
      case "Float32" => "FLOAT"
      case "Float64" => "DOUBLE"
      case "Bool" | "Boolean" => "BOOLEAN"
      case "String" | "UUID" | "IPv4" | "IPv6" | "JSON" | "Object" => "STRING"
      case "FixedString" => "STRING"
      case "Date" | "Date32" => "DATE"
      case "DateTime" | "DateTime64" => "TIMESTAMP"
      case "Decimal" =>
        val Seq(p, s) = args
        s"DECIMAL($p, $s)"
      case "Decimal32" => s"DECIMAL(9, ${args.head})"
      case "Decimal64" => s"DECIMAL(18, ${args.head})"
      case "Decimal128" => s"DECIMAL(38, ${args.head})"
      case "Enum8" | "Enum16" => "STRING"
      case "Array" => s"ARRAY<${chTypeToSpark(argS.getOrElse(
        throw new IllegalArgumentException(s"Array wants an element type: $t")))}>"
      case "Map" =>
        val Seq(k, v) = args
        s"MAP<${chTypeToSpark(k)}, ${chTypeToSpark(v)}>"
      case "Tuple" =>
        val fields = args.map { f =>
          val sp = f.indexWhere(_.isWhitespace)
          require(sp > 0, s"only NAMED Tuple maps to STRUCT " +
            s"(positional tuple field '$f' in $t)")
          s"${stripTicks(f.take(sp))}: ${chTypeToSpark(f.drop(sp + 1))}"
        }
        s"STRUCT<${fields.mkString(", ")}>"
      case other => throw new IllegalArgumentException(
        s"no faithful Spark mapping for ClickHouse type '$other' in: $t")
    }
  }

  // ------------------------------------------------------------- clauses

  // no trailing \b after ENGINE's '=' — '=' is a non-word char, so a
  // word boundary there would never match "ENGINE ="
  private val ClauseRe =
    ("(?i)\\b(ENGINE|PARTITION\\s+BY|PRIMARY\\s+KEY|ORDER\\s+BY|" +
      "SAMPLE\\s+BY|TTL|SETTINGS|LOCATION)\\b").r

  private def parseClauses(tail0: String): Map[String, String] = {
    val tail = tail0.replaceFirst("(?s)\\s*;\\s*$", "")
    val spans = GraftSqlParser.quotedSpans(tail)
    val starts = ClauseRe.findAllMatchIn(tail).toList
      .filter(m => !GraftSqlParser.inSpan(spans, m.start))
    starts.zipWithIndex.map { case (m, i) =>
      val key = m.group(1).toLowerCase.replaceAll("\\s+", " ").trim
      val end = if (i + 1 < starts.size) starts(i + 1).start else tail.length
      key -> tail.substring(m.end, end).trim.stripPrefix("=").trim
    }.toMap
  }

  private def orderKey(clauses: Map[String, String]): List[String] = {
    val raw = clauses.get("order by").orElse(clauses.get("primary key"))
      .getOrElse(throw new IllegalArgumentException(
        "ClickHouse CREATE TABLE: ORDER BY (or PRIMARY KEY) required — " +
          "the engine's sort key"))
    val cols = splitKey(raw)
    require(cols.nonEmpty && cols != List("tuple()"),
      "ORDER BY tuple() (no sort key) is not supported — declare a key")
    cols.foreach(c => require(c.matches("\\w+"),
      s"ORDER BY must name plain columns (got '$c'); materialize the " +
        "expression as a column"))
    // PRIMARY KEY, when both are present, must be a prefix (ClickHouse's
    // own rule) — then ORDER BY subsumes it
    clauses.get("primary key").filter(_ => clauses.contains("order by"))
      .foreach { pk =>
        val pkCols = splitKey(pk)
        require(cols.startsWith(pkCols),
          s"PRIMARY KEY ${pkCols.mkString(",")} must be a prefix of " +
            s"ORDER BY ${cols.mkString(",")}")
      }
    cols
  }

  private def splitKey(raw0: String): List[String] = {
    val raw = raw0.trim
    val inner = if (raw.startsWith("(") && matchParen(raw, 0) == raw.length - 1)
      raw.substring(1, raw.length - 1) else raw
    if (inner.trim == "tuple()") List("tuple()")
    else GraftSqlParser.splitTopLevel(inner)
      .map(s => stripTicks(s.trim)).filter(_.nonEmpty).toList
  }

  private val NumericSparkTypes =
    Set("TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE")

  private def engineOptions(engine0: String, orderBy: List[String],
      cols: Seq[(String, String, String)]): Seq[(String, String)] = {
    val engine = engine0.trim
    val (name, argS) = engine.indexOf('(') match {
      case -1 => (engine, None)
      case i =>
        val close = matchParen(engine, i)
        require(engine.substring(close + 1).trim.isEmpty,
          s"trailing text after ENGINE arguments: $engine")
        (engine.take(i).trim, Some(engine.substring(i + 1, close)))
    }
    def args = GraftSqlParser.splitTopLevel(argS.getOrElse(""))
      .map(s => stripTicks(s.trim)).filter(_.nonEmpty)
    val keys = Seq("keys" -> orderBy.mkString(","))
    name match {
      case "MergeTree" =>
        require(args.isEmpty, s"MergeTree takes no arguments: $engine")
        Nil
      case "ReplacingMergeTree" =>
        require(args.size <= 1, s"ReplacingMergeTree([ver]): $engine")
        Seq("mode" -> "replacing") ++ keys ++
          args.headOption.map("version" -> _)
      case "SummingMergeTree" =>
        val sums = if (args.nonEmpty) args else cols.collect {
          case (n, t, _) if NumericSparkTypes.contains(
            t.toUpperCase.takeWhile(_ != '(')) && !orderBy.contains(n) => n
        }
        require(sums.nonEmpty, "SummingMergeTree: no numeric non-key columns")
        Seq("mode" -> "summing") ++ keys ++ Seq("sums" -> sums.mkString(","))
      case "CollapsingMergeTree" =>
        require(args.size == 1, s"CollapsingMergeTree(sign): $engine")
        Seq("mode" -> "collapsing") ++ keys ++ Seq("sign" -> args.head)
      case "VersionedCollapsingMergeTree" =>
        require(args.size == 2, s"VersionedCollapsingMergeTree(sign, ver): $engine")
        Seq("mode" -> "collapsing") ++ keys ++
          Seq("sign" -> args.head, "version" -> args(1))
      case "AggregatingMergeTree" => throw new IllegalArgumentException(
        "AggregatingMergeTree's per-column functions live in its column " +
          "types — declare them explicitly via the options face: " +
          "USING mergetree OPTIONS (mode 'aggregating', keys …, aggs 'col:fn,…')")
      case other => throw new IllegalArgumentException(
        s"unsupported ENGINE '$other' — only the MergeTree family maps here")
    }
  }

  /** Table TTL `expr [DELETE]` → the options face's expired-when predicate. */
  private def ttlPredicate(raw0: String): String = {
    val raw = raw0.trim
    val lower = raw.toLowerCase
    Seq("to disk", "to volume", "group by", "where", "recompress").foreach { kw =>
      require(!lower.contains(kw),
        s"TTL … ${kw.toUpperCase} is not supported (plain delete-TTL is)")
    }
    val expr = raw.replaceFirst("(?i)\\s+DELETE\\s*$", "").trim
    require(expr.nonEmpty, "empty TTL expression")
    s"($expr) <= current_timestamp()"
  }

  /** CREATE-time SETTINGS: storage tuning is accepted and ignored, anything
    * that could change SEMANTICS refuses — the query-side SETTINGS posture.
    */
  private val IgnorableCreateSettings = Set(
    "index_granularity", "index_granularity_bytes", "min_bytes_for_wide_part",
    "min_rows_for_wide_part", "merge_with_ttl_timeout", "storage_policy",
    "merge_max_block_size", "ttl_only_drop_parts", "allow_nullable_key")

  private def checkSettings(raw: String): Unit =
    GraftSqlParser.splitTopLevel(raw).map(_.trim).filter(_.nonEmpty).foreach { p =>
      val k = p.takeWhile(_ != '=').trim.toLowerCase
      require(IgnorableCreateSettings.contains(k),
        s"CREATE SETTINGS '$k' could change table semantics and is not " +
          "supported — storage-tuning settings accepted (and ignored): " +
          IgnorableCreateSettings.toSeq.sorted.mkString(", "))
    }

  // -------------------------------------------------- SHOW CREATE (inverse)

  /** ClickHouse-dialect CREATE TABLE text for a persisted tabledef — the
    * INVERSE of [[rewrite]] (`show_create('<dir>')` table function, the
    * engine's system.tables.create_table_query face). Round-trip contract,
    * property-spec-pinned: `rewrite(showCreate(dir))` reproduces the same
    * options the tabledef carries. Lossy by type design, each loss stated:
    * unsigned widths (UInt64 arrived as BIGINT, re-emits Int64); an
    * expired-when TTL that is not the canonical `(e) <= current_timestamp()`
    * shape is emitted as a `-- TTL (predicate): …` comment (ClickHouse
    * cannot spell predicate TTLs); sketch sidecar columns (hll/topk/
    * quantile) have no ClickHouse index type and emit as comments too.
    */
  def showCreate(dir: String): String = {
    import graft.mergetree.ColumnarMergeTree.TableDef
    val d = TableDef.load(dir).getOrElse(throw new IllegalArgumentException(
      s"no mergetree table definition at $dir"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(d.schemaDdl)
    val colLines = schema.fields.map { f =>
      s"  `${f.name}` ${sparkTypeToCh(f.dataType)}" +
        (if (f.nullable) "" else " NOT NULL")
    }
    def idx(kind: String, cols: Option[List[String]], args: String = "") =
      cols.getOrElse(Nil).map(c => s"  INDEX idx_$c `$c` TYPE $kind$args")
    val idxLines =
      idx("bloom_filter", d.bloomFilterColumns) ++
      idx("minmax", d.minmaxColumns) ++
      idx("tokenbf_v1", d.tokenBloomColumns, "(32768, 3, 0)") ++
      idx("ngrambf_v1", d.ngramBloomColumns, "(3, 32768, 3, 0)") ++
      idx("set", d.setIndexColumns, "(100)")
    val mode = TableDef.decodeMode(d.mode)
    import graft.mergetree.MergeMode
    val engine = mode match {
      case MergeMode.Plain => "MergeTree()"
      case r: MergeMode.Replacing =>
        s"ReplacingMergeTree(${Option(r.versionCol).getOrElse("")})"
      case s: MergeMode.Summing =>
        s"SummingMergeTree((${s.sumCols.mkString(", ")}))"
      case c: MergeMode.Collapsing =>
        Option(c.versionCol).filter(_.nonEmpty) match {
          case Some(v) => s"VersionedCollapsingMergeTree(${c.signCol}, $v)"
          case None    => s"CollapsingMergeTree(${c.signCol})"
        }
      case _: MergeMode.Aggregating => "AggregatingMergeTree()"
    }
    val ttlLine = d.ttl.map { t =>
      val canonical = "^\\((.*)\\) <= current_timestamp\\(\\)$".r
      canonical.findFirstMatchIn(t) match {
        case Some(mm) => s"TTL ${mm.group(1)}"
        case None => s"-- TTL (predicate, no ClickHouse spelling): $t"
      }
    }
    val sketchNote = Seq(
      d.hllColumns.map(c => s"uniq: ${c.mkString(",")}"),
      d.topKColumns.map(c => s"topK: ${c.mkString(",")}"),
      d.quantileColumns.map(c => s"quantiles: ${c.mkString(",")}")
    ).flatten match {
      case Nil => None
      case xs => Some(s"-- per-part sketches (no ClickHouse index type): " +
        xs.mkString("; "))
    }
    (Seq(s"CREATE TABLE `$dir` (") ++
      Seq((colLines ++ idxLines).mkString(",\n")) ++
      Seq(s") ENGINE = $engine") ++
      d.partitionBy.map(p => s"PARTITION BY $p") ++
      Seq(s"ORDER BY (${d.orderBy.mkString(", ")})") ++
      d.sampleBy.map(c => s"SAMPLE BY $c") ++
      ttlLine ++ sketchNote).mkString("\n")
  }

  private[graft] def sparkTypeToCh(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case StringType => "String"
      case BooleanType => "Bool"
      case DateType => "Date"
      case TimestampType | TimestampNTZType => "DateTime"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case ArrayType(e, _) => s"Array(${sparkTypeToCh(e)})"
      case MapType(k, v, _) => s"Map(${sparkTypeToCh(k)}, ${sparkTypeToCh(v)})"
      case s: StructType =>
        s"Tuple(${s.fields.map(f => s"${f.name} ${sparkTypeToCh(f.dataType)}")
          .mkString(", ")})"
      case BinaryType => "String"
      case other => throw new IllegalArgumentException(
        s"no ClickHouse spelling for Spark type ${other.sql}")
    }
  }

  // ------------------------------------------------------------- helpers

  /** Index of the ')' matching the '(' at `open` (quote-aware). */
  private def matchParen(s: String, open: Int): Int = {
    require(s.charAt(open) == '(', s"expected '(' at $open in: $s")
    var depth = 0
    var i = open
    var inQ = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ != ' ') { if (c == inQ) inQ = ' ' }
      else c match {
        case '\'' | '"' | '`' => inQ = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses in: $s")
  }

  private def stripTicks(s: String): String = s.replace("`", "")
}
