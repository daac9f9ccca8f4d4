package graft

import org.apache.spark.sql.SparkSession

/** SQL-text entry point: registers the engine's tables as temp views so
  * flagship queries run from plain SQL (`spark.sql(...)` or a spark-sql
  * shell pointed at this library). The DataFrame API stays the primary
  * surface; this makes the same plans reachable from SQL text — the
  * Catalyst parser/analyzer path — which RegistrySpec pins as
  * digest-equivalent to the DataFrame forms for a flagship set.
  *
  * `events` is registered through [[relational.Tables.normalizeEventTs]]
  * so SQL sees the same (ts TIMESTAMP, ts_ns, ts_sec) column contract the
  * DataFrame queries use, whichever physical type the parquet shipped.
  */
object SqlEntry {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  /** Dialect-neutral preprocessing for running the shared oracle texts
    * through Spark. Two rewrites, both pure syntax with identical
    * semantics on both engines:
    *  - strips DuckDB's `AS MATERIALIZED (` CTE hint (pure performance
    *    annotation — `AS (` is semantically identical);
    *  - moves window-function null treatment out of the argument list:
    *    DuckDB spells `first_value(x IGNORE NULLS) OVER w`, Spark spells
    *    `first_value(x) IGNORE NULLS OVER w`. The non-greedy group stops
    *    at the first ` IGNORE NULLS)`, so arbitrary argument expressions
    *    (CASE..END, nested calls) pass through intact; `RESPECT NULLS`
    *    (both engines' default) is handled the same way for symmetry.
    * Everything else must parse as-is (after [[plans.ZipUnnest]]'s plan
    * normalization) or the text is not SQL-path verified.
    */
  def dialectNeutral(sql: String): String =
    sql.replaceAll("(?i)\\bAS\\s+MATERIALIZED\\s*\\(", "AS (")
      .replaceAll("(?i)\\b(first_value|last_value|lag|lead|nth_value|any_value)\\s*\\((.+?) (IGNORE|RESPECT) NULLS\\)",
        "$1($2) $3 NULLS")
      // DuckDB's ordered string aggregate puts ORDER BY inside the
      // argument list; Spark 4 spells the same aggregate listagg(...)
      // WITHIN GROUP (ORDER BY ...). Conservative shapes only: a bare
      // column/identifier argument, a quoted separator literal, and
      // paren-free sort keys — anything fancier keeps failing loudly.
      .replaceAll("(?i)\\bstring_agg\\s*\\(\\s*([^(),]+?),\\s*('[^']*')\\s+ORDER\\s+BY\\s+([^()]+?)\\)",
        "listagg($1, $2) WITHIN GROUP (ORDER BY $3)")

  /** Run `body` with ANSI/DuckDB string-literal semantics scoped to the
    * call: literals keep backslashes literally (without this, Spark's
    * default C-style unescaping silently strips the backslash from regex
    * literals — '\S+' becomes 'S+' — so a regex-bearing query would
    * PARSE on both engines and return different rows). The conf is
    * save/restored in a finally: the parser reads it at parse time
    * (inside `spark.sql`, which parses AND analyzes eagerly), so nothing
    * session-visible leaks — a library expression parsing its own
    * backslash-bearing SQL after this returns sees the session default.
    * Synchronized: the flag is session-global state, and overlapping
    * scopes from two threads could restore each other's transient value.
    */
  private val parserModeLock = new Object
  def withSqlParserMode[A](spark: SparkSession)(body: => A): A =
    parserModeLock.synchronized {
      val key = "spark.sql.parser.escapedStringLiterals"
      val old = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try body
      finally old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

  /** Run a shared oracle text through Spark's SQL entry (views must be
    * registered). Two transformations sit between text and analysis: the
    * hint strip ([[dialectNeutral]]) on the text, and the zipped-unnest
    * normalization ([[plans.ZipUnnest]]) on the PARSED plan — DuckDB's
    * positional zip of SELECT-position generators re-expressed as one
    * Generate, with the text left byte-identical for the DuckDB side.
    * The string-literal dialect is scoped to the parse, never left set
    * on the session.
    */
  def runSql(spark: SparkSession, sql: String): org.apache.spark.sql.DataFrame =
    withSqlParserMode(spark) {
      val parsed = spark.sessionState.sqlParser.parsePlan(dialectNeutral(sql))
      // dialect normalization first (it recurses into CTE definitions), so
      // the fixpoint executor runs already-normalized base/step plans
      val normalized = plans.ZipUnnest.rewrite(parsed)
      org.apache.spark.sql.GraftRegistrar.ofRows(spark,
        plans.RecursiveUnion.run(spark, normalized))
    }

  def registerViews(spark: SparkSession, dir: String): Unit =
      withSqlParserMode(spark) {
    // the literal dialect is scoped to this registration and to each
    // runSql call — never left flipped on the session (a library
    // expression with an embedded backslash literal parsed later must
    // see the session default, not the SQL entry's dialect)
    tableNames.foreach { n =>
      relational.Tables.t(spark, dir, n).createOrReplaceTempView(n)
    }
    relational.Tables.events(spark, dir).createOrReplaceTempView("events")
    // DuckDB-dialect compat: `epoch(ts)` (double seconds). A SQL scalar
    // function, not a UDF — the body inlines during analysis, so it stays
    // inside whole-stage codegen. unix_micros is exact; the double holds
    // micro counts < 2^53 exactly (fine past year 2200).
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION epoch(t TIMESTAMP)
      |RETURNS DOUBLE
      |RETURN CAST(unix_micros(t) AS DOUBLE) / 1000000.0""".stripMargin)
    // `epoch_us(ts)` — DuckDB's exact micros accessor, = unix_micros.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(t TIMESTAMP)
      |RETURNS BIGINT
      |RETURN unix_micros(t)""".stripMargin)
    // `strftime(ts, fmt)` — DuckDB's C-style formatter, translated to
    // java.time patterns for the directives the oracles use (%Y %m %d
    // %H %M %S). Formats outside that subset raise instead of silently
    // diverging: java.time treats bare letters as pattern directives
    // where DuckDB treats them as literals, so passing an untranslated
    // format through would format a DIFFERENT field, not error. Same
    // inlined-SQL-function mechanics as epoch().
    // `len(arr)` — DuckDB's list length (= length(list)); Spark's builtin
    // `len` is a string-length alias that rejects arrays, so rebind the
    // name session-locally to size()+BIGINT (DuckDB's result type). Pure
    // catalyst expressions — stays inside whole-stage codegen.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "len",
      exprs => org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Size(exprs.head),
        org.apache.spark.sql.types.LongType),
      "scala_udf")
    // `xor(a, b)` — DuckDB's bitwise-xor function (its `^` is POWER);
    // Spark's `^` is bitwise xor.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |xor(a BIGINT, b BIGINT) RETURNS BIGINT
      |RETURN a ^ b""".stripMargin)
    // `strlen(s)` — DuckDB's byte length of a VARCHAR; Spark's
    // octet_length counts the same UTF-8 bytes.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |strlen(s STRING) RETURNS BIGINT
      |RETURN CAST(octet_length(s) AS BIGINT)""".stripMargin)
    // `sha256(s)` — DuckDB's hex-string SHA-256 over the UTF-8 bytes;
    // sha2(s, 256) emits the same lowercase hex in Spark.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |sha256(s STRING) RETURNS STRING
      |RETURN sha2(s, 256)""".stripMargin)
    // `string_split(s, sep)` — DuckDB's literal-separator split; Spark's
    // split() takes a regex, so the separator is \Q..\E-quoted. Both
    // engines keep empty fields between adjacent separators. Bound as a
    // NATIVE expression (not a SQL UDF): Spark refuses SQL functions
    // inside Generate, and the dominant dialect shape is
    // unnest(string_split(text, ' ')).
    locally {
      import org.apache.spark.sql.catalyst.expressions._
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "string_split",
        exprs => StringSplit(exprs(0),
          Concat(Seq(Literal("\\Q"), exprs(1), Literal("\\E"))),
          Literal(-1)),
        "scala_udf")
      // regexp_split_to_array(s, p) — DuckDB's REGEX-separator split;
      // Spark's split() is already regex-separated with the same
      // keep-empty-fields contract, so this is the unquoted sibling of
      // string_split above.
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "regexp_split_to_array",
        exprs => StringSplit(exprs(0), exprs(1), Literal(-1)),
        "scala_udf")
    }
    // `regexp_matches(s, p)` — DuckDB's partial-match regex predicate;
    // Spark's RLIKE has identical partial-match semantics. Bound as a
    // NATIVE expression (not a SQL scalar function): SQL-function bodies
    // inline through a one-row subplan and cannot capture a lambda
    // variable, so the dominant `list_filter(ws, x -> regexp_matches(x,
    // p))` shape only resolves with a real expression.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "regexp_matches",
      exprs => org.apache.spark.sql.catalyst.expressions.RLike(
        exprs(0), exprs(1)),
      "scala_udf")
    // `json_extract_string(j, p)` — DuckDB's string-typed JSON path
    // accessor; get_json_object shares the '$.field' path dialect and
    // the NULL-on-missing contract.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |json_extract_string(j STRING, p STRING) RETURNS STRING
      |RETURN get_json_object(j, p)""".stripMargin)
    // `unnest(arr)` — DuckDB's SELECT-position list unnest ≡ Spark's
    // explode generator: one output row per element, other select items
    // repeated, zero rows for NULL/empty lists on both engines. Bound
    // through the expression registry (a SQL scalar function cannot
    // change row cardinality); Spark's single-generator-per-SELECT rule
    // and no-nesting rule still apply, so the zip-style multi-unnest and
    // unnest-inside-CAST dialects keep failing (and stay justified
    // skips) rather than silently diverging.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unnest",
      exprs => org.apache.spark.sql.catalyst.expressions.Explode(exprs.head),
      "scala_udf")
    // `regexp_full_match(s, p)` — DuckDB's whole-string regex predicate;
    // anchoring the pattern gives RLIKE the same semantics. Native for the
    // same lambda-capture reason as regexp_matches above.
    locally {
      import org.apache.spark.sql.catalyst.expressions._
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "regexp_full_match",
        exprs => RLike(exprs(0),
          Concat(Seq(Literal("^(?:"), exprs(1), Literal(")$")))),
        "scala_udf")
    }
    // DuckDB's SCALAR list builders and list_* lambda family, bound as
    // native expressions so they compose inside generators and lambdas:
    //  - range(n) / range(a, b): the half-open [a, b) integer list (the
    //    TABLE-position range(...) is Spark's own TVF and agrees);
    //  - generate_series(a, b): the inclusive [a, b] list;
    //  - list_filter(arr, x -> p): Spark's filter (same lambda syntax);
    //  - list_sum(arr): sum of elements, NULL for empty/NULL lists
    //    (DuckDB's documented behavior — an unguarded fold returns 0).
    // Empty ranges need the explicit guard: Spark's sequence(a, b)
    // auto-descends when b < a where DuckDB returns [].
    locally {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.types.{ArrayType, LongType}
      def L(e: Expression) = Cast(e, LongType)
      def emptyLongs =
        Literal.create(Array.empty[Long], ArrayType(LongType, false))
      def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "range",
        exprs => {
          val (a, b) = exprs match {
            case Seq(n) => (Literal(0L), L(n))
            case Seq(x, y) => (L(x), L(y))
            case other => throw new IllegalArgumentException(
              s"range shim: expected 1 or 2 args, got ${other.size}")
          }
          If(LessThanOrEqual(b, a), emptyLongs,
            new Sequence(a, Subtract(b, Literal(1L)), None))
        },
        "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "generate_series",
        exprs => {
          // arity-checked like the range shim: DuckDB's 1-arg and 3-arg
          // (step) forms fail with a clean diagnosable error, not a raw
          // IndexOutOfBoundsException
          val (a, b) = exprs match {
            case Seq(x, y) => (L(x), L(y))
            case other => throw new IllegalArgumentException(
              s"generate_series shim: expected 2 args, got ${other.size}")
          }
          If(LessThan(b, a), emptyLongs, new Sequence(a, b, None))
        },
        "scala_udf")
      // array_to_string(arr, sep) ≡ Spark's array_join
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "array_to_string",
        exprs => ArrayJoin(exprs(0), exprs(1), None),
        "scala_udf")
      // list_value(...) ≡ array(...): the function spelling of DuckDB's
      // [..] list literal (the bracket syntax itself has no Spark parse)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "list_value",
        exprs => CreateArray(exprs),
        "scala_udf")
      // list_extract(arr, i) — 1-based element access on BOTH engines
      // (Spark's element_at shares DuckDB's 1-based contract; the
      // bracket index arr[i] does NOT — it is 0-based in Spark)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "list_extract",
        exprs => ElementAt(exprs(0), exprs(1)),
        "scala_udf")
      // list_slice(arr, a, b) — DuckDB's 1-based INCLUSIVE-both-ends
      // slice; Spark's slice(arr, start, length) with length b−a+1.
      // Callers must keep a ≤ b ≤ len (Spark errors on non-positive
      // length where DuckDB clamps — the dialect texts satisfy this).
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "list_slice",
        exprs => Slice(exprs(0), Cast(exprs(1),
            org.apache.spark.sql.types.IntegerType),
          Cast(Add(Subtract(exprs(2), exprs(1)), Literal(1)),
            org.apache.spark.sql.types.IntegerType)),
        "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "list_filter",
        exprs => ArrayFilter(exprs(0), exprs(1)),
        "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "list_transform",
        exprs => ArrayTransform(exprs(0), exprs(1)),
        "scala_udf")
      // list_reduce(arr, (acc, x) -> e) — DuckDB's no-initial-value fold:
      // seeded with the FIRST element, folded over the rest. Spark's
      // aggregate() needs an explicit zero, so the shim slices: zero =
      // element_at(arr, 1) (NULL for an empty list, where DuckDB errors —
      // lenient is fine for the dialect entry), fold over slice(arr, 2,
      // max(n-1, 0)). The parsed two-parameter lambda IS aggregate()'s
      // merge shape; finish is identity.
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "list_reduce",
        exprs => ArrayAggregate(
          Slice(exprs(0), Literal(2),
            Greatest(Seq(Subtract(Size(exprs(0)), Literal(1)), Literal(0)))),
          ElementAt(exprs(0), Literal(1), None, failOnError = false),
          exprs(1),
          LambdaFunction(lv("acc"), Seq(lv("acc")))),
        "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "list_sum",
        exprs => If(EqualTo(Size(exprs.head), Literal(0)),
          Literal.create(null, LongType),
          ArrayAggregate(exprs.head, Literal(0L),
            LambdaFunction(Add(lv("acc"), Cast(lv("x"), LongType)),
              Seq(lv("acc"), lv("x"))),
            LambdaFunction(lv("acc"), Seq(lv("acc"))))),
        "scala_udf")
    }
    // DuckDB regex-function dialect, bound as native expressions:
    //  - regexp_extract_all(s, p): TWO-arg form returns FULL matches
    //    (group 0) on DuckDB where Spark's builtin defaults the group
    //    index to 1 (erroring on group-free patterns); the 3-arg form is
    //    identical on both engines and passes through.
    //  - regexp_replace(s, p, r, 'g'): DuckDB's global-replace option
    //    string. Spark's regexp_replace is ALWAYS global, so 'g' maps to
    //    the plain 3-arg expression; any other option string raises (and
    //    Spark's own integer-position 4th arg keeps working). DuckDB's
    //    optionless form replaces the FIRST match only — shared texts
    //    must spell 'g' when they mean global; the RegistrySpec
    //    SQL≡DataFrame divergence sweep catches a missed one.
    locally {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.types.StringType
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "regexp_extract_all",
        exprs => exprs match {
          case Seq(s, p) => RegExpExtractAll(s, p, Literal(0))
          case Seq(s, p, i) => RegExpExtractAll(s, p, i)
          case other => throw new IllegalArgumentException(
            s"regexp_extract_all shim: expected 2 or 3 args, got ${other.size}")
        },
        "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "regexp_replace",
        exprs => exprs match {
          case Seq(s, p, r) => RegExpReplace(s, p, r)
          case Seq(s, p, r, l @ Literal(_, StringType)) =>
            if (l.value != null && l.value.toString == "g") RegExpReplace(s, p, r)
            else throw new IllegalArgumentException(
              s"regexp_replace shim: unsupported option string $l (only 'g')")
          case Seq(s, p, r, pos) => RegExpReplace(s, p, r, pos)
          case other => throw new IllegalArgumentException(
            s"regexp_replace shim: expected 3 or 4 args, got ${other.size}")
        },
        "scala_udf")
    }
    // `strptime(s, f)` — DuckDB's C-style timestamp parse; the inverse of
    // the strftime shim below, with the same guarded directive subset.
    // Single-letter java.time parse patterns accept 1–2 digits, matching
    // strptime's lenient %d/%m/%H/%M/%S; both engines error on text that
    // does not match the format.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |strptime(s STRING, f STRING) RETURNS TIMESTAMP
      |RETURN CASE
      |  WHEN f NOT RLIKE '^([-:/ .]|%[YmdHMS])*$' THEN
      |    CAST(raise_error(concat('strptime shim supports only %Y %m %d ',
      |      '%H %M %S with -:/. separators, got: ', f)) AS TIMESTAMP)
      |  ELSE to_timestamp(s,
      |    replace(replace(replace(replace(replace(replace(f,
      |      '%Y', 'yyyy'), '%m', 'M'), '%d', 'd'),
      |      '%H', 'H'), '%M', 'm'), '%S', 's'))
      |END""".stripMargin)
    // `nfc_normalize(s)` — DuckDB builtin; bound to the library's native
    // codegen expression (functions/NfcNormalize.scala), not a UDF, so
    // SQL text hits the same compiled kernel as the DataFrame path.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => functions.NfcNormalize(exprs.head),
      "scala_udf")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
      |strftime(t TIMESTAMP, f STRING) RETURNS STRING
      |RETURN CASE
      |  WHEN f NOT RLIKE '^([-:/ .]|%[YmdHMS])*$' THEN
      |    raise_error(concat('strftime shim supports only %Y %m %d %H ',
      |      '%M %S with -:/. separators, got: ', f))
      |  ELSE date_format(t,
      |    replace(replace(replace(replace(replace(replace(f,
      |      '%Y', 'yyyy'), '%m', 'MM'), '%d', 'dd'),
      |      '%H', 'HH'), '%M', 'mm'), '%S', 'ss'))
      |END""".stripMargin)
  }
}
