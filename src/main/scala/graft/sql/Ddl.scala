package graft.sql

import org.apache.spark.sql.types.{DataType, StructType}

/** Arroyo-flavored DDL front-end.
  *
  * The reference accepts only SQL: `CREATE TABLE name (cols…) WITH
  * (connector = '…', format = '…', …)` plus `WATERMARK FOR col AS (expr)`
  * and `event_time_field` options (crates/arroyo-planner/src/tables.rs:
  * 360-420, 771+). Spark SQL DDL can't express connector options +
  * watermarks, so this small hand-rolled parser handles the statement shape
  * and hands everything else (types, queries) to Spark's own parsers.
  */
object Ddl {

  /** One column: name + Spark-normalized type DDL, or a virtual/generated
    * column (reference FieldSpec::Virtual, tables.rs:103-110).
    * `primaryKey` marks `PRIMARY KEY` columns — debezium sources merge
    * their CDC stream by these (reference updating semantics).
    */
  final case class ColumnDef(name: String, sqlType: String, virtualExpr: Option[String],
      primaryKey: Boolean = false, metadataFrom: Option[String] = None) {
    def ddl: String = s"`$name` $sqlType"
  }

  /** A connector table registered in the catalog (reference
    * Table::ConnectorTable, tables.rs:66-85).
    */
  final case class ConnectorTable(
      name: String,
      columns: Seq[ColumnDef],
      options: Map[String, String],
      eventTimeField: Option[String],
      watermarkDelay: Option[String]) {
    def connector: String = options.getOrElse("connector", "filesystem")
    def format: String = options.getOrElse("format", "parquet")
    def path: Option[String] = options.get("path")
    def isSink: Boolean = options.get("type").contains("sink")
    def pkColumns: Seq[String] = columns.filter(_.primaryKey).map(_.name)
    def schema: StructType =
      StructType.fromDDL(columns.filter(_.virtualExpr.isEmpty).map(_.ddl).mkString(", "))

    /** Columns decoded from the payload: declared minus virtual minus
      * `METADATA FROM` (metadata comes from the connector envelope, not
      * the serialized value — kafka_metadata_udf.sql).
      */
    def payloadSchema: StructType =
      StructType.fromDDL(columns.filter(c =>
        c.virtualExpr.isEmpty && c.metadataFrom.isEmpty).map(_.ddl).mkString(", "))
  }

  private val CreateTableRe =
    """(?is)^\s*CREATE\s+(TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*(\(.*\))?\s*WITH\s*\((.*)\)\s*$""".r
  /** `CREATE TABLE name (cols)` with no WITH clause — a memory table
    * (reference Table::MemoryTable: one INSERT materializes it).
    */
  private val CreateTableMemRe =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)\s*$""".r
  /** `CREATE TABLE name AS (query)` — the reference's in-pipeline named
    * sub-plan (create_table_updating.sql); equivalent to a view here.
    */
  private val CreateTableAsRe =
    """(?is)^\s*CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(.*)$""".r
  private val InsertRe =
    """(?is)^\s*INSERT\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)\s+(.*)$""".r
  private val CreateViewRe =
    """(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?VIEW\s+([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(.*)$""".r

  sealed trait Stmt
  final case class CreateTbl(table: ConnectorTable) extends Stmt
  final case class CreateView(name: String, query: String) extends Stmt
  final case class Insert(sink: String, query: String) extends Stmt
  final case class Query(query: String) extends Stmt
  /** `SET key = value` — the reference supports only `SET updating_ttl`
    * (crates/arroyo-planner/src/lib.rs:790-819).
    */
  final case class SetOption(key: String, value: String) extends Stmt
  /** `OPTIMIZE t [ZORDER BY (c1, …)]` / `VACUUM t [RETAIN n HOURS]` —
    * table maintenance verbs for delta (r8) and iceberg (r9:
    * rewrite_data_files / expire_snapshots) connector tables. ZORDER BY
    * re-clusters every active file along the Morton curve of the named
    * columns (r9, [[graft.operators.ZOrder]]).
    */
  final case class Maintain(op: String, table: String,
      retainHours: Option[Long], zorderBy: Seq[String] = Seq.empty) extends Stmt

  /** `DELETE FROM t [WHERE pred]` / `UPDATE t SET c = expr, … [WHERE
    * pred]` — copy-on-write DML verbs for delta and iceberg connector
    * tables (r10): only the files holding matching rows are rewritten,
    * as one atomic remove+add version / overwrite snapshot.
    * `op` ∈ {"delete", "update"}; `sets` empty for delete.
    */
  final case class Dml(op: String, table: String, where: Option[String],
      sets: Seq[(String, String)] = Seq.empty) extends Stmt

  /** `MERGE INTO t [AS ta] USING (src | (subquery)) [AS sa] ON cond
    * WHEN MATCHED [AND c] THEN UPDATE SET … | DELETE
    * WHEN NOT MATCHED [BY TARGET] [AND c] THEN INSERT (cols) VALUES (exprs) | INSERT *
    * WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … | DELETE`
    * — copy-on-write upsert for delta and iceberg connector tables
    * (r10). `matched`/`notBySource` keep statement order (first holding
    * clause wins within each family); `insert` None = no NOT MATCHED
    * clause, empty sets = `INSERT *`.
    */
  final case class MergeInto(target: String, targetAlias: String,
      sourceSql: Either[String, String], // Left = table name, Right = subquery
      sourceAlias: String, cond: String,
      matched: Seq[(Option[String], Either[Seq[(String, String)], Unit])],
      insert: Option[(Option[String], Seq[(String, String)])],
      notBySource: Seq[(Option[String], Either[Seq[(String, String)], Unit])] =
        Seq.empty) extends Stmt

  /** `ALTER TABLE t ADD COLUMN[S] (name type, …)` — append-only schema
    * evolution for delta and iceberg connector tables (r10): nullable
    * columns appended to the table schema as a metaData-only commit /
    * schemas-history entry; existing files read them as null.
    */
  final case class AlterAdd(table: String, cols: Seq[ColumnDef]) extends Stmt

  /** `ALTER TABLE t SET TBLPROPERTIES ('k' = 'v', …)` — table
    * properties as a metaData-only commit (r11; delta tables only —
    * how `delta.enableChangeDataFeed` lands on an EXISTING table).
    */
  final case class AlterSetProps(table: String,
      props: Map[String, String]) extends Stmt

  /** `ALTER TABLE t RENAME COLUMN a TO b` — a metaData-only logical
    * rename (r15): delta requires column mapping (the physicalName/id
    * binding is what keeps existing files resolving); iceberg renames
    * by field id through a schema-history entry.
    */
  final case class AlterRename(table: String, from: String,
      to: String) extends Stmt

  /** `ALTER TABLE t DROP COLUMN[S] a [, b …]` — a metaData-only drop
    * (r15): the field leaves the schema, its physical data stays in
    * existing files until a rewrite purges it.
    */
  final case class AlterDrop(table: String, cols: Seq[String]) extends Stmt

  private val SetRe = """(?is)^\s*SET\s+([A-Za-z_][A-Za-z0-9_.]*)\s*=\s*(.+?)\s*$""".r
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*$""".r
  private val AlterAddRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+COLUMNS?\s+(.+?)\s*$""".r
  private val AlterSetPropsRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+TBLPROPERTIES\s*\((.*)\)\s*$""".r
  private val AlterRenameRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+RENAME\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_.]*)\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)\s*$""".r
  private val AlterDropRe =
    """(?is)^\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+DROP\s+COLUMNS?\s+(.+?)\s*$""".r
  private val MergeHeadRe =
    """(?is)^\s*MERGE\s+INTO\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+AS\s+([A-Za-z_][A-Za-z0-9_]*))?\s+USING\s+(.+)$""".r

  /** Parse the tail of a MERGE statement after USING. */
  private def parseMerge(target: String, tAlias: String, rest0: String): MergeInto = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"MERGE INTO $target: $msg")
    var rest = rest0.trim
    // source: (subquery) or table name
    val source: Either[String, String] =
      if (rest.startsWith("(")) {
        var depth = 0; var inS = false; var i = 0; var end = -1
        while (i < rest.length && end < 0) {
          val c = rest.charAt(i)
          if (c == '\'') inS = !inS
          else if (!inS && c == '(') depth += 1
          else if (!inS && c == ')') { depth -= 1; if (depth == 0) end = i }
          i += 1
        }
        if (end < 0) bad("unbalanced parens in USING source")
        val q = rest.substring(1, end).trim
        rest = rest.substring(end + 1).trim
        Right(q)
      } else {
        val m = """^([A-Za-z_][A-Za-z0-9_]*)""".r.findFirstMatchIn(rest)
          .getOrElse(bad("expected a table name or (subquery) after USING"))
        rest = rest.substring(m.end).trim
        Left(m.group(1))
      }
    // optional [AS] alias
    val aliasRe = """(?is)^(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s+(?=ON\b)""".r
    val sAlias = aliasRe.findFirstMatchIn(rest) match {
      case Some(m) => rest = rest.substring(m.end).trim; Some(m.group(1))
      case None => None
    }
    if (!rest.matches("(?is)^ON\\b.*"))
      bad("expected ON <condition> after the USING source")
    rest = rest.replaceFirst("(?is)^ON\\s*", "")
    val (cond, clausesTail) = splitAtKeyword(rest, "WHEN")
    if (cond.isEmpty) bad("empty ON condition")
    val clauses = scala.collection.mutable.ArrayBuffer.empty[String]
    var tail = clausesTail
    while (tail.isDefined) {
      val (clause, next) = splitAtKeyword(tail.get, "WHEN")
      clauses += clause
      tail = next
    }
    if (clauses.isEmpty) bad("at least one WHEN clause is required")
    val matched = scala.collection.mutable.ArrayBuffer
      .empty[(Option[String], Either[Seq[(String, String)], Unit])]
    val notBySource = scala.collection.mutable.ArrayBuffer
      .empty[(Option[String], Either[Seq[(String, String)], Unit])]
    var insert: Option[(Option[String], Seq[(String, String)])] = None
    def parseSets(s: String): Seq[(String, String)] =
      splitTop(s, ',').map(_.trim).filter(_.nonEmpty).map { a =>
        a.split("=", 2) match {
          case Array(c, e) if c.trim.matches(
              "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*") && e.trim.nonEmpty =>
            (c.trim, e.trim)
          case _ => bad(s"malformed SET assignment '$a' (expected col = expr)")
        }
      }
    // Tokenizer-based clause parse (r11): the clause's THEN is found by
    // the SAME top-level scanner that split the WHEN clauses (paren /
    // quote / backquote / CASE-depth aware), so a THEN nested inside a
    // subquery, function call, string literal or CASE expression in the
    // clause's AND-condition can never mis-split — the lazy
    // `AND (.+?) THEN` regexes this replaces matched the FIRST textual
    // THEN regardless of nesting.
    clauses.foreach { clause0 =>
      val clause = clause0.trim
      val thenAt = topLevelKeyword(clause, "THEN")
      if (thenAt < 0)
        bad(s"cannot parse WHEN clause (no top-level THEN): 'WHEN $clause'")
      val head = clause.substring(0, thenAt).trim
      val action = clause.substring(thenAt + "THEN".length).trim
      // clause family: longest prefix first, word-bounded
      val families = Seq(
        "NOT MATCHED BY SOURCE" -> "source",
        "NOT MATCHED BY TARGET" -> "insert",
        "NOT MATCHED" -> "insert",
        "MATCHED" -> "matched")
      val (prefix, family) = families.find { case (p, _) =>
        head.matches("(?is)^" + p.replace(" ", "\\s+") + "(\\s.*|$)")
      }.getOrElse(bad(s"cannot parse WHEN clause: 'WHEN $clause'"))
      val rest = ("(?is)^" + prefix.replace(" ", "\\s+")).r
        .replaceFirstIn(head, "").trim
      val and: Option[String] =
        if (rest.isEmpty) None
        else if (rest.matches("(?is)^AND\\s.*")) {
          val c = rest.replaceFirst("(?is)^AND\\s+", "").trim
          if (c.isEmpty) bad(s"empty AND condition in 'WHEN $clause'")
          Some(c)
        } else bad(s"expected AND <condition> or THEN after $prefix, " +
          s"got '$rest'")
      val UpdateAct = """(?is)^UPDATE\s+SET\s+(.+)$""".r
      val InsertAct = """(?is)^INSERT\s+(.+)$""".r
      (family, action) match {
        case ("matched", UpdateAct(sets)) =>
          matched += ((and, Left(parseSets(sets))))
        case ("matched", a) if a.matches("(?is)^DELETE$") =>
          matched += ((and, Right(())))
        case ("matched", a) =>
          bad(s"WHEN MATCHED supports UPDATE SET … or DELETE, got '$a'")
        case ("source", UpdateAct(sets)) =>
          notBySource += ((and, Left(parseSets(sets))))
        case ("source", a) if a.matches("(?is)^DELETE$") =>
          notBySource += ((and, Right(())))
        case ("source", a) =>
          bad(s"WHEN NOT MATCHED BY SOURCE supports UPDATE SET … or " +
            s"DELETE, got '$a'")
        case ("insert", InsertAct(body0)) =>
          if (insert.isDefined) bad("at most one WHEN NOT MATCHED clause")
          val body = body0.trim
          val sets: Seq[(String, String)] =
            if (body == "*") Seq.empty
            else {
              val ColsVals =
                """(?is)^\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*$""".r
              body match {
                case ColsVals(cols, vals) =>
                  val cs = splitTop(cols, ',').map(_.trim).filter(_.nonEmpty)
                  val vs = splitTop(vals, ',').map(_.trim).filter(_.nonEmpty)
                  if (cs.size != vs.size)
                    bad(s"INSERT has ${cs.size} columns but ${vs.size} values")
                  if (cs.isEmpty) bad("INSERT needs at least one column")
                  cs.zip(vs)
                case _ => bad(
                  "expected INSERT * or INSERT (cols) VALUES (exprs)")
              }
            }
          insert = Some((and, sets))
        case ("insert", a) =>
          bad(s"WHEN NOT MATCHED supports only INSERT, got '$a'")
        case _ => bad(s"cannot parse WHEN clause: 'WHEN $clause'")
      }
    }
    if (matched.isEmpty && insert.isEmpty && notBySource.isEmpty)
      bad("no actionable WHEN clause")
    MergeInto(target, if (tAlias == null) target else tAlias,
      source, sAlias.getOrElse(source.left.toOption.getOrElse(
        bad("a (subquery) source needs an alias: USING (…) AS s"))),
      cond, matched.toSeq, insert, notBySource.toSeq)
  }
  private val DeleteRe =
    """(?is)^\s*DELETE\s+FROM\s+([A-Za-z_][A-Za-z0-9_]*)(\s+WHERE\s+.+)?\s*$""".r
  private val UpdateRe =
    """(?is)^\s*UPDATE\s+([A-Za-z_][A-Za-z0-9_]*)\s+SET\s+(.+)$""".r

  /** Index of the first top-level (outside quotes/backquotes/parens/
    * CASE…END) occurrence of keyword `kw` in `body`, from `from`; -1
    * when absent. Word-bounded. CASE expressions nest their own
    * WHEN/THEN/ELSE keywords, so the scanner tracks CASE depth like
    * paren depth — a `CASE WHEN s.x > 0 THEN … END` inside a MERGE
    * clause must not split the statement's WHEN clauses; nor may a
    * backquoted identifier like `` `then` `` look like a keyword.
    */
  private def topLevelKeyword(body: String, kw: String, from: Int = 0): Int = {
    def word(at: Int, w: String): Boolean =
      body.regionMatches(true, at, w, 0, w.length) &&
        (at == 0 || { val p = body.charAt(at - 1)
          !Character.isLetterOrDigit(p) && p != '_' }) &&
        (at + w.length >= body.length || { val n = body.charAt(at + w.length)
          !Character.isLetterOrDigit(n) && n != '_' })
    var depth = 0
    var caseDepth = 0
    var inS = false
    var inBq = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (!inBq && c == '\'') inS = !inS
      else if (!inS && c == '`') inBq = !inBq
      else if (!inS && !inBq && c == '(') depth += 1
      else if (!inS && !inBq && c == ')') depth -= 1
      else if (!inS && !inBq && (c == 'c' || c == 'C') && word(i, "CASE")) caseDepth += 1
      else if (!inS && !inBq && caseDepth > 0 && (c == 'e' || c == 'E') &&
        word(i, "END")) caseDepth -= 1
      else if (i >= from && !inS && !inBq && depth == 0 && caseDepth == 0 &&
        Character.toUpperCase(c) == kw.charAt(0) && word(i, kw))
        return i
      i += 1
    }
    -1
  }

  /** Split `body` at its first top-level keyword `kw`:
    * (before, Some(after)) — or (body, None) when there is none.
    */
  private def splitAtKeyword(body: String, kw: String): (String, Option[String]) =
    topLevelKeyword(body, kw) match {
      case -1 => (body.trim, None)
      case i => (body.substring(0, i).trim,
        Some(body.substring(i + kw.length).trim).filter(_.nonEmpty))
    }

  private def splitAtWhere(body: String): (String, Option[String]) =
    splitAtKeyword(body, "WHERE")

  /** Split a script into statements on top-level semicolons. Quote-aware
    * AND comment-aware in one scanner pass: a `;` or `'` inside a `--` line
    * comment neither splits the statement nor flips the in-string state.
    */
  def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inS = false // inside 'string'
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      if (!inS && c == '-' && i + 1 < script.length && script.charAt(i + 1) == '-') {
        while (i < script.length && script.charAt(i) != '\n') i += 1 // drop comment
      } else {
        c match {
          case '\'' => inS = !inS; cur += c
          case ';' if !inS => out += cur.toString; cur.clear()
          case _ => cur += c
        }
        i += 1
      }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def parse(statement: String): Stmt = statement match {
    case CreateTableRe(temp, name, cols, opts) =>
      val options0 = parseOptions(opts)
      // reference tables.rs:286-290: TEMPORARY tables are the lookup-table
      // syntax — type defaults to 'lookup' and must not be anything else
      val options =
        if (temp == null) options0
        else options0.get("type") match {
          case Some(t) if t != "lookup" => throw new IllegalArgumentException(
            s"Cannot have a temporary table with type '$t'; temporary tables must be type 'lookup'")
          case _ => options0 + ("type" -> "lookup")
        }
      val (columns, wmField, wmDelay) =
        if (cols == null || cols.trim.isEmpty) (Seq.empty[ColumnDef], None, None)
        else parseColumns(cols.trim.stripPrefix("(").stripSuffix(")"))
      val et = options.get("event_time_field").orElse(wmField)
      val delay = options.get("watermark_delay").orElse(wmDelay)
      CreateTbl(ConnectorTable(name, columns, options, et, delay))
    case CreateTableAsRe(name, q) =>
      val body = q.trim
      val unwrapped =
        if (body.startsWith("(") && body.endsWith(")")) body.substring(1, body.length - 1)
        else body
      CreateView(name, unwrapped)
    case CreateTableMemRe(name, cols) =>
      val (columns, _, _) = parseColumns(cols)
      CreateTbl(ConnectorTable(name, columns, Map("connector" -> "memory_table"), None, None))
    case CreateViewRe(name, q) => CreateView(name, q)
    case InsertRe(sink, q) => Insert(sink, q)
    case SetRe(k, v) => SetOption(k.toLowerCase, v.stripPrefix("'").stripSuffix("'"))
    case OptimizeRe(name, zcols) => Maintain("optimize", name, None,
      Option(zcols).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty))
    case VacuumRe(name, hours) =>
      Maintain("vacuum", name, Option(hours).map(_.toLong))
    case MergeHeadRe(name, alias, rest) => parseMerge(name, alias, rest)
    case AlterSetPropsRe(name, propsStr) =>
      // keys stay CASE-SENSITIVE ('delta.enableChangeDataFeed'), unlike
      // the lowercased WITH-options path
      val props = splitTop(propsStr, ',').flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            Some(k.trim.stripPrefix("'").stripSuffix("'") ->
              v.trim.stripPrefix("'").stripSuffix("'"))
          case _ => None
        }
      }.toMap
      if (props.isEmpty) throw new IllegalArgumentException(
        s"ALTER TABLE $name SET TBLPROPERTIES: no properties")
      AlterSetProps(name, props)
    case AlterRenameRe(name, from, to) =>
      AlterRename(name, from, to)
    case AlterDropRe(name, colsStr) =>
      val body = colsStr.trim
      val unwrapped =
        if (body.startsWith("(") && body.endsWith(")")) body.substring(1, body.length - 1)
        else body
      val cols = splitTop(unwrapped, ',').map(_.trim).filter(_.nonEmpty)
      if (cols.isEmpty) throw new IllegalArgumentException(
        s"ALTER TABLE $name DROP COLUMNS: no columns")
      cols.foreach(c =>
        if (!c.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*"))
          throw new IllegalArgumentException(
            s"ALTER TABLE $name DROP COLUMNS: malformed column name '$c'"))
      AlterDrop(name, cols)
    case AlterAddRe(name, colsStr) =>
      val body = colsStr.trim
      val unwrapped =
        if (body.startsWith("(") && body.endsWith(")")) body.substring(1, body.length - 1)
        else body
      // dotted names are NESTED adds (`s.z BIGINT` — r16), legal ONLY
      // here (never in CREATE TABLE), so they parse before the shared
      // column parser sees them
      val DottedColRe = """(?is)^\s*([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)+)\s+(.+?)\s*$""".r
      val (dottedStrs, plainStrs) = splitTop(unwrapped, ',')
        .partition(e => DottedColRe.findFirstIn(e).isDefined)
      val dotted = dottedStrs.map {
        case DottedColRe(n, tpe) => ColumnDef(n, normalizeType(tpe), None)
        case other => throw new IllegalArgumentException(
          s"cannot parse column def: '$other'")
      }
      val (plain, _, _) =
        if (plainStrs.isEmpty) (Seq.empty[ColumnDef], None, None)
        else parseColumns(plainStrs.mkString(", "))
      val cols = plain ++ dotted
      if (cols.isEmpty) throw new IllegalArgumentException(
        s"ALTER TABLE $name ADD COLUMNS: no columns")
      if (cols.exists(_.virtualExpr.isDefined)) throw new IllegalArgumentException(
        s"ALTER TABLE $name ADD COLUMNS: generated columns are not supported here")
      AlterAdd(name, cols)
    case DeleteRe(name, whereTail) =>
      val where = Option(whereTail)
        .map(_.trim.replaceFirst("(?is)^WHERE\\s+", "").trim)
        .filter(_.nonEmpty)
      Dml("delete", name, where)
    case UpdateRe(name, body) =>
      val (setsStr, where) = splitAtWhere(body)
      val sets = splitTop(setsStr, ',').map(_.trim).filter(_.nonEmpty).map { a =>
        a.split("=", 2) match {
          case Array(c, e) if c.trim.matches(
              "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*") && e.trim.nonEmpty =>
            (c.trim, e.trim)
          case _ => throw new IllegalArgumentException(
            s"UPDATE $name: malformed SET assignment '$a' (expected col = expr)")
        }
      }
      if (sets.isEmpty) throw new IllegalArgumentException(
        s"UPDATE $name: no SET assignments")
      Dml("update", name, where, sets)
    case q => Query(q)
  }

  /** True if the statement has `kw` at paren-depth 0 (top level). */
  def hasTopLevel(q: String, kw: String): Boolean = {
    val re = s"(?i)\\b${kw.replace(" ", "\\s+")}\\b".r
    var depth = 0
    var inS = false
    val depths = q.map { c =>
      if (c == '\'') inS = !inS
      else if (!inS && c == '(') depth += 1
      else if (!inS && c == ')') depth -= 1
      depth
    }
    re.findAllMatchIn(q).exists(m => depths(m.start) == 0)
  }

  /** Parse `k = 'v', k2 = 'v2'` WITH-options. Keys may be quoted (the
    * reference quotes dotted keys like 'avro.confluent_schema_registry').
    */
  def parseOptions(s: String): Map[String, String] =
    splitTop(s, ',').flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          Some(k.trim.stripPrefix("'").stripSuffix("'").toLowerCase ->
            v.trim.stripPrefix("'").stripSuffix("'"))
        case _ => None
      }
    }.toMap

  /** Parse the column list; extracts WATERMARK FOR clause and virtual
    * columns (`name type GENERATED ALWAYS AS (expr)` / `AS (expr)`).
    * Returns (columns, watermarkField, watermarkDelay).
    */
  def parseColumns(s: String): (Seq[ColumnDef], Option[String], Option[String]) = {
    var wmField: Option[String] = None
    var wmDelay: Option[String] = None
    val WatermarkRe =
      """(?is)^\s*WATERMARK\s+FOR\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+AS\s+.*?(?:INTERVAL\s+'([^']+)'(?:\s+(\w+))?).*)?$""".r
    val VirtualRe =
      """(?is)^\s*([A-Za-z_][A-Za-z0-9_]*)\s+(.+?)\s+(?:GENERATED\s+ALWAYS\s+)?AS\s*\((.*)\)\s*(?:STORED|VIRTUAL)?\s*$""".r
    val ColRe = """(?is)^\s*([A-Za-z_][A-Za-z0-9_]*)\s+(.+?)\s*$""".r

    val cols = splitTop(s, ',').flatMap {
      case WatermarkRe(f, iv, unit) =>
        wmField = Some(f)
        wmDelay = Option(iv).map(v => if (unit != null) s"$v $unit" else v)
        None
      case VirtualRe(name, tpe, expr) =>
        Some(ColumnDef(name, normalizeType(tpe), Some(expr)))
      case ColRe(name, tpe) =>
        val pk = """(?i)\bPRIMARY\s+KEY\b""".r.findFirstIn(tpe).isDefined
        // `METADATA FROM 'key'` (reference tables.rs metadata columns; the
        // redis lookup key rides this, lookup.rs:63-77)
        val MetaRe = """(?i)\bMETADATA\s+FROM\s+'([A-Za-z_]+)'""".r
        val meta = MetaRe.findFirstMatchIn(tpe).map(_.group(1))
        Some(ColumnDef(name, normalizeType(MetaRe.replaceAllIn(tpe, "")), None,
          primaryKey = pk, metadataFrom = meta))
      case other =>
        throw new IllegalArgumentException(s"cannot parse column def: '$other'")
    }
    (cols, wmField, wmDelay)
  }

  /** Append `colName` to the SELECT list of every parenthesized
    * non-aggregating subquery/CTE body that doesn't already project it —
    * the text-level analogue of the reference's hidden `_timestamp`
    * propagation (ArroyoRewriter injects it into every projection,
    * plan/mod.rs:266-284), so `tumble(...)` above a subquery still finds
    * its event-time column. Aggregating segments (top-level GROUP BY)
    * stop the propagation, matching the scope we support.
    *
    * Only invoked as an analysis-failure retry (Pipeline.sql), so plans
    * that resolve without it are never touched.
    */
  def injectColumnIntoSubqueries(q: String, colName: String): String =
    process(q, colName, mustProvide = false)

  /** Like [[injectColumnIntoSubqueries]] but also injects into the
    * OUTERMOST select list — CREATE VIEW propagation, where the view
    * itself must carry the column.
    */
  def injectColumnThroughQuery(q: String, colName: String): String =
    process(q, colName, mustProvide = true)

  /** Demand-driven walk: a segment's FROM-subqueries must provide the
    * column only when the segment itself references it OUTSIDE nested
    * subqueries (e.g. its window call or `mustProvide` from above) —
    * injecting everywhere would hand unrelated intermediate projections a
    * column their own FROM can't supply.
    */
  private def process(q: String, colName: String, mustProvide: Boolean): String = {
    val selfNeeds = mustProvide ||
      s"""(?i)\\b${java.util.regex.Pattern.quote(colName)}\\b""".r
        .findFirstIn(blankSubqueries(q)).isDefined
    val sb = new StringBuilder
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == '\'') { // skip string literals
        val end = q.indexOf('\'', i + 1)
        val stop = if (end < 0) q.length - 1 else end
        sb.append(q.substring(i, stop + 1)); i = stop + 1
      } else if (c == '(') {
        val close = matchParen(q, i)
        val inner = q.substring(i + 1, close)
        if ("""(?is)^\s*SELECT\b""".r.findFirstIn(inner).isDefined) {
          // CTE bodies (`WITH name AS ( SELECT …`) are referenced by NAME,
          // outside the paren-child demand chain — they must provide the
          // column whenever this retry runs at all
          val isCte = """(?is)\bAS\s*$""".r.findFirstIn(q.substring(0, i)).isDefined
          // mustProvide handles the child's own select-list injection
          sb.append('(')
            .append(process(inner, colName, mustProvide = selfNeeds || isCte))
            .append(')')
        } else
          sb.append('(').append(process(inner, colName, mustProvide = false)).append(')')
        i = close + 1
      } else { sb.append(c); i += 1 }
    }
    val out = sb.toString
    if (mustProvide) injectIntoSelect(out, colName) else out
  }

  /** Hoist the first `explode(...)` call that sits NESTED inside a scalar
    * expression out into a subquery (`SELECT f(explode(x)) FROM src` →
    * `SELECT f(__un) FROM (SELECT explode(x) AS __un, * FROM src)`) — the
    * reference's UnnestRewriter (rewriters.rs:331-488) does the same plan
    * surgery for `unnest(a)->'name'`-style expressions Spark rejects as
    * nested generators. Retry-only, like the event-time injection.
    */
  def hoistNestedExplode(q: String): Option[String] = {
    val m = """(?i)\bexplode\s*\(""".r.findFirstMatchIn(q).getOrElse(return None)
    val open = q.indexOf('(', m.start)
    val close = matchParen(q, open)
    val call = q.substring(m.start, close + 1)
    // paren depth of the call = depth of its segment
    var d = 0; var inS = false
    val depths = new Array[Int](q.length)
    for (i <- q.indices) {
      val c = q.charAt(i)
      if (c == '\'') inS = !inS
      else if (!inS && c == '(') d += 1
      else if (!inS && c == ')') d -= 1
      depths(i) = d
    }
    val segDepth = depths(m.start) - 1 // depth outside the call's own paren
    // the segment's top-level FROM after the call
    val fromRe = """(?i)\bfrom\b""".r
    val from = fromRe.findAllMatchIn(q)
      .find(f => f.start > close && depths(f.start) == segDepth)
      .getOrElse(return None)
    // FROM sources extend to the next top-level clause keyword or the
    // segment's end (its closing paren at segDepth-1, or end of string)
    val stopRe = """(?i)\b(where|group\s+by|order\s+by|having|limit|union)\b""".r
    val segEnd = (from.end until q.length)
      .find(i => q.charAt(i) == ')' && depths(i) == segDepth - 1)
      .getOrElse(q.length)
    val stop = stopRe.findAllMatchIn(q)
      .find(s => s.start > from.end && s.start < segEnd && depths(s.start) == segDepth)
      .map(_.start).getOrElse(segEnd)
    val sources = q.substring(from.end, stop).trim
    if (sources.isEmpty) return None
    val rewritten = q.substring(0, m.start) + "__un" +
      q.substring(close + 1, from.end) +
      s" (SELECT $call AS __un, * FROM $sources) " + q.substring(stop)
    Some(rewritten)
  }

  /** Blank only parenthesized SUBQUERY regions (content starting with
    * SELECT), keeping scalar-function arguments — `window(ts, …)` must
    * stay visible to the demand test.
    */
  private def blankSubqueries(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') {
        val end = s.indexOf('\'', i + 1)
        val stop = if (end < 0) s.length - 1 else end
        sb.append(s.substring(i, stop + 1)); i = stop + 1
      } else if (c == '(') {
        val close = matchParen(s, i)
        val inner = s.substring(i + 1, close)
        if ("""(?is)^\s*SELECT\b""".r.findFirstIn(inner).isDefined)
          sb.append('(').append(" " * inner.length).append(')')
        else
          sb.append('(').append(blankSubqueries(inner)).append(')')
        i = close + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inS = false
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inS = !inS
        case '(' if !inS => depth += 1
        case ')' if !inS =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    s.length - 1
  }

  /** `SELECT xs FROM rest` → `SELECT xs, col FROM rest` when the segment
    * has no top-level GROUP BY and xs doesn't already include col.
    */
  private def injectIntoSelect(seg: String, colName: String): String = {
    if (s"""(?is)\\bGROUP\\s+BY\\b""".r.findFirstIn(stripParenRegions(seg)).isDefined) return seg
    // top-level FROM position
    var depth = 0
    var inS = false
    var i = 0
    var fromAt = -1
    while (i < seg.length && fromAt < 0) {
      seg.charAt(i) match {
        case '\'' => inS = !inS
        case '(' if !inS => depth += 1
        case ')' if !inS => depth -= 1
        case 'f' | 'F' if !inS && depth == 0 &&
            seg.regionMatches(true, i, "FROM", 0, 4) &&
            (i == 0 || !Character.isLetterOrDigit(seg.charAt(i - 1))) &&
            (i + 4 >= seg.length || !Character.isLetterOrDigit(seg.charAt(i + 4))) =>
          fromAt = i
        case _ =>
      }
      i += 1
    }
    if (fromAt < 0) return seg
    val selectList = seg.substring(0, fromAt)
    if (s"""(?i)\\b${java.util.regex.Pattern.quote(colName)}\\b""".r
        .findFirstIn(selectList).isDefined) return seg
    if ("""(?is)\bSELECT\s+\*""".r.findFirstIn(selectList).isDefined) return seg
    s"${selectList.stripTrailing()}, $colName ${seg.substring(fromAt)}"
  }

  /** Blank out parenthesized regions so top-level keyword scans don't see
    * nested queries' GROUP BYs.
    */
  private def stripParenRegions(s: String): String = {
    val sb = new StringBuilder
    var depth = 0
    var inS = false
    s.foreach {
      case '\'' => inS = !inS; sb.append(' ')
      case '(' if !inS => depth += 1; sb.append(' ')
      case ')' if !inS => depth -= 1; sb.append(' ')
      case c => sb.append(if (depth == 0) c else ' ')
    }
    sb.toString
  }

  /** Split on a separator at paren/quote depth 0.
    *
    * Angle brackets are tracked SEPARATELY and only in type position:
    * a '<' counts as generic-type nesting (STRUCT<a INT, …>, ARRAY<T>,
    * MAP<K,V> — struct_ddl.sql) only when glued to an identifier character
    * and not forming a comparison operator (<=, <>). A bare comparison in
    * a generated-column expression (`flag BOOLEAN GENERATED ALWAYS AS
    * (a > b), x INT`) must NOT count as nesting — the old
    * count-every-angle version drove depth negative there and merged or
    * lost column defs. A stray '>' with no open generic is likewise inert.
    */
  /** Does the '<' at index `i` close as a generic type list? Forward scan:
    * identifier-glued '<' nests; a matching '>' at nesting zero closes; a
    * ')' outside an inner paren pair (DECIMAL(10,2) is fine), a string
    * quote, or end-of-input means this was an expression comparison.
    */
  private def closesAsGeneric(s: String, i: Int): Boolean = {
    var depth = 1
    var paren = 0
    var j = i + 1
    while (j < s.length && depth > 0) {
      s.charAt(j) match {
        case '(' => paren += 1
        case ')' => if (paren == 0) return false else paren -= 1
        case '\'' => return false
        case '<' if s.charAt(j - 1).isLetterOrDigit || s.charAt(j - 1) == '_' => depth += 1
        case '>' => depth -= 1
        case _ =>
      }
      j += 1
    }
    depth == 0
  }

  def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0 // parens + bracket lists ('partitioning.fields' = [a, b])
    var angle = 0 // generic type parameters only
    var inS = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\'' => inS = !inS; cur += c
        case '(' if !inS => depth += 1; cur += c
        case ')' if !inS => depth -= 1; cur += c
        case '[' if !inS => depth += 1; cur += c
        case ']' if !inS => depth -= 1; cur += c
        case '<' if !inS && {
            // generic-type position ONLY: '<' preceded (optionally across
            // whitespace — 'STRUCT <a INT>' is legal DDL) by a generic
            // keyword (STRUCT<...>, ARRAY<...>, …) AND closing as a type
            // list. A comparison like (a<b) or (a < b) — or (list<3) on a
            // column named list — must NOT open an angle: it would never
            // close and every later top-level comma would stop splitting.
            var j = i - 1
            while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
            val wordEnd = j + 1
            while (j >= 0 && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j -= 1
            val word = s.substring(j + 1, wordEnd).toUpperCase
            (word == "STRUCT" || word == "ARRAY" || word == "MAP" || word == "LIST") &&
              closesAsGeneric(s, i)
          } =>
          angle += 1; cur += c
        case '>' if !inS && angle > 0 => angle -= 1; cur += c
        case c2 if c2 == sep && depth == 0 && angle == 0 && !inS =>
          out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Normalize reference SQL types to Spark DDL types. Unsigned ints widen
    * (no unsigned types in Spark — SURVEY §1.2); TEXT→STRING; JSON→STRING;
    * sub-second TIMESTAMP precision collapses to Spark's µs TIMESTAMP.
    */
  def normalizeType(t0: String): String = {
    val t = t0.trim
      .replaceAll("(?i)\\s+PRIMARY\\s+KEY$", "")
      .replaceAll("(?i)\\s+NOT\\s+NULL$", "")
      .replaceAll("(?i)\\s+NULL$", "")
      .replaceAll("(?i)\\s+PRIMARY\\s+KEY$", "")
      .trim
    val up = t.toUpperCase
    // `T[]` array suffix (reference types.rs:18-31)
    if (up.endsWith("[]"))
      return s"ARRAY<${normalizeType(t.dropRight(2))}>"
    // recurse into STRUCT<name type, …> / ARRAY<T> element types so
    // TEXT/JSON/unsigned mappings apply at any nesting depth
    // (struct_ddl.sql: struct<a int, x struct<b text>>)
    if (up.startsWith("STRUCT<") && up.endsWith(">")) {
      val inner = t.substring(t.indexOf('<') + 1, t.length - 1)
      // angle-bracket-aware top-level comma split (splitTop only tracks parens)
      val fields = Seq.newBuilder[String]
      val cur = new StringBuilder
      var depth = 0
      inner.foreach {
        case '<' => depth += 1; cur += '<'
        case '>' => depth -= 1; cur += '>'
        case ',' if depth == 0 => fields += cur.toString; cur.clear()
        case c => cur += c
      }
      fields += cur.toString
      val normed = fields.result().map(_.trim).filter(_.nonEmpty).map { f =>
        f.split("\\s+", 2) match {
          case Array(n, tp) => s"$n ${normalizeType(tp)}"
          case _ => f
        }
      }
      return s"STRUCT<${normed.mkString(", ")}>"
    }
    if (up.startsWith("ARRAY<") && up.endsWith(">"))
      return s"ARRAY<${normalizeType(t.substring(t.indexOf('<') + 1, t.length - 1))}>"
    up match {
      case "TEXT" | "VARCHAR" | "CHAR" | "JSON" => "STRING"
      case s if s.startsWith("VARCHAR(") || s.startsWith("CHAR(") => "STRING"
      case "TINYINT UNSIGNED" => "SMALLINT"
      case "SMALLINT UNSIGNED" => "INT"
      case "INT UNSIGNED" | "INTEGER UNSIGNED" => "BIGINT"
      case "BIGINT UNSIGNED" => "BIGINT" // documented overflow caveat
      case "REAL" => "FLOAT"
      case s if s.startsWith("TIMESTAMP") => "TIMESTAMP"
      case "TIME" => "BIGINT" // ns-of-day; Spark has no TIME type
      case "BYTEA" => "BINARY"
      case _ => t
    }
  }
}
