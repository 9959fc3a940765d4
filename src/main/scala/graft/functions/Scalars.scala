package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Concat, Expression, GetJsonObject, Hex, Literal, StringLPad, XxHash64}
import org.apache.spark.sql.functions._

/** The reference's custom scalar functions
  * (crates/arroyo-planner/src/functions.rs:55-180), re-expressed over
  * Spark built-ins and registered into the session's SQL function registry
  * so SQL pipelines can call them by name.
  *
  * SQL and Column surfaces are value-identical: both ride the same Catalyst
  * expressions (GetJsonObject, XxHash64) — the SQL names are registered as
  * expression builders, not Scala UDFs, so they stay inside whole-stage
  * codegen and accept any arity where the reference's do.
  */
object Scalars {

  private val Seed2 = -7046029254386353131L

  /** get_first_json_object(text, path): first match of a JSON path.
    * Maps directly to get_json_object (functions.rs:55-70).
    */
  def getFirstJsonObject(text: Column, path: String): Column =
    get_json_object(text, path)

  /** extract_json(text, path) -> ALL matches of the path as strings
    * (functions.rs:71-97 returns List<Utf8>). Supports `$.key`, `[n]`
    * array indexing and `[*]` wildcards; scalar matches are unquoted,
    * object/array matches serialize as JSON.
    */
  def extractJson(text: Column, path: String): Column =
    extractJsonUdf(text, lit(path))

  /** extract_json_string: like get_first_json_object but guarantees an
    * unquoted string result (GetJsonObject already unquotes scalars).
    */
  def extractJsonString(text: Column, path: String): Column =
    get_json_object(text, path)

  /** multi_hash(cols...): 128-bit non-cryptographic hash of the arguments
    * (functions.rs:119-180). Two independent xxhash64 passes packed as a
    * 32-hex-char string - same shape (128 bits), not the same values as
    * the reference's internal hash. Hashing column-wise (not a joined
    * string) means ("a b","c") and ("a","b c") cannot collide.
    */
  def multiHash(cols: Column*): Column = {
    val h1 = xxhash64(cols: _*)
    val h2 = xxhash64(lit(Seed2) +: cols: _*)
    concat(lpad(hex(h1), 16, "0"), lpad(hex(h2), 16, "0"))
  }

  /** The expression tree behind [[multiHash]], shared by the SQL builder so
    * both surfaces compute identical values.
    */
  private def multiHashExpr(args: Seq[Expression]): Expression = {
    def packed(h: Expression): Expression =
      StringLPad(Hex(h), Literal(16), Literal("0"))
    Concat(Seq(
      packed(new XxHash64(args)),
      packed(new XxHash64(Literal(Seed2) +: args))))
  }

  /** Register SQL-callable versions of the custom functions. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    // real JSON-path semantics: the same Catalyst expression the Column
    // API uses (codegen'd, nested-path/escape-correct), not a regex UDF
    registry.createOrReplaceTempFunction("get_first_json_object",
      (args: Seq[Expression]) => GetJsonObject(args.head, args(1)), "built-in")
    registry.createOrReplaceTempFunction("extract_json_string",
      (args: Seq[Expression]) => GetJsonObject(args.head, args(1)), "built-in")
    registry.createOrReplaceTempFunction("multi_hash", multiHashExpr _, "built-in")
    // kept for scripts written against the old 2-arg alias
    registry.createOrReplaceTempFunction("multi_hash2", multiHashExpr _, "built-in")
    spark.udf.register("extract_json",
      (t: String, p: String) => JsonPathAll.all(t, p))
    // DataFusion's `->` json access operator (json_operators.sql golden):
    // returns the field's RAW JSON text — numbers unquoted, strings with
    // their quotes, missing fields as the literal text "null"
    spark.udf.register("json_get_json", (t: String, f: String) => {
      if (t == null) "null"
      else {
        val node =
          try JsonPathAll.rootNode(t) catch { case _: Exception => null }
        val v = if (node == null) null else node.get(f)
        if (v == null) "null" else v.toString
      }
    })
    // json_get(text, key): same union-ish accessor surface — alias of the
    // raw-JSON form (release_post_json.sql)
    spark.udf.register("json_get", (t: String, f: String) => {
      if (t == null) "null"
      else {
        val node =
          try JsonPathAll.rootNode(t) catch { case _: Exception => null }
        val v = if (node == null) null else node.get(f)
        if (v == null) "null" else v.toString
      }
    })
    // DataFusion names the 256-bit digest `sha256(x)`; Spark spells it
    // sha2(x, 256) (crypto_function.sql)
    spark.udf.register("sha256", (s: String) =>
      if (s == null) null
      else java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString)
    // `expr ? 'field'`: field PRESENCE (an explicit null field is present)
    spark.udf.register("json_has", (t: String, f: String) => {
      if (t == null) false
      else {
        val node =
          try JsonPathAll.rootNode(t) catch { case _: Exception => null }
        node != null && node.has(f)
      }
    })
    // DataFusion's `->>` operator: the field as plain TEXT (strings
    // unquoted, missing/null → SQL NULL)
    spark.udf.register("json_get_str", (t: String, f: String) => {
      if (t == null) null
      else {
        val node =
          try JsonPathAll.rootNode(t) catch { case _: Exception => null }
        val v = if (node == null) null else node.get(f)
        if (v == null || v.isNull) null
        else if (v.isTextual) v.asText()
        else v.toString
      }
    })

    // ── training-data scalar surface: the same Column expressions the
    // operator API uses, exposed by SQL name. Registered as expression
    // builders (the Column tree is grafted in whole), NOT Scala UDFs —
    // SQL callers get identical values and stay in whole-stage codegen.
    def col1(name: String, f: Column => Column): Unit =
      registry.createOrReplaceTempFunction(name,
        (args: Seq[Expression]) => {
          require(args.length == 1,
            s"$name expects exactly 1 argument, got ${args.length}")
          org.apache.spark.sql.GraftShim.catalystExpression(
            f(org.apache.spark.sql.GraftShim.column(args.head)))
        }, "built-in")
    col1("nfc_normalize", graft.operators.TextAnalysis.nfc)
    col1("normalize_text", graft.operators.TextAnalysis.normalizeText)
    col1("token_count", graft.operators.TextAnalysis.tokenCount)
    col1("token_count_bpe", graft.operators.TextAnalysis.tokenCountBpe)
    col1("quality_score", graft.operators.TextAnalysis.qualityScore)
    col1("flesch_reading_ease", graft.operators.TextAnalysis.fleschReadingEase)
    col1("lang_id", c => graft.operators.TextAnalysis.languageId(c))
    col1("url_normalize", graft.operators.Urls.normalize)
    col1("url_domain", graft.operators.Urls.domainOf)
    col1("extract_html_text", graft.operators.TextAnalysis.extractHtmlText)
    col1("fix_mojibake", graft.operators.TextAnalysis.fixMojibake)
  }

  private val extractJsonUdf = udf((t: String, p: String) => JsonPathAll.all(t, p))

  /** Minimal JSON-path evaluator returning every match — jackson-databind
    * (already on Spark's classpath) does the parsing, so quoting/escapes/
    * nesting behave like a real parser. Grammar: `$` (`.key` | `[n]` |
    * `[*]`)*.
    */
  private[functions] object JsonPathAll {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    @transient private lazy val mapper = new ObjectMapper()

    private val stepRe = """\.([A-Za-z0-9_\-]+)|\[(\d+)\]|\[\*\]""".r

    def rootNode(text: String): JsonNode = mapper.readTree(text)

    def all(text: String, path: String): Seq[String] = {
      if (text == null || path == null) return Seq.empty
      val root =
        try mapper.readTree(text)
        catch { case _: Exception => return Seq.empty }
      if (root == null) return Seq.empty
      var nodes: Seq[JsonNode] = Seq(root)
      stepRe.findAllMatchIn(path.stripPrefix("$")).foreach { m =>
        nodes =
          if (m.group(1) != null) nodes.flatMap(n => Option(n.get(m.group(1))))
          else if (m.group(2) != null) {
            val idx = m.group(2).toInt
            nodes.flatMap(n => Option(n.get(idx)))
          } else nodes.flatMap(n => if (n.isArray) (0 until n.size).map(n.get) else Seq.empty)
      }
      nodes.filterNot(_.isNull).map(n => if (n.isTextual) n.asText() else n.toString)
    }
  }
}
