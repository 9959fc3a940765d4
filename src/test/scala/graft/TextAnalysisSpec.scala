package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("token counts: whitespace and BPE-ish") {
    val r = one("Hello, world!  This has 42 tokens?")
      .select(
        TextAnalysis.tokenCount(col("text")).as("ws"),
        TextAnalysis.tokenCountBpe(col("text")).as("bpe"))
      .collect()(0)
    assert(r.getInt(0) == 6)
    // Hello , world ! This has 42 tokens ? → 9 BPE-ish chunks
    assert(r.getInt(1) == 9)
  }

  test("quality score rewards prose, penalizes noise") {
    val prose = "The quick brown fox jumps over the lazy dog and it is a very good day " * 8
    val noise = "!!! ??? 12345 @@@@ ##### 99999 !!!!! 00000 ..... 4242424242"
    val rows = {
      import spark.implicits._
      Seq((1L, prose), (2L, noise)).toDF("doc_id", "text")
    }.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) > 0.8, s"prose scored ${rows(1L)}")
    assert(rows(2L) < 0.4, s"noise scored ${rows(2L)}")
  }

  test("language id picks the stopword-dominant language") {
    val rows = {
      import spark.implicits._
      Seq(
        (1L, "the cat and the dog are in the house with a mouse"),
        (2L, "der Hund und die Katze sind im Haus mit einer Maus und das ist gut"),
        (3L, "le chat et le chien sont dans la maison avec une souris"),
        (4L, "el gato y el perro están en la casa con un ratón y es bueno"),
        (5L, "xyzzy plugh qwerty asdf")
      ).toDF("doc_id", "text")
    }.select(col("doc_id"), TextAnalysis.languageId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "en")
    assert(rows(2L) == "de")
    assert(rows(3L) == "fr")
    assert(rows(4L) == "es")
    assert(rows(5L) == "und")
  }

  test("scrubPii replaces emails, IPs and phones with tags; clean text intact") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail alice.smith+dev@sub.example.org now"),
      (2L, "server at 192.168.1.254 is down"),
      (3L, "call +1 555-0123 or 44 020 7946 0958"),
      (4L, "no pii here, just words and 42 numbers")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "mail <EMAIL> now")
    assert(rows(2L) == "server at <IP> is down")
    assert(rows(3L).contains("<PHONE>") && !rows(3L).exists(_.isDigit), s"got ${rows(3L)}")
    assert(rows(4L) == "no pii here, just words and 42 numbers")
  }

  test("scrubPii r7 categories: SSN, card numbers, IPv6, IBAN") {
    import spark.implicits._
    val rows = Seq(
      (1L, "ssn 123-45-6789 on file"),
      (2L, "pay 4111 1111 1111 1234 or 4111-1111-1111-1234 or 4111111111111234"),
      (3L, "host fe80:0:0:0:202:b3ff:fe1e:8329 up"),
      (4L, "wire to DE44500105175407324931 today"),
      (5L, "year 2024 had 365 days and 12 months"), // short digit runs untouched
      // r8: clock times / scores / short colon runs must NOT read as IPv6
      (6L, "meet at 12:30:45 or score 3:2:1 vs 10:0"),
      (7L, "uptime 1:02:33:45:59 logged") // 5 segments: IPv6-shaped, scrubbed
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "ssn <SSN> on file")
    assert(rows(2L) == "pay <CARD> or <CARD> or <CARD>", s"got ${rows(2L)}")
    assert(rows(3L) == "host <IP6> up")
    assert(rows(4L) == "wire to <IBAN> today")
    assert(rows(5L) == "year 2024 had 365 days and 12 months")
    assert(rows(6L) == "meet at 12:30:45 or score 3:2:1 vs 10:0", s"got ${rows(6L)}")
    assert(rows(7L) == "uptime <IP6> logged", s"got ${rows(7L)}")
  }

  test("repetition profile flags boilerplate docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),          // one 3-gram repeated
      (2L, "the quick brown fox jumps over fences")     // all distinct
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, "doc_id", "text", n = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // doc 1: grams of "buy now buy now ..." (8 tokens → 6 grams, 2 distinct:
    // "buy now buy" ×3 and "now buy now" ×3)
    assert(r(1L) == ((3L, 4L, 2L)), s"got ${r(1L)}")
    // doc 2: 5 grams, all distinct → no repetition
    assert(r(2L) == ((1L, 0L, 5L)), s"got ${r(2L)}")
  }

  test("bigram LM score: hand-computed MLE log-probs; short docs get null scores") {
    import spark.implicits._
    // corpus bigrams: d1 = (a,b),(b,a),(a,b); d2 = (a,b),(b,c)
    // counts: c(a,b)=3, c(b,a)=1, c(b,c)=1; contexts: c(a,·)=3, c(b,·)=2
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val r = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.size == 4)
    // d1: logs = ln(3/3), ln(1/2), ln(3/3) → avg = -ln2/3; Σc12 = 7, Σc1 = 8
    assert(r(1L).getLong(1) == 3L && r(1L).getLong(2) == 7L && r(1L).getLong(3) == 8L)
    assert(math.abs(r(1L).getDouble(4) - (-math.log(2) / 3)) < 1e-12)
    assert(math.abs(r(1L).getDouble(5) - math.exp(math.log(2) / 3)) < 1e-12)
    // d2: logs = ln(3/3), ln(1/2) → avg = -ln2/2 → worse (higher perplexity)
    assert(math.abs(r(2L).getDouble(4) - (-math.log(2) / 2)) < 1e-12)
    assert(r(2L).getDouble(5) > r(1L).getDouble(5))
    // < 2 tokens → zero bigrams, null scores
    Seq(3L, 4L).foreach { d =>
      assert(r(d).getLong(1) == 0L && r(d).isNullAt(4) && r(d).isNullAt(5))
    }
  }

  test("bigram LM score matches a brute-force reference on random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "dd", "ee")
    (1 to 5).foreach { trial =>
      val docs = (1L to 20L).map { id =>
        val n = rng.nextInt(8) // 0..7 tokens
        (id, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      // brute force: MLE bigram counts over the whole corpus
      val allPairs = docs.flatMap { case (id, t) =>
        val w = t.split("\\s+").filter(_.nonEmpty)
        w.zip(w.drop(1)).map(p => (id, p))
      }
      val c12 = allPairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val c1 = allPairs.groupBy(_._2._1).view.mapValues(_.size.toLong).toMap
      val expected = docs.map { case (id, _) =>
        val ps = allPairs.filter(_._1 == id).map(_._2)
        val logs = ps.map(p => math.log(c12(p).toDouble / c1(p._1)))
        (id, ps.size.toLong, ps.map(c12).sum, ps.map(p => c1(p._1)).sum,
          if (ps.isEmpty) None else Some(logs.sum / logs.size))
      }.map(e => e._1 -> e).toMap
      val got = TextAnalysis.lmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(got.size == docs.size, s"trial $trial: row count")
      expected.foreach { case (id, (_, n, s12, s1, avg)) =>
        val r = got(id)
        assert(r.getLong(1) == n && r.getLong(2) == s12 && r.getLong(3) == s1,
          s"trial $trial doc $id: stats ${(r.getLong(1), r.getLong(2), r.getLong(3))} != ${(n, s12, s1)}")
        avg match {
          case None => assert(r.isNullAt(4), s"trial $trial doc $id: expected null score")
          case Some(a) => assert(math.abs(r.getDouble(4) - a) < 1e-9,
            s"trial $trial doc $id: avg_logprob ${r.getDouble(4)} != $a")
        }
      }
    }
  }

  test("importance score: hand-computed LLR against a target slice") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // target = lang 'en' (docs 1, 2). Unigram tables:
    //   good:  ct=2 cr=3   clean: ct=2 cr=2   prose: ct=1 cr=1
    //   text:  ct=1 cr=2   spam:  ct=0 cr=2   junk:  ct=0 cr=1
    // V = 6, Tt = 6, Tr = 11
    val docs = Seq(
      (1L, "en", "good clean prose"),
      (2L, "en", "good clean text"),
      (3L, "xx", "spam junk text"),
      (4L, "xx", "good spam"),
      (5L, "xx", "")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.importanceScore(docs, col("lang") === "en", "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.size == 5)
    def llr(ct: Long, cr: Long): Double =
      math.log((ct + 1).toDouble / (6 + 6)) - math.log((cr + 1).toDouble / (11 + 6))
    // exact integer sufficient statistics
    assert(r(1L).getLong(1) == 3L && r(1L).getLong(2) == 5L && r(1L).getLong(3) == 6L)
    assert(r(3L).getLong(1) == 3L && r(3L).getLong(2) == 1L && r(3L).getLong(3) == 5L)
    // log-space scores match the formula
    val s1 = llr(2, 3) + llr(2, 2) + llr(1, 1)
    val s3 = llr(0, 2) + llr(0, 1) + llr(1, 2)
    assert(math.abs(r(1L).getDouble(4) - s1) < 1e-9)
    assert(math.abs(r(3L).getDouble(4) - s3) < 1e-9)
    // target-like docs outrank off-domain docs
    assert(r(1L).getDouble(4) > r(3L).getDouble(4))
    assert(r(2L).getDouble(4) > r(3L).getDouble(4))
    // empty doc: zero stats, null score
    assert(r(5L).getLong(1) == 0L && r(5L).isNullAt(4))
  }

  test("gopher rules: each rule trips independently; clean prose passes") {
    import spark.implicits._
    val prose = ("the results be known to most of the readers and that " +
      "should have been clear with the first figures we published ") * 3
    val docs = Seq(
      1L -> prose,                                   // passes every rule
      2L -> "the of and short",                      // too few words
      3L -> ("# " * 60 + prose),                     // symbol ratio > 0.1
      4L -> (1 to 60).map(i => s"- bullet $i line").mkString("\n"), // bullets
      5L -> (1 to 60).map(i => s"a line number $i trails off...").mkString("\n"), // ellipsis
      6L -> ("the " + "12 34 " * 40 + "of that be"), // alpha ratio < 0.8
      7L -> ("zebra quartz " * 40)                   // no stop-set evidence
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"))
    assert(!got(2L).getAs[Boolean]("keep") && got(2L).getAs[Int]("n_words") < 50)
    assert(!got(3L).getAs[Boolean]("keep") && got(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!got(4L).getAs[Boolean]("keep") && got(4L).getAs[Double]("bullet_line_ratio") > 0.9)
    assert(!got(5L).getAs[Boolean]("keep") && got(5L).getAs[Double]("ellipsis_line_ratio") > 0.3)
    assert(!got(6L).getAs[Boolean]("keep") && got(6L).getAs[Double]("alpha_word_ratio") < 0.8)
    assert(!got(7L).getAs[Boolean]("keep") && got(7L).getAs[Int]("stop_hits") < 2)
  }

  test("gopher repetition rules: line, top-gram and dup-gram gates trip independently") {
    import spark.implicits._
    val clean = (1 to 60).map(i => s"tok$i").mkString(" ")
    val dupLines = "alpha beta gamma\nalpha beta gamma\ndelta epsilon zeta"
    val spam = Seq.fill(30)("spam ham").mkString(" ")
    val span = "purple quantum rocket silver tango"
    val dupSpan = ((1 to 25).map(i => s"f$i") ++ span.split(" ") ++
      (26 to 50).map(i => s"f$i") ++ span.split(" ")).mkString(" ")
    val docs = Seq(1L -> clean, 2L -> dupLines, 3L -> spam, 4L -> dupSpan)
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRepetitionRules(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"), s"clean doc: ${r(1L)}")
    assert(!r(2L).getAs[Boolean]("keep") &&
      math.abs(r(2L).getAs[Double]("dup_line_frac") - 1.0 / 3) < 1e-12, s"got ${r(2L)}")
    assert(!r(3L).getAs[Boolean]("keep") &&
      r(3L).getAs[Double]("top_2gram_char_frac") > 0.2, s"got ${r(3L)}")
    assert(!r(4L).getAs[Boolean]("keep") &&
      r(4L).getAs[Double]("dup_5gram_char_frac") > 0.15, s"got ${r(4L)}")
    // overlap union, not double counting: spam doc's dup coverage ≤ 1.0
    assert(r(3L).getAs[Double]("dup_5gram_char_frac") <= 1.0 + 1e-12)
  }

  test("c4 cleaning: line rules and the min-sentences doc gate, hand-checked") {
    import spark.implicits._
    val docs = Seq(
      // three clean sentences → all kept, doc passes
      1L -> ("This is a good long sentence here.\n" +
        "Another fine long sentence follows here!\n" +
        "And a third one to pass the gate."),
      // line 1 too few words; line 2 blocklisted; line 3 no terminal punct
      2L -> ("short line.\n" +
        "please enable javascript in your browser to continue now.\n" +
        "a trailing line without any terminal punctuation at all"),
      // two clean sentences only → lines kept but doc fails min-sentences
      3L -> ("One perfectly fine sentence right here.\n" +
        "And then just a second one follows?"),
      // quote after terminal punctuation still terminates (C4 rule)
      4L -> ("\"A quoted sentence can end with a quote mark.\"\n" +
        "He said the rest would follow shortly after that.\n" +
        "It did arrive the very next morning.")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.c4Clean(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getInt(3), x.getBoolean(4), x.getString(5)))).toMap
    assert(r(1L)._4 && r(1L)._2 == 3 && r(1L)._3 == 3, s"got ${r(1L)}")
    assert(!r(2L)._4 && r(2L)._2 == 0 && r(2L)._5 == "", s"got ${r(2L)}")
    assert(!r(3L)._4 && r(3L)._2 == 2 && r(3L)._3 == 2, s"got ${r(3L)}")
    assert(r(4L)._4 && r(4L)._2 == 3, s"got ${r(4L)}")
    assert(r(1L)._5.split("\n").length == 3)
  }

  test("features frame computes all columns without nulls") {
    val docs = Tables.load(spark, sfDir, "documents")
    val f = TextAnalysis.features(docs, "doc_id", "text")
    assert(f.count() == docs.count())
    val nulls = f.select(f.columns.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c)).toIndexedSeq: _*)
      .collect()(0)
    f.columns.indices.foreach(i => assert(nulls.getLong(i) == 0L, s"nulls in ${f.columns(i)}"))
  }
  test("normalizeText: NFC + control strip + whitespace discipline") {
    import org.apache.spark.sql.functions.col
    def norm(s: String): String =
      one(s).select(TextAnalysis.normalizeText(col("text")).as("n"))
        .collect()(0).getString(0)
    // decomposed e + U+0301 composes to the single-codepoint form
    assert(norm("cafe\u0301") == "caf\u00e9")
    assert(norm("caf\u00e9") == "caf\u00e9") // already-NFC passes through
    // CRLF / CR become LF; spaces hugging newlines drop; runs collapse
    assert(norm("a  b\t\tc") == "a b c")
    assert(norm("l1 \r\n l2\rl3") == "l1\nl2\nl3")
    // C0 (BEL) + DEL + C1 stripped, tab/newline survive as whitespace
    assert(norm("x\u0007y\u007fz\u009b!") == "xyz!")
    // trim both ends, including newline runs
    assert(norm(" \n a \n ") == "a")
    // empty and all-junk inputs degrade to empty, not null
    assert(norm("\u0000\u0001  \t") == "")
    // idempotent: normalizing twice is a no-op
    val once = norm("  A\u0301  b  ")
    assert(norm(once) == once)
  }
  test("training-data scalars are SQL-callable and value-identical to the Column API") {
    GraftSession.registerFunctions(spark)
    val r = spark.sql(
      """SELECT normalize_text('  a  b ') AS n,
        |       nfc_normalize('cafe\u0301') AS nfc,
        |       token_count('one two three') AS tc,
        |       token_count_bpe('ab, cd!') AS tb,
        |       lang_id('the quick brown fox and the lazy dog') AS lang,
        |       flesch_reading_ease('one two. three four.') AS fre,
        |       url_normalize('https://www.Ex.COM/a/?b=2&a=1&utm_source=x') AS u,
        |       url_domain('https://www.Ex.COM:8080/a') AS d
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "a b")
    assert(r.getString(1) == "caf\u00e9")
    assert(r.getInt(2) == 3)
    assert(r.getInt(3) == 4)
    assert(r.getString(4) == "en")
    // 4 words / 2 sentences, 5 vowel groups ("o","e","o","ee","ou"):
    // 206.835 - 1.015*2 - 84.6*(5/4) = 99.055
    assert(math.abs(r.getDouble(5) - 99.055) < 1e-9)
    assert(r.getString(6) == "ex.com/a?a=1&b=2")
    assert(r.getString(7) == "ex.com")
    // value-identical to the Column surface (same expression tree)
    import org.apache.spark.sql.functions.col
    val viaCol = one("  a  b ")
      .select(TextAnalysis.normalizeText(col("text"))).collect()(0).getString(0)
    assert(viaCol == r.getString(0))
    // and SQL quality_score matches the Column quality_score on real rows
    val d = Tables.load(spark, sfDir, "documents").limit(50).cache()
    d.createOrReplaceTempView("ta_docs")
    val sqlScores = spark.sql("SELECT doc_id, quality_score(text) AS q FROM ta_docs")
      .collect().map(r2 => r2.getLong(0) -> r2.getDouble(1)).toMap
    val colScores = d.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r2 => r2.getLong(0) -> r2.getDouble(1)).toMap
    assert(sqlScores == colScores)
    d.unpersist()
  }

  test("extractHtmlText: scripts/styles/comments vanish, structure and entities survive") {
    import spark.implicits._
    def extract(html: String): String =
      Seq(Tuple1(html)).toDF("h")
        .select(TextAnalysis.extractHtmlText(org.apache.spark.sql.functions.col("h")))
        .collect()(0).getString(0)
    val page =
      """<html><!-- secret comment --><head><title>T</title>
        |<style type="text/css">body { color: red; }</style>
        |<script>if (1 < 2 && x > 0) { alert("<p>hi</p>"); }</script>
        |</head><body>
        |<h1>Header</h1>
        |<p>First &amp; second &lt;escaped&gt;.</p>
        |<div><b>bold</b> and <i>italic</i> glue</div>
        |line one<br>line two
        |</body></html>""".stripMargin
    val out = extract(page)
    // removed wholesale
    assert(!out.contains("secret") && !out.contains("color") && !out.contains("alert"))
    // the script's embedded markup-looking string must not leak
    assert(!out.contains("hi"))
    // block closers become line structure; inline tags become glue spaces
    val lines = out.split("\n").toSeq
    assert(lines.contains("Header"))
    assert(lines.contains("First & second <escaped>."))
    assert(lines.contains("bold and italic glue"))
    assert(lines.indexOf("line one") + 1 == lines.indexOf("line two"))
    // entity decode + collapse edge cases
    assert(extract("<p>a&nbsp;&nbsp;b</p>") == "a b")
    assert(extract("<p>&#39;s &quot;q&quot;</p>") == "'s \"q\"")
    assert(extract("") == "")
    assert(extract("no markup at all") == "no markup at all")
    // SQL surface parity for the two round-7 scalars
    val viaSql = spark.sql(
      "SELECT extract_html_text('<p>a&amp;b</p>'), fix_mojibake('plain')")
      .collect()(0)
    assert(viaSql.getString(0) == "a&b" && viaSql.getString(1) == "plain")
  }
}
