package graft

import graft.functions.MojibakeMath
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** Char-exact cases for the mojibake repair expression. Damaged inputs
  * are CONSTRUCTED by actually misdecoding UTF-8 bytes (no mojibake
  * string literals — the repo's encoding-gotcha discipline), so the spec
  * is immune to any editor/tool re-encoding of this file.
  */
class MojibakeSpec extends SparkSpec {

  private val cp1252 = Charset.forName("windows-1252")
  private def fix(s: String): String =
    MojibakeMath.repair(UTF8String.fromString(s)).toString

  // original strings built from code points, not literals. NOTE the close
  // quote is U+2018, not U+201D: U+201D's UTF-8 tail byte 0x9D is one of
  // cp1252's five UNDEFINED bytes, which Java's decoder turns into U+FFFD
  // — that damage destroys the byte and is unrepairable by construction
  // (asserted below), exactly like real crawl data through such decoders.
  private def cp(i: Int): String = new String(Character.toChars(i))
  private val curly = "don" + cp(0x2019) + "t " + cp(0x201c) + "quote" + cp(0x2018)
  private val accents = "caf" + cp(0xe9) + " na" + cp(0xef) + "ve " + cp(0xfc) + "ber"
  private val emdash = "one " + cp(0x2014) + " two"

  test("cp1252 misdecode (curly quotes, em dash) repairs byte-exactly") {
    for (orig <- Seq(curly, emdash, accents)) {
      val damaged = new String(orig.getBytes(UTF_8), cp1252)
      assert(damaged != orig, "damage must actually corrupt")
      assert(fix(damaged) == orig, s"cp1252 repair of '$damaged'")
    }
  }

  test("latin-1 misdecode (0x80-0x9F become control chars) repairs byte-exactly") {
    for (orig <- Seq(curly, emdash, accents)) {
      val damaged = new String(orig.getBytes(UTF_8), ISO_8859_1)
      assert(fix(damaged) == orig, s"latin-1 repair")
    }
  }

  test("clean text — ASCII and legitimately-accented — passes through untouched") {
    for (s <- Seq("plain ascii text.", accents, curly, emdash, "")) {
      assert(fix(s) == s, s"'$s' must not be altered")
    }
  }

  test("cp1252-decoder-lossy damage (undefined byte -> U+FFFD) stays unchanged") {
    // U+201D's tail byte 0x9D has no cp1252 mapping: Java's decoder emits
    // U+FFFD, destroying the byte — no inverse exists, and the repair must
    // NOT half-fix the rest of the string
    val orig = "a" + cp(0x201d) + "b"
    val damaged = new String(orig.getBytes(UTF_8), cp1252)
    assert(damaged.contains(cp(0xfffd)), "Java cp1252 must have replaced 0x9D")
    assert(fix(damaged) == damaged)
  }

  test("marker-bearing but non-UTF-8 sequences are left alone") {
    // a lone lead-byte echo with no valid continuation structure:
    // 0xC3 followed by 0x80-range then ASCII that breaks the sequence
    val junk = "x " + 0xc3.toChar + 0xa9.toChar + 0xc3.toChar + " y" // second C3 dangles
    assert(fix(junk) == junk)
  }

  test("purely lowercase Cyrillic and Greek mojibake repairs (0xD1/0xCF leads, r8)") {
    // 'тут' is all U+0442-range → every UTF-8 lead byte is 0xD1; lowercase
    // Greek π-ω (U+03C0+) leads with 0xCF. Before r8 the marker gate
    // skipped both and the damage passed through unrepaired.
    val cyr = cp(0x0442) + cp(0x0443) + cp(0x0442) // тут
    val grk = cp(0x3c0) + cp(0x3c9)                // πω
    for (orig <- Seq(cyr, grk, "say " + cyr + " ok")) {
      val damaged = new String(orig.getBytes(UTF_8), cp1252)
      assert(damaged != orig, "damage must actually corrupt")
      assert(fix(damaged) == orig, s"lowercase repair of '$damaged'")
    }
  }

  test("double-encoded text repairs one layer per application") {
    val once = new String(accents.getBytes(UTF_8), cp1252)
    val twice = new String(once.getBytes(UTF_8), cp1252)
    assert(fix(twice) == once && fix(fix(twice)) == accents)
  }

  test("column wrapper: damaged rows repair, nulls propagate, plan stays codegen") {
    import spark.implicits._
    val damaged = new String(curly.getBytes(UTF_8), cp1252)
    val df = Seq((1L, damaged), (2L, accents), (3L, null)).toDF("id", "t")
      .select(col("id"), TextAnalysis.fixMojibake(col("t")).as("fixed"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == curly)
    assert(rows(1).getString(1) == accents)
    assert(rows(2).isNullAt(1))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
