package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}
import java.nio.CharBuffer

/** Mojibake (encoding-damage) repair, callable from generated code.
  *
  * The classic crawl corruption: UTF-8 bytes were decoded as
  * Windows-1252 / Latin-1 somewhere upstream, turning every non-ASCII
  * character into 2-3 junk characters (e-acute becomes "A-tilde +
  * copyright"; a curly apostrophe becomes an "a-circumflex" triple). The
  * repair INVERTS that mistake: re-encode the characters back to the
  * byte stream under the suspected wrong charset, then decode those
  * bytes as STRICT UTF-8. The transformation is only accepted when
  *
  *   1. the text actually carries a mojibake marker (a char equal to a
  *      UTF-8 LEAD byte 0xC2/0xC3/0xCE/0xD0/0xE2 misread as a letter,
  *      followed by a char a continuation byte 0x80-0xBF misdecodes to),
  *   2. the inverse encoding maps every character (tried with
  *      windows-1252 first — its 0x80-0x9F printables cover the curly-
  *      quote family — then ISO-8859-1, whose 0x80-0x9F control chars
  *      cover misdecodes by pure Latin-1 readers), and
  *   3. the recovered bytes decode as VALID UTF-8 end-to-end (strict,
  *      no replacement) — random Latin text fails this, so false
  *      repairs are structurally unlikely (the ftfy insight: valid
  *      multi-byte UTF-8 arising by chance from re-encoded natural
  *      language is ~impossible).
  *
  * Anything failing a gate passes through UNCHANGED — the 100 TB
  * bad-row policy: a weird row degrades, it never aborts or mangles.
  *
  * No non-ASCII literals appear below (marker chars are built from code
  * points): editor/tool layers can silently re-encode escapes in source
  * text, which this file must be immune to by construction.
  */
object MojibakeMath {

  private val cp1252 = Charset.forName("windows-1252")
  private val latin1 = Charset.forName("ISO-8859-1")
  private val utf8 = Charset.forName("UTF-8")

  /** Chars windows-1252 decodes bytes 0x80-0x9F to (curly quotes, euro,
    * dashes, ...): they sit ABOVE U+00FF yet represent a single misread
    * byte. Derived from the charset itself — no literals.
    */
  private val cp1252HighChars: Set[Char] =
    (0x80 to 0x9f).map { b =>
      new String(Array(b.toByte), cp1252).charAt(0)
    }.filter(_.toInt > 0xff).toSet

  private def isLead(c: Char): Boolean = {
    val ci = c.toInt
    // 0xC2/0xC3 Latin-1 supplement, 0xCE/0xCF Greek (0xCF covers π-ω),
    // 0xD0/0xD1 Cyrillic (0xD1 leads ALL lowercase р-я — a purely
    // lowercase Russian word is invisible without it), 0xE2 punctuation
    ci == 0xc2 || ci == 0xc3 || ci == 0xce || ci == 0xcf ||
      ci == 0xd0 || ci == 0xd1 || ci == 0xe2
  }

  private def isContinuationEcho(c: Char): Boolean = {
    val ci = c.toInt
    (ci >= 0x80 && ci <= 0xbf) || cp1252HighChars.contains(c)
  }

  private[graft] def hasMarker(s: String): Boolean = {
    var i = 0
    while (i < s.length - 1) {
      if (isLead(s.charAt(i)) && isContinuationEcho(s.charAt(i + 1))) return true
      i += 1
    }
    false
  }

  /** Strict charset round-trip: chars → bytes under `cs` → strict UTF-8.
    * None when any char is unmappable or the bytes are not valid UTF-8.
    */
  private def invert(s: String, cs: Charset): Option[String] =
    try {
      val enc = cs.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val bytes = enc.encode(CharBuffer.wrap(s))
      val dec = utf8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(bytes).toString)
    } catch { case _: CharacterCodingException => None }

  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    if (!hasMarker(str)) return s
    invert(str, cp1252).orElse(invert(str, latin1)) match {
      case Some(fixed) => UTF8String.fromString(fixed)
      case None => s
    }
  }
}

/** Codegen'd `fix_mojibake(string) → string`: see [[MojibakeMath]]. */
case class MojibakeF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fix_mojibake requires string, got $t")
  }
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    MojibakeMath.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      code"""
        ${ev.value} = graft.functions.MojibakeMath.repair($v);
      """.toString
    })

  override protected def withNewChildInternal(newChild: Expression): MojibakeF =
    copy(child = newChild)
}
