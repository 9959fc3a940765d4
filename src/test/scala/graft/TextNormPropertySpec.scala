package graft

import graft.operators.{Bpe, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SC}
import org.scalacheck.Prop.propBoolean

/** Property-based checks for canonical text normalization and BPE: the
  * invariants (idempotence, output discipline, byte-exact round-trips,
  * training determinism) must hold across arbitrary inputs, not just the
  * hand-picked fixtures in TextAnalysisSpec/BpeSpec.
  */
class TextNormPropertySpec extends SparkSpec {

  private def check(label: String, prop: Prop, n: Int = 15): Unit = {
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$label failed: ${res.status}")
  }

  /** Batch a sample of strings through the normalizer in ONE Spark job. */
  private def normalizeAll(inputs: Seq[String]): Seq[String] = {
    import spark.implicits._
    inputs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "text")
      .select(col("i"), TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
  }

  // messy text: printable runs interleaved with controls, weird
  // whitespace, combining marks, and non-ASCII
  private val genMessy: Gen[String] = {
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "\t", "\r\n", "\r", "\n", "  ", " \t "),
      Gen.oneOf("\u0000", "\u0007", "\u007f", "\u009b", "\u0001"),
      Gen.oneOf("é", "café", "ä", "ß", "ﬁ"))
    Gen.listOf(piece).map(_.mkString.take(200))
  }

  test("normalizeText: idempotent, disciplined output, across arbitrary messy inputs") {
    check("normalize", Prop.forAll(Gen.listOfN(25, genMessy)) { inputs =>
      val once = normalizeAll(inputs)
      val twice = normalizeAll(once)
      val controlFree = once.forall(!_.exists(c =>
        (c < ' ' && c != '\n') || (c >= '\u007f' && c <= '\u009f')))
      val noDoubleSpace = once.forall(s => !s.contains("  ") && !s.contains("\t"))
      val trimmed = once.forall(s =>
        s.isEmpty || (!s.head.isWhitespace && !s.last.isWhitespace))
      val nfc = once.forall(s =>
        java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      (twice == once) :| "idempotent" &&
        controlFree :| "no control chars survive" &&
        noDoubleSpace :| "whitespace collapsed" &&
        trimmed :| "trimmed" &&
        nfc :| "output is NFC"
    })
  }

  private val genWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))

  test("BPE: encode round-trips any word under any corpus-trained merge table") {
    check("bpe", Prop.forAll(
        Gen.nonEmptyListOf(genWord).map(_.take(40)), Gen.choose(1, 25)) { (words, k) =>
      val freqs = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }.toSeq
      val merges = Bpe.trainDriver(freqs, k)
      val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
      val roundTrip = words.forall(w => Bpe.encodeWord(w, ranks).mkString == w)
      val deterministic = Bpe.trainDriver(freqs, k) == merges
      val ranksOrdered = merges.map(_.rank) == merges.indices
      // every merged symbol is a concatenation of its parts
      val wellFormed = merges.forall(m => (m.left + m.right).nonEmpty)
      roundTrip :| "round-trip" && deterministic :| "deterministic" &&
        ranksOrdered :| "ranks sequential" && wellFormed :| "well-formed"
    })
  }
}
