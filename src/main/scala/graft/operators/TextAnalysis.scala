package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, and document fingerprinting.
  *
  * Everything here is pure column expressions (whole-stage codegen, no
  * UDFs), so these run at scan speed and the filters they feed survive
  * Catalyst pushdown/pruning.
  */
object TextAnalysis {

  /** Unicode NFC composition as a codegen'd column (Spark ships none);
    * see [[graft.functions.NfcNormalizeF]].
    */
  def nfc(text: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.functions.NfcNormalizeF(org.apache.spark.sql.GraftShim.expression(text)))

  /** Canonical text normalization — the cleanup pass every training-data
    * pipeline runs before dedup/quality/tokenization so that visually
    * identical text hashes identically:
    *
    *   1. Unicode NFC (é vs e+U+0301 unify; [[nfc]])
    *   2. line endings → `\n` (`\r\n` and bare `\r`)
    *   3. control characters stripped (C0 except tab/newline, DEL, C1)
    *   4. horizontal whitespace runs → one space
    *   5. spaces hugging newlines dropped (no trailing-line blanks)
    *   6. leading/trailing whitespace trimmed
    *
    * Newlines survive deliberately: the line-level operators (C4 line
    * dedup, Gopher line rules) need them. Every step is a builtin
    * `regexp_replace` around the custom NFC expression — the whole chain
    * stays inside whole-stage codegen, zero shuffles, and is portable to
    * the DuckDB oracle operation-for-operation (q_normalize).
    */
  def normalizeText(text: Column): Column = {
    val s1 = nfc(text)
    val s2 = regexp_replace(s1, "\\r\\n|\\r", "\n")
    val s3 = regexp_replace(s2, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]", "")
    val s4 = regexp_replace(s3, "[ \\t]+", " ")
    val s5 = regexp_replace(s4, " *\\n *", "\n")
    regexp_replace(s5, "^[ \\n]+|[ \\n]+$", "")
  }

  /** Mojibake (encoding-damage) repair — the ftfy-style fix for UTF-8
    * text that was decoded as Windows-1252/Latin-1 somewhere upstream.
    * Row-local codegen'd expression ([[graft.functions.MojibakeF]]);
    * clean text (including legitimate accented text without the
    * double-encoding signature) passes through untouched.
    */
  def fixMojibake(text: Column): Column =
    org.apache.spark.sql.GraftShim.column(graft.functions.MojibakeF(
      org.apache.spark.sql.GraftShim.expression(text)))

  /** HTML → text extraction, the first step of any web-crawl training
    * pipeline (the C4/RefinedWeb ingest shape: WARC page → visible text
    * before any quality gate runs):
    *
    *   1. `<script>`/`<style>` ELEMENTS removed wholesale (their content
    *      is code, not prose; the lazy `.*?` spans nested markup-free
    *      bodies, and `(?is)` makes it case-insensitive across lines)
    *   2. HTML comments removed
    *   3. block-element CLOSERS (`</p> </div> </h1..6> </li> </tr>` and
    *      `<br>`) become newlines, so paragraph structure survives for
    *      the line-level operators downstream
    *   4. every remaining tag → a space (inline tags must not glue words)
    *   5. the five XML entities + `&nbsp;` decoded (of the decimal
    *      `&#NN;` forms only `&#39;` — the ubiquitous apostrophe — is
    *      handled; a general numeric decode needs a char-code
    *      conversion no portable regex chain can express)
    *   6. whitespace collapsed per [[normalizeText]]'s rules
    *
    * Pure builtin regex chain — scan-fused, codegen'd, zero shuffles,
    * portable operation-for-operation to the DuckDB oracle
    * (q_html_extract). Deliberately heuristic: a full HTML5 tree parser
    * is not expressible as columnar algebra and buys little for quality
    * filtering — this is the standard regex-extraction recipe.
    */
  def extractHtmlText(html: Column): Column = {
    val s1 = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val s2 = regexp_replace(s1, "(?is)<style[^>]*>.*?</style>", " ")
    val s3 = regexp_replace(s2, "(?s)<!--.*?-->", " ")
    val s4 = regexp_replace(s3,
      "(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|blockquote)>|<br[^>]*>", "\n")
    val s5 = regexp_replace(s4, "(?s)<[^>]*>", " ")
    val s6 = regexp_replace(s5, "&nbsp;", " ")
    val s7 = regexp_replace(s6, "&lt;", "<")
    val s8 = regexp_replace(s7, "&gt;", ">")
    val s9 = regexp_replace(s8, "&quot;", "\"")
    val s10 = regexp_replace(s9, "&#39;|&apos;", "'")
    val s11 = regexp_replace(s10, "&amp;", "&")
    val s12 = regexp_replace(s11, "[ \\t]+", " ")
    val s13 = regexp_replace(s12, " *\\n[ \\n]*", "\n")
    regexp_replace(s13, "^[ \\n]+|[ \\n]+$", "")
  }

  /** Flesch reading-ease (Flesch 1948): 206.835 − 1.015·(words/sentences)
    * − 84.6·(syllables/word) — the classic readability signal curation
    * pipelines use to bias toward educational prose. Sentences are
    * terminal-punctuation runs (min 1); syllables are vowel-group counts
    * (the standard regex proxy — exact syllabification needs a
    * dictionary, and the score is a monotone filter signal, not prosody).
    * One scan-fused expression; deterministic double math, so the value
    * is hash-exact cross-engine.
    */
  def fleschReadingEase(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sentences = greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("double")
    val syllables = regexp_count(lower(text), lit("[aeiouy]+")).cast("double")
    round(lit(206.835) - lit(1.015) * words / sentences
      - lit(84.6) * syllables / greatest(words, lit(1.0)), 4)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(Dedup.tokens(text))

  /** BPE-ish token estimate: counts word/number/punctuation chunks the way a
    * byte-pair tokenizer's pre-tokenizer splits (letters run | digits run |
    * single punct). A cheap, deterministic proxy for LLM token budgeting.
    */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Quality-score components; all ratios in [0,1]. */
  def charCount(text: Column): Column = length(text)
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / length(text))
      .otherwise(0.0)
  def upperRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^A-Z]", "")).cast("double") / length(text))
      .otherwise(0.0)
  def digitRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))
      .otherwise(0.0)
  def meanWordLen(text: Column): Column = {
    val toks = Dedup.tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(0.0)
  }
  def stopwordRatio(text: Column, stopwords: Seq[String] = StopWords.en): Column = {
    val toks = Dedup.tokens(text)
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks))
      .otherwise(0.0)
  }

  /** Composite heuristic quality score in [0,1]: rewards natural stopword
    * density and word lengths, penalizes punctuation/digit noise. The exact
    * weights are a heuristic; the value is monotone in "looks like prose".
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(len / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 3.0, lit(1.0))
    val wordLen = meanWordLen(text)
    val wordScore = when(wordLen.between(3.0, 8.0), 1.0).otherwise(0.5)
    val noise = punctRatio(text) + digitRatio(text)
    val noiseScore = greatest(lit(0.0), lit(1.0) - noise * 2.0)
    round(lenScore * 0.25 + stopScore * 0.35 + wordScore * 0.2 + noiseScore * 0.2, 4)
  }

  /** Language ID by stopword evidence: score each candidate language by the
    * fraction of tokens found in its stopword list, pick the argmax
    * (ties → "und" if zero evidence). N-gram-free but robust for the long
    * documents a pretraining pipeline filters on.
    */
  def languageId(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val scored = StopWords.all.map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words: _*))).cast("double").as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Order-sensitive document fingerprint: two independent polynomial
    * rolling hashes over the token sequence, each mod 2³¹−1 (keeps every
    * intermediate < 2⁶², so it is exact under ANSI arithmetic — no wrapping
    * needed), packed into one 62-bit value. Equal fingerprint ⇒ same token
    * sequence modulo collisions; unlike minhash/simhash this is
    * order-sensitive.
    */
  def fingerprint(text: Column): Column = fingerprintTokens(Dedup.tokens(text))

  /** The same rolling fingerprint over an explicit token-array column —
    * lets callers fingerprint a slice (e.g. the first N tokens for
    * title-style prefix dedup).
    */
  def fingerprintTokens(tokens: Column): Column = {
    val m = 2147483647L // 2^31 - 1
    val packed = aggregate(
      tokens,
      struct(lit(7L).as("a"), lit(13L).as("b")),
      (acc, t) => struct(
        pmod(acc.getField("a") * 1000003L + pmod(xxhash64(t), lit(m)), lit(m)).as("a"),
        pmod(acc.getField("b") * 69069L + pmod(xxhash64(lit(1), t), lit(m)), lit(m)).as("b")))
    packed.getField("a") * 2147483648L + packed.getField("b")
  }

  /** PII patterns for scrubbing — RE2-safe (no backrefs/lookaround) so the
    * same pattern text runs identically in Spark (java.util.regex) and in
    * engines on RE2 (the DuckDB oracle). The usual pretraining-pipeline
    * redaction pass: emails, IPv4s, simple phone shapes.
    */
  object Pii {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val phone = "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}\\b"
    // r7 additions: SSN shape, card-number digit runs (13-19 digits with
    // optional space/dash separators — aggressively scrubbed WITHOUT a
    // Luhn gate: for training data a false positive costs a token, a
    // false negative leaks a card), simplified IPv6, IBAN shape
    val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    val card = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"
    // ≥5 segments (4+ colon groups): clock times (12:30:45), scores and
    // ratios stay unscrubbed; real uncompressed IPv6 always has 8
    val ipv6 = "\\b(?:[0-9A-Fa-f]{1,4}:){4,7}[0-9A-Fa-f]{1,4}\\b"
    val iban = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}\\b"
    // chain order is load-bearing: email first (user@host digits must not
    // half-match as phone), ssn before card before ipv4/phone (the wider
    // digit-run patterns must not eat the narrower shapes' remnants)
    val all: Seq[(String, String)] =
      Seq(email -> "<EMAIL>", ssn -> "<SSN>", card -> "<CARD>",
        ipv4 -> "<IP>", ipv6 -> "<IP6>", phone -> "<PHONE>", iban -> "<IBAN>")
  }

  /** Scrub PII: replace each pattern with its tag, left to right (emails
    * first so user@host never half-matches as a phone). Pure codegen'd
    * regexp_replace chain — runs at scan speed over 100 TB.
    */
  def scrubPii(text: Column): Column =
    Pii.all.foldLeft(text) { case (c, (pat, tag)) => regexp_replace(c, pat, tag) }

  /** Count of PII matches per category (pre-scrub evidence columns). */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(Pii.email)).as("n_emails"),
    regexp_count(text, lit(Pii.ipv4)).as("n_ips"),
    regexp_count(text, lit(Pii.phone)).as("n_phones"),
    regexp_count(text, lit(Pii.ssn)).as("n_ssns"),
    regexp_count(text, lit(Pii.card)).as("n_cards"),
    regexp_count(text, lit(Pii.ipv6)).as("n_ip6s"),
    regexp_count(text, lit(Pii.iban)).as("n_ibans"))

  /** Within-document repetition profile over token n-grams (NOT distinct —
    * repetition is the signal): max single-gram frequency, number of
    * repeated occurrences (total − distinct), and the distinct count.
    * High repeated_grams/max_gram_freq flags boilerplate/spam docs — the
    * standard intra-doc quality gate next to [[qualityScore]]'s
    * surface stats. One shuffle on (doc, gram) with map-side partials.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    // gram construction is codegen'd (r17, [[graft.functions.GramStringsF]]
    // — the interpreted transform/slice/concat_ws chain was the dedup-wide
    // hotspot; value-identical windows)
    val grams = df
      .filter(size(toks) >= n)
      .select(col(idCol).as("doc"),
        explode(org.apache.spark.sql.GraftShim.column(graft.functions.GramStringsF(
          org.apache.spark.sql.GraftShim.expression(toks), n))).as("gram"))
    grams.groupBy("doc", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc")
      .agg(max(col("cnt")).as("max_gram_freq"),
        (sum(col("cnt")) - count(lit(1))).as("repeated_grams"),
        count(lit(1)).as("distinct_grams"))
  }

  /** Corpus bigram-LM scoring — the statistical quality gate next to the
    * surface heuristics in [[qualityScore]] (the CCNet/RefinedWeb-style
    * perplexity filter): score each document by the average log-probability
    * of its token bigrams under an MLE bigram model fitted on the corpus
    * itself, p(w2|w1) = c(w1,w2) / c(w1,·) with c(w1,·) = Σ_w2 c(w1,w2).
    * Gibberish and shuffled-boilerplate docs score low (high perplexity)
    * even when their length/punctuation stats look like prose.
    *
    * Returns (doc, n_bigrams, sum_bigram_c, sum_context_c, avg_logprob,
    * perplexity); docs with < 2 tokens keep n_bigrams = 0 and NULL scores.
    * The integer sufficient statistics pin the whole heavy plan for the
    * engine-portable oracle; the log/exp step is row-local on top of them
    * (cross-engine doubles differ in last ulps, so the oracle checks the
    * exact integers instead — see q_lm_score).
    *
    * Scale shape: bigram counts are one shuffle with map-side partials
    * (output bounded by distinct bigrams, not corpus size); context counts
    * derive from the bigram table — a second, vocab-sized aggregation, NOT
    * a second corpus pass; scoring is ONE corpus-side equi-join against
    * the (bigram → (c12, c1)) table, where every bigram occurrence matches
    * exactly one row — hot stopword bigrams are 1:1 matches, not fan-outs,
    * so output stays linear in corpus tokens.
    *
    * The `pairs` explode is deliberately traversed TWICE (once under the
    * count tables, once under the scoring join) rather than persisted —
    * the same recompute-over-cache trade [[Dedup.duplicatedSpanStats]]
    * documents: the exploded bigram form is ~token-count × the corpus,
    * so caching it at 100 TB would evict everything else, while
    * re-deriving it is a scan-fused projection.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    // bigram emission is codegen'd (r17, [[graft.functions.BigramsF]] —
    // same positional pairs, no interpreted per-window struct lambdas);
    // this projection is traversed twice (see the scaladoc trade), so the
    // per-window cost counts double
    val pairs = df.filter(size(toks) >= 2).select(
        col(idCol).as("doc"),
        explode(org.apache.spark.sql.GraftShim.column(graft.functions.BigramsF(
          org.apache.spark.sql.GraftShim.expression(toks)))).as("bg"))
      .select(col("doc"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bigramCounts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val contextCounts = bigramCounts.groupBy("w1").agg(sum("c12").as("c1"))
    val bc = bigramCounts.join(contextCounts, "w1")
    val scored = pairs.join(bc, Seq("w1", "w2"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("c12").as("sum_bigram_c"),
        sum("c1").as("sum_context_c"),
        avg(log(col("c12").cast("double") / col("c1"))).as("avg_logprob"))
    df.select(col(idCol).as("doc")).join(scored, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_bigram_c"), lit(0L)).as("sum_bigram_c"),
        coalesce(col("sum_context_c"), lit(0L)).as("sum_context_c"),
        col("avg_logprob"),
        when(col("avg_logprob").isNotNull, exp(-col("avg_logprob")))
          .as("perplexity"))
  }

  /** Data-selection importance scoring (the hashed-n-gram importance-
    * resampling recipe): score every document by how much more likely its
    * tokens are under a TARGET distribution (a trusted high-quality slice —
    * curated sources, a reference corpus) than under the RAW corpus
    * distribution. Documents that "sound like" the target get high scores;
    * sampling ∝ exp(score) tilts a 100 TB crawl toward the target domain
    * without training a classifier.
    *
    *   score(doc) = Σ_tokens [ ln((ct+1)/(Tt+V)) − ln((cr+1)/(Tr+V)) ]
    *
    * with ct/cr = target/raw corpus counts of the token (add-one smoothed),
    * Tt/Tr the corpus token totals and V the shared vocabulary size.
    * Returns (doc, n_tokens, sum_target_c, sum_raw_c, score, avg_llr);
    * the integer sufficient statistics (Σ ct, Σ cr over the doc's tokens,
    * un-smoothed) pin the count tables and the scoring join for the
    * engine-portable oracle — the log-space score is row-local double math
    * on top of them (same split as [[lmScore]] / q_lm_score).
    *
    * Scale shape: both unigram tables are one map-side-combined shuffle
    * each, output bounded by VOCAB, not corpus; V/Tt/Tr are three scalar
    * aggregates of those tables (broadcast back as a 1-row cross join, no
    * driver round-trip in the plan); scoring is ONE corpus-side equi-join
    * of token occurrences against the merged count table — every occurrence
    * matches exactly one row (hot stopwords are 1:1 matches, not fan-outs).
    * The token explode is traversed once per count table and once for
    * scoring — the recompute-over-cache trade documented on
    * [[Dedup.duplicatedSpanStats]]: the exploded form is ~tokens × corpus,
    * re-deriving it is a scan-fused projection.
    */
  def importanceScore(df: DataFrame, targetFilter: Column, idCol: String,
      textCol: String): DataFrame = {
    val occ = df.select(col(idCol).as("doc"), targetFilter.as("is_target"),
        explode(Dedup.tokens(col(textCol))).as("term"))
      .select(col("doc"), col("is_target"), xxhash64(col("term")).as("term_h"))
    // one vocab-bounded table carrying both distributions (raw = ALL docs,
    // the denominator the resampling literature uses; target ⊆ raw)
    val counts = occ.groupBy("term_h")
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
    val totals = counts.agg(count(lit(1)).as("vocab"),
      sum("ct").as("tt"), sum("cr").as("tr"))
    val scored = occ.select(col("doc"), col("term_h"))
      .join(counts, "term_h")
      .crossJoin(broadcast(totals))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_tokens"),
        sum("ct").as("sum_target_c"),
        sum("cr").as("sum_raw_c"),
        sum(log((col("ct") + 1).cast("double") / (col("tt") + col("vocab"))) -
          log((col("cr") + 1).cast("double") / (col("tr") + col("vocab"))))
          .as("score"))
    df.select(col(idCol).as("doc")).join(scored, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_target_c"), lit(0L)).as("sum_target_c"),
        coalesce(col("sum_raw_c"), lit(0L)).as("sum_raw_c"),
        col("score"),
        (col("score") / col("n_tokens")).as("avg_llr"))
  }

  /** The stop set the Gopher rules check for minimum-evidence-of-prose
    * (Rae et al. 2021, §A1.1.1 — public recipe).
    */
  val gopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style rule-based quality filter (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", appendix A1.1.1 — the standard
    * pretraining heuristic gate next to the model-based scores): per-doc
    * evidence columns plus one conjunctive `keep` flag.
    *
    *   - word count in [minWords, maxWords] (paper: 50..100 000)
    *   - mean word length in [3, 10]
    *   - symbol-to-word ratio ('#' or '...') ≤ 0.1
    *   - ≤ 90% of lines start with a bullet, ≤ 30% end with '...'
    *   - ≥ 80% of words contain an alphabetic character
    *   - ≥ 2 DISTINCT words from the 8-word stop set
    *
    * Pure codegen'd column expressions — runs at scan speed, and the
    * `keep` flag it feeds survives Catalyst pushdown like every other
    * filter here. All ratios are single int/int IEEE divisions, so the
    * DuckDB oracle reproduces them bit-exactly (q_gopher).
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000, minStopHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val toks = Dedup.tokens(t)
    val nWords = size(toks)
    val nwD = greatest(nWords, lit(1)).cast("double")
    val meanLen =
      aggregate(toks, lit(0L), (a, x) => a + length(x)).cast("double") / nwD
    val symbolRatio =
      (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))).cast("double") / nwD
    val lines = split(t, "\n")
    val nlD = greatest(size(lines), lit(1)).cast("double")
    val bulletRatio =
      size(filter(lines, l => ltrim(l).rlike("^[-*•]"))).cast("double") / nlD
    val ellipsisRatio =
      size(filter(lines, l => rtrim(l).rlike("\\.\\.\\.$"))).cast("double") / nlD
    val alphaRatio =
      size(filter(toks, x => x.rlike("[a-z]"))).cast("double") / nwD
    val stopHits =
      size(array_intersect(array_distinct(toks),
        array(gopherStopWords.map(lit): _*)))
    df.select(
      col(idCol),
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletRatio.as("bullet_line_ratio"),
      ellipsisRatio.as("ellipsis_line_ratio"),
      alphaRatio.as("alpha_word_ratio"),
      stopHits.as("stop_hits"),
      (nWords.between(minWords, maxWords) &&
        meanLen.between(3.0, 10.0) &&
        symbolRatio <= 0.1 &&
        bulletRatio <= 0.9 &&
        ellipsisRatio <= 0.3 &&
        alphaRatio >= 0.8 &&
        stopHits >= minStopHits).as("keep"))
  }

  /** Substrings whose presence disqualifies a line under the C4 cleaning
    * rules (Raffel et al. 2020 §2.2 — public recipe; boilerplate/code
    * markers).
    */
  val c4LineBlocklist: Seq[String] =
    Seq("javascript", "lorem ipsum", "terms of use", "privacy policy",
      "cookie policy", "{")

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    * lines that end in terminal punctuation (optionally followed by a
    * closing quote), carry ≥ `minLineWords` words, and contain none of the
    * boilerplate blocklist markers; then gate the whole doc on having ≥
    * `minSentences` sentences left. The line-level complement to the
    * doc-level [[gopherRules]] gate — published pipelines run both.
    *
    * Returns (idCol, n_lines, kept_lines, n_sentences, keep, clean_text);
    * `clean_text` is the kept lines rejoined with newlines (original
    * casing and spacing preserved — cleaning drops lines, it does not
    * re-tokenize). Pure codegen'd column expressions, zero shuffle.
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keptCol = filter(lines, l => {
      val words = size(filter(split(l, "\\s+"), t => t =!= ""))
      val terminal = rtrim(l).rlike("[.!?][\"']?$")
      val blocked = c4LineBlocklist
        .map(m => lower(l).contains(m))
        .reduce(_ || _)
      terminal && words >= minLineWords && !blocked
    })
    df.select(col(idCol), lines.as("lines"), keptCol.as("kept"))
      .select(col(idCol),
        size(col("lines")).as("n_lines"),
        size(col("kept")).as("kept_lines"),
        concat_ws("\n", col("kept")).as("clean_text"))
      .select(col(idCol), col("n_lines"), col("kept_lines"),
        regexp_count(col("clean_text"), lit("[.!?]")).as("n_sentences"),
        col("clean_text"))
      .select(col(idCol), col("n_lines"), col("kept_lines"), col("n_sentences"),
        (col("kept_lines") > 0 && col("n_sentences") >= minSentences).as("keep"),
        col("clean_text"))
  }

  /** Gopher REPETITION rules (Rae et al. 2021 §A1.1.2 — the second half
    * of the paper's filter next to [[gopherRules]]' surface battery):
    * remove documents dominated by repeated content. Thresholds from the
    * paper's table A1:
    *
    *   - duplicate line fraction > 0.30 (repeats of an earlier line)
    *   - duplicate line CHARACTER fraction > 0.20
    *   - top {2,3,4}-gram character fraction > {0.20, 0.18, 0.16}
    *   - duplicate {5..10}-gram character fraction > {0.15 .. 0.10}
    *
    * Character basis: Σ length(token) over the doc's whitespace tokens
    * (separator-free, so the fraction is a pure function of token content
    * and both engines compute identical integers — the q_gopher_rep
    * oracle replays every numerator/denominator). A gram's character
    * weight is the char sum of its n tokens; duplicate-gram coverage is
    * the UNION of token positions covered by any within-doc-repeated
    * n-gram (overlaps counted once — the [[Dedup.duplicatedSpanStats]]
    * coverage semantics, per doc).
    *
    * Plan shape: ONE scan-fused explode emits (doc, n, pos, gram) for all
    * nine gram sizes; one (doc, n, gram) map-side-combined count feeds the
    * top-gram maxima directly, and repeated grams' positions come back as
    * per-(doc, n) sorted start arrays whose coverage is a row-local
    * higher-order sum ([[Dedup.removeDuplicatedSpans]]' cut pattern) —
    * nothing quadratic, per-doc state bounded by dup-start counts.
    */
  def gopherRepetitionRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val topCaps = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupCaps = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

    val toks = Dedup.tokens(col(textCol))
    val base = df.select(col(idCol).as("doc"), toks.as("toks"),
      split(col(textCol), "\n").as("lines"))

    // ── line rules (exact line repeats; first occurrence is not a dup)
    val lineStats = base.select(col("doc"),
        posexplode(col("lines")).as(Seq("lpos", "line")))
      .groupBy("doc", "line")
      .agg(count(lit(1)).as("cnt"), length(col("line")).as("lchars"))
      .groupBy("doc")
      .agg(sum(col("cnt")).as("n_lines"),
        sum(col("cnt") - 1).as("dup_lines"),
        sum(col("cnt") * col("lchars")).as("line_chars"),
        sum((col("cnt") - 1) * col("lchars")).as("dup_line_chars"))
      .select(col("doc"),
        (col("dup_lines").cast("double") / greatest(col("n_lines"), lit(1L)))
          .as("dup_line_frac"),
        (col("dup_line_chars").cast("double") / greatest(col("line_chars"), lit(1L)))
          .as("dup_line_char_frac"))

    // ── one explode for every gram size: (doc, n, pos, gram), emitted by
    // the codegen'd [[graft.functions.MultiGramsF]] (r17 — the nine
    // interpreted transform/filter/slice/concat_ws chains per row were the
    // heaviest expression work in the whole text battery; windows and
    // values are identical)
    val grams = base.select(col("doc"),
        explode(org.apache.spark.sql.GraftShim.column(graft.functions.MultiGramsF(
          org.apache.spark.sql.GraftShim.expression(col("toks")),
          topNs ++ dupNs))).as("g"))
      .select(col("doc"), col("g.n").as("n"), col("g.pos").as("pos"),
        col("g.gram").as("gram"))
    val gramCounts = grams.groupBy("doc", "n", "gram")
      .agg(count(lit(1)).as("cnt"))
      // char weight of one occurrence: token chars only (spaces excluded)
      .withColumn("gchars", length(col("gram")) - (col("n") - 1))

    // top-gram char mass per (doc, n ∈ 2..4)
    val tops = gramCounts.filter(col("n").isin(topNs.map(Integer.valueOf): _*))
      .groupBy("doc", "n").agg(max(col("cnt") * col("gchars")).as("top_chars"))
    // repeated-gram start positions per (doc, n ∈ 5..10), sorted
    val dupStarts = grams.filter(col("n").isin(dupNs.map(Integer.valueOf): _*))
      .join(gramCounts.filter(col("cnt") >= 2).select("doc", "n", "gram"),
        Seq("doc", "n", "gram"), "left_semi")
      .groupBy("doc", "n").agg(sort_array(collect_list(col("pos"))).as("starts"))
    // row-local coverage: chars of tokens under any [s, s+n) window
    val dupCov = base.join(dupStarts, Seq("doc"))
      .select(col("doc"), col("n"),
        aggregate(
          filter(col("toks"), (_, i) =>
            exists(col("starts"), s => s <= i && i < s + col("n"))),
          lit(0L), (acc, t) => acc + length(t)).as("dup_chars"))

    val totals = base.select(col("doc"),
      aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).as("tchars"))

    def pivotMax(src: DataFrame, ns: Seq[Int], vcol: String, pfx: String): DataFrame = {
      val aggs = ns.map(n =>
        max(when(col("n") === n, col(vcol))).as(s"$pfx${n}gram_chars"))
      src.groupBy("doc").agg(aggs.head, aggs.tail: _*)
    }
    val joined = df.select(col(idCol).as("doc"))
      .join(lineStats, Seq("doc"), "left")
      .join(totals, Seq("doc"), "left")
      .join(pivotMax(tops, topNs, "top_chars", "top_"), Seq("doc"), "left")
      .join(pivotMax(dupCov, dupNs, "dup_chars", "dup_"), Seq("doc"), "left")

    val t = greatest(col("tchars"), lit(1L)).cast("double")
    val topFracs = topNs.map(n =>
      (coalesce(col(s"top_${n}gram_chars"), lit(0L)).cast("double") / t)
        .as(s"top_${n}gram_char_frac"))
    val dupFracs = dupNs.map(n =>
      (coalesce(col(s"dup_${n}gram_chars"), lit(0L)).cast("double") / t)
        .as(s"dup_${n}gram_char_frac"))
    val withFracs = joined.select(
      (col("doc") +:
        coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac") +:
        coalesce(col("dup_line_char_frac"), lit(0.0)).as("dup_line_char_frac") +:
        (topFracs ++ dupFracs)): _*)
    val keep = (col("dup_line_frac") <= 0.30) &&
      (col("dup_line_char_frac") <= 0.20) &&
      topNs.map(n => col(s"top_${n}gram_char_frac") <= topCaps(n)).reduce(_ && _) &&
      dupNs.map(n => col(s"dup_${n}gram_char_frac") <= dupCaps(n)).reduce(_ && _)
    withFracs.withColumn("keep", keep)
  }

  /** Full per-document feature frame used by quality filtering. */
  def features(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      tokenCount(t).as("n_tokens"),
      tokenCountBpe(t).as("n_tokens_bpe"),
      charCount(t).as("n_chars"),
      round(punctRatio(t), 4).as("punct_ratio"),
      round(digitRatio(t), 4).as("digit_ratio"),
      round(meanWordLen(t), 4).as("mean_word_len"),
      round(stopwordRatio(t), 4).as("stopword_ratio"),
      qualityScore(t).as("quality"),
      languageId(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"))
  }
}

/** Minimal stopword lists for stopword-evidence language ID. */
object StopWords {
  val en: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
    "it", "that", "for", "on", "with", "as", "this", "are", "be", "at", "by")
  val de: Seq[String] = Seq("der", "die", "das", "und", "oder", "von", "zu", "im",
    "ist", "es", "dass", "für", "auf", "mit", "als", "sind", "ein", "eine", "bei", "nicht")
  val fr: Seq[String] = Seq("le", "la", "les", "et", "ou", "de", "du", "dans", "est",
    "il", "que", "pour", "sur", "avec", "comme", "ce", "sont", "une", "aux", "pas")
  val es: Seq[String] = Seq("el", "los", "las", "y", "o", "de", "del", "en", "es",
    "que", "para", "por", "con", "como", "este", "son", "una", "unos", "al", "no")
  val all: Seq[(String, Seq[String])] = Seq("en" -> en, "de" -> de, "fr" -> fr, "es" -> es)
}
