package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for large-scale document pipelines:
 * tokenization, token counting, quality scoring, language ID, and
 * fingerprinting. All are built from codegen'd `org.apache.spark.sql.functions`
 * (no Scala UDFs) so they stay inside whole-stage codegen and are
 * semantically reproducible in any ANSI engine (the DuckDB oracle mirrors
 * each formula).
 */
object Text {

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word n-grams from a token ARRAY (non-distinct, document order); docs
   *  shorter than `n` tokens yield their whole text as one n-gram — the
   *  same short-doc convention as `Dedup.wordShingles`. Takes the array so
   *  callers materialize the tokenization once. */
  def ngramsFromTokens(toks: Column, n: Int): Column =
    transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** Fraction of tokens that repeat an earlier token — the duplicate-token
   *  repetition signal of Gopher-style quality filtering (Rae et al. 2021,
   *  "Scaling Language Models", §A1.1 repetition filters):
   *  (total − distinct) / total. Doc-local, zero shuffle. */
  def dupTokenRatio(toks: Column): Column =
    (size(toks) - size(array_distinct(toks))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Fraction of array slots occupied by the single most frequent element —
   *  applied to `ngramsFromTokens` this is the top-n-gram coverage
   *  repetition signal. O(len²) per document but doc-local (no shuffle,
   *  stays in codegen); pair with a length cap upstream for pathological
   *  documents. */
  def topFreqFrac(arr: Column): Column =
    array_max(transform(arr, x => size(filter(arr, y => y === x))))
      .cast("double") / greatest(size(arr), lit(1)).cast("double")

  /** BPE-ish subword count: alpha runs, digit runs, and single other
   *  non-space chars — a deterministic proxy for tokenizer load estimates. */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def punctRatio(c: Column): Column =
    size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of whitespace tokens that are (English) stopwords. */
  def stopwordRatio(c: Column): Column = {
    val sw = EnglishStopwords.map(w => s"\\b$w\\b").mkString("|")
    size(regexp_extract_all(lower(c), lit(sw), lit(0))).cast("double") /
      greatest(tokenCount(c), lit(1)).cast("double")
  }

  def avgTokenLen(c: Column): Column =
    length(regexp_replace(trim(c), "\\s+", "")).cast("double") /
      greatest(tokenCount(c), lit(1)).cast("double")

  /**
   * Heuristic quality score in [0,1]: rewards mid-length documents and
   * typical word lengths, penalizes punctuation soup. Deterministic,
   * codegen-friendly; tune weights per corpus.
   */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(400.0), lit(1.0))
    val wordScore = when(avgTokenLen(c).between(3.0, 8.0), lit(1.0)).otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punctRatio(c) * 10.0, lit(1.0))
    round(lenScore * 0.4 + wordScore * 0.4 + punctScore * 0.2, 6)
  }

  /**
   * N-gram/stopword-heuristic language ID over a fixed language set.
   * Scores each language by marker-token hits per whitespace token and takes
   * the argmax (ties broken by language code asc — deterministic).
   */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "is", "of", "to", "a", "in", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est", "que"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "wo3", "zai4"))

  def langScore(c: Column, markers: Seq[String]): Column = {
    val pat = markers.map(w => s"\\b$w\\b").mkString("|")
    size(regexp_extract_all(lower(c), lit(pat), lit(0))).cast("double") /
      greatest(tokenCount(c), lit(1)).cast("double")
  }

  /** Best language by marker score; 'und' (undetermined) when all scores
    * are 0. Argmax over ONE array of (−score, lang) structs — array_min
    * gives max score with ties to the alphabetically smaller language,
    * the same semantics as a strict-> fold, but each langScore expression
    * appears exactly once. The previous when-chain fold re-embedded every
    * earlier score TWICE per step (2^langs copies of the first regex) —
    * harmless while whole-stage codegen dedups it, but a wide projection
    * that falls back to interpreted evaluation paid all of them
    * (measured: 11 s vs 0.2 s over 5k docs in the curation report's
    * cached signal pass). */
  def langId(c: Column): Column = {
    val best = array_min(array(LangMarkers.map { case (lang, markers) =>
      struct((-langScore(c, markers)).as("nscore"), lit(lang).as("lang"))
    }: _*))
    when(best.getField("nscore") < 0.0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Fraction of non-empty (trimmed) lines that repeat an earlier line —
    * C4's duplicate-line signal (Raffel et al. 2020 §2.2 discard rules).
    * Doc-local, zero shuffle. */
  def duplicateLineFraction(c: Column): Column = {
    // deliberately HOF-free: the previous filter(transform(...)) form is a
    // CodegenFallback expression, and ONE fallback pins every projection
    // containing the quality verdict to interpreted evaluation — at 5M
    // docs that made the training-set build's filter the dominant cost.
    // Equivalent: strip per-line leading/trailing spaces (trim(Column)
    // trims 0x20 only, so `[ ]` matches its semantics), let the `\n+`
    // split collapse now-empty lines, drop boundary empties — all
    // codegen'd string/array expressions
    val stripped =
      regexp_replace(regexp_replace(c, "(?m)[ ]+$", ""), "(?m)^[ ]+", "")
    val lines = array_remove(split(stripped, "\n+"), "")
    (size(lines) - size(array_distinct(lines))).cast("double") /
      greatest(size(lines), lit(1)).cast("double")
  }

  /**
   * Composed document-quality verdict — the C4/Gopher rule battery (Raffel
   * et al. 2020 §2.2; Rae et al. 2021 §A1.1) over this file's signals, as
   * ONE column: `struct(keep, reason)` where `reason` names the FIRST
   * failing rule (rule order = argument order) or 'keep'. Tune thresholds
   * per corpus; a disabled rule is a threshold the data cannot cross
   * (e.g. `minStopwordFrac = 0` for non-English corpora).
   */
  def qualityVerdict(
      c: Column,
      minTokens: Int = 50, maxTokens: Int = 100000,
      minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
      minStopwordFrac: Double = 0.06,
      maxDupLineFrac: Double = 0.3,
      maxDupTokenRatio: Double = 0.6): Column = {
    val n = tokenCount(c)
    val awl = avgTokenLen(c)
    val reason =
      when(n < minTokens, "too_few_tokens")
        .when(n > maxTokens, "too_many_tokens")
        .when(awl < minAvgWordLen || awl > maxAvgWordLen, "word_length")
        .when(stopwordRatio(c) < minStopwordFrac, "low_stopword_frac")
        .when(duplicateLineFraction(c) > maxDupLineFrac, "dup_lines")
        .when(dupTokenRatio(tokens(c)) > maxDupTokenRatio, "dup_tokens")
        .otherwise("keep")
    struct((reason === "keep").as("keep"), reason.as("reason"))
  }

  /**
   * PII patterns for training-data scrubbing: emails, US phone numbers,
   * SSNs, credit-card-shaped numbers, IPv4 addresses. Deliberately RE2-safe
   * (no lookarounds/backreferences) so the SAME pattern runs in Spark
   * (java.util.regex) and any RE2 engine (the DuckDB oracle included) with
   * identical matches. Declared order is redaction order; every pattern has
   * a fixed-shape match so leftmost-greedy (Java) and leftmost-longest
   * (RE2) agree.
   */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "phone" -> "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b",
    "card" -> "\\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\\b",
    "ip" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  /** Match count of one PII pattern — doc-local, zero shuffle. */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Total PII matches across a pattern set (counted on the progressively
    * redacted text, so overlapping patterns never double-count). */
  def piiTotal(c: Column, patterns: Seq[(String, String)] = PiiPatterns): Column =
    patterns.zipWithIndex.map { case ((_, pat), i) =>
      // count each pattern on the text with all earlier patterns redacted
      val prior = patterns.take(i)
      piiCount(redactPii(c, prior), pat)
    }.reduce(_ + _)

  /** Replace every PII match with its `<TYPE>` token, in declared order —
    * the scrubbing pass a corpus takes before training-data release. */
  def redactPii(c: Column, patterns: Seq[(String, String)] = PiiPatterns): Column =
    patterns.foldLeft(c) { case (acc, (name, pat)) =>
      regexp_replace(acc, pat, s"<${name.toUpperCase}>")
    }

  /**
   * Character k-gram shingles (positions 1..len-k+1). Used by the dedup
   * family; array order is positional, so downstream mins are deterministic.
   */
  def charShingles(c: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => c.substr(i, lit(k)))

  /**
   * Rolling-hash document fingerprint: the minimum md5 over all character
   * k-grams (a 1-hash MinHash — stable under content moves, cheap at scale:
   * one pass, no shuffle).
   */
  def fingerprint(c: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => md5(c.substr(i, lit(k)).cast("binary"))))
}
