package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators (tokenization,
  * shingling, quality features). All pure built-in expressions — they stay
  * inside whole-stage codegen and are replayable in the DuckDB oracle.
  */
object TextFns {

  /** The shared stopword lexicon (quality scoring, Gopher-style gating).
    * Tiny by design: the signal is "has function words at all", not
    * linguistic coverage. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** Whitespace-collapsed, lower-cased canonical form — the normalization
    * step of document fingerprinting.
    */
  def normalized(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokenization. `split` on `\s+` after trim, matching the
    * oracle's `string_split_regex(trim(s), '\s+')`.
    */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** BPE-ish sub-word tokenization: letter runs, digit runs, and single
    * punctuation marks each count as one token (the usual pre-tokenizer
    * regex shape). Oracle: `regexp_extract_all(s, pattern)`.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(bpeTokenPattern), lit(0))

  /** Word n-gram shingles over [[tokens]]: `size-n+1` overlapping `n`-token
    * strings joined by a single space. Empty array when the document has
    * fewer than `n` tokens (guards Spark's descending-`sequence` pitfall).
    */
  def shingles(c: Column, n: Int): Column = shinglesOfTokens(tokens(c), n)

  /** [[shingles]] over an ALREADY-TOKENIZED array column — for pipelines
    * that materialize the token array once and derive several relations
    * from it (tokenizing is the dominant projection cost on long texts).
    */
  def shinglesOfTokens(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Exact-dedup document fingerprint: md5 of the normalized text.
    * Identical in DuckDB: `md5(normalized)`.
    */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Prefix fingerprint: md5 over the first `len` normalized chars — the
    * cheap "near-exact" dedup key (catches docs differing only in a tail).
    */
  def prefixFingerprint(c: Column, len: Int): Column =
    md5(substring(normalized(c), 1, len))

  /** 60-bit rolling-hash-style numeric fingerprint (see Hashing.h60). */
  def fingerprint60(c: Column): Column = Hashing.h60(normalized(c))
}
