package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the LLM-pipeline operators
  * (dedup, text analysis). Everything here is built-in-expression only —
  * no UDFs — so it stays inside whole-stage codegen and is reproducible
  * verbatim in the DuckDB oracle SQL.
  *
  * Cross-engine determinism contract (the correctness gate hashes values):
  *  - the 60-bit hash is the first 15 hex chars of md5 — identical in any
  *    engine with md5;
  *  - all modular arithmetic stays below 2^62 (Spark 4 runs ANSI mode:
  *    long overflow THROWS, it does not wrap);
  *  - ratios are always cast(int as double) / cast(int as double) — never
  *    `* 1.0` (Spark parses 1.0 as DECIMAL and the result type diverges
  *    from DuckDB's double).
  */
object TextOps {

  /** 2^31 - 1, the modulus for MinHash permutations: keeps every product
    * `a * x` below 2^62 (ANSI-safe). */
  val P: Long = 2147483647L

  /** Deterministic 60-bit hash of a string: first 15 hex chars of md5.
    * DuckDB equivalent: `cast('0x' || substr(md5(x),1,15) as bigint)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace-token array. Single-space split (not `\s+`) to match
    * DuckDB's `string_split(text, ' ')` exactly. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles. A doc shorter than n words yields its
    * whole text as one (clamped) shingle — same clamping as DuckDB list
    * slicing, so shingle sets agree on edge docs too. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = words(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(w, i, lit(n)))))
  }

  /** Count of non-whitespace runs — the token count used by text stats.
    * Resolves to the codegen'd [[graft.functions.TokenCount]] byte scan;
    * [[tokenCountRegex]] is the value-identical reference formulation. */
  def tokenCount(text: Column): Column = call_function("token_runs", text, lit("ws"))

  /** Reference formulation of [[tokenCount]] (equivalence-test target,
    * and the literal shape the DuckDB oracle reproduces). */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** Count of code points outside `[A-Za-z0-9\s]` — the punctuation
    * density numerator in quality scoring. Native byte scan; the regex
    * reference is [[punctCountRegex]]. */
  def punctCount(text: Column): Column = call_function("token_runs", text, lit("punct"))

  /** Reference formulation of [[punctCount]]. */
  def punctCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** BPE-ish subword segmentation count: letter runs, digit runs, and
    * single punctuation marks each count as one token. Native byte scan;
    * the regex reference is [[bpeTokenCountRegex]]. */
  def bpeTokenCount(text: Column): Column = call_function("token_runs", text, lit("bpe"))

  /** Reference formulation of [[bpeTokenCount]]. */
  def bpeTokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** How many tokens of `w` are in the given word list. */
  def countIn(w: Column, vocab: Seq[String]): Column =
    // size(filter(w, isin(vocab))) with the filter lambda unrolled into
    // chained array_removes: a higher-order filter is CodegenFallback
    // and forces the WHOLE projection interpreted, while array_remove
    // (which drops every occurrence) keeps codegen. Identical counts —
    // null/empty tokens are counted by neither formulation.
    size(w) - size(vocab.foldLeft(w)((arr, v) => array_remove(arr, v)))

  /** Exact ratio of two int columns as an engine-identical double. */
  def ratio(num: Column, den: Column): Column =
    num.cast("double") / den.cast("double")
}
