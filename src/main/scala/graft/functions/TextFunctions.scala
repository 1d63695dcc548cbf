package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-expression building blocks for the training-data-pipeline
  * operators (dedup, similarity, text analysis). Everything here is pure
  * `org.apache.spark.sql.functions` composition — codegen'd, no UDFs — so
  * each operator scales as a narrow map over partitions until its own
  * shuffle (groupBy / self-join) and survives a 1000-executor fan-out.
  *
  * Cross-engine determinism: where an oracle needs to reproduce a hash,
  * md5 (bit-identical everywhere) is used; engine-internal hashes use
  * xxhash64 (codegen'd, faster, not portable).
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. Spark `split` keeps no leading /
    * trailing empties after trim, matching DuckDB's regexp_split_to_array.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram windows WITHOUT dedup (repetition statistics need every
    * occurrence), 1-based `element_at` windows: for n=2 over k tokens ->
    * k-1 shingles joined with single spaces. Empty array when the doc has
    * fewer than n tokens (guards Spark's descending-`sequence` pitfall when
    * size-n+1 < 1).
    */
  def shinglesAll(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - (n - 1))
    val grams = transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    when(size(toks) >= n, grams).otherwise(array())
  }

  /** Distinct word n-gram shingles (the dedup/similarity basis). */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(shinglesAll(toks, n))

  /** |A ∩ B| / |A ∪ B| over two pre-distinct shingle arrays, rounded for
    * cross-engine float stability.
    */
  def jaccard(a: Column, b: Column, scale: Int = 4): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = (size(a) + size(b)).cast(DoubleType) - inter
    round(when(union > 0, inter / union).otherwise(lit(0.0)), scale)
  }

  /** MinHash prime modulus (2^31 - 1). Products stay below 2^62, so the
    * arithmetic is exact in int64 on every engine.
    */
  val MinhashPrime = 2147483647L

  /** Uniform 31-bit shingle ids: u(s) = first-15-hex-digits(md5(s)) mod p.
    * ONE md5 per shingle; bit-reproducible in a SQL oracle (DuckDB:
    * ('0x'||substr(md5(s),1,15))::BIGINT).
    *
    * Materialize this as its own column (withColumn) before building the
    * signature: higher-order-function lambdas are evaluated interpreted and
    * escape codegen CSE, so inlining it into k signature components would
    * recompute the md5s k times.
    */
  def shingleIds(shinglesCol: Column): Column =
    transform(shinglesCol, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast(LongType) % MinhashPrime)

  /** MinHash signature as `k` min-permutation values over the shingle ids:
    * component i is min over shingles of ((2i+1)·u + 1000003·i) mod p —
    * pure int64 arithmetic, 16x less hashing than k independent md5 rounds.
    */
  def minhashFromIds(idsCol: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(idsCol, x =>
        (x * (2 * i + 1) + 1000003L * i) % MinhashPrime))
    }: _*)

  /** Convenience composition for single-expression contexts (tests). Prefer
    * [[shingleIds]] + [[minhashFromIds]] across a materialized column in
    * real plans (see scaladoc above).
    */
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    minhashFromIds(shingleIds(shinglesCol), k)

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`
    * consecutive components, each group concatenated into one bucket key
    * (prefixed with the band index so buckets of different bands never
    * collide). Docs sharing ANY band key become candidate pairs via a
    * band-key equi-join — the classic shingle→minhash→band→bucket-join plan.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("#", lit(b.toString) +:
        (0 until rowsPerBand).map(r => element_at(signature, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** 64-bit SimHash over token xxhash64 values: per bit, +1/-1 vote by
    * token-hash bit, sign of the vote sum becomes the fingerprint bit.
    * Returns the fingerprint as LongType. Engine-internal (xxhash64 is not
    * reproducible outside Spark). Computed per-row over the token array —
    * no explode, no shuffle.
    */
  def simhash(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Dot product of two equal-length numeric arrays in double precision,
    * left-to-right accumulation (matches a SQL oracle's list_sum order).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded for cross-engine float stability. */
  def cosine(a: Column, b: Column, scale: Int = 4): Column =
    round(dot(a, b) / (l2norm(a) * l2norm(b)), scale)

  /** BPE-ish pre-tokenization pattern (shared with the SQL oracles): letter
    * runs, digit runs, or single non-alphanumeric non-space marks — the
    * split BPE vocabularies start from before merges.
    */
  val SubwordPattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Stopword list shared with the SQL oracles (keep in sync!). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(Stopwords.map(x => x: Any): _*)))

  /** Punctuation characters counted for quality scoring (shared with oracles). */
  val PunctClass = "[.,!?;:]"

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, PunctClass, ""))

  /** Rolling-hash document fingerprint: the minimum md5 over word 3-gram
    * shingles — a stable, portable content fingerprint (same idea as the
    * reference's row hash, db_utils.py:278-289, lifted to document grain).
    */
  def fingerprint(text: Column): Column = {
    val sh = shingles(tokens(text), 3)
    when(size(sh) > 0, array_min(transform(sh, s => md5(s))))
      .otherwise(md5(trim(text)))
  }

  /** C4/CCNet-style text cleaning, as pure codegen'd regexp chains (one
    * narrow map per row at any scale). Masking replaces spans with stable
    * placeholder tokens so downstream tokenization/dedup see a canonical
    * form instead of high-entropy noise; URL masking runs BEFORE email
    * masking (URLs may embed `@`).
    */
  def maskUrls(text: Column): Column =
    regexp_replace(text, "(?i)\\bhttps?://\\S+", "<URL>")

  def maskEmails(text: Column): Column =
    regexp_replace(text, "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\b",
      "<EMAIL>")

  // ---- PII detection / redaction (training-data scrubbing) ----
  // Patterns restrict themselves to RE2-safe syntax (no lookaround, no
  // backreferences) so the DuckDB oracles can run the IDENTICAL regex;
  // Java and RE2 agree on every construct used here (\b is the ASCII word
  // boundary in both). Each count/redaction is one codegen'd regexp pass —
  // a narrow map at any scale, no shuffle.

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Occurrences of `re` in `text` (0 when none, NULL for NULL text).
    * `size()` returns -1 for NULL input under Spark's default
    * `spark.sql.legacy.sizeOfNull=true` — a NULL document would contribute
    * a NEGATIVE count to any sum and diverge from the oracle's NULL
    * semantics (DuckDB `len(...)` of NULL is NULL), so NULL text is gated
    * to NULL explicitly.
    */
  def patternCount(text: Column, re: String): Column =
    when(text.isNull, lit(null))
      .otherwise(size(regexp_extract_all(text, lit(re), lit(0))))

  /** Redact emails, then phone numbers, then IPv4 addresses with typed
    * placeholder tokens. Email runs first (an address may contain digit
    * runs the later patterns would mangle); phone before IP is safe — the
    * dotted phone form has one separator too few to parse as an IPv4.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  /** Strip C0/C1 control characters (keep \t\n\r which normalize next). */
  def stripControl(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]", "")

  /** Collapse every whitespace run to one space and trim the edges. */
  def normalizeWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Full cleaning chain: control-strip -> URL mask -> email mask ->
    * whitespace normalize.
    */
  def cleanText(text: Column): Column =
    normalizeWhitespace(maskEmails(maskUrls(stripControl(text))))

  /** Language-ID n-gram/marker heuristic. Marker words are checked against
    * the token set; CJK presence short-circuits to zh. Deterministic and
    * mirrored in the DuckDB oracle (each side uses its own regex syntax for
    * the CJK class).
    */
  def langId(text: Column, toks: Column): Column = {
    def hasAny(words: Seq[String]): Column =
      size(array_intersect(array_distinct(toks),
        array(words.map(lit): _*))) > 0
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(hasAny(Seq("der", "die", "und", "nicht", "das")), "de")
      .when(hasAny(Seq("el", "los", "las", "una", "pero")), "es")
      .when(hasAny(Seq("le", "les", "une", "est", "dans")), "fr")
      .otherwise("en")
  }
}
