package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Text-analysis primitives for the large-scale training-data pipeline
  * surface (SURVEY.md §7.5): tokenization, quality scoring, language
  * ID, document fingerprinting, shingling.
  *
  * Everything is built as Spark SQL expression text over higher-order
  * array functions (`transform`/`aggregate`/`filter`) — native Catalyst
  * expressions, no UDFs, fully distributed and codegen-eligible. The
  * expression builders take column *names* so the same formula can be
  * mirrored 1:1 into the DuckDB oracles.
  */
object TextFunctions {

  /** Modulus for the polynomial rolling hash (a prime > 10^9). */
  val Mod = 1000000007L

  /** Strip non-printable-ASCII so ascii()/ord() agree across engines. */
  def cleanAsciiSql(c: String): String = s"regexp_replace($c, '[^ -~]', '')"

  /** Polynomial rolling hash of a string: fold (acc*31 + charcode) % Mod.
    * The de-facto document fingerprint (deterministic, engine-portable).
    * Spark side is the codegen'd PolyHash Catalyst expression (register
    * via GraftFunctions.register before building expression text). */
  def polyHashSql(e: String): String = s"graft_poly($e)"

  def polyHash(c: String): Column = expr(polyHashSql(c))

  /** Whitespace tokenization (the reference corpus is space-separated). */
  def tokensSql(c: String): String = s"split(trim($c), '\\\\s+')"

  /** Character k-shingles (distinct), guarded for short strings. */
  def shinglesSql(c: String, k: Int): String =
    s"IF(char_length($c) < $k, array(), " +
      s"array_distinct(transform(sequence(1, char_length($c) - ${k - 1}), " +
      s"i -> substr($c, i, $k))))"

  /** Token k-shingles (distinct): the discriminative unit for MinHash
    * over natural text (char shingles collide heavily on small-vocab
    * corpora — measured 60% candidate-pair rate on the fixture docs).
    *
    * IMPORTANT: `toksCol` must be a STAGED column holding the token
    * array, not an inline `split(...)` — expression trees are re-
    * evaluated inside lambda bodies per element, so inlining the split
    * makes shingling O(tokens²) string-splits per row (observed as a
    * single-thread hotspot at sf0.1). */
  def tokenShinglesSql(toksCol: String, k: Int): String = {
    // get() is 0-based and null-safe out of bounds (ANSI-proof)
    val joined = (0 until k).map(o => s"get($toksCol, i + $o)").mkString(", ' ', ")
    s"IF(size($toksCol) < $k, array(), " +
      s"array_distinct(transform(sequence(0, size($toksCol) - $k), " +
      s"i -> concat($joined))))"
  }

  /** Token count / distinct token count — `toksCol` is a STAGED token
    * array column (see tokenShinglesSql note on lambda re-evaluation). */
  def tokenCount(toksCol: String): Column = expr(s"size($toksCol)")
  def distinctTokenCount(toksCol: String): Column = expr(s"size(array_distinct($toksCol))")

  /** Quality signals: punctuation ratio, stopword ratio, mean token
    * length — the classic cheap text-quality heuristics. */
  // All three ratios quantize through DECIMAL(18,12) before the round:
  // k/n rationals can land exactly on a .5 at the rounding digit, where
  // Spark (shortest-string HALF_UP) and DuckDB (float-multiply) round
  // differently — and corpus_filter compares these against thresholds.
  def punctRatio(c: String): Column =
    expr(s"CAST(round(CAST(CAST(char_length(regexp_replace($c, '[a-zA-Z0-9 ]', '')) AS DOUBLE) " +
      s"/ greatest(char_length($c), 1) AS DECIMAL(18,12)), 6) AS DOUBLE)")

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")

  /** Codegen'd set-membership count (register GraftFunctions first). */
  def stopwordRatio(toksCol: String): Column =
    expr(s"CAST(round(CAST(CAST(graft_stop_hits($toksCol) AS DOUBLE) " +
      s"/ greatest(size($toksCol), 1) AS DECIMAL(18,12)), 6) AS DOUBLE)")

  def meanTokenLen(c: String, toksCol: String): Column =
    expr(s"CAST(round(CAST(CAST(char_length(replace($c, ' ', '')) AS DOUBLE) " +
      s"/ greatest(size($toksCol), 1) AS DECIMAL(18,12)), 6) AS DOUBLE)")

  /** Heuristic language ID: count stopword hits per language list, take
    * the argmax with a fixed precedence order (en, es, de, fr, zh). */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is", "value", "table"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  /** One-pass argmax over all language sets (codegen'd LangIdExpr;
    * register GraftFunctions first). Semantics identical to the CASE
    * cascade it replaces: first language in declaration order reaching
    * the maximum hit count (all-zero ⇒ first language). */
  def langId(toksCol: String): Column = expr(s"graft_lang_id($toksCol)")
}
