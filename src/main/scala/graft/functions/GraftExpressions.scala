package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §7.3 preference (b): a native
  * `Expression` with codegen beats any UDF).
  *
  * PolyHash replaces the higher-order `aggregate(split(...))` char fold:
  * higher-order lambdas are interpreted per element, so hashing 260 k
  * shingles walked an expression tree per character; this is a tight
  * loop, codegen'd in the whole-stage plan and equally tight when
  * evaluated inside ArrayTransform lambdas. Identical math to the
  * DuckDB oracle (`list_reduce` over `ord()`): acc = (acc*31 + c) % p
  * over UTF-16 units — callers strip non-ASCII first so units ==
  * codepoints == duckdb `ord`. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash = copy(newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31 + str.charAt(i)) % Mod
      i += 1
    }
    acc
  }
}

/** Hashes of all k-token windows of a token array, in one tight loop —
  * equivalent to `transform(tokenShingles(toks,k), sh -> poly(sh))` but
  * with no intermediate shingle strings and no interpreted lambda
  * evals (those cost ~10 s per million shingles). Duplicate shingles
  * are retained: MinHash minima are unaffected by multiplicity, which
  * is the only consumer. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.hashWindows(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.hashWindows($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Window hash = polynomial hash of "tok_i tok_{i+1} … tok_{i+k-1}".
    *
    * Each token is reduced ONCE to (h_t, 31^len_t mod p); a window then
    * combines in O(k): folding a token of length m into accumulator a
    * yields a·31^m + h_t (mod p). The earlier formulation re-converted
    * every token to a fresh String k times per window — ~3× allocation
    * churn in the engine's hottest loop (GC-sensitive under bench
    * contention). Tokens are ASCII after cleanAsciiSql, so the byte
    * fast path equals the UTF-16 fold; non-ASCII falls back to chars
    * to keep PolyHash semantics identical. */
  def hashWindows(arr: org.apache.spark.sql.catalyst.util.ArrayData, k: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n) // token polynomial hash
    val tp = new Array[Long](n) // 31^len(token) mod p
    var t = 0
    while (t < n) {
      val s = arr.getUTF8String(t)
      val nb = s.numBytes()
      var acc = 0L
      var pow = 1L
      var ascii = true
      var b = 0
      while (b < nb && ascii) { if (s.getByte(b) < 0) ascii = false; b += 1 }
      if (ascii) {
        b = 0
        while (b < nb) {
          acc = (acc * 31 + s.getByte(b)) % PolyHash.Mod
          pow = (pow * 31) % PolyHash.Mod
          b += 1
        }
      } else {
        val str = s.toString
        var c = 0
        while (c < str.length) {
          acc = (acc * 31 + str.charAt(c)) % PolyHash.Mod
          pow = (pow * 31) % PolyHash.Mod
          c += 1
        }
      }
      th(t) = acc
      tp(t) = pow
      t += 1
    }
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var acc = th(i)
      var j = 1
      while (j < k) {
        // append separator then token t: ((acc·31 + ' ')·31^len_t + h_t) mod p
        acc = (((acc * 31 + ' ') % PolyHash.Mod) * tp(i + j) + th(i + j)) % PolyHash.Mod
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Count of tokens contained in a fixed word set, hashed-set lookup per
  * token in one codegen'd pass — replaces the interpreted
  * `size(filter(toks, t -> array_contains(array(...), t)))` pattern,
  * which walks an expression tree per token and scans the word list
  * linearly. */
case class TokenSetHits(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val set = TokenSetHits.buildSet(words)

  override protected def nullSafeEval(input: Any): Any =
    TokenSetHits.hits(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokset", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSetHits.hits($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
}

object TokenSetHits {
  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def hits(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      set: java.util.HashSet[UTF8String]): Int = {
    var n = 0
    var i = 0
    val sz = arr.numElements()
    while (i < sz) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }
}

/** Stopword-argmax language ID in ONE pass over the tokens: each token
  * is membership-tested against every language's set; the winner is the
  * first language (in declaration order) reaching the maximum hit
  * count — exactly the `CASE WHEN c_l >= greatest(others)` cascade it
  * replaces, where each count sub-expression was re-evaluated ~5× per
  * row by the interpreted CASE tree. */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    LangIdExpr.lang(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdExpr.lang($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(newChild)
}

object LangIdExpr {
  private lazy val langs: Array[UTF8String] =
    TextFunctions.LangStopwords.map(p => UTF8String.fromString(p._1)).toArray
  private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    TextFunctions.LangStopwords.map(p => TokenSetHits.buildSet(p._2)).toArray

  def lang(arr: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val counts = new Array[Int](sets.length)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(t)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var best = 0
    var max = counts(0)
    var j = 1
    while (j < counts.length) {
      if (counts(j) > max) { best = j; max = counts(j) }
      j += 1
    }
    langs(best)
  }
}

/** Whole MinHash signature (NumHashes minima) of a shingle-hash array
  * in ONE tight codegen'd pass — turns the signature stage into a
  * narrow per-row projection: no explode of ~hundreds of rows per doc,
  * no shuffle, no hash-aggregate. The explode → groupBy formulation it
  * replaces was the round-1 workaround for interpreted array lambdas;
  * a native expression needs no workaround. Arithmetic is identical to
  * the DuckDB oracle's permutations: min over ((2i+3)·h + (7919i+13))
  * mod p. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(newChild)
}

object MinHashSig {
  final val NumHashes = 32
  final val P = 2147483647L // 2^31-1, same prime as Dedup.MinhashP

  def sig(arr: org.apache.spark.sql.catalyst.util.ArrayData):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = Array.fill(NumHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < NumHashes) {
        val v = ((2L * i + 3L) * h + (7919L * i + 13L)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** LSH band hashes of a shingle-hash array: the full MinHash signature
  * AND its per-band polynomial folds in one codegen'd pass, returned
  * as array(band_hash) indexed by band. Referenced exactly ONCE inside
  * a posexplode, so Catalyst's project collapsing cannot duplicate the
  * computation (the re-eval trap that motivated round 1's explode →
  * groupBy shape). Arithmetic matches the DuckDB oracles bit-for-bit. */
case class BandHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BandHashes.hashes(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BandHashes.hashes($c)")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(newChild)
}

object BandHashes {
  final val Bands = 8
  final val RowsPerBand = 4
  final val BandP = 1000000000000037L

  def hashes(arr: org.apache.spark.sql.catalyst.util.ArrayData):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val sig = MinHashSig.sig(arr)
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var acc = 0L
      var r = 0
      while (r < RowsPerBand) {
        acc = (acc * 31 + sig.getLong(b * RowsPerBand + r)) % BandP
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** 32-bit SimHash of a token-hash array in one codegen'd pass: bit b
  * of the result is set iff the majority of token hashes have bit b
  * set. Narrow per-document computation — replaces the explode →
  * groupBy formulation with 32 sum aggregates (no shuffle, no
  * per-token row explosion). Duplicate tokens keep their multiplicity,
  * exactly like the aggregation it replaces and the DuckDB oracle. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.simhash(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(newChild)
}

object SimHashExpr {
  final val Bits = 32

  def simhash(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < Bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Document chunking as a Catalyst `Generator` (the UDTF surface of
  * SURVEY.md §2-I): one text column in, one row per overlapping
  * token-window chunk out — the standard pre-embedding segmentation of
  * an LLM data pipeline, feeding chunk-level dedup. A Generator plans
  * as a Generate node (like explode), so the fan-out runs inside the
  * scan stage with no extra shuffle; CodegenFallback is fine here
  * because each call amortizes over its emitted rows. */
case class ChunkTokens(child: Expression, size: Int, overlap: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(size > 0 && overlap >= 0 && overlap < size,
    s"need size > overlap >= 0, got size=$size overlap=$overlap")
  private val stride = size - overlap

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("chunk_idx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("chunk", StringType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow):
      IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString.trim
    if (s.isEmpty) return Iterator.empty
    val toks = s.split("\\s+")
    val n = toks.length
    val count = (n + stride - 1) / stride
    (0 until count).iterator.map { i =>
      val start = i * stride
      val chunk = toks.slice(start, math.min(start + size, n)).mkString(" ")
      org.apache.spark.sql.catalyst.InternalRow(i, UTF8String.fromString(chunk))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkTokens =
    copy(child = newChild)
}

/** Lazy fixed-width character windows: `(win_idx, w)` rows for every
  * `stride`-spaced `width`-char substring of the input — the substring-
  * dedup extraction (`dedup_substring_windows`) as a GENERATOR, so a
  * million-char document streams ~1M window rows without first
  * materializing a ~`width`× blow-up array the way
  * `transform(sequence(...)) + explode` must (each emitted window is a
  * substring sharing the parent's backing storage until projected).
  * Reference context: no substring surface in the reference; LLM-
  * pipeline extension (SURVEY §7.5). */
case class CharWindows(child: Expression, width: Int, stride: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(width > 0 && stride > 0, s"need width > 0 and stride > 0, got $width/$stride")

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("win_idx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("w", StringType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow):
      IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString.trim
    if (s.length < width) return Iterator.empty
    val count = (s.length - width) / stride + 1
    (0 until count).iterator.map { i =>
      val start = i * stride
      org.apache.spark.sql.catalyst.InternalRow(
        i, UTF8String.fromString(s.substring(start, start + width)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharWindows =
    copy(child = newChild)
}

/** CONTENT-DEFINED chunking (Rabin-style): split a document at
  * positions where the rolling polynomial hash of the trailing `width`
  * chars is ≡ 0 (mod `mask`) — so chunk boundaries are decided by
  * CONTENT, not offsets. Insert one byte near the start of a document
  * and every fixed-width window shifts (all window hashes change), but
  * CDC boundaries re-synchronize right after the edit — the downstream
  * chunks are byte-identical and dedup against the unedited copy. This
  * is the storage/dataset-dedup primitive fixed windows cannot express.
  *
  * One O(n) streaming pass per document: the hash is maintained by a
  * rolling add/remove (B=257, P=1000003, h = Σ c·B^j mod P — exactly
  * the left fold `(h·B + c) mod P` over the window, which is what the
  * DuckDB oracle recomputes per position at O(n·w)). Chunks are lazily
  * emitted as (chunk_idx, start (1-based), chunk); the document end is
  * always a boundary; expected chunk length ≈ `mask` chars.
  * Reference context: no chunking surface in the reference; LLM-
  * pipeline extension (SURVEY §7.5). */
case class CdcChunks(child: Expression, width: Int, mask: Long)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(width > 0 && mask > 0, s"need width > 0 and mask > 0, got $width/$mask")

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("chunk_idx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("start",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("chunk", StringType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow):
      IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString.trim
    val n = s.length
    if (n == 0) return Iterator.empty
    val B = 257L
    val P = 1000003L
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private val bw = { // B^(width-1) mod P, the rolling removal factor
        var x = 1L; var i = 0
        while (i < width - 1) { x = x * B % P; i += 1 }
        x
      }
      private var pos = 0 // chars consumed into the rolling hash
      private var h = 0L
      private var lastCut = 0
      private var idx = 0
      private var done = false
      override def hasNext: Boolean = !done
      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        var cutAt = -1
        while (cutAt < 0 && pos < n) {
          val c = s.charAt(pos).toLong
          if (pos >= width) {
            var hh = (h - s.charAt(pos - width).toLong * bw % P) % P
            if (hh < 0) hh += P
            h = (hh * B + c) % P
          } else h = (h * B + c) % P
          pos += 1
          if (pos >= width && h % mask == 0) cutAt = pos
        }
        if (cutAt < 0 || cutAt == n) { cutAt = n; done = true }
        val row = org.apache.spark.sql.catalyst.InternalRow(
          idx, lastCut + 1, UTF8String.fromString(s.substring(lastCut, cutAt)))
        idx += 1
        lastCut = cutAt
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** Sequential double dot product of two float-array columns — the
  * codegen'd replacement for the interpreted
  * `aggregate(zip_with(a, b, ...))` fold: identical accumulation order
  * (index 0..n-1, double accumulator), so results are bit-identical to
  * the SQL fold and the DuckDB oracles, but the per-element work is a
  * tight JVM loop instead of an expression-tree walk per element. */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** Sequential double dot product of two DOUBLE-array columns — the
  * array<double> twin of [[DotProduct]] (which reads float elements and
  * would mis-read a double array's bytes). Used by the trained-IVF path
  * where centroids are per-dimension means (doubles) while queries are
  * cast-to-double embeddings. Same fold order as the DuckDB
  * `list_reduce(list_transform(...))` twin ⇒ bit-identical doubles. */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DoubleDotProduct.dot(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DoubleDotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

object DoubleDotProduct {
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Sequential squared-L2 distance of two double-array columns — the
  * codegen'd replacement for the interpreted
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0D, +)` fold the
  * PQ training/search loop evaluates millions of times. Identical
  * accumulation order (index 0..n-1, double accumulator), so results
  * are bit-identical to the SQL fold and the DuckDB `list_reduce`
  * oracles. */
case class SquaredL2(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SquaredL2.d2(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SquaredL2.d2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

object SquaredL2 {
  def d2(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val dx = a.getDouble(i) - b.getDouble(i)
      acc += dx * dx
      i += 1
    }
    acc
  }
}

/** Sign-random-projection LSH bucket over `nPlanes` deterministic
  * hyperplanes (table `tbl`'s planes are rows tbl*nPlanes.. of the
  * shared weight stream; tbl = 0 reproduces the single-table bucket).
  * Same per-plane double fold order as the interpreted SQL aggregate,
  * so bucket ids are bit-identical; one tight loop per row instead of
  * nPlanes×dim interpreted lambda evals. */
case class LshTableBucket(emb: Expression, tbl: Expression, dim: Int, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = emb
  override def right: Expression = tbl
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  // the embedding child may be array<float> (the parquet corpus) or
  // array<double> (derived vectors — e.g. the ALSH-augmented MIPS
  // frame, computed in double); a float component widens to the SAME
  // double either way, so the two paths differ only in the accessor
  private def isDoubleArr: Boolean = emb.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, t: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val tl = t.asInstanceOf[Number].longValue()
    if (isDoubleArr) LshTableBucket.bucketD(arr, dim, nPlanes, tl)
    else LshTableBucket.bucket(arr, dim, nPlanes, tl)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isDoubleArr) "bucketD" else "bucket"
    defineCodeGen(ctx, ev,
      (a, t) => s"graft.functions.LshTableBucket.$fn($a, $dim, $nPlanes, (long)$t)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshTableBucket =
    copy(emb = newLeft, tbl = newRight)
}

object LshTableBucket {
  def bucket(emb: org.apache.spark.sql.catalyst.util.ArrayData,
      dim: Int, nPlanes: Int, tbl: Long): Long = {
    var acc = 0L
    var j = 0
    while (j < nPlanes) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val w = ((((tbl * nPlanes + j) * dim + i) + 1) * 2654435761L) % 1000003L - 501501L
        s += emb.getFloat(i).toDouble * w.toDouble
        i += 1
      }
      if (s >= 0) acc += (1L << j)
      j += 1
    }
    acc
  }

  /** [[bucket]] over an array<double> child — identical arithmetic
    * (the float path widens each component to double before the
    * multiply, so a float array and its exact double image hash to
    * the same bucket; spec-pinned). */
  def bucketD(emb: org.apache.spark.sql.catalyst.util.ArrayData,
      dim: Int, nPlanes: Int, tbl: Long): Long = {
    var acc = 0L
    var j = 0
    while (j < nPlanes) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val w = ((((tbl * nPlanes + j) * dim + i) + 1) * 2654435761L) % 1000003L - 501501L
        s += emb.getDouble(i) * w.toDouble
        i += 1
      }
      if (s >= 0) acc += (1L << j)
      j += 1
    }
    acc
  }
}

/** ⌊log₂ v⌋ for a positive BIGINT in one hardware instruction
  * (63 − numberOfLeadingZeros) — the QSketch octave without
  * `length(bin(v))`'s per-row binary-string allocation on the sketch
  * build hot path. Contract: callers clamp v ≥ 1 (QSketch does);
  * v ≤ 0 yields an out-of-domain octave rather than throwing, exactly
  * like the string form it replaces. */
case class Log2Floor(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    63 - java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(63 - java.lang.Long.numberOfLeadingZeros($c))")

  override protected def withNewChildInternal(newChild: Expression): Log2Floor = copy(newChild)
}

/** Packed SQ8 asymmetric-distance sum: Σ_d lut[d·256 + codes[d]] over
  * an int-array code vector and a query's flat (dim × 256)-entry
  * BIGINT LUT — the codegen'd scan kernel that replaces the
  * row-exploded (vec, dim, code) ⋈ LUT join (O(|Q|·N·dim) joined rows)
  * with one tight loop per (query, vector) pair. Integer addition is
  * order-insensitive, so the result is exactly the exploded plan's
  * BIGINT sum and the same DuckDB oracle applies verbatim
  * (`sq8_adc_packed_topk`). */
case class Sq8AdcSum(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sq8_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sq8AdcSum.sum(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Sq8AdcSum.sum($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8AdcSum =
    copy(left = newLeft, right = newRight)
}

object Sq8AdcSum {
  def sum(codes: org.apache.spark.sql.catalyst.util.ArrayData,
      lut: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = codes.numElements()
    // Fail LOUDLY on a shape mismatch (ADVICE r12): UnsafeArrayData has
    // no bounds check, so a misaligned LUT or an unclamped legacy code
    // would otherwise read garbage memory silently.
    if (lut.numElements() != (n << 8))
      throw new IllegalArgumentException(
        s"graft_sq8_adc: LUT carries ${lut.numElements()} entries, expected dim·256 = ${n << 8}")
    var acc = 0L
    var d = 0
    while (d < n) {
      val c = codes.getInt(d)
      if (c < 0 || c > 255)
        throw new IllegalArgumentException(
          s"graft_sq8_adc: code $c at dim $d outside [0, 255] — encode must clamp")
      acc += lut.getLong((d << 8) + c)
      d += 1
    }
    acc
  }
}

/** Generalized packed ADC sum: Σ_m lut[m·ks + codes[m]] for any
  * codebook width ks — the [[Sq8AdcSum]] kernel (ks = 256) opened up
  * for the PQ family (ks = 16 codebook cells per subspace). Same
  * order-insensitive integer-sum contract: the exploded
  * (id, m, code) ⋈ LUT join's oracle pins the packed plan verbatim. */
case class AdcSumK(codes: Expression, lut: Expression, ks: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = lut
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_adc_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AdcSumK.sum(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.AdcSumK.sum($a, $b, $ks)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSumK =
    copy(codes = newLeft, lut = newRight)
}

object AdcSumK {
  def sum(codes: org.apache.spark.sql.catalyst.util.ArrayData,
      lut: org.apache.spark.sql.catalyst.util.ArrayData, ks: Int): Long = {
    val n = codes.numElements()
    // Fail LOUDLY on a shape mismatch (ADVICE r12): a sparse LUT (dead
    // Lloyd cells dropped from the codebook) or a foreign code id would
    // otherwise index past the UnsafeArrayData silently. Pq.adcLutFlat
    // densifies to exactly m·ks entries; anything else is corruption.
    if (lut.numElements() != n * ks)
      throw new IllegalArgumentException(
        s"graft_adc_sum: LUT carries ${lut.numElements()} entries, expected m·ks = ${n * ks}")
    var acc = 0L
    var m = 0
    while (m < n) {
      val c = codes.getInt(m)
      if (c < 0 || c >= ks)
        throw new IllegalArgumentException(
          s"graft_adc_sum: code $c at subspace $m outside [0, $ks)")
      acc += lut.getLong(m * ks + c)
      m += 1
    }
    acc
  }
}

object GraftFunctions {
  /** Idempotently register graft SQL functions on a session so
    * expression text (including lambda bodies) can call them. The
    * presence probe makes repeat calls true no-ops — without it every
    * query build re-replaces the functions and SimpleFunctionRegistry
    * logs a WARN per function, flooding benchmark/verify output. */
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_poly"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_poly", exprs => PolyHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hashes",
      exprs => ShingleHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig", exprs => MinHashSig(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_band_hashes", exprs => BandHashes(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHashExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_stop_hits",
      exprs => TokenSetHits(exprs.head, TextFunctions.Stopwords), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lang_id", exprs => LangIdExpr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_chunk_tokens",
      exprs => ChunkTokens(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_windows",
      exprs => CharWindows(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cdc_chunks",
      exprs => CdcChunks(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].longValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_d", exprs => DoubleDotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq", exprs => SquaredL2(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_bucket",
      exprs => LshTableBucket(exprs.head, exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_log2floor", exprs => Log2Floor(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sq8_adc", exprs => Sq8AdcSum(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adc_sum",
      exprs => AdcSumK(exprs.head, exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
  }
}
