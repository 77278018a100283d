package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.util.hashing.MurmurHash3

/** Deterministic per-row text-hashing expressions for dedup at scale.
  *
  * Design note (100 TB): MinHash/SimHash signatures are computed per row in
  * a single map pass — no explode, no crossJoin against a seed table, no
  * shuffle until the (tiny) signature is banded. The reference has no dedup
  * surface at all (SURVEY §2.10 — no UDF registry); these are part of the
  * LLM-pipeline extension mandated by BASELINE.json's north star.
  *
  * All hashing is MurmurHash3 (scala stdlib) over UTF-8 bytes with fixed
  * seeds → stable across JVMs, executors, and rounds.
  */
object TextHashes {

  /** k minhash values over w-shingles of the token array. */
  def minhashSig(tokens: Column, k: Int, shingle: Int): Column =
    column(MinHashSigExpr(expression(tokens), k, shingle))

  /** 16-hex-char md5 prefixes of every k-token sliding window
    * (space-joined) — byte-identical to
    * `transform(sequence(1, n-k+1), i -> substring(md5(array_join(
    * slice(toks, i, k), ' ')), 1, 16))` but ONE digest and buffer
    * reused across all windows of a document (the SQL form allocates a
    * slice array, a joined string, and a 32-char hex string per window;
    * q136's scan is nothing but this hash). Emits the empty array for
    * docs shorter than k tokens.
    */
  def md5WindowPrefixes(tokens: Column, k: Int): Column =
    column(Md5WindowPrefixExpr(expression(tokens), k))

  private val HexChars = "0123456789abcdef".getBytes

  def md5WindowPrefixesFromArrayData(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) { toks(t) = arr.getUTF8String(t).getBytes; t += 1 }
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks(i + j))
        j += 1
      }
      val dig = md.digest()
      val cs = new Array[Byte](16)
      var b = 0
      while (b < 8) {
        cs(2 * b) = HexChars((dig(b) >> 4) & 0xF)
        cs(2 * b + 1) = HexChars(dig(b) & 0xF)
        b += 1
      }
      out(i) = UTF8String.fromBytes(cs)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Single-scan BPE-ish count (see [[BpeishCountExpr]]). */
  def bpeishCountCol(text: Column): Column =
    column(BpeishCountExpr(expression(text)))

  /** Code-point walk equal to regexp_count over
    * `[a-z]+|[0-9]|[^a-z0-9 ]`: a lowercase run counts once, every other
    * non-space code point counts once (a digit is the regex's second
    * branch, anything else its third — both single-code-point matches).
    */
  def bpeishCount(u: UTF8String): Long = {
    val s = u.toString
    val len = s.length
    var i = 0
    var n = 0L
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') {
        n += 1
        i += 1
        while (i < len && { val c = s.charAt(i); c >= 'a' && c <= 'z' }) i += 1
      } else {
        if (cp != ' ') n += 1
        i += Character.charCount(cp)
      }
    }
    n
  }

  /** 64-bit simhash of the token array. */
  def simhash64(tokens: Column): Column = column(SimHash64Expr(expression(tokens)))

  /** Winnowed rolling-hash fingerprints (doc fingerprinting, window w). */
  def winnowFingerprints(tokens: Column, window: Int): Column =
    column(WinnowExpr(expression(tokens), window))

  private[graft] def tokenHash(s: String, seed: Int): Int =
    MurmurHash3.bytesHash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Reference Scala impls (shared by the expressions and the specs). */
  def minhashSigScala(tokens: Seq[String], k: Int, shingle: Int): Array[Long] = {
    val shingles: Iterator[String] =
      if (tokens.length < shingle) Iterator(tokens.mkString(" "))
      else tokens.sliding(shingle).map(_.mkString(" "))
    val mins = Array.fill(k)(Long.MaxValue)
    shingles.foreach { sh =>
      val base = tokenHash(sh, 0x9747b28c)
      val base2 = tokenHash(sh, 0x85ebca6b)
      val h64 = (base.toLong << 32) | (base2.toLong & 0xffffffffL)
      var i = 0
      while (i < k) {
        // Independent permutation per index: splitmix64 finalizer over the
        // 64-bit shingle hash offset by i·golden-gamma. (A linear
        // h1 + i·h2 family is NOT independent enough for minhash — the
        // argmin correlates across i and similarity is overestimated.)
        val h = splitmix64(h64 + i.toLong * 0x9E3779B97F4A7C15L)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    mins
  }

  /** splitmix64 finalizer — a high-quality 64-bit mixer. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def simhash64Scala(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h1 = tokenHash(t, 0x9747b28c).toLong & 0xffffffffL
      val h2 = tokenHash(t, 0x85ebca6b).toLong & 0xffffffffL
      val h = (h1 << 32) | h2
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def winnowScala(tokens: Seq[String], window: Int): Array[Long] = {
    if (tokens.isEmpty) return Array.empty
    val hashes = tokens.map(t => tokenHash(t, 0x1b873593).toLong & 0xffffffffL).toArray
    if (hashes.length <= window) return Array(hashes.min)
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var i = 0
    while (i + window <= hashes.length) {
      var m = Long.MaxValue
      var j = i
      while (j < i + window) { if (hashes(j) < m) m = hashes(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def sortedIntersectSize(a: Column, b: Column): Column =
    column(SortedIntersectSizeExpr(expression(a), expression(b)))

  def sortedLongIntersectSize(a: Column, b: Column): Column =
    column(SortedLongIntersectSizeExpr(expression(a), expression(b)))

  /** |A ∩ B| for two SORTED long arrays — the 8-byte-compare variant of
    * the merge intersect, for pipelines whose sets are already token
    * HASHES (q33's recheck): primitive compares instead of UTF8String
    * byte-order walks, and the candidate broadcast carries 8 bytes per
    * token instead of the token text.
    */
  def sortedLongIntersectSizeFromArrayData(a: ArrayData, b: ArrayData): Long = {
    var i = 0
    var j = 0
    var n = 0L
    val an = a.numElements()
    val bn = b.numElements()
    while (i < an && j < bn) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** |A ∩ B| for two SORTED string arrays via a linear two-pointer merge —
    * no per-pair hash set. UTF8String.compareTo is binary order, the same
    * order array_sort produces, so sorting once per document replaces
    * hashing once per candidate PAIR (the LSH recheck hot loop).
    */
  def sortedIntersectSizeFromArrayData(a: ArrayData, b: ArrayData): Long = {
    var i = 0
    var j = 0
    var n = 0L
    val an = a.numElements()
    val bn = b.numElements()
    while (i < an && j < bn) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** k minhash values over the token SET with md5-derived base hashes —
    * the cross-engine-reproducible variant: md5 is available in DuckDB
    * too, so the whole signature (and the LSH pipeline on top) can be
    * recomputed by the oracle. h = first 60 bits of md5(token); the i-th
    * permutation is splitmix64(h + i·gamma); min is UNSIGNED (DuckDB
    * UBIGINT min) — signed Long min would pick different tokens.
    */
  def md5MinhashSigScala(tokens: Seq[String], k: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(k)(-1L) // unsigned max
    tokens.distinct.foreach { t =>
      val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = h >>> 4 // 60 bits == first 15 hex chars
      var i = 0
      while (i < k) {
        val v = splitmix64Pub(h + i.toLong * 0x9E3779B97F4A7C15L)
        if (java.lang.Long.compareUnsigned(v, mins(i)) < 0) mins(i) = v
        i += 1
      }
    }
    mins
  }

  /** splitmix64 exposed for the md5-minhash path (same mixer as above). */
  def splitmix64Pub(x: Long): Long = splitmix64(x)

  def md5MinhashSig(tokens: Column, k: Int): Column =
    column(Md5MinHashSigExpr(expression(tokens), k))

  /** k minhash values over PRE-HASHED tokens (array<long> of 60-bit md5
    * prefixes): the i-th permutation is splitmix64(h + i·gamma), min
    * unsigned — identical output to [[md5MinhashSig]] when fed
    * `md5h60(token)` values. Lets the q61 pipeline hash each token with
    * md5 ONCE and reuse the hash array for both the signature and the
    * exact-Jaccard recheck.
    */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    column(MinHashFromHashesExpr(expression(hashes), k))

  def minhashFromHashesArrayData(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(-1L) // unsigned max
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = splitmix64(h + i.toLong * 0x9E3779B97F4A7C15L)
        if (java.lang.Long.compareUnsigned(v, mins(i)) < 0) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Sorted distinct 60-bit md5 token hashes in ONE codegen'd pass —
    * the native form of
    * `array_sort(array_distinct(transform(toks, t -> conv(substring(
    * md5(t),1,15),16,10))))`: one digest per token, primitive sort +
    * in-place dedup, no hex strings or string-radix parsing. Values are
    * 60-bit (non-negative), so the signed sort equals DuckDB's UBIGINT
    * order and the output matches the SQL chain bit for bit.
    */
  def md5HashSet(tokens: Column): Column =
    column(Md5HashSetExpr(expression(tokens)))

  def md5HashSetFromArrayData(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var j = 0
    while (j < n) {
      hs(j) = md5h60(md, arr.getUTF8String(j).toString)
      j += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == n) hs else java.util.Arrays.copyOf(hs, w))
  }

  def md5BucketCountsFromArrayData(arr: ArrayData, buckets: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](buckets + 1)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      out((md5h60(md, arr.getUTF8String(j).toString) % buckets).toInt) += 1L
      j += 1
    }
    out(buckets) = 1L
    new GenericArrayData(out)
  }

  def md5BucketCounts(tokens: Column, buckets: Int): Column =
    column(Md5BucketCountsExpr(expression(tokens), buckets))

  /** md5-derived 60-bit token hash (shared by the oracle-reproducible
    * minhash/simhash/winnow family: first 15 hex chars of md5).
    */
  private def md5h60(md: java.security.MessageDigest, t: String): Long = {
    val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
    h >>> 4
  }

  /** 64-bit simhash with md5 token hashes (oracle-reproducible sibling of
    * simhash64Scala): bit b set iff the +1/-1 vote over (h>>b)&1 is
    * positive. Tokens keep multiplicity (simhash weights repeats).
    */
  def md5Simhash64Scala(tokens: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = md5h60(md, t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnow fingerprints with md5 token hashes: distinct sliding-window
    * minima (window w) in first-occurrence order. 60-bit hashes, so
    * signed and unsigned comparisons agree with DuckDB's UBIGINT min.
    */
  def md5WinnowScala(tokens: Seq[String], window: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    if (tokens.isEmpty) return Array.empty
    val hashes = tokens.map(t => md5h60(md, t)).toArray
    if (hashes.length <= window) return Array(hashes.min)
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var i = 0
    while (i + window <= hashes.length) {
      var m = Long.MaxValue
      var j = i
      while (j < i + window) { if (hashes(j) < m) m = hashes(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }

  def md5Simhash64(tokens: Column): Column =
    column(Md5SimHash64Expr(expression(tokens)))

  def md5Simhash64FromArrayData(arr: ArrayData): Long =
    md5Simhash64Scala(toTokens(arr))

  def md5Winnow(tokens: Column, window: Int): Column =
    column(Md5WinnowExpr(expression(tokens), window))

  def md5WinnowFromArrayData(arr: ArrayData, window: Int): ArrayData =
    new GenericArrayData(md5WinnowScala(toTokens(arr), window))

  /** Hot path: digest each token's UTF-8 bytes directly (no String
    * materialization) and skip the defensive distinct — the min over a
    * multiset equals the min over its set, so duplicate tokens cannot
    * change the signature. Bit-identical to md5MinhashSigScala
    * (asserted in TextHashesSpec).
    */
  def md5MinhashSigFromArrayData(arr: ArrayData, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(k)(-1L) // unsigned max
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val dig = md.digest(arr.getUTF8String(j).getBytes)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = h >>> 4
      var i = 0
      while (i < k) {
        val v = splitmix64(h + i.toLong * 0x9E3779B97F4A7C15L)
        if (java.lang.Long.compareUnsigned(v, mins(i)) < 0) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  // ArrayData-typed entry points invoked from generated code (doGenCode
  // emits static calls to these — the StaticInvoke pattern Spark's own
  // collection expressions use; keeps the whole stage codegen'd without
  // hand-writing the hash loops in Java strings).
  private def toTokens(arr: ArrayData): Seq[String] =
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)

  def minhashSigFromArrayData(arr: ArrayData, k: Int, shingle: Int): ArrayData = {
    // Hot path for shingle=1 (token-set minhash): hash each token's UTF-8
    // bytes directly — no String materialization, no charset re-encode, no
    // sliding-window iterator. Produces bit-identical output to the
    // reference implementation below (asserted in TextHashesSpec).
    if (shingle == 1 && arr.numElements() > 0) {
      val n = arr.numElements()
      val mins = Array.fill(k)(Long.MaxValue)
      var j = 0
      while (j < n) {
        val bytes = arr.getUTF8String(j).getBytes
        val base = MurmurHash3.bytesHash(bytes, 0x9747b28c)
        val base2 = MurmurHash3.bytesHash(bytes, 0x85ebca6b)
        val h64 = (base.toLong << 32) | (base2.toLong & 0xffffffffL)
        var i = 0
        while (i < k) {
          val h = splitmix64(h64 + i.toLong * 0x9E3779B97F4A7C15L)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        j += 1
      }
      new GenericArrayData(mins)
    } else new GenericArrayData(minhashSigScala(toTokens(arr), k, shingle))
  }

  def simhash64FromArrayData(arr: ArrayData): Long =
    simhash64Scala(toTokens(arr))

  def winnowFromArrayData(arr: ArrayData, window: Int): ArrayData =
    new GenericArrayData(winnowScala(toTokens(arr), window))
}

/** (sorted array<string>, sorted array<string>) → long intersection size. */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.sortedIntersectSizeFromArrayData(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashes.sortedIntersectSizeFromArrayData($a, $b)")
  override def prettyName: String = "sorted_intersect_size"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectSizeExpr =
    copy(left = l, right = r)
}

/** (sorted array<long>, sorted array<long>) → long intersection size. */
case class SortedLongIntersectSizeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.sortedLongIntersectSizeFromArrayData(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashes.sortedLongIntersectSizeFromArrayData($a, $b)")
  override def prettyName: String = "sorted_long_intersect_size"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedLongIntersectSizeExpr =
    copy(left = l, right = r)
}

/** array<string> → 64-bit md5-based simhash (long). */
case class Md5SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.md5Simhash64FromArrayData(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.md5Simhash64FromArrayData($c)")
  override def prettyName: String = "md5_simhash64"
  override protected def withNewChildInternal(c: Expression): Md5SimHash64Expr = copy(child = c)
}

/** array<string> → array<string> of 16-hex md5 prefixes per k-window. */
case class Md5WindowPrefixExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.md5WindowPrefixesFromArrayData(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.md5WindowPrefixesFromArrayData($c, $k)")
  override def prettyName: String = "md5_window_prefixes"
  override protected def withNewChildInternal(c: Expression): Md5WindowPrefixExpr =
    copy(child = c)
}

/** array<string> → array<long> md5-based winnow fingerprints. */
case class Md5WinnowExpr(child: Expression, window: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.md5WinnowFromArrayData(input.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.md5WinnowFromArrayData($c, $window)")
  override def prettyName: String = "md5_winnow_fingerprints"
  override protected def withNewChildInternal(c: Expression): Md5WinnowExpr = copy(child = c)
}

/** array<long> (pre-hashed tokens) → array<long> of k minhash values. */
case class MinHashFromHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.minhashFromHashesArrayData(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.minhashFromHashesArrayData($c, $k)")
  override def prettyName: String = "minhash_from_hashes"
  override protected def withNewChildInternal(c: Expression): MinHashFromHashesExpr =
    copy(child = c)
}

/** array<string> → array<long> of k md5-based minhash values (token set). */
/** array<string> → sorted distinct array<long> of 60-bit md5 prefixes. */
case class Md5HashSetExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.md5HashSetFromArrayData(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.md5HashSetFromArrayData($c)")
  override def prettyName: String = "md5_hash_set"
  override protected def withNewChildInternal(c: Expression): Md5HashSetExpr = copy(child = c)
}

/** array<string> → dense array<long> of `buckets`+1 hashed-token
  * counts (md5-h60 % buckets, bias 1 in the last slot) — the q192
  * feature vector computed in ONE codegen'd map pass, replacing an
  * explode + two token-scale groupBy shuffles (sf10: the trainer's
  * feature build dominated its wall before this).
  */
case class Md5BucketCountsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.md5BucketCountsFromArrayData(
      input.asInstanceOf[ArrayData], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.md5BucketCountsFromArrayData($c, $buckets)")
  override def prettyName: String = "md5_bucket_counts"
  override protected def withNewChildInternal(c: Expression): Md5BucketCountsExpr = copy(child = c)
}

case class Md5MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.md5MinhashSigFromArrayData(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.md5MinhashSigFromArrayData($c, $k)")
  override def prettyName: String = "md5_minhash_sig"
  override protected def withNewChildInternal(c: Expression): Md5MinHashSigExpr = copy(child = c)
}

/** array<string> → array<long> of k minhash values over w-shingles. */
case class MinHashSigExpr(child: Expression, k: Int, shingle: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.minhashSigFromArrayData(input.asInstanceOf[ArrayData], k, shingle)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.minhashSigFromArrayData($c, $k, $shingle)")
  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
}

/** array<string> → 64-bit simhash (long). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.simhash64FromArrayData(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.simhash64FromArrayData($c)")
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
}

/** array<string> → array<long> winnowed fingerprints. */
case class WinnowExpr(child: Expression, window: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.winnowFromArrayData(input.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.winnowFromArrayData($c, $window)")
  override def prettyName: String = "winnow_fingerprints"
  override protected def withNewChildInternal(c: Expression): WinnowExpr = copy(child = c)
}

/** Single-scan BPE-ish token count — exactly
  * `regexp_count(text, "[a-z]+\|[0-9]\|[^a-z0-9 ]")` (one count per
  * lowercase RUN, per digit, per other non-space code point) without the
  * java.util.regex alternation machinery: one code-point walk, no
  * backtracking, no Matcher allocation per row. Measured ~5× on the q28
  * map pass at sf10; the DuckDB oracle keeps the regexp formulation, so
  * the gate proves the scan IS the regex.
  */
case class BpeishCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.bpeishCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.bpeishCount($c)")
  override def prettyName: String = "bpeish_count"
  override protected def withNewChildInternal(c: Expression): BpeishCountExpr =
    copy(child = c)
}
