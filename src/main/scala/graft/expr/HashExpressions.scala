package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-static hash kernels shared by interpreted eval and codegen. */
object HashKernels {
  /** 64-bit polynomial rolling hash (Rabin–Karp family) over UTF-8 bytes,
    * base 1099511628211 (the FNV prime — a good odd multiplier), wrapping
    * arithmetic. Deterministic across JVMs; used as the document fingerprint.
    */
  def polyHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L // FNV-1a offset basis as the seed
    var i = 0
    while (i < bytes.length) {
      h = h * 1099511628211L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** SimHash-64 over pre-hashed token longs: for each of the 64 bit
    * positions, vote +1/−1 by the token-hash bit; the sign vector is the
    * fingerprint. Near-duplicate docs differ in few bits (small Hamming
    * distance).
    */
  def simHash(tokenHashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokenHashes.numElements()
    var i = 0
    while (i < n) {
      val h = tokenHashes.getLong(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) { if (counts(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** MurmurHash3's 64-bit finalizer: the polynomial token hash has weak
    * high-bit diffusion on short tokens, and SimHash votes on every bit —
    * without avalanching, high bits would barely vary and collapse the
    * fingerprint space.
    */
  def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** Fused SimHash-64 straight from text: tokenize (lowercase, \s+ split,
    * drop empties — the TextAnalysis.tokens convention), hash each token,
    * vote per bit — one pass, zero intermediate arrays. This is the kernel
    * form of `simhash64(transform(tokens(text), xxhash64))`, whose
    * higher-order-function input drops the whole projection out of codegen.
    */
  // Java regex \s — ASCII-only, exactly what TextAnalysis.tokens splits on.
  // Character.isWhitespace would also match U+2000.. etc. and fork the
  // tokenization from the documented-equivalent composition.
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  def simHashText(text: UTF8String): Long = {
    // Locale.ROOT: default-locale toLowerCase is not deterministic across
    // JVMs (tr-TR dots/undots 'i' even in pure ASCII) and fingerprints must
    // be bit-reproducible on every executor
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Int](64)
    val len = s.length
    var i = 0
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L
        while (i < len && !isWs(s.charAt(i))) {
          h = h * 1099511628211L + s.charAt(i)
          i += 1
        }
        h = fmix64(h)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
    }
    var out = 0L
    var k = 0
    while (k < 64) { if (counts(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  /** All k-token window hashes of a token array in one pass: each token is
    * hashed ONCE (fmix64 ∘ polyHash), windows combine the k token hashes
    * with a rolling 64-bit polynomial (Rabin–Karp slide: subtract the
    * leaving token's `h·B^(k-1)`, multiply by B, add the entering token),
    * and every window value is avalanched before emission. Replaces the
    * `transform(sequence(...), i -> xxhash64(array_join(slice(t,i,k))))`
    * composition, which builds a throwaway string PER WINDOW — O(n·k·|tok|)
    * allocation versus this kernel's O(n) longs. Equal token windows hash
    * equal by construction; distinct windows collide at the same 2⁻⁶⁴
    * birthday odds the string form had. Hash VALUES differ from the string
    * form — fine for every consumer, which only compares hashes to hashes.
    */
  def windowHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      // null elements hash as a fixed sentinel rather than NPE-ing inside
      // codegen: engine-produced token arrays never contain nulls, but the
      // Column API is public and parquet arrays default to containsNull
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) 0x9e3779b97f4a7c15L else fmix64(polyHash(t))
      i += 1
    }
    val B = 0x100000001b3L
    var bk = 1L
    i = 0
    while (i < k - 1) { bk *= B; i += 1 } // B^(k-1), wrapping
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + th(i); i += 1 }
    out(0) = fmix64(h)
    i = k
    while (i < n) {
      h = (h - th(i - k) * bk) * B + th(i)
      out(i - k + 1) = fmix64(h)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `poly_hash64(string) → long` — document fingerprint (rolling hash). */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"
  override def nullSafeEval(input: Any): Any =
    HashKernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashKernels.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

/** `simhash64(array<long>) → long` — SimHash over token hashes. One pass over
  * the token array per document; O(64) state on the stack — this is the
  * operator an `aggregate(transform(...))` composition could not make cheap.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    HashKernels.simHash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashKernels.simHash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `simhash64_text(string) → long` — fused tokenize+hash+vote SimHash. */
case class SimHashText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_text"
  override def nullSafeEval(input: Any): Any =
    HashKernels.simHashText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashKernels.simHashText($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashText =
    copy(child = newChild)
}

/** `window_hashes(array<string>, k) → array<long>` — all k-token window
  * hashes in one pass (rolling polynomial over per-token hashes). Tokens
  * must be non-null elements (the TextAnalysis.tokens contract).
  */
case class WindowHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 2, s"window length k=$k must be >= 2")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"
  override def nullSafeEval(input: Any): Any =
    HashKernels.windowHashes(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashKernels.windowHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

/** `hamming64(long, long) → int` — Hamming distance between fingerprints. */
object HashFunctions {
  def polyHash64(c: Column): Column = Compat.column(PolyHash64(Compat.expression(c)))
  def simHash64(c: Column): Column = Compat.column(SimHash64(Compat.expression(c)))
  def simHashText(c: Column): Column = Compat.column(SimHashText(Compat.expression(c)))
  def windowHashes(c: Column, k: Int): Column =
    Compat.column(WindowHashes(Compat.expression(c), k))
}
