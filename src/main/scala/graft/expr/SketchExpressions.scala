package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Sketching kernels (shingles, MinHash, random-hyperplane LSH) as single
  * codegen expressions.
  *
  * Why not compose `transform`/`aggregate`/`zip_with`: deeply nested
  * higher-order functions drop out of whole-stage codegen into interpreted
  * eval with per-element boxing — measured 10-50× slower at sf0.1 — and their
  * per-row cost is paid again on each side of the LSH self-join. One
  * primitive-loop kernel per row is the scale path.
  */
object SketchKernels {
  /** splitmix64 finalizer — the standard cheap statistical mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Distinct hashed word n-grams (shingles) of a text in one pass:
    * lower-case, whitespace-tokenize, hash each token, combine n consecutive
    * token hashes polynomially, dedupe. Equivalent set cardinalities to
    * distinct string shingles (64-bit collisions are negligible), but only
    * 8-byte values ever leave the expression.
    */
  def wordShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Long])
    val tokenHash = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val s = tokens(i)
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < s.length) { h = h * 1099511628211L + s.charAt(j); j += 1 }
      tokenHash(i) = h
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    i = 0
    while (i <= tokens.length - n) {
      var g = 0x2545F4914F6CDD1DL
      var k = 0
      while (k < n) { g = g * 0x100000001B3L + mix64(tokenHash(i + k)); k += 1 }
      if (seen.add(g)) out.add(g)
      i += 1
    }
    val arr = new Array[Long](out.size())
    i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  /** MinHash signature: sig(i) = min over shingles of mix64(g ^ seed(i)).
    * O(|grams| × k) primitive ops, zero allocation beyond the output.
    */
  def minHashSig(grams: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val g = grams.getLong(i)
      var s = 0
      while (s < k) {
        val h = mix64(g ^ mix64(s.toLong))
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Random-hyperplane LSH band hashes: `planes` Rademacher(±1) planes whose
    * signs come from mix64(plane, dim); the sign bits are grouped into
    * `bands` and each band polynomial-hashed. Vectors with high cosine agree
    * on many sign bits → collide in some band whp.
    */
  def hyperplaneBands(vec: ArrayData, planes: Int, bands: Int): ArrayData = {
    val dims = vec.numElements()
    val rows = planes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rows) {
        val p = b * rows + r
        var dot = 0.0
        var d = 0
        while (d < dims) {
          val sign = if ((mix64((p.toLong << 32) | d) & 1L) == 0L) 1.0 else -1.0
          dot += sign * vec.getFloat(d)
          d += 1
        }
        h = h * 0x100000001B3L + (if (dot >= 0) 1L else 0L)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingle_hashes(text, n) → array<long>` */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    SketchKernels.wordShingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SketchKernels.wordShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** `minhash_sig(array<long>, k) → array<long>` */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    SketchKernels.minHashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SketchKernels.minHashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `hyperplane_bands(array<float>, planes, bands) → array<long>` */
case class HyperplaneBands(child: Expression, planes: Int, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"
  override def nullSafeEval(input: Any): Any =
    SketchKernels.hyperplaneBands(input.asInstanceOf[ArrayData], planes, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SketchKernels.hyperplaneBands($c, $planes, $bands)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object SketchFunctions {
  def nearestCentroids(vec: Column, centroids: Array[Array[Float]], m: Int): Column =
    Compat.column(NearestCentroids(Compat.expression(vec), centroids, m))
  def wordShingleHashes(text: Column, n: Int): Column =
    Compat.column(WordShingleHashes(Compat.expression(text), n))
  def minHashSig(grams: Column, k: Int): Column =
    Compat.column(MinHashSig(Compat.expression(grams), k))
  def hyperplaneBands(vec: Column, planes: Int, bands: Int): Column =
    Compat.column(HyperplaneBands(Compat.expression(vec), planes, bands))
}

/** IVF coarse-quantizer kernels (centroid assignment). */
object IvfKernels {
  /** Indices of the `m` nearest centroids to `vec` by cosine similarity,
    * nearest first. One primitive pass over `centroids`; `m` is tiny (the
    * nProbe knob) so selection is insertion into a fixed-size window.
    */
  def nearestCentroids(vec: ArrayData, centroids: Array[Array[Float]], m0: Int): ArrayData = {
    val dims = vec.numElements()
    // never return more slots than centroids exist: unfilled slots would
    // read as spurious duplicate probes of centroid 0
    val m = math.min(m0, centroids.length)
    val bestIdx = new Array[Int](m)
    val bestSim = new Array[Double](m)
    java.util.Arrays.fill(bestSim, Double.NegativeInfinity)
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var d = 0
      val lim = math.min(dims, cv.length)
      while (d < lim) {
        val x = vec.getFloat(d).toDouble; val y = cv(d).toDouble
        dot += x * y; nv += x * x; nc += y * y
        d += 1
      }
      val sim = if (nv == 0.0 || nc == 0.0) -1.0 else dot / math.sqrt(nv * nc)
      var i = m - 1
      if (sim > bestSim(i)) {
        while (i > 0 && sim > bestSim(i - 1)) {
          bestSim(i) = bestSim(i - 1); bestIdx(i) = bestIdx(i - 1); i -= 1
        }
        bestSim(i) = sim; bestIdx(i) = c
      }
      c += 1
    }
    new GenericArrayData(bestIdx)
  }
}

/** `nearest_centroids(array<float>) → array<int>` — top-m centroid ids for a
  * vector against a broadcast-by-reference centroid table (codegen via
  * `ctx.addReferenceObj`, so the table is shared per task, not per row).
  */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], m: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"
  override def nullSafeEval(input: Any): Any =
    IvfKernels.nearestCentroids(input.asInstanceOf[ArrayData], centroids, m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.IvfKernels.nearestCentroids($c, $ref, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
