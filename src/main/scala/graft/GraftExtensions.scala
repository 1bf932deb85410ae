package graft

import graft.expr._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration of the engine's custom Catalyst expressions, so
  * `spark.sql` users get them as first-class functions:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT cri_timestamp_nanos(ts_str), simhash64(hashes) FROM t")
  * }}}
  *
  * [[GraftSession.configure]] also installs them on an already-built session
  * (driver-owned sessions can't add builder-time extensions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name → FunctionBuilder for every SQL-expressible custom expression. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cri_timestamp_nanos" -> { args => CriTimestampNanos(args.head) },
    "poly_hash64" -> { args => PolyHash64(args.head) },
    "simhash64" -> { args => SimHash64(args.head) },
    "simhash64_text" -> { args => SimHashText(args.head) },
    "cosine_sim" -> { args => CosineSimilarity(args(0), args(1)) },
    "dot_product" -> { args => DotProduct(args(0), args(1)) },
    "word_shingle_hashes" -> { args =>
      WordShingleHashes(args.head, intArg(args(1), "n")) },
    "minhash_sig" -> { args => MinHashSig(args.head, intArg(args(1), "k")) },
    "hyperplane_bands" -> { args =>
      HyperplaneBands(args.head, intArg(args(1), "planes"), intArg(args(2), "bands")) },
    "random_project" -> { args =>
      RandomProjection(args.head, intArg(args(1), "outDim"), longArg(args(2), "seed")) }
  )

  /** Install on an existing session (temp-function registry). Idempotent:
    * already-registered names are left alone — re-registering on every
    * `configure` call emitted one "replaced a previously registered
    * function" WARN per function per call, flooding bounded log captures
    * (the round-6 bench artifact lost its sequential map to exactly this).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
