package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecDot, MinHashSigExpr, SimHash64Expr, WordShinglesExpr}
import graft.operators.Dedup

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * codegen kernels too:
  *
  *   spark = SparkSession.builder()
  *     .withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) ...")
  *
  * Functions: vec_dot(a, b), word_shingles(text, n),
  * minhash_sig(hashes, numPerms, seed), simhash64(hashes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
}

object GraftExtensions {

  private def foldableArg(
      args: Seq[Expression], i: Int, fn: String, what: String): Any = {
    val e = args(i)
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        Map(
          "sqlExpr" -> s"$fn(...)",
          "inputName" -> s"`$what`",
          "inputType" -> "integer literal",
          "inputExpr" -> e.sql))
    e.eval()
  }

  private def intArg(
      args: Seq[Expression], i: Int, default: Int,
      fn: String, what: String): Int =
    if (args.length > i)
      foldableArg(args, i, fn, what).asInstanceOf[Number].intValue()
    else default

  /** Long-typed constant argument — `Number.intValue()` would silently
    * truncate a BIGINT literal (e.g. a seed > 2^31) to 32 bits and
    * select a different permutation family than the DataFrame API. */
  private def longArg(
      args: Seq[Expression], i: Int, default: Long,
      fn: String, what: String): Long =
    if (args.length > i)
      foldableArg(args, i, fn, what).asInstanceOf[Number].longValue()
    else default

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", "vec_dot(a, b) - dot product of two numeric arrays",
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    ("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles",
      (args: Seq[Expression]) =>
        WordShinglesExpr(args.head,
          intArg(args, 1, 3, "word_shingles", "n"))),
    ("minhash_sig", "minhash_sig(hashes, numPerms, seed) - MinHash signature",
      (args: Seq[Expression]) =>
        MinHashSigExpr(args.head,
          intArg(args, 1, 126, "minhash_sig", "numPerms"),
          longArg(args, 2, 42L, "minhash_sig", "seed"),
          Dedup.MinhashPrime)),
    ("simhash64", "simhash64(hashes) - 64-bit SimHash fingerprint",
      (args: Seq[Expression]) => SimHash64Expr(args.head)))

  /** Register on an already-constructed session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name,
        new ExpressionInfo("graft", null, name, usage, ""), builder)
    }
}
