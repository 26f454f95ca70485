package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{LongArrayDot, LshSigExpr, MinHashSigExpr,
  NgramsExpr, RollingHashExpr, ShinglesExpr, SimHashExpr, TokensExpr,
  WinnowExpr}

/** SparkSessionExtensions installer for graft's native expressions, so a
  * plain-SQL user gets them without touching the Scala API:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT graft_dot(a, b) FROM t")
  * }}}
  *
  * The operator entry points (graft.operators.*) also self-register these
  * per session, so the extension class is optional for Scala users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.ZipRowsStrategy)
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - integer dot product of two bigint arrays"),
      (exprs: Seq[Expression]) => LongArrayDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_tokens"),
      info("graft_tokens", "graft_tokens(text) - normalized token array"),
      (exprs: Seq[Expression]) => TokensExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(text, k) - k seeded md5 minhash components"),
      (exprs: Seq[Expression]) => MinHashSigExpr(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_rollhash"),
      info("graft_rollhash", "graft_rollhash(text) - polynomial rolling hash"),
      (exprs: Seq[Expression]) => RollingHashExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_ngrams"),
      info("graft_ngrams", "graft_ngrams(text, n) - space-joined token n-grams"),
      (exprs: Seq[Expression]) => NgramsExpr(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(text) - word 3-gram shingles (token fallback)"),
      (exprs: Seq[Expression]) => ShinglesExpr(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(text, bits) - bits-wide simhash fingerprint, NULL on zero tokens"),
      (exprs: Seq[Expression]) => SimHashExpr(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "graft_winnow(text, w) - robust-winnowing fingerprints"),
      (exprs: Seq[Expression]) => WinnowExpr(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_lshsig"),
      info("graft_lshsig", "graft_lshsig(q, nBits[, jOffset]) - sign-bit LSH signature of a bigint array"),
      (exprs: Seq[Expression]) => LshSigExpr(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int],
        if (exprs.length > 2) exprs(2).eval(null).asInstanceOf[Int] else 0)))
  }
}
