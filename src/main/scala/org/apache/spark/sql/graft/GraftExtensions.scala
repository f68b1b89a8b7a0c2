package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the engine's native expressions, so `spark.sql`
  * users get them as first-class functions:
  *
  *   array_long_dot(a, b)              exact integer dot product
  *   minhash_sigs(hs, k)               k affine MinHash minima in one pass
  *   array_long_intersect_count(a, b)  |A∩B| without materialization
  *
  * Two entry points, both thin:
  *   - `GraftExtensions` for `spark.sql.extensions` (applies at session
  *     build — the production path), via SparkSessionExtensions.injectFunction.
  *   - `GraftFunctions.register(spark)` for an already-running session
  *     (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    // declarative HOF kernels → codegen'd expressions (see GraftKernelRules)
    ext.injectOptimizerRule(_ => GraftKernelRules)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_long_dot"),
      info("array_long_dot", "_FUNC_(a, b) - exact integer dot product of two array<bigint>"),
      (children: Seq[Expression]) => ArrayLongDot(children(0), children(1))),
    (FunctionIdentifier("array_long_intersect_count"),
      info("array_long_intersect_count", "_FUNC_(a, b) - |a ∩ b| for array<bigint> sets"),
      (children: Seq[Expression]) => ArrayLongIntersectCount(children(0), children(1))),
    (FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", "_FUNC_(hs, k) - k affine MinHash minima over hashed shingles"),
      (children: Seq[Expression]) => {
        val k = children(1).eval().asInstanceOf[Number].intValue()
        MinHashSigs(children(0), k, 1048573L, 2147483647L, 1000003L, 7919L, 12345L, 104729L)
      }),
    (FunctionIdentifier("bpe_token_count"),
      info("bpe_token_count",
        "_FUNC_(text, merges) - BPE token count; merges = array(array(a,b), ...) ranked"),
      (children: Seq[Expression]) => {
        // merge table must be a foldable literal: array of 2-element arrays
        val arr = children(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val merges = (0 until arr.numElements()).map { i =>
          val pair = arr.getArray(i)
          (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
        }
        BpeTokenCount(children(0), merges)
      }))

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, inf, builder) =>
      registry.registerFunction(id, inf, builder)
    }
  }
}
