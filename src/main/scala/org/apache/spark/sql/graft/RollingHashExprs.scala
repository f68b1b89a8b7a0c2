package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All n-codepoint window hashes of a string in ONE pass — the kernel
  * behind cross-document repeated-substring detection (Dedup
  * `positionalGrams`). Output: array<long> of length max(0, L−n+1),
  * element i (0-based) hashing codepoints [i, i+n).
  *
  * Why it exists: the per-position formulation (`xxhash64(substr(text,
  * i, n))` under a `transform`) hashes every character n times and
  * allocates a UTF8String per gram — Σ|text|·n bytes touched. The
  * polynomial rolling hash touches each codepoint ONCE (drop the
  * leaving codepoint's term, multiply, add the entering one), so the
  * whole gram frame costs Σ|text| arithmetic with zero per-gram
  * allocation — the n-fold kernel cut that took q119 from ~2.4× to
  * parity with its DuckDB oracle.
  *
  * Hash-agnosticism contract (same as the xxhash64 it replaces): the
  * repeated-span surfaces never emit a hash value — gram hashes only
  * PARTITION windows into identical-substring groups, so any sound hash
  * yields the same repeated sets and the DuckDB oracle is free to group
  * by its own md5. A polynomial mod-2^64 hash is sound for natural text
  * (a false merge needs two distinct n-grams on one 64-bit collision;
  * the base is an odd 64-bit prime, so the map is a bijection per
  * window position-weight).
  */
case class RollingGramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 2, "gram length must be >= 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_gram_hashes"

  private val B = 0x100000001b3L // FNV-1a prime, odd => invertible mod 2^64
  private val powN1: Long = {
    var p = 1L; var i = 1
    while (i < n) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // codepoint array (surrogate-pair safe; positions must match the
    // codepoint-counting substr both Spark and the DuckDB oracle use)
    val cps = new Array[Int](s.length)
    var L = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(L) = cp; L += 1
      i += Character.charCount(cp)
    }
    if (L < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](L - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * B + cps(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= L - n) {
      h = (h - cps(i - 1) * powN1) * B + cps(i + n - 1)
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[RollingGramHashes].getName
    val ref = ctx.addReferenceObj("rollingHasher", this, cls)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ($ad) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingGramHashes =
    copy(child = newChild)
}

object RollingHashExprs {
  def rollingGramHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(RollingGramHashes(ExpressionUtils.expression(text), n))
}
