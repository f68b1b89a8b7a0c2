package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared BPE merge kernel: a ranked merge table applied to one
  * whitespace word — characters (surrogate-pair safe) repeatedly merge
  * at the LOWEST-rank adjacent pair until none applies. Both the count
  * and the encode expressions call this one implementation, so their
  * results can never drift apart. */
private[graft] final class BpeMergeKernel(merges: Seq[(String, String)])
    extends Serializable {
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + "\u0000" + b, Integer.valueOf(i))
    }
    m
  }

  def encodeWord(word: String): java.util.ArrayList[String] = {
    val pieces = new java.util.ArrayList[String](word.length)
    if (word.isEmpty) return pieces
    var i = 0
    while (i < word.length) { // chars, surrogate-pair safe
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      pieces.add(word.substring(i, i + n))
      i += n
    }
    var merged = true
    while (merged && pieces.size > 1) {
      var bestRank = Integer.MAX_VALUE
      var bestAt = -1
      var j = 0
      while (j < pieces.size - 1) {
        val r = ranks.get(pieces.get(j) + "\u0000" + pieces.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) merged = false
      else {
        pieces.set(bestAt, pieces.get(bestAt) + pieces.get(bestAt + 1))
        pieces.remove(bestAt + 1)
      }
    }
    pieces
  }
}

/** Merge-table BPE token count — the real byte-pair-encoding apply step
  * (vs the regex proxy in TextFunctions.bpeTokenCount): per whitespace
  * word, start from characters and repeatedly merge the adjacent pair with
  * the LOWEST merge rank until none applies, then count the resulting
  * pieces. Row-local, one compiled pass per document; the ranked merge
  * table rides along as a reference object (broadcast with the plan, no
  * shuffle). Same codegen shape as the other graft expressions: the
  * generated code calls back into this compiled method — the data-moving
  * pipeline stays inside WholeStageCodegen.
  *
  * Learning the table is `graft.operators.Bpe.learnMerges` (a distributed
  * Spark job); this expression is the at-scale encode path.
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val kernel = new BpeMergeKernel(merges)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
    if (text.isEmpty) 0L
    else {
      var total = 0L
      text.split("\\s+").foreach(w => total += kernel.encodeWord(w).size.toLong)
      total
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[BpeTokenCount].getName
    val ref = ctx.addReferenceObj("bpeCounter", this, cls)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Merge-table BPE ENCODE — the piece sequence itself (array<string>, in
  * document order), not just its length: the step that actually feeds a
  * trainer. Same kernel, same codegen shape as [[BpeTokenCount]];
  * `size(bpe_encode(x)) == bpe_token_count(x)` by construction. Piece →
  * vocab-id is deliberately NOT fused in: ids are a posexplode + join
  * against a vocab table, which keeps the expression vocab-free and the
  * id space a catalog concern. */
case class BpeEncodePieces(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val kernel = new BpeMergeKernel(merges)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
    if (text.isEmpty) new GenericArrayData(Array.empty[Any])
    else {
      val out = new java.util.ArrayList[Any]()
      text.split("\\s+").foreach { w =>
        val ps = kernel.encodeWord(w)
        var i = 0
        while (i < ps.size) { out.add(UTF8String.fromString(ps.get(i))); i += 1 }
      }
      new GenericArrayData(out.toArray)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[BpeEncodePieces].getName
    val ref = ctx.addReferenceObj("bpeEncoder", this, cls)
    val ad = classOf[ArrayData].getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ($ad) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodePieces =
    copy(child = newChild)
}

object BpeExprs {
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeTokenCount(ExpressionUtils.expression(text), merges))

  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeEncodePieces(ExpressionUtils.expression(text), merges))
}
