package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: word n-gram shingles — space-joined
 * windows of `n` consecutive tokens — in ONE pass over the token
 * array, bit-identical to the relational form
 * `transform(sequence(1, size(toks) - (n-1)), i =>
 *   concat_ws(" ", slice(toks, i, n)))`
 * (with the `size >= n` empty guard) that TextOps.shingles built
 * through r17.
 *
 * Why native: shingling is the entry kernel of EVERY shingle-join
 * operator family (MinHash signatures, Jaccard/containment pairs,
 * source overlap, decontamination, duplicate spans, novelty) and the
 * relational form pays, per shingle, an interpreted lambda dispatch, a
 * `slice` array allocation and a varargs `concat_ws` — measured r18 at
 * 3.9 s for ONE corpus pass at sf0.1 where the rest of the tokenize
 * pipeline costs 0.15 s. Here the window slides over the token array
 * once and each shingle is one `UTF8String.concatWs` over reused
 * references.
 *
 * Null/empty semantics mirror the relational composition exactly
 * (WordShinglesSpec pins them): fewer than `n` tokens → empty array
 * (the `when` guard's `otherwise(array())`); a null TOKEN inside a
 * window is skipped by concat_ws (joins the survivors with one
 * space); a null token ARRAY → null here, and [[graft.ops.TextOps]]
 * restores the legacy null→empty via coalesce.
 */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"shingle width n=$n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    WordShingles.compute(a.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordShingles.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression)
  : WordShingles = copy(child = newChild)
}

object WordShingles {

  private val SPACE = UTF8String.fromString(" ")

  /** One row's shingles; empty array when the row has fewer than n
    * tokens. Called from generated code — keep the signature
    * Java-friendly. The short-doc branch allocates a FRESH empty
    * GenericArrayData per call (r18 ADVICE): sharing one mutable
    * ArrayData instance across rows is a latent aliasing hazard if a
    * consumer ever mutates or retains it, and the allocation is
    * negligible on this rare path. */
  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    // materialize the token refs once; windows then reuse them instead
    // of slicing a fresh array per shingle
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      // concatWs skips null inputs — the concat_ws(" ", slice(...))
      // semantics the relational form had
      out(i) = UTF8String.concatWs(SPACE, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column form. */
  def wordShingles(toks: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(toks), n))
}
