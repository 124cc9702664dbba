package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: the full k-wide MinHash signature of a
 * shingle array under the PRODUCTION xxhash64 family in ONE pass —
 * sig[j] = min over shingles s of `xxhash64(s, j)`, bit-identical to
 * the relational form `array_min(transform(sh, x => xxhash64(x, j)))`
 * that [[graft.ops.Dedup.minhashWideSigs]]'s generic-family path
 * builds (d49's production side).
 *
 * Why native: the generic path folds the family through k separate
 * `transform` + `array_min` higher-order functions — Spark evaluates
 * lambda functions OUTSIDE whole-stage codegen, one interpreted
 * expression tree walk per (shingle, seed) pair plus k intermediate
 * array allocations per doc. Here the whole signature is one codegen
 * call: per shingle the STRING hash is computed once
 * (`XXH64.hashUTF8String(s, 42)` — xxhash64's fold makes the string
 * hash the seed of the j-hash, so it is seed-independent) and the k
 * seeds ride k cheap `hashInt` folds (the generic form's seed is an
 * IntegerType literal), exactly the arithmetic `XxHash64(Seq(s, j))`
 * evaluates (XxMinHashSigsSpec pins bit-for-bit parity, including the
 * null-element and empty-array edges).
 *
 * Null/empty semantics mirror the generic path's guarded form: an
 * empty (or null) shingle array yields null (the `when(size == 0,
 * null)` guard there); a null ELEMENT is skipped by xxhash64's fold
 * (hash stays at the seed) and still contributes hashLong(j, 42) to
 * the min, exactly like the transform form.
 */
case class XxMinHashSigs(child: Expression, k: Int)
  extends UnaryExpression {

  require(k > 0 && k <= MinHashSigs.MAX_K, s"k=$k out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xx_minhash_sigs expects array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    XxMinHashSigs.compute(a.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the loop body lives in the static helper; generated code just
      // calls it, so the expression stays inside whole-stage codegen
      // without inlining the hash machinery into Janino
      s"""
         |${ev.value} = graft.functions.XxMinHashSigs.compute($a, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
  : XxMinHashSigs = copy(child = newChild)
}

object XxMinHashSigs {

  /** xxhash64's fixed start seed (XxHash64 expression default). */
  private val SEED = 42L

  /** One row's signature; null for empty input (the generic path's
    * `when(size == 0, null)` guard). Called from generated code — keep
    * the signature Java-friendly. */
  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // xxhash64(s, j) = hashLong(j, hashUTF8String(s, 42)); a null
      // element is skipped by the fold, leaving the start seed
      val base =
        if (arr.isNullAt(i)) SEED
        else XXH64.hashUTF8String(arr.getUTF8String(i), SEED)
      var j = 0
      while (j < k) {
        // the generic form's seed is lit(j: Int) — IntegerType — so the
        // fold's second step is hashInt, not hashLong
        val h = XXH64.hashInt(j, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column form. */
  def xxMinhashSigs(shingles: Column, k: Int): Column =
    ColumnShim.column(XxMinHashSigs(ColumnShim.expression(shingles), k))
}
