package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: the full k-wide MinHash signature of a
 * shingle array in ONE pass — sig[j] = min over shingles s of the 60-bit
 * md5-derived hash of s + "#" + j, bit-identical to the relational form
 * `min(conv(substr(md5(concat(s, '#', j)), 1, 15), 16, 10))` that the
 * DuckDB oracles replay (Dedup.md5Hash).
 *
 * Why native: the relational path explodes (doc, shingle) through a
 * shuffle just to min-aggregate k hash columns back per doc, and each
 * hash pays concat → md5-hex-string → substr → base-16 parse in the
 * expression interpreter. Here signature computation is a PROJECTION —
 * no explode, no exchange, one thread-local MessageDigest, and the
 * 60-bit value is read straight from the first 8 digest bytes
 * (big-endian >>> 4 == first 15 hex chars parsed base 16).
 *
 * Null/empty semantics mirror the aggregation form: an empty (or null)
 * shingle array produced no group there, so it yields null here and
 * callers filter it out; null elements are skipped like `min` skips
 * nulls.
 */
case class MinHashSigs(child: Expression, k: Int)
  extends UnaryExpression {

  require(k > 0 && k <= MinHashSigs.MAX_K, s"k=$k out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    MinHashSigs.compute(a.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the loop body lives in the static helper; generated code just
      // calls it, so the expression stays inside whole-stage codegen
      // without inlining the digest machinery into Janino
      s"""
         |${ev.value} = graft.functions.MinHashSigs.compute($a, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
  : MinHashSigs = copy(child = newChild)
}

object MinHashSigs {

  val MAX_K = 256

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // "#j" suffix bytes per seed, computed once
  private val suffix: Array[Array[Byte]] =
    Array.tabulate(MAX_K)(j => ("#" + j).getBytes("UTF-8"))

  /** One row's signature; null for empty input (no shingles → no group in
    * the aggregation form). Called from generated code — keep signature
    * Java-friendly. */
  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    val md = digest.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val sb = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(sb)
          md.update(suffix(j))
          val h = md.digest()
          // first 15 hex chars == top 60 of the first 64 digest bits
          val v = (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
            ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
            ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
            ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  /** Column form. */
  def minhashSigs(shingles: Column, k: Int): Column =
    ColumnShim.column(MinHashSigs(ColumnShim.expression(shingles), k))
}
