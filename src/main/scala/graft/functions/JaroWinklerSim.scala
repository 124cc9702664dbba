package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: Jaro-Winkler string similarity — the standard
 * entity-resolution verify metric (name/address matching), complementing the
 * built-in `levenshtein` with a length-normalized score that rewards shared
 * prefixes. Third native expression beside [[DotProduct]] and
 * [[MinHashSigs]]: the ER verify stage runs this once per candidate pair,
 * and the static-call codegen keeps it inside whole-stage codegen (the
 * pattern Spark's own `levenshtein` uses).
 *
 * Semantics pinned to the classic algorithm, byte-for-byte replayable by
 * DuckDB's `jaro_winkler_similarity` (verified against it over boundary
 * cases in JaroWinklerSpec):
 *  - match window = max(⌊max(|a|,|b|)/2⌋ − 1, 0); zero matches → 0.0;
 *    either side empty → 0.0 (even for two empties);
 *  - transpositions = half the out-of-order matched positions;
 *  - the Winkler prefix boost (p = 0.1, prefix capped at 4) applies only
 *    when the Jaro score exceeds 0.7 (the classic boost threshold).
 *
 * Operates on UTF-8 BYTES (like DuckDB), so scores agree across engines for
 * any input; for multi-byte text a "character" is a byte — the ER columns
 * this serves are ASCII identifiers/names.
 */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinklerSim(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** The algorithm, called from generated code via the static forwarder. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val sm = new Array[Boolean](la)
    val tm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tm(j) && s(i) == t(j)) {
          sm(i) = true; tm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // out-of-order matched positions, walked in order on both sides
    var mismatched = 0
    var k = 0
    i = 0
    while (i < la) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s(i) != t(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    // Floor division ON PURPOSE: a 3-cycle of matched chars (e.g.
    // ABCVWXYZ / CABVWXYZ) gives an ODD mismatch count, and the classic
    // algorithm — and DuckDB — count it as floor(3/2) = 1 transposition.
    val trans = mismatched / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - trans) / md) / 3.0
    if (jaro > 0.7) {
      val maxL = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxL && s(l) == t(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
