package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the engine's 60-bit md5-derived content
 * hash — bit-identical to the relational form
 * `conv(substring(md5(x), 1, 15), 16, 10)::long` that the DuckDB
 * oracles replay (Dedup.md5Hash), computed straight from the digest
 * bytes (first 15 hex chars == top 60 of the first 64 digest bits, the
 * [[MinHashSigs]] extraction).
 *
 * Why native: md5Hash is the content-addressing workhorse of every
 * deterministic draw in the engine (bucket salts, sampling folds,
 * pairing orders, slot sketches — d103 alone evaluates it
 * rows × 64 times), and the relational form pays, per call, a 32-char
 * hex UTF8String materialization, a substring copy, an arbitrary-base
 * `conv` string parse and a long cast. Here the digest goes straight
 * to the long with one thread-local MessageDigest and zero
 * intermediate strings.
 *
 * Accepts string (hashes its UTF-8 bytes — exactly what `md5(string)`
 * hashes after its implicit binary cast) or binary input; null → null.
 */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_long expects string or binary, got ${other.sql}")
  }

  // lazy: dataType is only legal on a RESOLVED child, and Catalyst
  // copies expressions (withNewChildInternal) while still unresolved
  private lazy val isString = child.dataType == StringType

  override def nullSafeEval(a: Any): Any =
    if (isString) Md5Long.hashBytes(a.asInstanceOf[UTF8String].getBytes)
    else Md5Long.hashBytes(a.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = if (isString) s"$a.getBytes()" else a
      s"${ev.value} = graft.functions.Md5Long.hashBytes($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression)
  : Md5Long = copy(child = newChild)

  override def prettyName: String = "md5_long"
}

object Md5Long {

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes) as a non-negative long — equals
    * `conv(substring(md5(bytes), 1, 15), 16, 10)::long`. Called from
    * generated code — keep the signature Java-friendly. */
  def hashBytes(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val h = md.digest(bytes)
    (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
  }

  /** Column form. */
  def apply(c: Column): Column =
    ColumnShim.column(Md5Long(ColumnShim.expression(c)))
}
