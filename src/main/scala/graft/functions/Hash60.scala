package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Support for the native 60-bit md5 hash: the value of the first 15
  * hex digits of md5(input) — numerically identical to
  * `conv(substr(md5(x),1,15),16,10)` and DuckDB's
  * `('0x'||substr(md5(x),1,15))::BIGINT` — computed straight from the
  * digest bytes (no hex-string materialization, no base-16 parse).
  * The expression form replaces the composed version on hot paths
  * (MinHash signatures: 12 salted hashes × shingles per doc).
  */
object Hash60Util {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes), hex-digit order (matches substr). */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xffL) << 52) | ((b(1) & 0xffL) << 44) | ((b(2) & 0xffL) << 36) |
      ((b(3) & 0xffL) << 28) | ((b(4) & 0xffL) << 20) | ((b(5) & 0xffL) << 12) |
      ((b(6) & 0xffL) << 4) | ((b(7) & 0xffL) >>> 4)
  }
}

case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60Util.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60Util.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}
