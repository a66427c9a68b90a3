package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Native Catalyst probe into a DELETION-VECTOR bitmap: is bit `idx`
  * set in `bytes` (a `java.util.BitSet.toByteArray` serialization —
  * bit n lives at byte n/8, position n%8)? O(1) per row, zero
  * allocation, direct byte probe inside whole-stage codegen — the
  * read-side cost model that makes per-file delete bitmaps beat a
  * row-proportional (path, idx) hash-set join: the mask for a file is
  * one broadcast byte-array lookup plus this bit test.
  *
  * Out-of-range indices (past the bitmap's last byte, or negative)
  * are simply "not set" — a bitmap only records the rows it deletes.
  */
case class DvContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dv_contains expects (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_dv_contains"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DvContains.contains(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DvContains.contains($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvContains =
    copy(left = newLeft, right = newRight)
}

object DvContains {
  /** Bit probe on BitSet.toByteArray bytes: bit n = (bytes[n>>3] >> (n&7)) & 1. */
  def contains(bytes: Array[Byte], idx: Long): Boolean = {
    if (idx < 0) return false
    val byteIdx = idx >>> 3
    byteIdx < bytes.length && ((bytes(byteIdx.toInt) >> (idx & 7L).toInt) & 1) == 1
  }
}
