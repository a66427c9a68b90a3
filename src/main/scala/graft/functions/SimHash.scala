package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Support for the native SimHash: one pass over the feature-hash
  * array accumulating per-bit majority counters. Semantics are
  * EXACTLY the composed form's (bit b set iff strictly more feature
  * hashes have bit b set than unset, i.e. 2*cnt_b - n > 0), so the
  * DuckDB oracle is unchanged — but the composed form walks the
  * array once per bit (48 `filter` passes, each materializing an
  * array), while this walks it once total.
  */
object SimHashUtil {
  def hash(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        cnt(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (2 * cnt(b) - n > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** `graft_simhash(array<bigint>, bits)` — `bits`-wide SimHash over a
  * (multiplicity-preserving) feature-hash array, single fused pass.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<bigint> and 1<=bits<=64, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.hash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.hash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
