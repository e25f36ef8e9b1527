package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-ORDER (Morton) interleave of two non-negative long keys — the
  * multi-dimensional clustering primitive: sorting by the interleaved
  * key places rows close in BOTH dimensions into the same files, so
  * parquet min/max footer stats stay narrow on each dimension
  * separately and a range predicate on either column prunes row
  * groups. A linear sort gives this on its leading column only; at
  * 100 TB the difference is scanning one dimension's slice versus the
  * whole table (the Delta/Iceberg OPTIMIZE ZORDER technique, here as
  * a plain codegen'd expression + range-partitioned write).
  */
object ZOrder {

  /** Bit-interleave two keys in [0, 2^31): a's bits land on even
    * positions, b's on odd — 62 bits out, order-preserving per
    * dimension. Loud outside the domain (aliasing high bits would
    * silently destroy locality). */
  def interleave(a: Long, b: Long): Long = {
    require(a >= 0L && a < (1L << 31) && b >= 0L && b < (1L << 31),
      s"zorder keys must lie in [0, 2^31): got ($a, $b)")
    var r = 0L
    var i = 0
    while (i < 31) {
      r |= ((a >> i) & 1L) << (2 * i)
      r |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }
}

/** [[ZOrder.interleave]] as a codegen'd native expression. */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderExprs {
  def interleaveBits(a: Column, b: Column): Column =
    Bridge.column(InterleaveBits(
      Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long"))))
}
