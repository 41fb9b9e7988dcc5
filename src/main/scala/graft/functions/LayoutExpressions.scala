package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve layout keys beyond the bit-interleave Z-order
  * (`RelQueries.zvalue`). The Hilbert index is the curve Z-order
  * approximates: CONSECUTIVE indices are always UNIT-STEP adjacent
  * cells (|Δx|+|Δy| = 1, spec-verified exhaustively over the full
  * 256×256 grid), where the Z curve jumps up to half the grid at
  * quadrant seams. The price is that the mapping is data-dependent
  * per bit level (each step conditionally reflects and transposes the
  * lower bits), so unlike `zvalue` it cannot unroll into one static
  * shift/or formula — an 8-step expression fold would double the
  * expression tree per step, so it ships as a native expression with
  * a codegen'd loop instead (the `CentroidArgmin` plan-size lesson).
  */
object HilbertOps {
  /** 16-bit Hilbert index of (x mod 256, y mod 256) — the standard
    * iterative xy→d walk: per level s = 128…1, quadrant digit
    * (3·rx)⊕ry weighted s², then reflect (s−1−·, when rx=1∧ry=0)
    * and transpose the remaining low bits. Pure integer ops; the
    * DuckDB oracle restates the identical loop as a recursive CTE. */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 255L
    var y = y0 & 255L
    var d = 0L
    var s = 128L
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** hilbert_index(x, y): LONG in [0, 65536) — see [[HilbertOps.xy2d]].
  * Codegen emits one static call (the loop lives in compiled Scala,
  * not in generated Java), keeping the plan O(1)-sized. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertOps.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertOps.xy2d($a, $b)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Column-level API. */
object layoutNative {
  def hilbert_index(x: Column, y: Column): Column =
    ColumnBridge.column(HilbertIndex(ColumnBridge.expression(x),
      ColumnBridge.expression(y)))
}
