package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the ANN vector hot path.
  *
  * The HOF formulations in VectorOps (transform / zip_with +
  * aggregate) are interpreted: one closure dispatch per element, 64×
  * per row per reference. These run the same exact-integer math in a
  * tight JVM loop. VectorOps keeps the HOF versions as executable
  * specifications; equivalence is asserted in VectorNativeSpec.
  *
  * Semantics contract (bit-identical to the HOF versions and the
  * DuckDB oracle): quantize = floor(double(x) * Q) per element (null
  * element → null element); qdot = Σ l(i)·r(i), NULL if lengths
  * differ or any touched element is null (zip_with pads the shorter
  * side with nulls and `+` propagates them — same outcome). */
object VectorNative {

  def quantize(v: ArrayData, q: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i))
        out(i) = math.floor(v.getFloat(i).toDouble * q).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Boxed Long so `null` can signal the zip_with-padding cases. */
  def qdot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

case class QuantizeVector(child: Expression, q: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "quantize_vector"

  override def nullSafeEval(input: Any): Any =
    VectorNative.quantize(input.asInstanceOf[ArrayData], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorNative.quantize($c, $q);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class QDotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "qdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorNative.qdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_boxed = graft.functions.VectorNative.qdot($a, $b);
      if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_boxed.longValue(); }""")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level API. */
object vectorNative {
  def quantize_vector(v: Column, q: Int): Column =
    ColumnBridge.column(QuantizeVector(ColumnBridge.expression(v), q))
  def qdot(a: Column, b: Column): Column =
    ColumnBridge.column(QDotLong(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
