package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd dot product of two BIGINT arrays.
  *
  * The built-in route (`aggregate(zip_with(a, b, (x,y) -> x*y), ...)`)
  * is a higher-order function: Catalyst evaluates the lambda
  * *interpreted*, per element, with boxing — it dominates the runtime
  * of brute-force similarity search. This expression stays inside
  * whole-stage codegen as one tight primitive loop (preference order
  * per SURVEY §7.3: compose built-ins, then custom Expression, before
  * anything else).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"long_array_dot expects ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: generated projections use short locals (`i` is the
      // input row of UnsafeProjection) that plain names would shadow
      val n = ctx.freshName("len")
      val s = ctx.freshName("acc")
      val k = ctx.freshName("idx")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $k = 0; $k < $n; $k++) {
         |  $s += $a.getLong($k) * $b.getLong($k);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column wrapper for [[LongArrayDot]] (Spark 4 classic-mode bridge). */
  def longArrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper for [[StringPolyHash]]. */
  def stringPolyHash(s: Column): Column =
    ColumnBridge.column(StringPolyHash(ColumnBridge.expression(s)))

  /** Column wrapper for [[LongArrayMaxAbs]]. */
  def longArrayMaxAbs(a: Column): Column =
    ColumnBridge.column(LongArrayMaxAbs(ColumnBridge.expression(a)))

  /** Column wrapper for [[QuantizeInt8]]. */
  def quantizeInt8Col(a: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(a)))

  /** Column wrapper for [[FloatArrayMilli]]. */
  def floatArrayMilli(a: Column): Column =
    ColumnBridge.column(FloatArrayMilli(ColumnBridge.expression(a)))

  /** Column wrapper for [[PqEncode]]. */
  def pqEncode(q: Column, codebook: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(q), codebook))
}
