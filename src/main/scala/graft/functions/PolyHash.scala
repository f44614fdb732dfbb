package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash of a string's byte stream:
  * `h = fold(seed=7, h*31 + byte mod 1e9+7)`.
  *
  * The built-in route (`aggregate(split(text, ''), 7L, ...)`) allocates
  * a per-character array and runs the lambda *interpreted* with boxing —
  * the exact pattern [[LongArrayDot]] exists to avoid (reference for the
  * operator: winnowing/rolling-hash document fingerprinting). This stays
  * inside whole-stage codegen as one tight loop over the UTF8 bytes
  * (inputs are ASCII; for ASCII, byte == code point == `ascii(char)`).
  */
case class StringPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"string_poly_hash expects STRING input, got ${t.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "string_poly_hash"

  override def nullSafeEval(s: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    var h = 7L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      // fresh names: generated projections use short locals (`i` is the
      // input row of UnsafeProjection) that plain names would shadow
      val b = ctx.freshName("bytes")
      val h = ctx.freshName("hash")
      val k = ctx.freshName("idx")
      s"""
         |byte[] $b = $s.getBytes();
         |long $h = 7L;
         |for (int $k = 0; $k < $b.length; $k++) {
         |  $h = ($h * 31L + ($b[$k] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
