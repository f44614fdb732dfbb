package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd max(|x|) over a BIGINT array — the per-vector scale of
  * symmetric int8 quantization. The built-in route
  * (`array_max(transform(q, abs))`) allocates an intermediate array
  * and runs the lambda interpreted per element.
  */
case class LongArrayMaxAbs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_array_max_abs expects ARRAY<BIGINT>, got ${t.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_max_abs"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var m = 0L
    var i = 0
    while (i < x.numElements()) {
      val v = math.abs(x.getLong(i)); if (v > m) m = v; i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("len")
      val m = ctx.freshName("max")
      val k = ctx.freshName("idx")
      val v = ctx.freshName("val")
      s"""
         |int $n = $a.numElements();
         |long $m = 0L;
         |for (int $k = 0; $k < $n; $k++) {
         |  long $v = $a.getLong($k);
         |  if ($v < 0) $v = -$v;
         |  if ($v > $m) $m = $v;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd milli quantization of a FLOAT/DOUBLE vector:
  * `out[i] = round(x[i] · 1000)` as BIGINT (half-up, matching Spark's
  * `ROUND(CAST(x AS DOUBLE) * 1000)`) — the exact-integer base every
  * vector operator computes on. Replaces the interpreted
  * `transform(embedding, x -> CAST(ROUND(...) AS BIGINT))` lambda on
  * the input path of quantization, similarity search and LSH.
  */
case class FloatArrayMilli(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{DoubleType, FloatType}

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float_array_milli expects ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "float_array_milli"

  /** Half-away-from-zero rounding via sign-split binary floor.
    * Near-equivalent to Spark's ROUND(double) (BigDecimal HALF_UP on
    * the shortest decimal string), with one known divergence: a double
    * one ULP below a .5 boundary (e.g. 0.49999999999999994) reads as
    * "0.5" in shortest-decimal form, so Spark rounds it up while
    * floor(v + 0.5) correctly stays down. That edge cannot arise from
    * the milli-scaled values this expression is used on in-library
    * (float inputs widened to double), but callers feeding raw doubles
    * at .5-boundary-adjacent values will see the one-ULP difference. */
  private def roundHalfAwayFromZero(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5d).toLong
    else -math.floor(-v + 0.5d).toLong

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) * 1000d
      out(i) = roundHalfAwayFromZero(v)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("len")
      val k = ctx.freshName("idx")
      val v = ctx.freshName("val")
      val out = ctx.freshName("out")
      val get = if (isFloat) s"(double) $a.getFloat($k)" else s"$a.getDouble($k)"
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $k = 0; $k < $n; $k++) {
         |  double $v = ($get) * 1000.0d;
         |  $out[$k] = $v >= 0 ? (long) java.lang.Math.floor($v + 0.5d)
         |                     : -(long) java.lang.Math.floor(-$v + 0.5d);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd symmetric int8 quantization of a BIGINT (milli) vector:
  * `q8[i] = round(q[i]·127 / max|q|)`, round-half-away-from-zero in
  * pure integer math — `sign(x)·((|x|·254 + m) / (2m))` — so results
  * are bit-identical on every engine; the zero vector quantizes to
  * zeros. Replaces a three-deep interpreted HOF chain (transform →
  * array_max → CASE transform) with one two-pass primitive loop that
  * stays inside whole-stage codegen — the per-row hot path of
  * quantized retrieval over billions of embeddings.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_int8 expects ARRAY<BIGINT>, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0L
    var i = 0
    while (i < n) {
      val v = math.abs(x.getLong(i)); if (v > m) m = v; i += 1
    }
    val out = new Array[Long](n)
    if (m != 0L) {
      i = 0
      while (i < n) {
        val v = x.getLong(i)
        out(i) =
          if (v < 0) -((-v * 254 + m) / (2 * m))
          else (v * 254 + m) / (2 * m)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("len")
      val m = ctx.freshName("max")
      val k = ctx.freshName("idx")
      val v = ctx.freshName("val")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long $m = 0L;
         |for (int $k = 0; $k < $n; $k++) {
         |  long $v = $a.getLong($k);
         |  if ($v < 0) $v = -$v;
         |  if ($v > $m) $m = $v;
         |}
         |long[] $out = new long[$n];
         |if ($m != 0L) {
         |  for (int $k = 0; $k < $n; $k++) {
         |    long $v = $a.getLong($k);
         |    $out[$k] = $v < 0 ? -((-$v * 254L + $m) / (2L * $m))
         |                      : ($v * 254L + $m) / (2L * $m);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
