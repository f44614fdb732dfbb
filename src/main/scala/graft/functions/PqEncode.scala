package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** PQ encode as ONE compact expression: per subspace `s`, the argmin
  * centroid code of `q[s·L .. s·L+L)` under the trained codebook
  * (squared L2, ties to the lower code — the [[graft.pipeline
  * .VectorOps.pqTrain]] assignment rule).
  *
  * The previous formulation inlined the codebook as m·k literal-array
  * struct expressions reduced by `array_min`: correct, but the
  * generated projection grew past janino's 64 KB method limit (the
  * plan compiled ~38k lines) and whole-stage codegen silently fell
  * back to the interpreted path — the one hot-path fallback in the
  * library (VERDICT r7 #2). Here the codebook is a REFERENCE OBJECT
  * (`long[][][]`, data not code), so the generated code is three
  * small loops regardless of m·k·L, and the encode pass stays inside
  * whole-stage codegen at any codebook size.
  *
  * Distance discipline: `dist(s, j) = ||c_j||² − 2·q_s·c_j` — the
  * `||q_s||²` term of the true squared distance is constant per
  * (row, subspace), so the argmin and its ties are EXACTLY those of
  * the full expression (ties compare equal shifted distances). All
  * arithmetic is exact integer, as everywhere in the vector tier.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Long]]])
    extends UnaryExpression {

  private def m = codebook.length
  private def k = codebook(0).length
  private def subLen = codebook(0)(0).length

  @transient private lazy val norms: Array[Array[Long]] =
    codebook.map(_.map(c => c.map(x => x * x).sum))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects ARRAY<BIGINT> input, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val base = s * subLen
      var bestD = Long.MaxValue
      var bestJ = 0
      var j = 0
      while (j < k) {
        val c = codebook(s)(j)
        var dot = 0L
        var i = 0
        while (i < subLen) { dot += q.getLong(base + i) * c(i); i += 1 }
        val d = norms(s)(j) - 2L * dot
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      out(s) = bestJ.toLong
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[][][]")
      val nm = ctx.addReferenceObj("pqNorms", norms, "long[][]")
      val out = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val bestD = ctx.freshName("bestD")
      val bestJ = ctx.freshName("bestJ")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val c = ctx.freshName("cent")
      s"""
         |long[] $out = new long[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $subLen;
         |  long $bestD = Long.MAX_VALUE;
         |  int $bestJ = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long[] $c = $cb[$s][$j];
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $subLen; $i++) {
         |      $dot += $q.getLong($base + $i) * $c[$i];
         |    }
         |    long $d = $nm[$s][$j] - 2L * $dot;
         |    if ($d < $bestD) { $bestD = $d; $bestJ = $j; }
         |  }
         |  $out[$s] = (long) $bestJ;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
