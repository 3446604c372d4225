package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two float/double array columns.
  *
  * Why an Expression and not built-ins: the pairwise-similarity hot loops
  * (cosine near-dup, ANN ranking) evaluate a dot per *pair* inside a
  * broadcast nested-loop join condition, where neither higher-order
  * `aggregate`/`zip_with` lambdas nor a 64-term unrolled `element_at` sum
  * are whole-stage-codegen'd — both fall to per-element interpreted eval
  * (~20 µs/pair measured at sf0.1 — 50 s for 2M pairs). This expression
  * compiles to a primitive `for` loop via `doGenCode`, and its interpreted
  * `eval` is the same tight loop, so it is fast under every execution mode
  * (~0.1 µs/pair; the same 2M pairs in <1 s).
  *
  * Determinism contract (keys the DuckDB oracle parity): the sum is a
  * sequential left-to-right fold seeded with 0.0 over
  * `(double) a[i] * (double) b[i]` — the identical IEEE operation sequence
  * as DuckDB's `list_aggregate(list_transform(...), 'sum')`, so results are
  * bit-identical. float→double widening is exact; each product rounds once.
  *
  * Array elements must be non-null (embedding vectors); lengths are folded
  * to the shorter side.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($arr1.numElements(), $arr2.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $arr1.$lGet($i) * (double) $arr2.$rGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level sequential-fold dot product (see [[VecDot]]). */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(
      VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
