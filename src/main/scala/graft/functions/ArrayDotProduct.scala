package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `array_dot(a, b)` — dot product of two `array<double>` columns as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Why an Expression and not a UDF or `aggregate(zip_with(...))`: the
  * higher-order functions interpret a lambda per element (closure calls,
  * boxing) and a Scala UDF adds serialization at the boundary; both are an
  * order of magnitude too slow for similarity kernels that evaluate one dot
  * per candidate pair. The generated code below is a primitive loop the JIT
  * vectorizes, and it composes with the rest of the operator's codegen
  * stage (no pipeline break).
  *
  * Two modes:
  *   - default (`strict = false`, the hand-written similarity kernels):
  *     evaluates over the element-count minimum, elements assumed non-null
  *     (the quantization projections produce them).
  *   - `strict = true` (the [[graft.plans.DotProductRewrite]] optimizer
  *     rule): NULL on length mismatch or any null element — exactly the
  *     semantics of `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`, whose
  *     zip null-pads the shorter array and poisons the sum. The rewrite
  *     must preserve those semantics bit-for-bit, and the summation order
  *     (ascending index) already matches the sequential fold.
  */
case class ArrayDotProduct(left: Expression, right: Expression,
    strict: Boolean = false)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = strict || super.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (strict && x.numElements() != y.numElements()) return null
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (strict && (x.isNullAt(i) || y.isNullAt(i))) return null
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      if (!strict) {
        // pristine hot path: no isNull references (safe under codegen
        // function splitting), exactly the pre-strict code
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $sum = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $sum += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $sum;
         """.stripMargin
      } else {
        // strict: may flip ev.isNull (nullSafeCodeGen documents that the
        // result code may change nullability); bad-state tracked in a
        // local so ev.isNull is touched exactly once
        val bad = ctx.freshName("bad")
        s"""
           |boolean $bad = $a.numElements() != $b.numElements();
           |double $sum = 0.0;
           |if (!$bad) {
           |  int $n = $a.numElements();
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |    $sum += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |}
           |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}
