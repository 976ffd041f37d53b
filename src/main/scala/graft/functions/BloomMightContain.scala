package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(value, serialized_filter)` — probe a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` (the same sketch
  * `df.stat.bloomFilter` produces) as a native codegen'd expression.
  *
  * Why an Expression and not a UDF: the probe sits on the bulk side of
  * incremental dedup (every incoming row pays it), so it must stay inside
  * whole-stage codegen — a Scala UDF would break the stage and add ser/de
  * per row. The filter bytes arrive as a foldable BinaryType literal (built
  * once on the driver, shipped with the plan; the deserialized filter is a
  * per-executor reference object, NOT regenerated per row, and the literal
  * is never inlined into generated Java). The generated code is a single
  * virtual call against that reference.
  *
  * Value may be STRING (probed as its UTF-8 bytes, matching
  * `BloomFilter.putString`) or BIGINT (matching `putLong`). Null value →
  * null. False positives are allowed by contract — callers must route
  * might-contain rows through an exact check (see
  * `Dedup.incrementalDedupBloom`); false negatives never occur.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType | LongType if right.dataType == BinaryType && right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain expects (string|bigint, foldable binary), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql}" +
        s"${if (right.foldable) "" else ", non-foldable"})")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else left.dataType match {
      case StringType => bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
      case LongType => bloom.mightContainLong(v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    val l = left.genCode(ctx)
    val probe = left.dataType match {
      case StringType => s"$ref.mightContainBinary(${l.value}.getBytes())"
      case LongType => s"$ref.mightContainLong(${l.value})"
    }
    if (nullable) {
      ev.copy(code =
        code"""
          ${l.code}
          boolean ${ev.isNull} = ${l.isNull};
          boolean ${ev.value} = false;
          if (!${ev.isNull}) {
            ${ev.value} = $probe;
          }""")
    } else {
      ev.copy(code =
        code"""
          ${l.code}
          boolean ${ev.value} = $probe;""",
        isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}
