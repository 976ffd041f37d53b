package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `array_intersect_count(a, b)` — `size(array_intersect(a, b))` without
  * materializing the intersection array.
  *
  * `size(array_intersect(...))` is the confirm kernel of the whole
  * MinHash/LSH family (Jaccard = |A∩B| / (|A|+|B|−|A∩B|), evaluated once
  * per candidate pair): the composed form allocates a deduplicated
  * intersection ARRAY per pair (hash set build + element copy + array
  * header) only to take its length and throw it away. This expression
  * computes the count directly — same hash-set probe, zero allocation of
  * the result array — and stays inside whole-stage codegen (the generated
  * code is one static kernel call per row; no lambda interpretation, no
  * CodegenFallback).
  *
  * Semantics are EXACTLY `size(array_intersect(a, b))` under
  * `spark.sql.legacy.sizeOfNull=false` (the default — and
  * [[graft.plans.IntersectCountRewrite]] only fires on that form):
  *   - NULL if either input array is NULL (null-intolerant, like
  *     array_intersect; size(NULL) is NULL in non-legacy mode);
  *   - counts DISTINCT common elements (array_intersect deduplicates);
  *   - a null ELEMENT present in both arrays counts once;
  *   - element equality is exact binary equality — supported element
  *     types are long, int, and string, deliberately excluding
  *     floating-point (NaN/-0.0 set semantics differ from plain
  *     equality; the LSH kernels intersect hash/token arrays, never
  *     doubles).
  */
case class ArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  private def elemType: Option[DataType] = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b => Some(a)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(LongType | IntegerType | StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "array_intersect_count expects two arrays with the same element " +
        s"type among (bigint, int, string), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = IntegerType

  private lazy val kernel: (ArrayData, ArrayData) => Int = elemType.get match {
    case LongType    => IntersectCountKernels.countLong
    case IntegerType => IntersectCountKernels.countInt
    case StringType  => IntersectCountKernels.countString
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = elemType.get match {
      case LongType    => "countLong"
      case IntegerType => "countInt"
      case StringType  => "countString"
    }
    // one static call per row: the loop lives in JIT-compiled kernel code,
    // and the expression composes with the surrounding codegen stage
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCountKernels.$method($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_intersect_count"
}

/** Static kernels for [[ArrayIntersectCount]] (a standalone object, so the
  * generated Java calls `graft.functions.IntersectCountKernels.countX`
  * through the compiler's static forwarders).
  *
  * The long/int kernels use a private open-addressing hash set over a
  * primitive long array (linear probing, power-of-two capacity, load
  * factor <= 0.5) — no boxing, no external collection classes. One set is
  * built from the RIGHT array, then the LEFT array probes it; a second
  * set dedups the left side so each distinct common value counts once.
  * Cost: O(|a| + |b|) with two small allocations per call — versus
  * array_intersect's set build PLUS result-array allocation and copy.
  */
object IntersectCountKernels {

  /** Open-addressed membership set for longs. A sentinel slot value can't
    * mark emptiness (any long is a legal element), so occupancy lives in
    * a parallel bitset-free `used` array — simpler and still one cache
    * line per probe for the sizes at hand (shingle arrays, token sets).
    */
  private final class LongSet(expected: Int) {
    private val cap = {
      var c = 8
      while (c < expected * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val slots = new Array[Long](cap)
    private val used = new Array[Boolean](cap)

    def add(v: Long): Boolean = {           // true if newly inserted
      var i = (java.lang.Long.hashCode(v) * 0x9E3779B9) & mask
      while (used(i)) {
        if (slots(i) == v) return false
        i = (i + 1) & mask
      }
      slots(i) = v; used(i) = true; true
    }

    def contains(v: Long): Boolean = {
      var i = (java.lang.Long.hashCode(v) * 0x9E3779B9) & mask
      while (used(i)) {
        if (slots(i) == v) return true
        i = (i + 1) & mask
      }
      false
    }
  }

  def countLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    val inB = new LongSet(nb)
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true else inB.add(b.getLong(i))
      i += 1
    }
    val counted = new LongSet(na)
    var cnt = 0
    var nullCounted = false
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !nullCounted) { cnt += 1; nullCounted = true }
      } else {
        val v = a.getLong(i)
        if (inB.contains(v) && counted.add(v)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  def countInt(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    val inB = new LongSet(nb)
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true else inB.add(b.getInt(i).toLong)
      i += 1
    }
    val counted = new LongSet(na)
    var cnt = 0
    var nullCounted = false
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !nullCounted) { cnt += 1; nullCounted = true }
      } else {
        val v = a.getInt(i).toLong
        if (inB.contains(v) && counted.add(v)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  def countString(a: ArrayData, b: ArrayData): Int = {
    val nb = b.numElements()
    // UTF8String has value equals/hashCode; HashSet[UTF8String] avoids
    // per-element copies (strings reference the underlying bytes)
    val inB = new java.util.HashSet[UTF8String](math.max(8, nb * 2))
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true else inB.add(b.getUTF8String(i))
      i += 1
    }
    val na = a.numElements()
    val counted = new java.util.HashSet[UTF8String](math.max(8, na))
    var cnt = 0
    var nullCounted = false
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !nullCounted) { cnt += 1; nullCounted = true }
      } else {
        val v = a.getUTF8String(i)
        if (inB.contains(v) && counted.add(v)) cnt += 1
      }
      i += 1
    }
    cnt
  }
}
