package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

import graft.functions.ArrayIntersectCount

/** Optimizer rule: rewrite `size(array_intersect(a, b))` into the native
  * counting expression [[ArrayIntersectCount]].
  *
  * The composed form is the Jaccard confirm kernel of the entire
  * MinHash/LSH family — evaluated once per candidate pair, it builds a
  * deduplicated intersection ARRAY (hash-set insert + element copy +
  * result allocation) only to take its size. The counting expression does
  * the same set probe with zero result materialization; the rewrite makes
  * the natural user-written form get the kernel automatically, following
  * [[DotProductRewrite]]'s template.
  *
  * Fires only where semantics are bit-identical to the composed form:
  *   - `Size` in non-legacy mode (`legacySizeOfNull = false`, the
  *     default): legacy mode returns -1 for NULL input while
  *     array_intersect_count (like array_intersect) returns NULL;
  *   - both inputs are arrays of the SAME element type among
  *     long / int / string. Floating-point element types are left to the
  *     composed form on purpose: SQL set semantics treat NaN = NaN and
  *     0.0 = -0.0, which plain binary equality does not — the LSH
  *     kernels intersect hash/token arrays, never doubles.
  * Distinctness and null-element handling match by construction
  * (array_intersect deduplicates and keeps one shared null; the kernel
  * counts distinct common values plus one if both sides hold a null).
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  /** Element types of the two sides when both are arrays of a supported,
    * MATCHING element type (containsNull may differ — array_intersect
    * ignores it and so does the kernel).
    */
  private def supportedPair(ai: ArrayIntersect): Boolean =
    (ai.left.dataType, ai.right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if a == b => a match {
        case LongType | IntegerType | StringType => true
        case _ => false
      }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai: ArrayIntersect, legacy) if !legacy && supportedPair(ai) =>
        ArrayIntersectCount(ai.left, ai.right)
    }
}
