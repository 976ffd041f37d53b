package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ArrayDotProduct

class DotProductRewriteSpec extends SparkSpec {

  private def declDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def hasNativeDot(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .exists(_.exists(_.isInstanceOf[ArrayDotProduct]))

  test("declarative aggregate(zip_with(*)) dot products are rewritten to " +
      "the native array_dot and compute the same value") {
    import spark.implicits._
    // repartition keeps the literal rows from constant-folding away
    // before the user-provided optimizer batch runs
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
      .toDF("a", "b").repartition(1)
    val q = df.select(declDot(col("a"), col("b")).as("dot"))
    assert(hasNativeDot(q), s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect()(0).getDouble(0) == 32.0)
    // swapped lambda variable order still matches
    val q2 = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => y * x), lit(0.0),
        (acc, v) => v + acc).as("dot"))
    assert(hasNativeDot(q2))
    assert(q2.collect()(0).getDouble(0) == 32.0)
  }

  test("rewrite preserves higher-order null semantics: length mismatch " +
      "and null elements give NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (2L, Seq[Option[Double]](Some(1.0)), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (3L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(3.0), Some(4.0)))
    ).toDF("id", "a", "b").repartition(1)
    val q = df.select(col("id"), declDot(col("a"), col("b")).as("dot"))
      .orderBy("id")
    assert(hasNativeDot(q))
    val rows = q.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L) == Some(11.0))
    assert(rows(2L) == None, "length mismatch must stay NULL")
    assert(rows(3L) == None, "null element must stay NULL")
  }

  test("non-dot kernels are left untouched") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .repartition(1)
    val sumKernel = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y), lit(0.0),
        (acc, v) => acc + v))
    assert(!hasNativeDot(sumKernel))
    val scaledZero = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(1.0),
        (acc, v) => acc + v))
    assert(!hasNativeDot(scaledZero))
    val squaredMerge = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, v) => acc + v * v))
    assert(!hasNativeDot(squaredMerge))
  }
}
