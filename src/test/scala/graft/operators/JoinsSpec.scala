package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {

  test("rangeJoin == naive non-equi join, including boundary and null " +
      "semantics, at several bucket widths") {
    import spark.implicits._
    val fact = Seq(
      (1L, 0.0), (2L, 9.999), (3L, 10.0),   // 10.0 = lo of the next band
      (4L, 25.0), (5L, 39.999), (6L, 40.0), // 40.0 = hi → excluded
      (7L, -5.0), (8L, 120.0)               // outside every band
    ).toDF("id", "v")
      .unionByName(Seq((9L, Option.empty[Double])).toDF("id", "v"))
    val dims = Seq(
      ("lo", 0.0, 10.0), ("midwide", 10.0, 40.0), ("hi", 50.0, 100.0)
    ).toDF("band", "lo", "hi")
    val naive = fact.join(dims, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (w <- Seq(1.0, 7.0, 10.0, 1000.0)) {
      val got = Joins.rangeJoin(fact, "v", dims, "lo", "hi", w)
        .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == naive, s"bucketWidth=$w")
    }
    assert(naive == Set((1L, "lo"), (2L, "lo"), (3L, "midwide"),
      (4L, "midwide"), (5L, "midwide")))
  }

  test("rangeJoin plans as an equi-join on the bucket, never a nested loop") {
    import spark.implicits._
    val fact = spark.range(1000).withColumn("v", col("id").cast("double"))
    val dims = Seq(("a", 0.0, 300.0), ("b", 300.0, 900.0)).toDF("band", "lo", "hi")
    val plan = Joins.rangeJoin(fact, "v", dims, "lo", "hi", 100.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan)
    // and the naive spelling really does nested-loop (the thing we avoid)
    val naivePlan = fact.join(dims, col("v") >= col("lo") && col("v") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoop"), naivePlan)
  }
}
