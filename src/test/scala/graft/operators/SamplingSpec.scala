package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def ids = {
    import spark.implicits._
    (0L until 10000L).toDF("id")
  }

  test("hashSplit: fractions land near targets and assignment is a pure " +
      "function of (salt, id) — identical across partitionings") {
    val split = Sampling.hashSplit(ids, "id", "exp1",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 9000L) < 200)
    assert(math.abs(counts("val") - 500L) < 100)
    assert(math.abs(counts("test") - 500L) < 100)
    // repartitioned input → bit-identical assignment
    val a = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(ids.repartition(7), "id", "exp1",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("hashSplit: a different salt reshuffles assignments; fractions " +
      "must sum to 1") {
    val a = Sampling.hashSplit(ids, "id", "exp1", Seq("x" -> 0.5, "y" -> 0.5))
    val b = Sampling.hashSplit(ids, "id", "exp2", Seq("x" -> 0.5, "y" -> 0.5))
    val moved = a.withColumnRenamed("split", "sa")
      .join(b.withColumnRenamed("split", "sb"), "id")
      .filter(col("sa") =!= col("sb")).count()
    assert(moved > 2000) // ~half move between independent 50/50 splits
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", "s", Seq("x" -> 0.5, "y" -> 0.4))
    }
  }

  test("hashSample: deterministic subset of the requested size, stable " +
      "across calls, and nested (10% within 20%)") {
    val s10 = Sampling.hashSample(ids, "id", "s", 0.10)
    val s20 = Sampling.hashSample(ids, "id", "s", 0.20)
    val n10 = s10.count()
    assert(math.abs(n10 - 1000L) < 150)
    assert(Sampling.hashSample(ids, "id", "s", 0.10).count() == n10)
    // bucket < 1000 implies bucket < 2000: the 10% sample nests in the 20%
    assert(s10.join(s20, Seq("id"), "left_anti").count() == 0)
  }
}
