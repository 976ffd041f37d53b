package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {

  test("h60Local (driver mirror) equals the engine h60 expression") {
    import spark.implicits._
    val inputs = Seq("", "a", "plane:0:0", "3:the quick brown", "ünïcode-ø")
    val engine = inputs.toDF("s")
      .select(Hashing.h60(col("s")).as("h")).collect().map(_.getLong(0))
    assert(engine.toSeq == inputs.map(Hashing.h60Local))
  }

  test("h60 is non-negative and < 2^60") {
    import spark.implicits._
    val hs = (0 until 1000).map(i => s"v$i").toDF("s")
      .select(Hashing.h60(col("s")).as("h")).collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0 && h < (1L << 60)))
    assert(hs.distinct.length == hs.length) // no collisions in 1k values
  }

  test("bloom_might_contain: no false negatives, codegen stage intact, " +
      "string and long probes") {
    import spark.implicits._
    val bfS = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (0 until 50).foreach(i => bfS.putString(s"key$i"))
    val bytesS = { val o = new java.io.ByteArrayOutputStream(); bfS.writeTo(o); o.toByteArray }
    // range source (not a local relation) so the plan exercises real
    // whole-stage codegen rather than ConvertToLocalRelation's eval path
    val dfS = spark.range(100)
      .withColumn("s", concat(lit("key"), col("id")))
      .withColumn("hit", call_function("bloom_might_contain", col("s"), lit(bytesS)))
    // every inserted key must hit (no false negatives)
    assert(dfS.filter(col("id") < 50).filter(!col("hit")).count() == 0)
    // the probe must not break whole-stage codegen: the projection that
    // computes `hit` must carry the `*(n)` codegen-stage marker
    val plan = dfS.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("bloom_might_contain") && l.trim.startsWith("*(")),
      s"bloom probe fell out of codegen:\n$plan")
    val bfL = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (0L until 50L).foreach(bfL.putLong)
    val bytesL = { val o = new java.io.ByteArrayOutputStream(); bfL.writeTo(o); o.toByteArray }
    val hitsL = spark.range(100)
      .withColumn("hit", call_function("bloom_might_contain", col("id"), lit(bytesL)))
      .filter(col("id") < 50).filter(!col("hit")).count()
    assert(hitsL == 0)
  }

  test("property: TopKAggregator == sort.take(k) regardless of split/merge order") {
    val gen = for {
      n <- Gen.choose(0, 40)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(-5.0, 5.0), Gen.choose(0L, 20L)))
      cut <- Gen.choose(0, n)
    } yield (xs, cut)
    (0 until 30).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (xs, cut) =>
        val agg = new TopKAggregator(5)
        val (l, r) = xs.splitAt(cut)
        val bufL = l.foldLeft(agg.zero)(agg.reduce)
        val bufR = r.foldLeft(agg.zero)(agg.reduce)
        val merged = agg.finish(agg.merge(bufL, bufR))
        val expected = xs.sortBy { case (s, id) => (-s, id) }.take(5)
        assert(merged.toSeq == expected, s"seed $i")
      }
    }
  }

  test("property: MinKOrderedStringsAggregator == sortBy(keys).take(k).labels " +
      "regardless of split/merge order") {
    val gen = for {
      n <- Gen.choose(0, 40)
      xs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 10L), Gen.choose(0L, 50L)))
      cut <- Gen.choose(0, n)
    } yield (xs.map { case (a, b) => (a, b, s"v$a-$b") }, cut)
    (0 until 30).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (xs, cut) =>
        val agg = new graft.functions.MinKOrderedStringsAggregator(8)
        val (l, r) = xs.splitAt(cut)
        val bufL = l.foldLeft(agg.zero)(agg.reduce)
        val bufR = r.foldLeft(agg.zero)(agg.reduce)
        val merged = agg.finish(agg.merge(bufL, bufR))
        val expected = xs.sortBy { case (a, b, _) => (a, b) }.take(8).map(_._3)
        assert(merged == expected, s"seed $i")
      }
    }
  }
}
