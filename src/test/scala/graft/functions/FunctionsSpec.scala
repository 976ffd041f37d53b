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
}
