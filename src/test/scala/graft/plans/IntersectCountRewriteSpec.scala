package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ArrayIntersectCount

class IntersectCountRewriteSpec extends SparkSpec {

  private def hasNative(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .exists(_.exists(_.isInstanceOf[ArrayIntersectCount]))

  test("size(array_intersect) over long arrays rewrites to the native " +
      "count and agrees with the composed form, both argument orders") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 2L), Seq(2L, 3L, 4L, 3L)),   // dup elements: distinct count = 2
      (2L, Seq(5L, 6L), Seq(7L, 8L)),                   // disjoint -> 0
      (3L, Seq.empty[Long], Seq(1L, 2L))                // empty -> 0
    ).toDF("id", "a", "b").repartition(1)
    val q = df.select(col("id"),
      size(array_intersect(col("a"), col("b"))).as("n"),
      size(array_intersect(col("b"), col("a"))).as("m"))
    assert(hasNative(q), s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
    val out = q.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out == Map(1L -> ((2, 2)), 2L -> ((0, 0)), 3L -> ((0, 0))))
  }

  test("null semantics survive the rewrite: NULL array -> NULL, shared " +
      "null element counts once, string arrays dedup") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[String]](Some("x"), None, Some("y"), Some("x")),
        Seq[Option[String]](None, Some("x"), None)),
      (2L, Seq[Option[String]](Some("x")), null)
    ).toDF("id", "a", "b").repartition(1)
    val q = df.select(col("id"),
      size(array_intersect(col("a"), col("b"))).as("n"))
    assert(hasNative(q))
    val out = q.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    // row 1: common values {"x", null} -> 2 (null once, "x" deduped)
    assert(out == Map(1L -> Some(2), 2L -> None))
  }

  test("negative cases stay untouched: double arrays (NaN set semantics) " +
      "and bare array_intersect without size") {
    import spark.implicits._
    val dbl = Seq((Seq(1.0, Double.NaN), Seq(Double.NaN, 2.0)))
      .toDF("a", "b").repartition(1)
    val qd = dbl.select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(!hasNative(qd), "double arrays must not rewrite")
    // and SQL set semantics hold: NaN matches NaN via the builtin
    assert(qd.collect()(0).getInt(0) == 1)
    val bare = dbl.select(array_intersect(col("a"), col("b")).as("i"))
    assert(!hasNative(bare), "array_intersect without size must not rewrite")
  }

  test("the SQL surface array_intersect_count works and matches") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(3L, 1L, 9L))).toDF("a", "b")
    df.createOrReplaceTempView("ic_t")
    val n = spark.sql("SELECT array_intersect_count(a, b) AS n FROM ic_t")
      .collect()(0).getInt(0)
    assert(n == 2)
  }

  test("whole-stage codegen: the rewritten expression produces no " +
      "codegen fallback on a realistic confirm-kernel shape") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (1L to 200L).map { i =>
      (i, (0 until 40).map(_ => rnd.nextInt(500).toLong))
    }.toDF("id", "shs")
    val pairs = docs.as("a").join(docs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        size(array_intersect(col("a.shs"), col("b.shs"))).as("inter"))
    assert(hasNative(pairs))
    // independent oracle: the same counts computed driver-side in plain
    // Scala (a query-side "reference" would itself be rewritten)
    val raw = docs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = pairs.filter(col("id_a") <= 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    native.foreach { case ((ia, ib), n) =>
      val expected = (raw(ia).toSet intersect raw(ib).toSet).size
      assert(n == expected, s"pair ($ia,$ib): native $n != scala $expected")
    }
    assert(native.nonEmpty)
  }
}
