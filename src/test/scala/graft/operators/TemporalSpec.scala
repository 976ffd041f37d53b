package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches the latest right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq( // (key, ts, px)
      ("A", "2024-01-01 10:00:00", 100.0),
      ("A", "2024-01-01 10:05:00", 101.0),
      ("B", "2024-01-01 10:02:00", 50.0)
    ).map { case (k, t, p) => (k, ts(t), p) }.toDF("sym", "qts", "px")
    val trades = Seq( // (key, ts, qty)
      ("A", "2024-01-01 10:00:00", 1L), // equal ts → matched (>= semantics)
      ("A", "2024-01-01 10:04:59", 2L), // before second quote
      ("A", "2024-01-01 10:06:00", 3L), // after second quote
      ("B", "2024-01-01 10:01:00", 4L), // before any B quote → null
      ("C", "2024-01-01 10:00:00", 5L)  // key with no rights → null
    ).map { case (k, t, q) => (k, ts(t), q) }.toDF("sym", "tts", "qty")
    val out = Temporal.asofJoin(trades, quotes, "sym", "tts", "qts", Seq("px"))
      .collect().map(r => r.getAs[Long]("qty") ->
        Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double])).toMap
    assert(out == Map(1L -> Some(100.0), 2L -> Some(100.0), 3L -> Some(101.0),
      4L -> None, 5L -> None))
  }

  test("sessionize splits on gaps > the threshold, session ends gap after last") {
    import spark.implicits._
    val ev = Seq(
      ("u1", "2024-01-01 10:00:00", 1.0),
      ("u1", "2024-01-01 10:20:00", 2.0), // 20 min gap → same session
      ("u1", "2024-01-01 11:00:00", 3.0), // 40 min gap → new session
      ("u2", "2024-01-01 10:00:00", 4.0)
    ).map { case (k, t, v) => (k, ts(t), v) }.toDF("user_id", "ts", "value")
    val out = Temporal.sessionize(ev, "user_id", "ts", "30 minutes", col("value"))
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(first.getAs[Timestamp]("session_end") == ts("2024-01-01 10:50:00"))
    assert(first.getAs[Long]("n_events") == 2L)
    assert(first.getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1L)
  }
}
