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

  test("gapFillHourly: silent hours filled forward, NULL observations carried") {
    import spark.implicits._
    val df = Seq(
      ("A", ts("2024-01-01 10:10:00"), Option(1.0), 1L),
      ("A", ts("2024-01-01 10:40:00"), Option(2.0), 2L),  // same hour: later wins
      ("A", ts("2024-01-01 13:05:00"), Option.empty[Double], 3L), // NULL observed
      ("A", ts("2024-01-01 14:30:00"), Option(4.0), 4L),
      ("B", ts("2024-01-01 00:00:00"), Option(9.0), 5L))
      .toDF("k", "t", "v", "id")
    val out = Temporal.gapFillHourly(df, "k", "t", "v", "id")
      .collect().map(r => (r.getString(0),
          r.getAs[java.time.LocalDateTime](1).toString) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toMap
    assert(out(("A", "2024-01-01T10:00")) == ((Some(2.0), true)))
    assert(out(("A", "2024-01-01T11:00")) == ((Some(2.0), false))) // filled
    assert(out(("A", "2024-01-01T12:00")) == ((Some(2.0), false)))
    // hour 13's observation is genuinely NULL: carried, NOT skipped back to 2.0
    assert(out(("A", "2024-01-01T13:00")) == ((None, true)))
    assert(out(("A", "2024-01-01T14:00")) == ((Some(4.0), true)))
    assert(out(("B", "2024-01-01T00:00")) == ((Some(9.0), true)))
    assert(out.count(_._1._1 == "A") == 5) // spine covers 10:00..14:00
  }
}
