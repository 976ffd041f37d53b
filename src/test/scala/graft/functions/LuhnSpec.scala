package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LuhnSpec extends SparkSpec {

  private def check(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      inputs: String*): Seq[Any] = {
    import spark.implicits._
    inputs.toDF("s").select(fn(col("s"))).collect().map(_.get(0)).toSeq
  }

  test("luhnValid accepts the classic reference numbers, rejects edits") {
    // 79927398713 is THE textbook Luhn example; 4539578763621486 a
    // standard 16-digit valid fixture
    assert(check(TextFns.luhnValid, "79927398713", "4539578763621486")
      == Seq(true, true))
    // any single-digit edit of the check digit must flip validity
    assert(check(TextFns.luhnValid, "79927398714", "4539578763621487",
      "79927398703") == Seq(false, false, false))
  }

  test("luhnCheckDigit reconstructs the digit that validates the base") {
    // base of the textbook number (check digit 3 stripped)
    assert(check(c => TextFns.luhnCheckDigit(c), "7992739871") == Seq(3L))
    // appending the computed digit always yields a valid number
    import spark.implicits._
    val bases = Seq("7992739871", "453957876362148", "1", "000", "9999")
    val ok = bases.toDF("b")
      .select(TextFns.luhnValid(
        concat(col("b"), TextFns.luhnCheckDigit(col("b")).cast("string"))))
      .collect().map(_.getBoolean(0)).toSeq
    assert(ok.forall(identity))
  }

  test("driver cross-check: column Luhn sum equals a scala reference") {
    def ref(s: String): Long = s.reverse.zipWithIndex.map { case (ch, i) =>
      val d = ch - '0'
      if (i % 2 == 1) { val x = 2 * d; if (x > 9) x - 9 else x } else d
    }.sum
    val inputs = Seq("79927398713", "1234567890123456", "18", "5")
    assert(check(TextFns.luhnSum, inputs: _*)
      == inputs.map(ref(_)))
  }
}
