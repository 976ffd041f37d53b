package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.similarity(a, b)

  test("kernel matches DuckDB jaro_winkler_similarity BIT-EXACT on a " +
      "10k-pair generated fixture (small/mid/full alphabets + mutations)") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/jaro_winkler_fixture.csv"))
    try {
      val lines = src.getLines().drop(1).toSeq
      assert(lines.size == 10000)
      var checked = 0
      lines.foreach { line =>
        // fields never contain commas/quotes (generator alphabet); the
        // empty-string cases still split into 3 parts via limit = -1
        val parts = line.split(",", -1)
        assert(parts.length == 3, s"bad fixture line: $line")
        val expectBits = parts(2).toLong
        val gotBits = java.lang.Double.doubleToLongBits(jw(parts(0), parts(1)))
        assert(gotBits == expectBits,
          s"jw('${parts(0)}','${parts(1)}'): got ${java.lang.Double.longBitsToDouble(gotBits)} " +
            s"want ${java.lang.Double.longBitsToDouble(expectBits)}")
        checked += 1
      }
      assert(checked == 10000)
    } finally src.close()
  }

  test("kernel pins the published reference values and edge cases") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    // below the 0.7 boost threshold the prefix must NOT boost
    assert(jw("aXXXXX", "aYYYYY") == 0.4444444444444444)
    // DuckDB scores empty-vs-anything (and empty-vs-empty) as 0
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    // prefix boost caps at 4 shared characters
    assert(jw("abcdxx", "abcdyy") == 0.8666666666666666)
  }

  test("expression evaluates under codegen on a DataFrame, null-safe") {
    import spark.implicits._
    val df = Seq(
      (Option("martha"), Option("marhta")),
      (Option("crate"), Option("trace")),
      (None: Option[String], Option("x")),
      (Option("x"), None: Option[String])
    ).toDF("a", "b")
    val out = df.select(
        call_function("jaro_winkler", lit("martha"), lit("marhta")).as("lit"),
        call_function("jaro_winkler", col("a"), col("b")).as("jw"))
      .collect()
    assert(out.forall(_.getDouble(0) == 0.9611111111111111))
    assert(out(0).getDouble(1) == 0.9611111111111111)
    assert(!out(1).isNullAt(1))
    assert(out(2).isNullAt(1) && out(3).isNullAt(1))
  }

  test("SQL registration via GraftExtensions") {
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS s").collect()(0).getDouble(0)
    assert(r == 0.9611111111111111)
  }
}
