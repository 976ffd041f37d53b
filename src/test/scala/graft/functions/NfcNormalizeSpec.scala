package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** All fixtures use explicit \\u escapes — composed and decomposed forms
  * are visually identical, so glyph literals could not distinguish the
  * assertion from an identity pass-through.
  */
class NfcNormalizeSpec extends SparkSpec {

  private val eAcuteNfc = "\u00e9"          // e-acute precomposed
  private val eAcuteNfd = "e\u0301"         // e + combining acute
  private val xDiaNfc = "\u1e8d"            // x-diaeresis precomposed
  private val xDiaNfd = "x\u0308"           // x + combining diaeresis

  private def nfc(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("s")
      .select(call_function("nfc_normalize", col("s")))
      .collect()(0).getString(0)
  }

  test("composes decomposed sequences to their precomposed forms") {
    assert(nfc(eAcuteNfd) == eAcuteNfc)
    assert(nfc(xDiaNfd) == xDiaNfc)
    assert(nfc(s"a$eAcuteNfd b$xDiaNfd") == s"a$eAcuteNfc b$xDiaNfc")
    assert(nfc(eAcuteNfd).length == 1 && eAcuteNfd.length == 2)
  }

  test("ASCII and already-NFC input pass through unchanged; idempotent") {
    assert(nfc("plain ascii 123") == "plain ascii 123")
    assert(nfc(eAcuteNfc) == eAcuteNfc)
    assert(nfc(nfc(eAcuteNfd)) == eAcuteNfc)
  }

  test("null propagates; empty string survives; works from SQL text") {
    import spark.implicits._
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, ""))
      .toDF("id", "s")
      .select(col("id"), call_function("nfc_normalize", col("s")).as("n"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getString(1) == "")
    val sql = spark.sql("SELECT nfc_normalize('o\u0302')").collect()(0)
    assert(sql.getString(0) == "\u00f4")
  }

  test("direct expression eval matches the dataframe (codegen) path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val in = "n\u0303 and e\u0301 mixed"
    val expr = NfcNormalize(Literal(UTF8String.fromString(in),
      org.apache.spark.sql.types.StringType))
    val direct = expr.eval(null).asInstanceOf[UTF8String].toString
    assert(direct == "\u00f1 and \u00e9 mixed")
    assert(direct == nfc(in))
  }
}
