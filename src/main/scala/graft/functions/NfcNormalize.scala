package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(s)` — Unicode NFC (canonical composition) as a native
  * codegen'd expression. Spark ships no Unicode-normalization function at
  * all, yet it is the FIRST transform of every text-cleaning pipeline: a
  * corpus scraped from the web mixes precomposed ("é" U+00E9) and
  * decomposed ("e" + U+0301) spellings of the same grapheme, which breaks
  * exact dedup (different fingerprints for identical text), tokenizer
  * vocabularies (two entries for one word), and string equality joins.
  * Normalizing to NFC before fingerprinting/tokenizing collapses them.
  *
  * Semantics: `java.text.Normalizer.normalize(s, NFC)` — the JDK's
  * implementation of Unicode Standard Annex #15 canonical composition,
  * the same normal form as DuckDB's `nfc_normalize` (the oracle engine);
  * canonical equivalence is engine-independent by the Unicode standard's
  * idempotence/uniqueness guarantees, so outputs agree byte-for-byte.
  * ASCII input is returned unchanged via the quick-check fast path
  * (Normalizer.isNormalized is O(n) with no allocation), which makes the
  * common case (already-NFC web text) a cheap scan.
  *
  * A Scala UDF would box every row and fall out of whole-stage codegen;
  * this expression stays inside the generated loop (one static call on
  * the UTF8String), null-propagating like any unary string function.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${other.sql}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeKernel.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.NfcNormalizeKernel.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

/** Static kernel for [[NfcNormalize]] (standalone object → static
  * forwarder for the generated Java).
  */
object NfcNormalizeKernel {

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
