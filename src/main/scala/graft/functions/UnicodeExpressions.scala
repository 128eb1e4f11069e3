package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a Catalyst expression — the
  * canonical-composition pass every text-dedup pipeline needs before
  * hashing (a composed "é" and its decomposed "e"+U+0301 are the SAME
  * text but different bytes: without normalization they fingerprint,
  * shingle, and MinHash differently, silently splitting duplicate
  * clusters). Spark has no builtin; a Scala UDF would box and block
  * codegen. This stays inside the generated code via a static helper
  * call (the normalization itself is `java.text.Normalizer`, the
  * JDK's implementation of UAX #15 — the same standard DuckDB's
  * `nfc_normalize` implements, which is what lets the oracle gate it
  * cross-engine).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by interpreted eval and codegen. ASCII fast
    * path: NFC is the identity on ASCII (the overwhelming bulk of a
    * web corpus), and `Normalizer.isNormalized` on a pure-ASCII
    * string is a linear scan with no allocation — the String
    * round-trip is only paid when normalization can actually change
    * something.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
