package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Spark has no builtin for canonical composition (the reference has
  * no analog either — this is a training-data-pipeline extension: web
  * text mixes composed and decomposed accents, and every downstream
  * exact/dedup hash treats "é" (U+00E9) and "é" as different
  * documents unless the corpus is normalized first).
  *
  * Codegen is a single static call (java.text.Normalizer is the JDK's
  * ICU-derived implementation), so the expression stays inside
  * whole-stage codegen instead of fencing the projection the way a
  * CodegenFallback would. ASCII fast path: NFC is the identity on
  * pure-ASCII strings, so we skip the Normalizer round-trip (and its
  * String materialization) entirely — at 100 TB most web text is
  * ASCII-dominant and the hot loop never allocates.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  /** NFC-normalize a UTF8String; identity (no copy) for ASCII input. */
  def normalize(s: UTF8String): UTF8String = {
    if (isAscii(s)) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def column(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
