package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions.{column => _, _}

import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.kernel.{QualityScore, TextKernel}

/**
 * Native Catalyst expressions for the reference's byte-level text operators
 * (sanitize / printable-ratio / quality), so they are usable from both the
 * Column API and SQL, and stay inside whole-stage codegen (each doGenCode
 * emits a static call — no Scala-UDF serialization, no InternalRow boxing).
 *
 * Reference: sanitize src/uploader.py:159-172; printable ratio
 * src/processor.py:700-701; quality src/ocr_watcher.py:75-89.
 */
object TextExprs {
  /** Static entry points for codegen (stable JVM names). */
  def sanitizeUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(TextKernel.sanitize(s.toString))
  def printableRatioStr(s: UTF8String): Double = {
    val t = s.toString
    if (t.isEmpty) 0.0 else TextKernel.printableRatio(t)
  }
  def qualityStr(s: UTF8String): Double = QualityScore.computeQuality(s.toString)
  def langIdNgram(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.kernel.LangId.detect(s.toString))
  def nfcUTF8(s: UTF8String): UTF8String = {
    val t = s.toString
    // fast path: already-normalized (all ASCII in particular) returns the
    // input UTF8String untouched — no allocation on the common case
    if (java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
  }
  def nfkcUTF8(s: UTF8String): UTF8String = {
    val t = s.toString
    if (java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFKC))
  }

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /**
   * Single-pass mojibake repair (the core heuristic of ftfy's
   * fix_encoding): a string whose characters all round-trip through
   * CP1252 *and* whose CP1252 byte image is strict-valid UTF-8 with at
   * least one multi-byte sequence was almost certainly UTF-8 bytes
   * mis-decoded as CP1252 ("thÃ©" -> "thé", "â€™" -> "’") — re-decode it.
   * Anything else (pure ASCII, genuine Latin-1 text like "café" whose
   * byte image is NOT valid UTF-8, emoji outside CP1252) returns
   * unchanged, which is the safety property that makes the fix
   * idempotent on clean text. Strict REPORT coding on both legs; any
   * coding error means "not mojibake" and returns the input.
   */
  def fixMojibakeStr(t: String): String = {
    var hasHigh = false
    var i = 0
    while (i < t.length && !hasHigh) {
      if (t.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return t // ASCII fast path: nothing to repair
    try {
      val enc = Cp1252.newEncoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val bytes = enc.encode(java.nio.CharBuffer.wrap(t))
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val fixed = dec.decode(bytes).toString
      // fixed.length < t.length iff a multi-byte UTF-8 sequence collapsed;
      // equal length means the bytes were all single-byte ASCII-range (no
      // repair evidence) — impossible here since hasHigh, but kept cheap
      if (fixed.length < t.length) fixed else t
    } catch {
      case _: java.nio.charset.CharacterCodingException => t
    }
  }

  def fixMojibakeUTF8(s: UTF8String): UTF8String = {
    val t = s.toString
    val fixed = fixMojibakeStr(t)
    if (fixed eq t) s else UTF8String.fromString(fixed)
  }
}

abstract class StringKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType}")
  protected def staticCall: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$staticCall($c)")
}

/** sanitize_text(s): truncate->NUL-strip->keep {0x20..0x7E, \t\n\r, 0xA0..0xFFFF}. */
case class SanitizeText(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = TextExprs.sanitizeUTF8(v.asInstanceOf[UTF8String])
  override protected def staticCall = "graft.functions.TextExprs.sanitizeUTF8"
  override protected def withNewChildInternal(c: Expression): SanitizeText = copy(child = c)
  override def prettyName: String = "sanitize_text"
}

/** printable_ratio(s): fraction of code points passing Python isprintable or \n\r\t. */
case class PrintableRatio(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = TextExprs.printableRatioStr(v.asInstanceOf[UTF8String])
  override protected def staticCall = "graft.functions.TextExprs.printableRatioStr"
  override protected def withNewChildInternal(c: Expression): PrintableRatio = copy(child = c)
  override def prettyName: String = "printable_ratio"
}

/** text_quality(s): wordlist hit-ratio (O4). */
case class TextQuality(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = TextExprs.qualityStr(v.asInstanceOf[UTF8String])
  override protected def staticCall = "graft.functions.TextExprs.qualityStr"
  override protected def withNewChildInternal(c: Expression): TextQuality = copy(child = c)
  override def prettyName: String = "text_quality"
}

/** lang_id_ngram(s): Cavnar–Trenkle trigram-profile language id ("und" when
  * too short to call). */
case class LangIdNgram(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = TextExprs.langIdNgram(v.asInstanceOf[UTF8String])
  override protected def staticCall = "graft.functions.TextExprs.langIdNgram"
  override protected def withNewChildInternal(c: Expression): LangIdNgram = copy(child = c)
  override def prettyName: String = "lang_id_ngram"
}

/** nfc_normalize(s): Unicode NFC (UAX #15) — canonical composition; the
  * standard first step of webtext cleanup (two byte-spellings of "é"
  * must dedup/fingerprint/tokenize identically). Fast no-alloc path for
  * already-normalized (e.g. pure-ASCII) input. */
case class NfcNormalize(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = TextExprs.nfcUTF8(v.asInstanceOf[UTF8String])
  override protected def staticCall = "graft.functions.TextExprs.nfcUTF8"
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/** nfkc_normalize(s): Unicode NFKC — compatibility composition (also
  * folds ligatures, fullwidth forms, superscripts). */
case class NfkcNormalize(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = TextExprs.nfkcUTF8(v.asInstanceOf[UTF8String])
  override protected def staticCall = "graft.functions.TextExprs.nfkcUTF8"
  override protected def withNewChildInternal(c: Expression): NfkcNormalize = copy(child = c)
  override def prettyName: String = "nfkc_normalize"
}

/** fix_mojibake(s): single-pass ftfy-style repair of UTF-8 bytes
  * mis-decoded as CP1252 ("thÃ©" -> "thé"); returns the input unchanged
  * unless the CP1252 byte image is strict-valid multi-byte UTF-8. */
case class FixMojibake(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = TextExprs.fixMojibakeUTF8(v.asInstanceOf[UTF8String])
  override protected def staticCall = "graft.functions.TextExprs.fixMojibakeUTF8"
  override protected def withNewChildInternal(c: Expression): FixMojibake = copy(child = c)
  override def prettyName: String = "fix_mojibake"
}

object TextFunctions {
  def sanitize_text(c: Column): Column = ColumnBridge.column(SanitizeText(ColumnBridge.expression(c)))
  def printable_ratio(c: Column): Column = ColumnBridge.column(PrintableRatio(ColumnBridge.expression(c)))
  def text_quality(c: Column): Column = ColumnBridge.column(TextQuality(ColumnBridge.expression(c)))
  def lang_id_ngram(c: Column): Column = ColumnBridge.column(LangIdNgram(ColumnBridge.expression(c)))
  def nfc_normalize(c: Column): Column = ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  def nfkc_normalize(c: Column): Column = ColumnBridge.column(NfkcNormalize(ColumnBridge.expression(c)))
  def fix_mojibake(c: Column): Column = ColumnBridge.column(FixMojibake(ColumnBridge.expression(c)))

  /** SQL registration: SELECT sanitize_text(text) ... */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("sanitize_text", es => SanitizeText(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("printable_ratio", es => PrintableRatio(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("text_quality", es => TextQuality(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("lang_id_ngram", es => LangIdNgram(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize", es => NfcNormalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("nfkc_normalize", es => NfkcNormalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("fix_mojibake", es => FixMojibake(es.head), "scala_udf")
  }
}
