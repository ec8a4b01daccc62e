package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — step 0 of a text-curation pipeline: the same visible
  * string has many byte encodings (composed é vs e+combining-acute),
  * and every downstream identity — exact-dedup md5, shingle hashes,
  * BPE merges, boilerplate line keys — silently fractures across them
  * unless the corpus is normalized at ingest.
  *
  * Spark has no built-in for this, and a Scala UDF would break the
  * engine-wide zero-UDF contract (ser/de per row, no codegen). The
  * expression stays inside WholeStageCodegen: generated code is one
  * static call, with a fast path returning the INPUT UTF8String
  * untouched when it is already normalized (the overwhelming case for
  * real corpora — no String materialization, no re-encode).
  *
  * The normalization form is a plan-time constructor parameter, not a
  * per-row argument: a mixed-form normalize has no meaningful
  * semantics and forms are engine-portable names (DuckDB
  * nfc_normalize, ICU transliterators), which keeps the oracle twin
  * exact. */
case class NormalizeUnicode(child: Expression, formName: String) extends UnaryExpression {
  override def prettyName: String = "graft_normalize_unicode"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!UnicodeNorm.Forms.contains(formName))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNorm.Forms.mkString("/")}, got $formName")
    else child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], Normalizer.Form.valueOf(formName))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.UnicodeNorm.normalize(" +
        s"$c, java.text.Normalizer.Form.$formName);")

  override protected def withNewChildInternal(c: Expression): NormalizeUnicode = copy(child = c)
}

object UnicodeNorm {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Already-normalized input returns the SAME UTF8String (no String
    * round-trip); only denormalized rows pay the re-encode. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
