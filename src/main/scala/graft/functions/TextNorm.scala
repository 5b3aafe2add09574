package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for content-identity dedup. Visually
  * identical strings differ bytewise in three common ways: combining
  * characters vs precomposed code points (é vs é), case, and
  * whitespace runs. [[CanonicalText]] folds all three — NFC normalize,
  * then ROOT-locale lowercase, then trim + collapse `\s+` runs to one
  * space — so the 64-bit content fingerprint downstream sees one
  * canonical byte string per logical text. Spark ships no NFC builtin;
  * this is a codegen'd unary kernel over the JDK's `java.text.Normalizer`
  * (one virtual call per row, scan-stage, whole-stage-codegen friendly).
  *
  * Order matters and is part of the contract: NFC FIRST (lowercasing a
  * decomposed sequence can interact with combining marks), then case
  * fold, then whitespace — COLLAPSE runs first, trim the single edge
  * spaces last. The whitespace class is RE2's `\s` = [\t\n\f\r ]
  * written out explicitly (Java's `\s` adds \x0B and String.trim
  * strips every char ≤ U+0020 — both silently diverge from DuckDB),
  * and the final trim only ever sees single ' ' edges, which DuckDB's
  * space-only trim() matches exactly. The oracle replays:
  * `trim(regexp_replace(lower(nfc_normalize(s)), '\s+', ' ', 'g'))`.
  */
object TextNorm {

  private val WsRun = java.util.regex.Pattern.compile("[ \t\n\f\r]+")

  case class CanonicalText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override protected def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])

    def compute(s: UTF8String): UTF8String = {
      val nfc = java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFC)
      val lower = nfc.toLowerCase(java.util.Locale.ROOT)
      val collapsed = WsRun.matcher(lower).replaceAll(" ")
      UTF8String.fromString(
        collapsed.stripPrefix(" ").stripSuffix(" "))
    }

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("canonKernel", this)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }

    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  def canonicalText(text: Column): Column =
    ColumnBridge.column(CanonicalText(ColumnBridge.expression(text)))
}
