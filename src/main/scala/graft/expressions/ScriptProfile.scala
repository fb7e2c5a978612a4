package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Writing-system profile of a text — the multilingual-curation signal
  * in front of any per-language pipeline: which SCRIPT dominates
  * (Latin, Cyrillic, Han, Arabic, …), how dominant it is, and how many
  * scripts appear at all (mixed-script text is where boilerplate
  * collages, spam keyword stuffing, and mojibake live). Classification
  * is `java.lang.Character.UnicodeScript.of` — the PUBLIC JDK API over
  * the Unicode script property, so the build embeds zero normative
  * tables — with COMMON/INHERITED/UNKNOWN code points excluded from
  * the denominator (punctuation, digits, and spaces belong to every
  * script; Unicode UAX #24 makes the same cut for run detection).
  *
  * Returns a struct: `script` (the dominant script's enum name, "" for
  * scriptless text), `script_ratio` (dominant / classified code
  * points, 0.0 when scriptless), `n_scripts` (distinct real scripts),
  * `n_chars` (classified code points). Ratios are exact binary
  * divisions of small integers replayed as literals by planted
  * oracles. Codegen'd kernel (no UDF); supplementary-plane-safe
  * (code-point iteration, never char). */
object ScriptKernels {

  def scriptProfileKernel(u: UTF8String): InternalRow = {
    val s = u.toString
    val counts = new java.util.HashMap[java.lang.Character.UnicodeScript, Int]()
    var i = 0
    var classified = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val sc = java.lang.Character.UnicodeScript.of(cp)
      if (sc != java.lang.Character.UnicodeScript.COMMON &&
        sc != java.lang.Character.UnicodeScript.INHERITED &&
        sc != java.lang.Character.UnicodeScript.UNKNOWN) {
        counts.merge(sc, 1, Integer.sum)
        classified += 1
      }
      i += java.lang.Character.charCount(cp)
    }
    if (classified == 0)
      return InternalRow(UTF8String.fromString(""), 0.0, 0, 0)
    var best: java.lang.Character.UnicodeScript = null
    var bestN = -1
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // deterministic tie-break: higher count wins, enum name breaks ties
      if (e.getValue > bestN || (e.getValue == bestN &&
        e.getKey.name() < best.name())) {
        best = e.getKey; bestN = e.getValue
      }
    }
    InternalRow(UTF8String.fromString(best.name()),
      bestN.toDouble / classified, counts.size(), classified)
  }

  // referenced from generated code, so the array shape stays in one place
  val schema: StructType = StructType(Seq(
    StructField("script", StringType, nullable = false),
    StructField("script_ratio", DoubleType, nullable = false),
    StructField("n_scripts", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))
}

/** `script_profile(string)` → struct: see [[ScriptKernels]]. */
case class ScriptProfile(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"script_profile requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ScriptKernels.schema
  override def prettyName: String = "script_profile"
  override def nullSafeEval(input: Any): Any =
    ScriptKernels.scriptProfileKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ScriptKernels.scriptProfileKernel($c);")
  override protected def withNewChildInternal(newChild: Expression): ScriptProfile =
    copy(child = newChild)
}

object NativeScript {
  def scriptProfile(text: Column): Column =
    GraftColumnBridge.column(ScriptProfile(GraftColumnBridge.expression(text)))
}
