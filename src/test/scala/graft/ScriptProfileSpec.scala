package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import org.apache.spark.unsafe.types.UTF8String

/** Writing-system profile: dominance, the COMMON/INHERITED exclusion,
  * supplementary-plane code points, tie-breaking, and the
  * encoding-damage counters. */
class ScriptProfileSpec extends SparkSpec {
  import spark.implicits._

  private def p(s: String): (String, Double, Int, Int) = {
    val r = graft.expressions.ScriptKernels
      .scriptProfileKernel(UTF8String.fromString(s))
    (r.getUTF8String(0).toString, r.getDouble(1), r.getInt(2), r.getInt(3))
  }

  test("single-script texts: ratio 1.0, punctuation/digits excluded") {
    assert(p("Hello, world 42!") == (("LATIN", 1.0, 1, 10)))
    assert(p("привет мир") == (("CYRILLIC", 1.0, 1, 9)))
    assert(p("漢字文本") == (("HAN", 1.0, 1, 4)))
    assert(p("مرحبا") == (("ARABIC", 1.0, 1, 5)))
  }

  test("mixed scripts: dominant wins, ratio exact, all counted") {
    val (script, ratio, nScripts, nChars) = p("word слово word")
    assert(script == "LATIN" && nScripts == 2 && nChars == 13)
    assert(ratio == 8.0 / 13)
  }

  test("scriptless and empty text: the empty profile") {
    assert(p("12345 !!! ...") == (("", 0.0, 0, 0)))
    assert(p("") == (("", 0.0, 0, 0)))
  }

  test("supplementary-plane code points count once (code-point iteration)") {
    // GOTHIC LETTER AHSA U+10330 — two chars in UTF-16, one code point
    val gothic = new String(Character.toChars(0x10330)) * 3
    assert(p(gothic) == (("GOTHIC", 1.0, 1, 3)))
  }

  test("equal counts tie-break deterministically by script name") {
    val (script, ratio, nScripts, _) = p("ab яж")
    assert(nScripts == 2 && ratio == 0.5)
    assert(script == "CYRILLIC") // CYRILLIC < LATIN lexicographically
  }

  test("column form agrees with the kernel and stays codegen (no UDF)") {
    val df = Seq("Hello мир 123").toDF("t")
      .select(TF.scriptProfile($"t").as("p"))
      .select($"p.script", $"p.script_ratio", $"p.n_scripts", $"p.n_chars")
    val r = df.collect()(0)
    assert(r.getString(0) == "LATIN" && r.getInt(2) == 2 && r.getInt(3) == 8)
    assert(r.getDouble(1) == 5.0 / 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("encodingQuality: replacement chars, C0 controls, the clean verdict") {
    def q(s: String): (Int, Int, Boolean) = {
      val r = Seq(s).toDF("t").select(TF.encodingQuality($"t").as("q"))
        .select($"q.n_replacement", $"q.n_control", $"q.clean").collect()(0)
      (r.getInt(0), r.getInt(1), r.getBoolean(2))
    }
    assert(q("perfectly clean text.") == ((0, 0, true)))
    assert(q("broken � twice �") == ((2, 0, false)))
    assert(q("bell" + 7.toChar + " and nul" + 0.toChar) == ((0, 2, false)))
    // tab/newline/CR are TEXT, not damage
    assert(q("a\tb\nc\rd") == ((0, 0, true)))
  }
}
