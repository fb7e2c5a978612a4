package graft

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.MojibakeKernels
import graft.functions.TextFunctions

/** The mojibake repair kernel: exact inversion of wrong cp1252
  * decodes (single and double, undefined-position stress), healthy
  * passthrough, and the codegen'd column path. */
class MojibakeSpec extends SparkSpec {

  private val cp1252 = Charset.forName("windows-1252")

  private def damage(s: String): String = new String(s.getBytes(UTF_8), cp1252)

  private def fix(s: String): String =
    MojibakeKernels.fixMojibakeKernel(UTF8String.fromString(s)).toString

  test("single wrong decode inverts exactly") {
    val healthy = "it’s café — naïve™ for €5 « guillemets »"
    val broken = damage(healthy)
    assert(broken != healthy)
    assert(broken.contains("â€™")) // the canonical smart-quote smell
    assert(fix(broken) == healthy)
  }

  test("double wrong decode heals in two rounds") {
    val healthy = "it’s café naïve™ for €5 «ok»"
    val twice = damage(damage(healthy))
    assert(twice != damage(healthy))
    assert(fix(twice) == healthy)
  }

  test("undefined-byte damage is honestly unrecoverable, not corrupted") {
    // ” is U+201D → bytes E2 80 9D; 0x9D is UNDEFINED in cp1252, so a
    // real wrong decode already replaced it with U+FFFD — information
    // is GONE. The kernel must leave such text alone (U+FFFD is not
    // cp1252-encodable), never half-fix it.
    val broken = damage("she said “yes” now")
    assert(broken.contains('�'))
    assert(fix(broken) == broken)
  }

  test("healthy text passes through untouched") {
    for (s <- Seq(
      "plain ascii only",
      "", // empty
      "café déjà-vu naïve", // healthy accents: é is not a UTF-8 lead
      "Ω and 中文 text", // outside cp1252 entirely: unmappable
      "ends with a lead Ã")) // truncated-looking but invalid UTF-8
      assert(fix(s) == s)
  }

  test("column path repairs through codegen and keeps nulls") {
    import spark.implicits._
    val healthy = "curly ‘quotes’ and – dashes"
    val df = Seq(
      (1L, damage(healthy)),
      (2L, "ascii stays"),
      (3L, null: String))
      .toDF("id", "t")
      .repartition(2) // keep the projection out of ConvertToLocalRelation
      .select(col("id"), TextFunctions.fixMojibake(col("t")).as("fixed"))
    val ds = df.as[(Long, String)]
    val got = ds.collect().sortBy(_._1).toList
    assert(got == List((1L, healthy), (2L, "ascii stays"), (3L, null)))
    // the kernel rides whole-stage codegen, not an interpreted
    // fallback (inspect the FINAL adaptive plan, post-execution)
    // the star prefix marks a WholeStageCodegen'd operator
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("fix_mojibake"))
  }
}
