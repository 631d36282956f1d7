package graft

import graft.operators.Qa
import org.scalatest.funsuite.AnyFunSuite

/** Q3 answerer semantics (SURVEY.md §2.5): pluggable generation with
  * the reference's error-as-answer behavior
  * (`src/qa_system.py:106-109` — failures become the answer string,
  * never an exception).
  */
class QaSpec extends AnyFunSuite {

  test("successful generation passes through") {
    val out = Qa.answer(p => s"echo: $p")("what is a shuffle?")
    assert(out == "echo: what is a shuffle?")
  }

  test("a failing generator becomes an error-string answer, not an exception") {
    val out = Qa.answer(_ => throw new RuntimeException("api timeout"))("q")
    assert(out.contains("api timeout"))
    assert(out.startsWith("抱歉"))
  }

  test("hash60 is the md5 prefix, base 16 (cross-engine contract)") {
    // md5("abc") = 900150983cd24fb0..., first 15 hex digits base-16:
    val spark = SparkSpec.session
    import spark.implicits._
    val v = Seq("abc").toDF("s")
      .select(Fns.hash60(org.apache.spark.sql.functions.col("s")).as("h"))
      .collect().head.getLong(0)
    assert(v == java.lang.Long.parseLong("900150983cd24fb", 16))
  }
}
