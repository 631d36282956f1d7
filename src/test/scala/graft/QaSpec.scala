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

  test("P5 exit tokens: exit/quit/退出 case-insensitive, untrimmed (src/main.py:94)") {
    assert(Repl.isExitCommand("exit"))
    assert(Repl.isExitCommand("EXIT"))
    assert(Repl.isExitCommand("Quit"))
    assert(Repl.isExitCommand("退出"))
    assert(!Repl.isExitCommand("exit ")) // reference does not strip — quirk preserved
    assert(!Repl.isExitCommand("please exit"))
    assert(!Repl.isExitCommand(""))
  }

  test("Q5 key config: missing key warns at build and answers the error string at call") {
    val warnings = scala.collection.mutable.ListBuffer.empty[String]
    val gen = graft.operators.HttpAnswerer.fromEnv(
      "http://localhost:1/v1/chat/completions", "m",
      env = _ => None, warn = warnings += _)
    assert(warnings.toList == List(graft.operators.HttpAnswerer.MissingKeyWarning))
    // call time: error string AS the answer, never an exception
    assert(gen("any prompt") == graft.operators.HttpAnswerer.MissingKeyAnswer)
    assert(gen("another") == graft.operators.HttpAnswerer.MissingKeyAnswer)
  }

  test("Q5 key config: explicit key beats env and emits no warning") {
    val warnings = scala.collection.mutable.ListBuffer.empty[String]
    graft.operators.HttpAnswerer.fromEnv(
      "http://localhost:1/v1/chat/completions", "m",
      apiKey = Some("k-explicit"), env = _ => Some("k-env"), warn = warnings += _)
    val fromVar = graft.operators.HttpAnswerer.fromEnv(
      "http://localhost:1/v1/chat/completions", "m",
      env = _ => Some("k-env"), warn = warnings += _)
    assert(warnings.isEmpty)
    // with a key configured, failures surface as exceptions for the
    // Qa.answer error-as-answer seam to absorb (unreachable endpoint)
    assert(Qa.answer(fromVar)("q").startsWith("抱歉"))
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
