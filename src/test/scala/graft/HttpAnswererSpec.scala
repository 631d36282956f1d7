package graft

import graft.operators.{HttpAnswerer, Qa}
import org.scalatest.funsuite.AnyFunSuite

/** Q3 production path against a real localhost HTTP server (the JDK's
  * own — no network egress involved): request shape, auth header, JSON
  * escaping both directions, and the error-as-answer seam.
  */
class HttpAnswererSpec extends AnyFunSuite {

  /** Run `f` against a one-endpoint server; returns (result, requests
    * seen). The handler replies with `status` and `responseBody`.
    */
  private def withServer(status: Int, responseBody: String)
                        (f: String => Unit): Seq[(String, String)] = {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      seen += ((Option(exchange.getRequestHeaders.getFirst("Authorization")).getOrElse(""), body))
      val resp = responseBody.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(status, resp.length.toLong)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions")
    finally server.stop(0)
    seen.toSeq
  }

  test("round trip: auth header, escaped request, unescaped response content") {
    val canned = """{"choices":[{"message":{"role":"assistant",
      "content":"line one\nquote \" backslash \\ uni 中 done."}}]}"""
    val prompt = "ask about\n\"quoted\" things\tplease"
    var answer = ""
    val seen = withServer(200, canned) { url =>
      answer = HttpAnswerer(url, "sk-test-key", "test-model").generate(prompt)
    }
    assert(answer == "line one\nquote \" backslash \\ uni 中 done.")
    val (auth, body) = seen.head
    assert(auth == "Bearer sk-test-key")
    // the prompt's newline/quote/tab must be ESCAPED inside the JSON body
    assert(body.contains("""ask about\n\"quoted\" things\tplease"""))
    assert(body.contains(""""model":"test-model""""))
  }

  test("non-2xx becomes an exception; Qa.answer turns it into an answer string") {
    var viaSeam = ""
    withServer(503, """{"error":"overloaded"}""") { url =>
      val gen = HttpAnswerer(url, "k", "m")
      intercept[RuntimeException](gen.generate("hi"))
      viaSeam = Qa.answer(gen.generate)("hi") // reference error-as-answer semantics
    }
    assert(viaSeam.startsWith("抱歉，生成回答时出现错误"))
    assert(viaSeam.contains("503"))
  }

  test("missing content field is an error, not an empty answer") {
    withServer(200, """{"choices":[]}""") { url =>
      intercept[RuntimeException](HttpAnswerer(url, "k", "m").generate("hi"))
    }
  }

  test("content extractor handles the full escape set and embedded quotes") {
    assert(HttpAnswerer.extractContent("""{"content":"a\"b\\cA\n"}""")
      .contains("a\"b\\cA\n"))
    // \uXXXX decode (JSON built via escapes so Scala can't pre-process it)
    assert(HttpAnswerer.extractContent("{\"content\":\"\\u0041ok\"}").contains("Aok"))
    assert(HttpAnswerer.extractContent("""{"x":1}""").isEmpty)
    assert(HttpAnswerer.extractContent("""{"content": 42}""").isEmpty)
  }
}
