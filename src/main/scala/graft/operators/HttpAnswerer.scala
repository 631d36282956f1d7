package graft.operators

/** Q3 — the production half of answer generation: an OpenAI-style
  * chat-completions client over the JDK HTTP stack (the reference calls
  * its provider through httpx with base URL + API key + model,
  * `/root/reference/src/qa_system.py:41-76`; Q5's key/endpoint config
  * becomes this class's constructor). No third-party dependencies: the
  * request body is assembled with strict JSON string escaping and the
  * response's `content` field is pulled out by a small, correct JSON
  * string scanner (full escape set incl. \uXXXX) — not a regex.
  *
  * Plug into the error-as-answer seam exactly like the stub:
  * {{{
  *   val gen = HttpAnswerer("http://llm.internal/v1/chat/completions", key, "some-model")
  *   Qa.answer(gen.generate)(prompt) // failures become answer strings
  * }}}
  * Driver-side by design: generation happens once per user query (the
  * reference's REPL), never inside a distributed plan — no executor
  * should hold API credentials or block on a remote model.
  */
final case class HttpAnswerer(endpoint: String, apiKey: String, model: String,
                              timeoutMs: Long = 120000L,
                              temperature: Double = 0.1,
                              maxTokens: Int = 2048,
                              systemPrompt: Option[String] = None) {

  def generate(prompt: String): String = {
    // the reference's exact payload shape (`src/qa_system.py:77-86`):
    // optional system message first, temperature 0.1, max_tokens 2048,
    // stream false, 120 s timeout
    val messages = (systemPrompt.map(s =>
        s"""{"role":"system","content":${HttpAnswerer.jstr(s)}}""").toSeq :+
      s"""{"role":"user","content":${HttpAnswerer.jstr(prompt)}}""").mkString(",")
    val body =
      s"""{"model":${HttpAnswerer.jstr(model)},"messages":[$messages],""" +
        s""""temperature":$temperature,"max_tokens":$maxTokens,"stream":false}"""
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body, java.nio.charset.StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString(java.nio.charset.StandardCharsets.UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    HttpAnswerer.extractContent(resp.body()).getOrElse(
      throw new RuntimeException(s"no content field in response: ${resp.body().take(200)}"))
  }
}

object HttpAnswerer {

  /** Reference's call-time error answer when no key is configured
    * (`/root/reference/src/qa_system.py:45-46`).
    */
  val MissingKeyAnswer = "错误: API密钥未设置。请设置API_KEY环境变量。"

  /** Reference's construction-time warning (`src/qa_system.py:18`). */
  val MissingKeyWarning = "警告: 未找到API密钥。请设置API_KEY环境变量。"

  /** Q5 — key config with the reference's ergonomics
    * (`src/qa_system.py:14-20, 45-46`): an explicit key wins, else the
    * environment variable is consulted; a MISSING key warns once here
    * (construction) and then surfaces as the reference's error string
    * AS THE ANSWER at every call — never an exception, so a keyless
    * deployment still runs end-to-end (retrieval + citations intact).
    *
    * Dotenv parity: the reference's `load_dotenv()`
    * (`src/qa_system.py:13`, `src/main.py:110`) reads a `.env` file
    * with `override=False` — a variable already in the process
    * environment WINS over the file. The default `env` lookup here does
    * the same: `sys.env` first, then `.env` in the current directory
    * (missing file ⇒ empty). Pass `dotenvPath` to point elsewhere.
    *
    * `env`/`warn` are injectable for tests; production callers use the
    * defaults (`sys.env` + `.env` / stderr).
    */
  def fromEnv(endpoint: String, model: String,
              apiKey: Option[String] = None,
              envVar: String = "API_KEY",
              env: String => Option[String] = null,
              warn: String => Unit = Console.err.println,
              dotenvPath: java.nio.file.Path = java.nio.file.Paths.get(".env")): String => String = {
    val lookup = Option(env).getOrElse { (k: String) =>
      sys.env.get(k).orElse(loadDotenv(dotenvPath).get(k))
    }
    apiKey.filter(_.nonEmpty).orElse(lookup(envVar).filter(_.nonEmpty)) match {
      case Some(key) => HttpAnswerer(endpoint, key, model).generate
      case None =>
        warn(MissingKeyWarning)
        _ => MissingKeyAnswer
    }
  }

  /** Read a dotenv file if present (missing/unreadable ⇒ empty map —
    * `load_dotenv()` is silent on a missing file too). Driver-side,
    * once, at construction: never ship credentials into a plan.
    */
  def loadDotenv(path: java.nio.file.Path): Map[String, String] =
    try {
      if (java.nio.file.Files.isReadable(path))
        parseDotenv(new String(java.nio.file.Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8))
      else Map.empty
    } catch { case _: java.io.IOException => Map.empty }

  /** The python-dotenv subset that covers real `.env` files: one
    * `KEY=VALUE` per line, optional `export ` prefix, `#` comment lines
    * and trailing ` #` comments on unquoted values, single- or
    * double-quoted values (double quotes decode \n \r \t \\ \" escapes,
    * single quotes are literal), whitespace trimmed around key and
    * unquoted value. First assignment of a key wins (matching
    * `load_dotenv`'s override=False as seen by the consumer).
    */
  private[graft] def parseDotenv(content: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    content.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && line.contains('=')) {
        val noExport = if (line.startsWith("export ")) line.drop(7).trim else line
        val eq = noExport.indexOf('=')
        val key = noExport.take(eq).trim
        var v = noExport.drop(eq + 1).trim
        if (key.nonEmpty && key.forall(c => c.isLetterOrDigit || c == '_')) {
          if (v.length >= 2 && v.head == '"' && v.last == '"') {
            v = decodeEscapes(v.substring(1, v.length - 1))
          } else if (v.length >= 2 && v.head == '\'' && v.last == '\'') {
            v = v.substring(1, v.length - 1)
          } else {
            val hash = v.indexOf(" #")
            if (hash >= 0) v = v.take(hash).trim
          }
          if (!out.contains(key)) out(key) = v
        }
      }
    }
    out.toMap
  }

  /** Backslash escapes inside a double-quoted dotenv value; unknown
    * escapes pass through verbatim (python-dotenv behavior).
    */
  private def decodeEscapes(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '"' => sb.append('"'); i += 2
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Strict JSON string literal (quotes, backslashes, control chars). */
  private[graft] def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  /** Pull the first `"content"` string value out of a JSON document —
    * the `choices[0].message.content` field of a chat-completions
    * response. A full JSON parser is not warranted for one field; this
    * scanner is still CORRECT for that field: it decodes the complete
    * escape set (\" \\ \/ \b \f \n \r \t \uXXXX) and cannot be fooled
    * by escaped quotes inside the value.
    */
  private[graft] def extractContent(json: String): Option[String] = {
    val key = "\"content\""
    val at = json.indexOf(key)
    if (at < 0) None
    else {
      var i = at + key.length
      while (i < json.length && (json.charAt(i) == ' ' || json.charAt(i) == ':' ||
        json.charAt(i) == '\n' || json.charAt(i) == '\r' || json.charAt(i) == '\t')) i += 1
      if (i >= json.length || json.charAt(i) != '"') None
      else {
        i += 1
        val sb = new StringBuilder
        var done = false
        var ok = true
        while (!done && i < json.length) {
          json.charAt(i) match {
            case '"' => done = true; i += 1
            case '\\' if i + 1 < json.length =>
              json.charAt(i + 1) match {
                case '"' => sb += '"'; i += 2
                case '\\' => sb += '\\'; i += 2
                case '/' => sb += '/'; i += 2
                case 'b' => sb += '\b'; i += 2
                case 'f' => sb += '\f'; i += 2
                case 'n' => sb += '\n'; i += 2
                case 'r' => sb += '\r'; i += 2
                case 't' => sb += '\t'; i += 2
                case 'u' if i + 5 < json.length =>
                  try { sb += Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar; i += 6 }
                  catch { case _: NumberFormatException => ok = false; done = true }
                case _ => ok = false; done = true
              }
            case c => sb += c; i += 1
          }
        }
        if (done && ok) Some(sb.toString) else None
      }
    }
  }
}
