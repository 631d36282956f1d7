package graft

import org.apache.spark.sql.SparkSession

/** P5 — the interactive console loop, the reference's primary UX
  * (`/root/reference/src/main.py:80-103`): build the knowledge base,
  * then read questions from stdin and answer each with sources until
  * an exit token arrives.
  *
  * Run with:
  * {{{
  *   sbt "runMain graft.Repl [sfDir] [workDir]"
  * }}}
  * `sfDir` defaults to the smallest test corpus; `workDir` (where the
  * extracted CSV + vector store land) defaults to a temp directory, so
  * re-running against the same workDir exercises the P1/P2 skip
  * guards exactly like the reference's second launch.
  *
  * Answer generation: if `GRAFT_LLM_ENDPOINT` (+ optional
  * `GRAFT_LLM_MODEL`) is set, questions go through the chat-completions
  * client with the Q5 key contract ([[graft.operators.HttpAnswerer.fromEnv]]
  * — warn at startup if `API_KEY` is absent, error-string answers at
  * call time); otherwise the deterministic extractive stub answers, so
  * the loop is fully usable offline.
  */
object Repl {

  /** Exit predicate — `src/main.py:94`: `query.lower() in ["exit",
    * "quit", "退出"]`. Case-insensitive, NO trimming (the reference
    * does not strip, so "exit " with a trailing space is a question,
    * not an exit — quirk preserved).
    */
  def isExitCommand(query: String): Boolean = {
    val l = query.toLowerCase(java.util.Locale.ROOT)
    l == "exit" || l == "quit" || l == "退出"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val workDir =
      if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_repl").toString

    val spark = GraftSession
      .builder(sys.env.getOrElse("SPARK_MASTER", "local[4]"), "4")
      .appName("graft-repl")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- knowledge-base setup, staged like src/main.py:14-78
    println("[1/3] 提取文档...")
    println("[2/3] 构建向量存储...")
    val result = Pipeline.setupKnowledgeBase(spark, Tables.documents(spark, sfDir), workDir)
    println("[3/3] 初始化问答系统...")
    val generate: Option[String => String] = sys.env.get("GRAFT_LLM_ENDPOINT").map { ep =>
      operators.HttpAnswerer.fromEnv(ep, sys.env.getOrElse("GRAFT_LLM_MODEL", "default"))
    }
    println(s"\n知识库构建完成！(chunks=${result.chunkCount}, " +
      s"extracted=${result.extracted}, indexed=${result.indexed})")

    interactiveQa(spark, s"$workDir/vector_store", generate)
    spark.stop()
  }

  /** The interactive loop alone (`src/main.py:80-103` banners, prompt,
    * answer printing) — split from session/knowledge-base setup so a
    * spec can drive a scripted stdin session against a populated store
    * and golden-check the exact console transcript. Reads Console.in
    * (what `StdIn.readLine` consumes), prints to Console.out.
    */
  def interactiveQa(spark: SparkSession, store: String,
                    generate: Option[String => String] = None): Unit = {
    println("\n" + "=" * 50)
    println("智能数据工程课程知识问答系统")
    println("=" * 50)
    println("输入问题与课程内容进行交互，输入 'exit' 或 'quit' 退出")

    var running = true
    while (running) {
      print("\n请输入问题: ")
      Console.flush()
      val query = scala.io.StdIn.readLine()
      if (query == null || isExitCommand(query)) { // null = EOF: exit like a token
        println("谢谢使用，再见！")
        running = false
      } else {
        val response = operators.Qa.answerWithSources(spark, store, query, topK = 5, generate)
        println("\n回答:")
        println(response.answer)
      }
    }
  }
}
