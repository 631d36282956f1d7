package graft

import graft.operators.Segmenter
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests (FIXTURES.md §1.5) for the pure-Scala
  * operator cores — randomized inputs over CJK/ASCII/whitespace-heavy
  * text, invariants instead of goldens. Runs natively under sbt's
  * ScalaCheck framework.
  */
object PropertySpec extends Properties("graft") {

  private val wordGen: Gen[String] =
    Gen.oneOf("spark", "数据", "join", "流处理", "hash", "sort.", "表!", "scan", "a", "词")
  private val sepGen: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \n ")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 400)
    ws <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(n, sepGen)
  } yield ws.zip(seps).map { case (w, s) => w + s }.mkString

  /** Reference model of the C1 chunker (clean → filter → chunk) —
    * identical semantics to the Spark SQL implementation (ChunkerSpec
    * pins the two together; these properties pin the model itself).
    */
  private def chunkModel(raw: String): Seq[(Option[Int], String)] = {
    val t = raw.replaceAll("\\s{2,}", " ").replaceAll("^\\s+|\\s+$", "")
    if (t.length < 10) Seq.empty
    else if (t.length <= 500) Seq((None, t))
    else (0 until t.length by 450).iterator
      .map(i => (i / 450 + 1, t.substring(i, math.min(i + 500, t.length))))
      .filter(_._2.length >= 50)
      .map { case (n, c) => (Some(n), c) }
      .toSeq
  }

  property("chunker invariants") = Prop.forAll(textGen) { text =>
    val chunks = chunkModel(text)
    val split = chunks.collect { case (Some(n), c) => (n, c) }
    val bounded = chunks.forall(_._2.length <= 500)
    val minLen = split.forall(_._2.length >= 50)
    val dense = split.map(_._1) == (1 to split.size)
    val overlap = split.sliding(2).forall {
      case Seq((_, a), (_, b)) if a.length == 500 => a.takeRight(50) == b.take(50)
      case _ => true
    }
    val cleaned = text.replaceAll("\\s{2,}", " ").replaceAll("^\\s+|\\s+$", "")
    val single =
      if (cleaned.length >= 10 && cleaned.length <= 500) chunks == Seq((None, cleaned))
      else true
    bounded && minLen && dense && overlap && single
  }

  property("segmentPlain conserves non-whitespace characters") =
    Prop.forAll(textGen) { text =>
      def letters(s: String) = s.replaceAll("\\s+", "")
      letters(Segmenter.segmentPlain(text).mkString(" ")) == letters(text)
    }

  private val paraGen: Gen[List[String]] = Gen.listOf(Gen.oneOf(
    "short frag", "结束。",
    "a full length paragraph that definitely exceeds thirty characters.",
    "tiny", "mid-size paragraph just over thirty chars!"))

  property("mergeShort conserves text and only leaves short fragments at the tail") =
    Prop.forAll(paraGen) { paras =>
      val merged = Segmenter.mergeShort(paras)
      val conserved =
        merged.mkString(" ").replaceAll("\\s+", " ").trim ==
          paras.mkString(" ").replaceAll("\\s+", " ").trim
      val shape = merged.dropRight(1).forall(p =>
        p.length >= 30 || p.matches("(?s).*[.。?？!！]$"))
      conserved && shape
    }
}
