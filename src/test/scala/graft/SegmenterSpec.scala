package graft

import graft.operators.Segmenter
import graft.operators.Segmenter.Line
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture tests for E1–E3 (FIXTURES.md §1.4) — the
  * order-dependent folds that the DuckDB oracle cannot express.
  * Expected values are hand-simulated from the reference semantics
  * (`src/pdf_extractor.py:60-206`).
  */
class SegmenterSpec extends AnyFunSuite {

  // ------------------------------------------------------------ E1 layout
  test("E1: vertical gap > 15 starts a new paragraph") {
    val lines = Seq(
      Line("This is the first paragraph of the page.", 0, 10, 0, 0),
      Line("Second paragraph starts here and is long enough.", 30, 40, 0, 1))
    assert(Segmenter.segmentLayout(lines) == Seq(
      "This is the first paragraph of the page.",
      "Second paragraph starts here and is long enough."))
  }

  test("E1: small gap, same block type → same paragraph (joined with space)") {
    val lines = Seq(
      Line("A sentence split across", 0, 10, 0, 0),
      Line("two layout lines in one block stays joined.", 12, 22, 0, 0))
    assert(Segmenter.segmentLayout(lines) == Seq(
      "A sentence split across two layout lines in one block stays joined."))
  }

  test("E1: block-type change splits; E3 then merges the short heading") {
    val lines = Seq(
      Line("Heading text block", 0, 10, 1, 0),
      Line("Body paragraph follows the heading immediately.", 12, 22, 0, 1))
    // split happens (type 1→0), but the 18-char heading has no terminal
    // punctuation → E3 glues it onto the following paragraph
    assert(Segmenter.segmentLayout(lines) == Seq(
      "Heading text block Body paragraph follows the heading immediately."))
  }

  test("E1: the indentation rule is dead code (reference strips first)") {
    val lines = Seq(
      Line("A first line of the running paragraph", 0, 10, 0, 0),
      Line("    indented continuation should NOT split", 12, 22, 0, 0))
    assert(Segmenter.segmentLayout(lines) == Seq(
      "A first line of the running paragraph indented continuation should NOT split"))
  }

  test("E1: empty lines are skipped without touching state") {
    val lines = Seq(
      Line("Opening paragraph with enough length here.", 0, 10, 0, 0),
      Line("   ", 12, 22, 0, 0),
      Line("and its continuation stays attached to it.", 13, 23, 0, 0))
    assert(Segmenter.segmentLayout(lines) == Seq(
      "Opening paragraph with enough length here. and its continuation stays attached to it."))
  }

  // ------------------------------------------------------------- E3 merge
  test("E3: short paragraphs accumulate onto the following one") {
    assert(Segmenter.mergeShort(Seq(
      "short one", "tiny",
      "This is a long closing paragraph with terminal.")) == Seq(
      "short one tiny This is a long closing paragraph with terminal."))
  }

  test("E3: short paragraph WITH terminal punctuation is kept standalone") {
    assert(Segmenter.mergeShort(Seq("Short but done.",
      "A following longer paragraph that stands alone here.")) == Seq(
      "Short but done.",
      "A following longer paragraph that stands alone here."))
  }

  test("E3: CJK terminal punctuation 。？！ counts") {
    assert(Segmenter.mergeShort(Seq("短句结束。", "另一个长段落在此处继续直到满三十个字符以上结束")) == Seq(
      "短句结束。", "另一个长段落在此处继续直到满三十个字符以上结束"))
  }

  test("E3: trailing accumulation is emitted") {
    assert(Segmenter.mergeShort(Seq("only a stub")) == Seq("only a stub"))
  }

  // ---------------------------------------------------------- E2 fallback
  test("E2: blank lines (with whitespace) split blocks") {
    assert(Segmenter.segmentPlain("Para one line.\n   \nPara two starts here.") == Seq(
      "Para one line.", "Para two starts here."))
  }

  test("E2: list markers start new paragraphs") {
    assert(Segmenter.segmentPlain(
      "Intro sentence continues\n1. first item\n2. second item") == Seq(
      "Intro sentence continues", "1. first item", "2. second item"))
  }

  test("E2: sentence-final previous line starts a new paragraph") {
    assert(Segmenter.segmentPlain("First sentence ends here.\nNew line after period") == Seq(
      "First sentence ends here.", "New line after period"))
  }

  test("E2: short non-terminal lines continue the current paragraph") {
    assert(Segmenter.segmentPlain("Short line\nanother bit\nfinal part of paragraph") == Seq(
      "Short line another bit final part of paragraph"))
  }

  test("E2: CJK sentence-final 。 splits") {
    assert(Segmenter.segmentPlain("第一句话结束。\n新段落开始") == Seq("第一句话结束。", "新段落开始"))
  }

  test("E2: single-line text yields one paragraph") {
    assert(Segmenter.segmentPlain("just one line of text") == Seq("just one line of text"))
  }

  // ---------------------------------------------------------------- E4/E5
  test("E4+E5: clean collapses whitespace; min length 10 filters") {
    assert(Segmenter.cleanParagraph("  a   b  ").isEmpty)
    assert(Segmenter.cleanParagraph("  a   long   enough   paragraph  ")
      .contains("a long enough paragraph"))
  }
}
