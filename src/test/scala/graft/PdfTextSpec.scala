package graft

import graft.sources.{PdfFixtures, PdfText}
import java.nio.file.Files

/** S2 extractor tests against REAL on-disk PDF bytes (built by the
  * deterministic fixture writer): object scan, FlateDecode, content
  * interpretation, layout-line mapping, and the full distributed
  * pipeline — the piece the reference gets from PyMuPDF
  * (`src/pdf_extractor.py:8-23,60-124`).
  */
class PdfTextSpec extends SparkSpec {

  test("uncompressed streams: page count and layout paragraphs match goldens") {
    val bytes = PdfFixtures.buildPdf(PdfFixtures.fixturePages, compress = false)
    assert(PdfText.pageCount(bytes) == 2)
    assert(PdfText.extractPageParagraphs(bytes) == PdfFixtures.fixtureParagraphs)
  }

  test("FlateDecode streams: byte-identical extraction to the raw form") {
    val bytes = PdfFixtures.buildPdf(PdfFixtures.fixturePages, compress = true)
    assert(PdfText.pageCount(bytes) == 2)
    assert(PdfText.extractPageParagraphs(bytes) == PdfFixtures.fixtureParagraphs)
  }

  test("string escapes: parens, backslash, octal codes decode exactly") {
    val page =
      """BT /F1 12 Tf 72 720 Td (Escaped \(parens\) and backslash \\ plus octal \101\102 done.) Tj ET
        |""".stripMargin
    val got = PdfText.extractPageParagraphs(PdfFixtures.buildPdf(Seq(page), compress = false))
    assert(got == Seq(Seq("Escaped (parens) and backslash \\ plus octal AB done.")))
  }

  test("hex strings decode; same-baseline shows join as spans") {
    val page =
      """BT /F1 12 Tf 72 720 Td <48656C6C6F> Tj (continues after hex with sufficient length.) Tj ET
        |""".stripMargin
    val got = PdfText.extractPageParagraphs(PdfFixtures.buildPdf(Seq(page), compress = false))
    assert(got == Seq(Seq("Hello continues after hex with sufficient length.")))
  }

  test("ToUnicode CMap: bfchar, increment bfrange, array bfrange, multi-unit dst") {
    val cmap =
      """2 beginbfchar
        |<0003> <6570>
        |<0004> <D835DC00>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0041>
        |<0020> <0021> [<0066006C> <4E2D>]
        |endbfrange""".stripMargin
    val m = PdfText.parseToUnicodeCMap(cmap)
    assert(m(0x0003) == "数")
    assert(m(0x0004) == "𝐀") // surrogate pair rides through as UTF-16 units
    assert(m(0x0010) == "A" && m(0x0011) == "B" && m(0x0012) == "C")
    assert(m(0x0020) == "fl" && m(0x0021) == "中") // array form, incl. multi-char dst
  }

  test("Type0/CID font: CJK decodes via ToUnicode; mixed-font spans join") {
    for (compress <- Seq(false, true)) {
      val bytes = PdfFixtures.buildCjkPdf(compress)
      assert(PdfText.pageCount(bytes) == 1)
      assert(PdfText.extractPageParagraphs(bytes) == PdfFixtures.cjkParagraphs,
        s"compress=$compress")
    }
  }

  test("vertical -V CMap: columns re-flow right-to-left, glyphs top-to-bottom") {
    // the fixture paints the left column first and the right column
    // bottom-up, so stream order is scrambled — only positional
    // re-flow recovers the reading order
    val bytes = PdfFixtures.buildVerticalCMapPdf()
    assert(PdfText.pageCount(bytes) == 1)
    val lines = PdfText.extractPageLines(bytes).head.map(_.text)
    assert(lines == PdfFixtures.verticalLines,
      s"vertical reading order wrong: $lines")
  }

  test("Identity-H without ToUnicode: the embedded TrueType cmap recovers text") {
    // glyph ids are deliberately non-identity (100 + 3i), so echoing
    // CIDs cannot pass — only inverting the font's own cmap can
    val bytes = PdfFixtures.buildIdentityHPdf()
    assert(PdfText.pageCount(bytes) == 1)
    assert(PdfText.extractPageParagraphs(bytes) ==
      Seq(Seq(PdfFixtures.identityHParagraph)))
  }

  test("TrueType cmap parser: format 4 segments round-trip, malformed is empty") {
    val mapping = Seq('A' -> 7, 'B' -> 9, '中' -> 4660)
    val uniToGid = PdfText.parseTrueTypeCmap(PdfFixtures.buildMinimalTtf(mapping))
    assert(mapping.forall { case (c, g) => uniToGid.get(c.toInt).contains(g) })
    assert(uniToGid.size == mapping.size)
    assert(PdfText.parseTrueTypeCmap(Array[Byte](1, 2, 3)) == Map.empty)
  }

  test("ObjStm: dicts packed in a compressed object stream still parse") {
    val bytes = PdfFixtures.buildObjStmPdf()
    assert(PdfText.pageCount(bytes) == 1)
    assert(PdfText.extractPageParagraphs(bytes) ==
      Seq(Seq(PdfFixtures.objStmParagraph)))
  }

  test("PNG-predicted Flate stream (all five filter types) reconstructs exactly") {
    val bytes = PdfFixtures.buildPredictorPdf()
    assert(PdfText.pageCount(bytes) == 1)
    assert(PdfText.extractPageParagraphs(bytes) ==
      Seq(Seq(PdfFixtures.predictorParagraph)))
  }

  test("Type0 font without ToUnicode yields no text, not mojibake") {
    // same CJK doc with the /ToUnicode entry cut out of the font dict:
    // CIDs carry no inherent meaning, so the honest answer is nothing
    val bytes = PdfFixtures.buildCjkPdf(compress = false)
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/ToUnicode 8 0 R ", "")
    val got = PdfText.extractPageParagraphs(
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(got == Seq(Seq("Unit 01:"))) // the simple-font span survives
  }

  test("predefined UniGB-UCS2-H CMap: Type0 with NO ToUnicode extracts (code space is UCS-2)") {
    val bytes = PdfFixtures.buildPredefCMapPdf()
    assert(PdfText.pageCount(bytes) == 1)
    assert(PdfText.extractPageParagraphs(bytes) ==
      Seq(Seq(PdfFixtures.predefParagraph)))
  }

  test("predefined legacy-charset CMap: GBK-EUC-H show bytes decode via the JVM charset") {
    // same document, /Encoding swapped to the GBK byte-space CMap and
    // the show string re-encoded as GBK bytes in a literal string
    val base = new String(PdfFixtures.buildPredefCMapPdf(),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val gbkBytes = PdfFixtures.predefParagraph.getBytes(
      java.nio.charset.Charset.forName("GBK"))
    // escape the PDF literal-string specials; other high bytes pass raw
    val lit = gbkBytes.flatMap {
      case b if b == '('.toByte || b == ')'.toByte || b == '\\'.toByte =>
        Seq('\\'.toByte, b)
      case b => Seq(b)
    }
    val hexStr = PdfFixtures.predefParagraph.map(c => f"${c.toInt}%04X")
      .mkString("<", "", ">")
    val content0 = s"BT /F1 12 Tf 72 720 Td $hexStr Tj ET\n"
    val body = "BT /F1 12 Tf 72 720 Td (" +
      new String(lit, java.nio.charset.StandardCharsets.ISO_8859_1) + ") Tj ET"
    assert(base.contains(content0) && body.length < content0.length,
      "fixture drift: GBK body must fit inside the original /Length")
    // pad to the original content length so the untouched /Length and
    // xref offsets stay valid after the in-place swap
    val content1 = body + (" " * (content0.length - body.length - 1)) + "\n"
    val swapped = base
      .replace(content0, content1)
      .replace("/Encoding /UniGB-UCS2-H", "/Encoding /GBK-EUC-H   ")
    val got = PdfText.extractPageParagraphs(
      swapped.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(got == Seq(Seq(PdfFixtures.predefParagraph)))
  }

  test("/Encoding /Differences + WinAnsi base: glyph names remap before Latin-1") {
    val bytes = PdfFixtures.buildDifferencesPdf()
    assert(PdfText.pageCount(bytes) == 1)
    assert(PdfText.extractPageParagraphs(bytes) ==
      Seq(Seq(PdfFixtures.diffParagraph)))
  }

  test("glyph-name resolution: AGL subset, uniXXXX, uXXXXX, variants, singles") {
    assert(PdfText.glyphToUnicode("bullet").contains("•"))
    assert(PdfText.glyphToUnicode("eacute").contains("é"))
    assert(PdfText.glyphToUnicode("germandbls").contains("ß"))
    assert(PdfText.glyphToUnicode("uni4E2D").contains("中"))
    assert(PdfText.glyphToUnicode("uni00480065").contains("He")) // multi-unit form
    assert(PdfText.glyphToUnicode("u1F600").contains(new String(Character.toChars(0x1F600))))
    assert(PdfText.glyphToUnicode("a.sc").contains("a")) // variant suffix strips
    assert(PdfText.glyphToUnicode("seven.oldstyle").contains("7"))
    assert(PdfText.glyphToUnicode("Q").contains("Q")) // single-char name is itself
    assert(PdfText.glyphToUnicode("gXYZ").isEmpty) // unknown stays unmapped
  }

  test("/Differences parsing: code resets, increments, unknown names consume slots") {
    val m = PdfText.parseDifferences(
      "/Differences [ 65 /bullet /nosuchglyph /emdash 200 /Euro ]")
    assert(m == Map(65 -> "•", 67 -> "—", 200 -> "€"))
  }

  test("LZWDecode: encoded content extracts; long input crosses the 9→10 bit width bump") {
    val bytes = PdfFixtures.buildFilteredPdf(
      PdfFixtures.lzwParagraph, Seq("LZWDecode"), PdfFixtures.lzwEncode)
    assert(PdfText.extractPageParagraphs(bytes) == Seq(Seq(PdfFixtures.lzwParagraph)))
    // ~2800 chars of mostly-distinct tokens force well past 512 table
    // entries, so encoder and decoder must agree on the early-change
    // width switch — the classic LZW interop bug this pins down.
    val long = (0 until 400).map(i => s"w${i}q${(i * 7) % 97}").mkString(" ")
    val lb = PdfFixtures.buildFilteredPdf(long, Seq("LZWDecode"), PdfFixtures.lzwEncode)
    assert(PdfText.extractPageParagraphs(lb) == Seq(Seq(long)))
  }

  test("RunLengthDecode: literal and repeat runs both reconstruct") {
    val bytes = PdfFixtures.buildFilteredPdf(
      PdfFixtures.rleParagraph, Seq("RunLengthDecode"), PdfFixtures.runLengthEncode)
    assert(PdfText.extractPageParagraphs(bytes) == Seq(Seq(PdfFixtures.rleParagraph)))
  }

  test("ASCII85 + Flate filter CHAIN applies left to right") {
    val bytes = PdfFixtures.buildFilteredPdf(
      PdfFixtures.a85Paragraph, Seq("ASCII85Decode", "FlateDecode"),
      b => PdfFixtures.ascii85Encode(PdfFixtures.deflate(b)))
    assert(PdfText.extractPageParagraphs(bytes) == Seq(Seq(PdfFixtures.a85Paragraph)))
  }

  test("ASCIIHexDecode: hex-armored stream extracts (odd digit tolerated)") {
    val para = "Hex armored content stream decodes through paired digits exactly."
    val hexEnc = (b: Array[Byte]) =>
      (b.map(x => f"${x & 0xFF}%02X").mkString + ">")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val bytes = PdfFixtures.buildFilteredPdf(para, Seq("ASCIIHexDecode"), hexEnc)
    assert(PdfText.extractPageParagraphs(bytes) == Seq(Seq(para)))
  }

  test("xref-stream file: indirect /Length with embedded 'endstream' needs the xref walk") {
    // The payload contains the literal word "endstream", so a linear
    // scan's extent search truncates mid-string; only the xref-stream
    // walk + ObjStm-resolved indirect length recovers the paragraph.
    val bytes = PdfFixtures.buildXrefStreamPdf()
    assert(PdfText.pageCount(bytes) == 1)
    assert(PdfText.extractPageParagraphs(bytes) == Seq(Seq(PdfFixtures.xrefParagraph)))
  }

  test("garbage bytes: zero pages, no crash (tolerant-extractor contract)") {
    assert(PdfText.pageCount("not a pdf at all".getBytes) == 0)
    assert(PdfText.extractPageParagraphs(Array.fill[Byte](256)(0x7f)) == Nil)
  }

  test("long two-line paragraph chunks with the 500/450/50 window rules") {
    val l1 = ("alpha beta gamma delta epsilon zeta " * 9).trim // 323 chars
    val l2 = ("omega psi chi phi upsilon tau sigma " * 9).trim
    val page =
      s"""BT /F1 12 Tf 72 720 Td 14 TL ($l1) Tj T* ($l2) Tj ET
         |""".stripMargin
    val dir = Files.createTempDirectory("graft_pdf_long").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "long.pdf"),
      PdfFixtures.buildPdf(Seq(page), compress = true))
    val rows = PdfText.extractChunks(spark, dir)
      .collect().map(r => (r.getAs[Integer]("chunk_number"), r.getAs[String]("text")))
      .sortBy(r => Option(r._1).map(_.toInt).getOrElse(0))
    val para = s"$l1 $l2"
    assert(para.length > 500)
    val expected = (0 until para.length by 450)
      .map(i => (i / 450 + 1, para.slice(i, i + 500))).filter(_._2.length >= 50)
    assert(rows.map(r => (r._1.toInt, r._2)).toSeq == expected)
  }

  test("extractChunks: distributed S1→C2 over a mixed-case fixture corpus") {
    val dir = Files.createTempDirectory("graft_pdf_corpus").toString
    PdfFixtures.writeFixtureDir(dir)
    val rows = PdfText.extractChunks(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("page_number"),
        r.getAs[Int]("paragraph_number"), r.getAs[Int]("total_pages"),
        r.getAs[String]("text"))).toSet
    val expected = Set(
      ("a.pdf", 1, 1, 2, PdfFixtures.fixtureParagraphs.head.head),
      ("a.pdf", 1, 2, 2, PdfFixtures.fixtureParagraphs.head(1)),
      ("a.pdf", 2, 1, 2, PdfFixtures.fixtureParagraphs(1).head),
      ("B.PDF", 1, 1, 1, PdfFixtures.companionParagraph),
      ("cjk.pdf", 1, 1, 1, PdfFixtures.cjkParagraphs.head.head),
      ("cjk.pdf", 1, 2, 1, PdfFixtures.cjkParagraphs.head(1)),
      ("m.pdf", 1, 1, 1, PdfFixtures.objStmParagraph),
      ("lzw.pdf", 1, 1, 1, PdfFixtures.lzwParagraph),
      ("rle.pdf", 1, 1, 1, PdfFixtures.rleParagraph),
      ("a85.pdf", 1, 1, 1, PdfFixtures.a85Paragraph),
      ("xr.pdf", 1, 1, 1, PdfFixtures.xrefParagraph),
      ("rc4.pdf", 1, 1, 1, PdfFixtures.rc4Paragraph),
      ("aes.pdf", 1, 1, 1, PdfFixtures.aesParagraph),
      ("aes256.pdf", 1, 1, 1, PdfFixtures.aes256Paragraph),
      ("m_enc.pdf", 1, 1, 1, PdfFixtures.encObjStmParagraph),
      ("xr_enc.pdf", 1, 1, 1, PdfFixtures.encXrefParagraph),
      ("gb.pdf", 1, 1, 1, PdfFixtures.predefParagraph),
      ("diff.pdf", 1, 1, 1, PdfFixtures.diffParagraph))
    assert(rows == expected) // notes.txt never parsed; .PDF case-insensitive
  }

  test("encrypted PDFs: RC4-40/128 and AES-128 with empty user password decrypt") {
    assert(PdfText.extractPageParagraphs(
      PdfFixtures.buildEncryptedPdf(PdfFixtures.rc4FortyParagraph, "rc4-40"))
      == Seq(Seq(PdfFixtures.rc4FortyParagraph)))
    assert(PdfText.extractPageParagraphs(
      PdfFixtures.buildEncryptedPdf(PdfFixtures.rc4Paragraph, "rc4-128"))
      == Seq(Seq(PdfFixtures.rc4Paragraph)))
    // AES over a COMPRESSED stream: decrypt must run before inflate
    assert(PdfText.extractPageParagraphs(
      PdfFixtures.buildEncryptedPdf(PdfFixtures.aesParagraph, "aes-128", compress = true))
      == Seq(Seq(PdfFixtures.aesParagraph)))
    // AES-256 / R6 (PDF 2.0): the iterated-SHA-2 key schedule, file key
    // used directly (no per-object derivation)
    assert(PdfText.extractPageParagraphs(
      PdfFixtures.buildEncryptedPdf(PdfFixtures.aes256Paragraph, "aes-256"))
      == Seq(Seq(PdfFixtures.aes256Paragraph)))
  }

  test("encrypted ObjStm: decryption runs before the packed table expands") {
    val bytes = PdfFixtures.buildEncryptedObjStmPdf()
    assert(PdfText.pageCount(bytes) == 1)
    assert(PdfText.extractPageParagraphs(bytes)
      == Seq(Seq(PdfFixtures.encObjStmParagraph)))
  }

  test("encrypted xref-stream file: indirect length resolves, then streams decrypt") {
    val bytes = PdfFixtures.buildEncryptedXrefPdf()
    assert(PdfText.pageCount(bytes) == 1)
    assert(PdfText.extractPageParagraphs(bytes)
      == Seq(Seq(PdfFixtures.encXrefParagraph)))
  }

  test("nonzero-generation encrypted objects decrypt (key salts in the generation)") {
    // incremental-update files carry nonzero generations; the RC4/AES
    // per-object key salts in them, so dropping the generation decrypts
    // those streams to garbage
    for (mode <- Seq("rc4-128", "aes-128")) {
      val bytes = PdfFixtures.buildEncryptedPdf(
        PdfFixtures.rc4Paragraph, mode, compress = false, contentGen = 3)
      assert(PdfText.extractPageParagraphs(bytes) ==
        Seq(Seq(PdfFixtures.rc4Paragraph)), mode)
    }
  }

  test("V4 file whose /CF subdict precedes the file /Length still derives the right key") {
    // the crypt filter's /Length is a BYTE count (16); matched first it
    // would masquerade as a 16-BIT file key length and break the /U check
    val base = new String(
      PdfFixtures.buildEncryptedPdf(PdfFixtures.aesParagraph, "aes-128", compress = false),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val orig = "/Length 128 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
    val swapped = "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /Length 128"
    assert(base.contains(orig), "fixture drift: /Encrypt dict layout changed")
    val out = base.replace(orig, swapped)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfText.extractPageParagraphs(out) == Seq(Seq(PdfFixtures.aesParagraph)))
  }

  test("encrypted PDF with a real (non-empty) user password degrades to no text") {
    // Flip a /U byte: the empty-password check fails, so no decryptor
    // exists and the Flate stream stays ciphertext → no paragraphs,
    // no crash (the documented out-of-scope contract).
    val bytes = PdfFixtures.buildEncryptedPdf(PdfFixtures.rc4Paragraph, "rc4-128")
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val uAt = s.indexOf("/U <") + 4
    bytes(uAt) = (if (bytes(uAt) == '0') '1' else '0').toByte
    assert(PdfText.pageCount(bytes) == 1) // structure still parses
    assert(PdfText.extractPageParagraphs(bytes).flatten.isEmpty)
  }

  test("independently generated encrypted files decrypt (Python hashlib+cryptography pin)") {
    // These two files were produced by a SEPARATE generator (Python:
    // hashlib MD5, its own RC4, the cryptography package's AES-CBC) —
    // a derivation bug shared between PdfFixtures' encryptor and
    // PdfCrypt's decryptor cannot self-certify through them.
    val rc4B64 =
      "JVBERi0xLjQKMSAwIG9iago8PCAvVHlwZSAvQ2F0YWxvZyAvUGFnZXMgMiAwIFIgPj4KZW5kb2JqCjIgMCBvYmoKPDwgL1R5cGUgL1BhZ2VzIC9LaWRzIFszIDAgUl0gL0NvdW50IDEgL01lZGlhQm94IFswIDAgNjEyIDc5Ml0gPj4KZW5kb2JqCjMgMCBvYmoKPDwgL1R5cGUgL1BhZ2UgL1BhcmVudCAyIDAgUiAvQ29udGVudHMgNCAwIFIgL1Jlc291cmNlcyA8PCAvRm9udCA8PCAvRjEgNSAwIFIgPj4gPj4gPj4KZW5kb2JqCjQgMCBvYmoKPDwgL0xlbmd0aCAxMDIgL0ZpbHRlciAvRmxhdGVEZWNvZGUgPj4Kc3RyZWFtCqzAICbqTbRZu1xCN6G9B8AVqTzKdUX8hhvxlwsNUJ2zLocNSf+uN2unqrPmZedRgXSvhKaAhlnmcJaqy3712WSABw/dF+W2HuMNwAaosgvAXBIse4YSiISLGmTD9znX6PKJO7Yo3wplbmRzdHJlYW0KZW5kb2JqCjUgMCBvYmoKPDwgL1R5cGUgL0ZvbnQgL1N1YnR5cGUgL1R5cGUxIC9CYXNlRm9udCAvSGVsdmV0aWNhID4+CmVuZG9iago2IDAgb2JqCjw8IC9GaWx0ZXIgL1N0YW5kYXJkIC9WIDIgL1IgMyAvTGVuZ3RoIDEyOCAvTyA8MzY0NTFCRDM5RDc1M0I3QzFEMTA5MjJDMjhFNjY2NUFBNEYzMzUzRkIwMzQ4QjUzNjg5M0UzQjFEQjVDNTc5Qj4gL1UgPDE0QTUxMUIyMTBCNzE2RUIxRTU5Nzk3NjFFNUVDMzQ2MDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDA+IC9QIC00NCA+PgplbmRvYmoKeHJlZgowIDcKMDAwMDAwMDAwMCA2NTUzNSBmIAowMDAwMDAwMDA5IDAwMDAwIG4gCjAwMDAwMDAwNTggMDAwMDAgbiAKMDAwMDAwMDEzOSAwMDAwMCBuIAowMDAwMDAwMjQxIDAwMDAwIG4gCjAwMDAwMDA0MTUgMDAwMDAgbiAKMDAwMDAwMDQ4NSAwMDAwMCBuIAp0cmFpbGVyCjw8IC9TaXplIDcgL1Jvb3QgMSAwIFIgL0VuY3J5cHQgNiAwIFIgL0lEIFs8MDUwQzEzMUEyMTI4MkYzNjNENDQ0QjUyNTk2MDY3NkU+IDwwNTBDMTMxQTIxMjgyRjM2M0Q0NDRCNTI1OTYwNjc2RT5dID4+CnN0YXJ0eHJlZgo2OTMKJSVFT0YK"
    val aesB64 =
      "JVBERi0xLjQKMSAwIG9iago8PCAvVHlwZSAvQ2F0YWxvZyAvUGFnZXMgMiAwIFIgPj4KZW5kb2JqCjIgMCBvYmoKPDwgL1R5cGUgL1BhZ2VzIC9LaWRzIFszIDAgUl0gL0NvdW50IDEgL01lZGlhQm94IFswIDAgNjEyIDc5Ml0gPj4KZW5kb2JqCjMgMCBvYmoKPDwgL1R5cGUgL1BhZ2UgL1BhcmVudCAyIDAgUiAvQ29udGVudHMgNCAwIFIgL1Jlc291cmNlcyA8PCAvRm9udCA8PCAvRjEgNSAwIFIgPj4gPj4gPj4KZW5kb2JqCjQgMCBvYmoKPDwgL0xlbmd0aCAxMjggPj4Kc3RyZWFtCgcUIS47SFVib3yJlqOwvcr5cv0QLtPNNC81aLqE09R5p2bmRX6HQEZiGzjCqqUTaOI9VaCX75/532C+SWCMfWYyTVZsaaYdiWMLrTvnIrtCGuvKQr7b56ETwlVHX3f2Erq8H0y/GqEKot8eJihyxB8OBijdtzYvP8L9F8XE8+hkCmVuZHN0cmVhbQplbmRvYmoKNSAwIG9iago8PCAvVHlwZSAvRm9udCAvU3VidHlwZSAvVHlwZTEgL0Jhc2VGb250IC9IZWx2ZXRpY2EgPj4KZW5kb2JqCjYgMCBvYmoKPDwgL0ZpbHRlciAvU3RhbmRhcmQgL1YgNCAvUiA0IC9MZW5ndGggMTI4IC9DRiA8PCAvU3RkQ0YgPDwgL0NGTSAvQUVTVjIgL0xlbmd0aCAxNiA+PiA+PiAvU3RtRiAvU3RkQ0YgL1N0ckYgL1N0ZENGIC9PIDwzNjQ1MUJEMzlENzUzQjdDMUQxMDkyMkMyOEU2NjY1QUE0RjMzNTNGQjAzNDhCNTM2ODkzRTNCMURCNUM1NzlCPiAvVSA8MTRBNTExQjIxMEI3MTZFQjFFNTk3OTc2MUU1RUMzNDYwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMD4gL1AgLTQ0ID4+CmVuZG9iagp4cmVmCjAgNwowMDAwMDAwMDAwIDY1NTM1IGYgCjAwMDAwMDAwMDkgMDAwMDAgbiAKMDAwMDAwMDA1OCAwMDAwMCBuIAowMDAwMDAwMTM5IDAwMDAwIG4gCjAwMDAwMDAyNDEgMDAwMDAgbiAKMDAwMDAwMDQyMCAwMDAwMCBuIAowMDAwMDAwNDkwIDAwMDAwIG4gCnRyYWlsZXIKPDwgL1NpemUgNyAvUm9vdCAxIDAgUiAvRW5jcnlwdCA2IDAgUiAvSUQgWzwwNTBDMTMxQTIxMjgyRjM2M0Q0NDRCNTI1OTYwNjc2RT4gPDA1MEMxMzFBMjEyODJGMzYzRDQ0NEI1MjU5NjA2NzZFPl0gPj4Kc3RhcnR4cmVmCjc3MAolJUVPRgo="
    val dec = java.util.Base64.getDecoder
    assert(PdfText.extractPageParagraphs(dec.decode(rc4B64)) == Seq(Seq(
      "Independent generator confirms the stream cipher decryption path end to end.")))
    assert(PdfText.extractPageParagraphs(dec.decode(aesB64)) == Seq(Seq(
      "Independent generator confirms the block cipher decryption path end to end.")))
  }

  test("independently generated AES-256/R6 file decrypts (Python hashlib+cryptography pin)") {
    // Algorithm 2.B (the iterated SHA-256/384/512 schedule) implemented
    // a second time in Python — R6 salts, /UE unwrap, and the
    // no-per-object-key V5 stream path all cross-check.
    val aes256B64 =
      "JVBERi0yLjAKMSAwIG9iago8PCAvVHlwZSAvQ2F0YWxvZyAvUGFnZXMgMiAwIFIgPj4KZW5kb2JqCjIgMCBvYmoKPDwgL1R5cGUgL1BhZ2VzIC9LaWRzIFszIDAgUl0gL0NvdW50IDEgL01lZGlhQm94IFswIDAgNjEyIDc5Ml0gPj4KZW5kb2JqCjMgMCBvYmoKPDwgL1R5cGUgL1BhZ2UgL1BhcmVudCAyIDAgUiAvQ29udGVudHMgNCAwIFIgL1Jlc291cmNlcyA8PCAvRm9udCA8PCAvRjEgNSAwIFIgPj4gPj4gPj4KZW5kb2JqCjQgMCBvYmoKPDwgL0xlbmd0aCAxMjggL0ZpbHRlciAvRmxhdGVEZWNvZGUgPj4Kc3RyZWFtCgkaKzxNXm+AkaKzxNXm9wiZSBplRaLHSw6BplUY+j7U2qq4ZcVktTrtH+NqF+b9ow+qe/dngB030dZ1uewZjA/SX4s/vKZIdZpd4Ra/Jc1UvR0ryytLHbCQkc3vhqsX88yvZZW2xAj3x0aHKapsaKZmbRCo8+P9j+ftZ/IDTLStCmVuZHN0cmVhbQplbmRvYmoKNSAwIG9iago8PCAvVHlwZSAvRm9udCAvU3VidHlwZSAvVHlwZTEgL0Jhc2VGb250IC9IZWx2ZXRpY2EgPj4KZW5kb2JqCjYgMCBvYmoKPDwgL0ZpbHRlciAvU3RhbmRhcmQgL1YgNSAvUiA2IC9MZW5ndGggMjU2IC9DRiA8PCAvU3RkQ0YgPDwgL0NGTSAvQUVTVjMgL0xlbmd0aCAzMiA+PiA+PiAvU3RtRiAvU3RkQ0YgL1N0ckYgL1N0ZENGIC9PIDw0OUM3RDVDOEYyQThGNzhDRTlDRUNBRUUwQjI2OUFEM0IzRTI4MzdCQkFDQUI0ODEwMDM5MDQ0Q0MzMUY0Q0IyMEI0NDdEQjZFRjI4NjE5QTBCNDY4MUJDRjczMjZEQTg+IC9VIDw2MEM1QzkyOTY3NjYyRjAxM0U1RjU5MDBFMUU1OEU4RDhGMTQ1M0I0NUNENjEzRDVFQjdBQkVGNkI4REFCREM0MEIzRTcxQTRENzBBM0Q3MDBCNDA3NUFBREYxNDQ5N0U+IC9PRSA8ODA1RTJENjEwNTYzREE3QjAzN0UyNDc5OTJBOEZFMTNBMkIwQzJBMEM4Q0REMkJCNDVGNUQzODk1OUVCMzdDOD4gL1VFIDwyNTczN0IyM0RDRTYxRDYyMDNDMTY3NDk5QjAyRkE2NjY4ODdEMzBCNEQwMTQ2RDIyOEVCQzYyQUZGRUI1QUMzPiAvUGVybXMgPDNGMjg5MTREQ0JCNzY2NzU3RDY5OEFDM0ZCMEZDQjdGPiAvUCAtNDQgPj4KZW5kb2JqCnhyZWYKMCA3CjAwMDAwMDAwMDAgNjU1MzUgZiAKMDAwMDAwMDAwOSAwMDAwMCBuIAowMDAwMDAwMDU4IDAwMDAwIG4gCjAwMDAwMDAxMzkgMDAwMDAgbiAKMDAwMDAwMDI0MSAwMDAwMCBuIAowMDAwMDAwNDQxIDAwMDAwIG4gCjAwMDAwMDA1MTEgMDAwMDAgbiAKdHJhaWxlcgo8PCAvU2l6ZSA3IC9Sb290IDEgMCBSIC9FbmNyeXB0IDYgMCBSID4+CnN0YXJ0eHJlZgoxMDM5CiUlRU9GCg=="
    assert(PdfText.extractPageParagraphs(java.util.Base64.getDecoder.decode(aes256B64))
      == Seq(Seq("Independent generator confirms the iterated hash key schedule end to end.")))
  }
}
