package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PdfText

/** The from-scratch PDF extractor vs the committed ground truth: every
  * `sbud_pdf/<year>.pdf` fixture must extract byte-for-byte to the text
  * in `sbud/<year>.txt` it was generated from (tools/make_sbud_pdfs.py;
  * the generator deliberately rotates Tj / TJ-array / ' / Td / hex
  * spellings per line, so equality here exercises the whole operator
  * surface, multi-page breaks included). */
class PdfTextSpec extends AnyFunSuite {
  private val root = "fixtures/legiscan"
  private val years = Seq("2017", "2018", "2019", "2020", "2021", "2022")

  test("every committed budget PDF extracts to its ground-truth text exactly") {
    for (y <- years) {
      val pdf = Files.readAllBytes(Paths.get(s"$root/sbud_pdf/$y.pdf"))
      val want = new String(
        Files.readAllBytes(Paths.get(s"$root/sbud/$y.txt")),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(PdfText.extract(pdf) === want, s"year $y")
    }
  }

  test("uncompressed content streams and every escape form decode") {
    // a minimal raw (no Flate) PDF body: one page, all escapes, nested
    // parens, octal, hex with odd trailing digit, and a "-operator show
    val content =
      "BT /F1 10 Tf 12 TL 72 720 Td\n" +
        "(paren \\( close \\) back\\\\slash) Tj\n" +
        "T*\n(nested (group (deep)) ok) Tj\n" +
        "[(ab) -20 <4344> (e)] TJ\n" +
        "(octal \\101\\102) '\n" +
        "1 2 (quoted) \"\n" +
        "ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val got = PdfText.extract(pdf)
    assert(got ===
      "paren ( close ) back\\slash\n" +
        "nested (group (deep)) okabCDe\n" +
        "octal AB\n" +
        "quoted")
  }

  test("property: random text round-trips through a Flate PDF exactly") {
    // independent in-test writer (NOT the Python generator): random
    // printable-ASCII lines — parens, backslashes, brackets included,
    // which the committed fixtures never contain — one (line) Tj per
    // line, Deflater-compressed, paginated every 4 lines
    val rnd = new scala.util.Random(12021)
    def randomLine(): String = {
      val n = rnd.nextInt(60)
      (0 until n).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 6) '(' else if (r < 12) ')' else if (r < 16) '\\'
        else if (r < 20) '[' else if (r < 24) ']'
        else (32 + rnd.nextInt(95)).toChar
      }.mkString
    }
    def esc(s: String): String = s
      .replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    def flate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    def pdf(lines: Seq[String]): Array[Byte] = {
      val pages = lines.grouped(4).toSeq
      val body = pages.map { pl =>
        val content = ("BT /F1 10 Tf 12 TL 72 720 Td\n" +
          pl.zipWithIndex.map { case (l, j) =>
            (if (j == 0) "" else "T*\n") + "(" + esc(l) + ") Tj\n"
          }.mkString + "ET\n")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val z = flate(content)
        ("<< /Filter /FlateDecode /Length " + z.length + " >>\nstream\n")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
          z ++ "\nendstream\n".getBytes
      }
      "%PDF-1.4\n".getBytes ++ body.flatten.toArray ++ "%%EOF\n".getBytes
    }
    for (trial <- 1 to 25) {
      val lines = (0 until (1 + rnd.nextInt(11))).map(_ => randomLine())
      val got = PdfText.extract(pdf(lines))
      assert(got === lines.mkString("\n"), s"trial $trial round-trip drifted")
    }
  }

  test("property: multi-stream files with MIXED filters round-trip exactly") {
    // one file, many stream objects, each independently raw or Flate
    // (both with a direct /Length — the raw body may contain parens
    // and brackets; the Flate body may contain ANY bytes, including
    // the `endstream` sequence, which /Length must arbitrate); the
    // show operator rotates Tj / TJ-array / ' per line — the
    // combination surface the single-filter fuzz never hits
    val rnd = new scala.util.Random(13013)
    def randomLine(): String = {
      val n = 1 + rnd.nextInt(50)
      (0 until n).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 6) '(' else if (r < 12) ')' else if (r < 16) '\\'
        else if (r < 20) '[' else if (r < 24) ']'
        else (32 + rnd.nextInt(95)).toChar
      }.mkString
    }
    def esc(s: String): String = s
      .replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    def flate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    def show(l: String, j: Int): String = rnd.nextInt(3) match {
      case 0 => (if (j == 0) "" else "T*\n") + "(" + esc(l) + ") Tj\n"
      case 1 => (if (j == 0) "" else "T*\n") + "[(" + esc(l) + ") -12] TJ\n"
      case _ => "(" + esc(l) + ") '\n" // ' = T* + show in one operator
    }
    def streamObj(lines: Seq[String], idx: Int): Array[Byte] = {
      val content = ("BT /F1 10 Tf 12 TL 72 720 Td\n" +
        lines.zipWithIndex.map { case (l, j) => show(l, j) }.mkString +
        "ET\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      if (rnd.nextBoolean()) {
        val z = flate(content)
        (s"$idx 0 obj\n<< /Filter /FlateDecode /Length ${z.length} >>\nstream\n")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
          z ++ "\nendstream\nendobj\n".getBytes
      } else
        (s"$idx 0 obj\n<< /Length ${content.length} >>\nstream\n")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
          content ++ "\nendstream\nendobj\n".getBytes
    }
    for (trial <- 1 to 25) {
      val pages = (0 until (2 + rnd.nextInt(4)))
        .map(_ => (0 until (1 + rnd.nextInt(5))).map(_ => randomLine()))
      // the ' operator emits a line break BEFORE its text like T*, so
      // expected joining is uniform newline regardless of spelling
      val body = pages.zipWithIndex.map { case (pl, i) => streamObj(pl, i + 1) }
      val pdf = "%PDF-1.4\n".getBytes ++ body.flatten.toArray ++ "%%EOF\n".getBytes
      val got = PdfText.extract(pdf)
      assert(got === pages.flatten.mkString("\n"),
        s"trial $trial mixed-filter round-trip drifted")
    }
  }

  test("CID/Type0 fixture: 2-byte codes resolve through the /ToUnicode CMap") {
    // tools/make_cid_pdf.py: glyph codes are NOT unicode values (a..z
    // live at 0x0100.., A/B/C at 0x0300.., the rest at 0x0200..), so a
    // byte-literal reading would produce garbage — equality here
    // certifies codespacerange + bfrange (offset AND list forms) +
    // bfchar parsing, the resource-name→font→CMap resolution, the Tf
    // font switch, and that page 2's CMap-less WinAnsi font still
    // reads as Latin-1 in the same file
    val pdf = Files.readAllBytes(Paths.get(s"$root/cid_pdf/sample.pdf"))
    val want = new String(
      Files.readAllBytes(Paths.get(s"$root/cid_pdf/sample.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(PdfText.extract(pdf) === want)
    assert(want.contains("résumé") && want.contains("§"),
      "ground truth must contain non-ASCII or the CMap test is weak")
  }

  test("Identity-H raw-CID fallback: a CMap-less Type0 font reads codes as Unicode") {
    // a Type0 font with /Encoding /Identity-H and NO /ToUnicode: the
    // common Identity encodings put CID == Unicode, so the reader must
    // take each 2-byte show code as its own character (poppler's
    // bundled-registry behavior) — the pre-fallback 1-byte path would
    // interleave a NUL before every Latin character and mangle
    // anything past 0xFF
    val txt = "Identity fallback résumé 你好"
    val hex = txt.map(c => f"${c.toInt}%04X").mkString
    val content = s"BT /F7 12 Tf <$hex> Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Page /Resources << /Font << /F7 2 0 R >> >> >>\nendobj\n" +
      "2 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /T1 /Encoding /Identity-H >>\nendobj\n" +
      "3 0 obj\n<< /Length " + content.length + " >>\nstream\n" + content +
      "\nendstream\nendobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(pdf) === txt)
    // a Type0 font with a NON-identity encoding and no ToUnicode gets
    // no fallback (codes are registry-specific, a raw reading would be
    // wrong): the 2-byte show string stays unmapped
    val pdf2 = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/Identity-H", "/UniJIS-UCS2-H")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!PdfText.extract(pdf2).contains("你"))
  }

  test("a direct /Length arbitrates a body containing the endstream bytes") {
    // the 9-byte sequence `endstream` INSIDE a shown string: the raw
    // scan alone would truncate the stream mid-literal; the declared
    // direct /Length (validated against the real endstream behind it)
    // must win
    val content = "BT /F1 10 Tf (text endstream text) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(pdf) === "text endstream text")
  }

  test("a wrong direct /Length falls back to the endstream scan") {
    val content = "BT /F1 10 Tf (recovered) Tj ET"
    // /Length overshoots the real extent; the validator sees no
    // endstream at the declared end and arbitration falls to the scan
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + (content.length + 500) +
      " >>\nstream\n" + content + "\nendstream\nendobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfText.extract(pdf) === "recovered")
  }

  test("malformed and non-text input extracts empty, never throws") {
    assert(PdfText.extract(null) === "")
    assert(PdfText.extract(Array.empty[Byte]) === "")
    assert(PdfText.extract("not a pdf at all".getBytes) === "")
    // a Flate stream of random bytes (undecodable) is skipped
    val junk = ("x\nstream\n\nendstream\n" +
      "<< /Filter /FlateDecode >>\nstream\nÿþ\nendstream\n").getBytes
    assert(PdfText.extract(junk) === "")
  }
}
