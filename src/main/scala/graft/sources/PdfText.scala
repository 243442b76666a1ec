package graft.sources

import java.util.zip.Inflater

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** From-scratch PDF text extraction — the real S6/F12 surface
  * (reference: `legiscan_main.R:84`, `pdf_text()` via poppler), built on
  * nothing but the JDK: `java.util.zip.Inflater` decodes FlateDecode
  * streams and a small content-stream interpreter replays the text
  * operators. No PDF library exists in this container (COVERAGE.md S6
  * documents the failed PDFBox resolve), so the codec itself is
  * implemented here rather than stubbed.
  *
  * Scope: the text-showing subset of the content-stream grammar —
  * literal strings (all escapes, nested parens), hex strings, arrays,
  * and the operators `Tj`, `TJ`, `'`, `"`, `T*`, `Td`/`TD` (downward
  * moves read as line breaks), inside `BT`/`ET` blocks. This covers
  * text-first PDFs from standard generators (the legislative-document
  * case); PDFs that need font CMap resolution (CID/Type0 subsetting)
  * are out of scope and extract as empty rather than throwing.
  *
  * Scale shape: a pure `Array[Byte] => String` function applied per
  * row of a `binaryFile` scan — embarrassingly parallel, no shuffle,
  * no state; the UDF spelling is deliberate (a byte-level parser has
  * no codegen win, and the reference's own spelling is a native
  * library call).
  */
object PdfText {

  /** Extract text from one PDF byte array. Never throws: malformed
    * input yields the text of whatever streams did parse ("" at
    * worst). Pages (content streams with text) join with `\n`. */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    val pages = streams(bytes).flatMap { case (dict, raw) =>
      val data =
        if (dict.contains("/FlateDecode")) inflate(raw)
        else Some(raw)
      data.flatMap { d =>
        val s = new String(d, java.nio.charset.StandardCharsets.ISO_8859_1)
        if (s.contains("BT")) {
          val t = runContent(s)
          if (t.nonEmpty) Some(t) else None
        } else None
      }
    }
    pages.mkString("\n")
  }

  /** Spark column spelling: `pdf_text(content)` over a binaryFile scan. */
  val pdfText: Column => Column = {
    val u = udf((b: Array[Byte]) => extract(b))
    (c: Column) => u(c)
  }

  // ----------------------------------------------------------------- //

  /** All (dictionary-text, raw-stream-bytes) pairs in the file. The
    * stream body runs from the EOL after the `stream` keyword to the
    * EOL before `endstream` — /Length is NOT trusted (it may be an
    * indirect reference). */
  private def streams(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer.empty[(String, Array[Byte])]
    var from = 0
    while (from < s.length) {
      val at = s.indexOf("stream", from)
      if (at < 0) { from = s.length }
      else if (at + 6 <= s.length &&
        (s.startsWith("streams", at) || (at > 0 && s.charAt(at - 1) == 'd'))) {
        // "endstream" (preceded by 'd') or an unrelated word — skip
        from = at + 6
      } else {
        var b = at + 6
        if (b < s.length && s.charAt(b) == '\r') b += 1
        if (b < s.length && s.charAt(b) == '\n') b += 1
        val end = s.indexOf("endstream", b)
        if (end < 0) { from = s.length }
        else {
          var e = end
          if (e > b && s.charAt(e - 1) == '\n') e -= 1
          if (e > b && s.charAt(e - 1) == '\r') e -= 1
          val dictStart = s.lastIndexOf("<<", at)
          val dict = if (dictStart >= 0) s.substring(dictStart, at) else ""
          out += ((dict, bytes.slice(b, e)))
          from = end + 9
        }
      }
    }
    out.toSeq
  }

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return Some(out.toByteArray)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** Replay a content stream's text operators. */
  private def runContent(s: String): String = {
    val text = new StringBuilder
    val strings = ArrayBuffer.empty[String]   // pending string operands
    val numbers = ArrayBuffer.empty[Double]   // pending numeric operands
    var inText = false
    var lineOpen = false                       // text emitted on current line
    var i = 0

    def newline(): Unit = { text.append('\n'); lineOpen = false }
    def show(str: String): Unit = { text.append(str); lineOpen = true }
    def clear(): Unit = { strings.clear(); numbers.clear() }

    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, next) = literal(s, i + 1)
        strings += str; i = next
      } else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') {
        i = s.indexOf(">>", i + 2) match { case -1 => s.length; case j => j + 2 }
      } else if (c == '<') {
        val (str, next) = hexString(s, i + 1)
        strings += str; i = next
      } else if (c == '[' || c == ']') {
        i += 1 // TJ arrays: strings already accumulate in order
      } else if (c == '/') {
        i += 1
        while (i < s.length && !delim(s.charAt(i))) i += 1
      } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
        val start = i
        i += 1
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        try numbers += s.substring(start, i).toDouble
        catch { case _: NumberFormatException => () }
      } else if (c == '\'') {
        // move-to-next-line-and-show: the move is a break only once
        // text exists — the first show of a block must not lead with \n
        if (inText) { if (lineOpen) newline(); strings.foreach(show) }
        clear(); i += 1
      } else if (c == '"') {
        if (inText) { if (lineOpen) newline(); strings.lastOption.foreach(show) }
        clear(); i += 1
      } else if (c.isLetter || c == '*') {
        val start = i
        i += 1
        while (i < s.length &&
          (s.charAt(i).isLetter || s.charAt(i) == '*' || s.charAt(i).isDigit))
          i += 1
        s.substring(start, i) match {
          case "BT" => inText = true; clear()
          case "ET" => inText = false; clear()
          case "Tj" | "TJ" =>
            if (inText) strings.foreach(show)
            clear()
          case "T*" =>
            if (inText && lineOpen) newline()
            clear()
          case "Td" | "TD" =>
            // a downward move is a line advance; the block-opening
            // positive move is positioning, not a break
            if (inText && lineOpen && numbers.length >= 2 && numbers.last < 0)
              newline()
            clear()
          case _ => clear()
        }
      } else i += 1
    }
    text.toString
  }

  private def delim(c: Char): Boolean =
    c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0

  /** Literal string body starting AFTER the opening paren; returns
    * (decoded, index after closing paren). */
  private def literal(s: String, start: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = start
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '(' => out.append('('); i += 2
          case ')' => out.append(')'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' =>
            i += 2
            if (i < s.length && s.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < s.length && j < i + 4 &&
              s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            out.append(v.toChar); i = j
          case other => out.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; out.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) out.append(c)
        i += 1
      } else { out.append(c); i += 1 }
    }
    (out.toString, i)
  }

  /** Hex string body starting AFTER `<`; returns (decoded, index after
    * `>`). Odd trailing digit pads with 0 per spec. */
  private def hexString(s: String, start: Int): (String, Int) = {
    val out = new StringBuilder
    var i = start
    var hi = -1
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { out.append(((hi << 4) | d).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.append((hi << 4).toChar)
    (out.toString, if (i < s.length) i + 1 else i)
  }
}
