package graft.expressions

import java.security.MessageDigest
import java.util.regex.Pattern

/** Shared per-row text kernel for the native expressions: the ONE
  * tokenizer and md5-top-16-bits hash that must stay bit-identical to
  * the built-in spellings (`tokens()` / `md5Bits16` in
  * `graft.functions`). Centralized so a semantics change (e.g. the
  * whitespace class) cannot silently diverge one copy — every native
  * expression's parity guarantee routes through here.
  */
private[expressions] object TextKernel {
  /** Precompiled — `String.split("\\s+")`'s fast path only covers
    * single literal chars, so the naive call recompiles the pattern
    * per row. Callers must still skip empty tokens (a leading
    * separator yields one). */
  private val Ws: Pattern = Pattern.compile("\\s+")

  def tokenize(text: String): Array[String] = Ws.split(text)

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First two md5 digest bytes big-endian == `md5Bits16`'s first four
    * hex nibbles. */
  def hash16(token: String): Int = {
    val md = digest.get()
    md.reset()
    val d = md.digest(token.getBytes("UTF-8"))
    ((d(0) & 0xff) << 8) | (d(1) & 0xff)
  }

  /** First 15 md5 hex nibbles big-endian (60 bits — the widest prefix
    * that fits a signed long without sign games): bytes 0..6 plus byte
    * 7's high nibble. The Spark built-in twin is
    * `conv(substring(md5(t), 1, 15), 16, 10)`; the DuckDB twin is
    * 15-nibble hex arithmetic. */
  def hash60(token: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(token.getBytes("UTF-8"))
    var v = 0L
    var b = 0
    while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }
}
