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
}
