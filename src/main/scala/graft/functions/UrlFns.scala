package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Reference URL host extraction (dbms/src/Functions/FunctionsURL.h:
  * getURLScheme:64-86, getURLHost:88-118, ExtractDomain:129-152) as a
  * single byte scan over the UTF8String — no java.net.URI, no regex.
  *
  * Semantics (byte-exact to the reference):
  *   scheme = ALPHA *(ALNUM | '+' | '-' | '.'), then ':' then "//"
  *   host   = bytes after the last '@' up to the first ':' '/' '?' '#'
  *   empty scheme/authority/host -> '' (the reference's empty
  *   substring, not NULL).
  *
  * All delimiters are ASCII, so scanning raw UTF-8 bytes is safe —
  * multi-byte sequences have the high bit set and never match.
  */
object UrlFns {
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isAlnum(b: Byte): Boolean =
    isAlpha(b) || (b >= '0' && b <= '9')

  private val Empty = UTF8String.fromString("")

  /** getURLHost + optional leading-"www." strip (ExtractDomain). */
  def host(url: UTF8String, withoutWww: Boolean): UTF8String = {
    val n = url.numBytes()
    var p = 0
    // scheme
    if (n > 0 && isAlpha(url.getByte(0))) {
      p = 1
      while (p < n && {
        val b = url.getByte(p)
        isAlnum(b) || b == '+' || b == '-' || b == '.'
      }) p += 1
    }
    // ':' then '//' must follow the scheme
    if (p >= n || url.getByte(p) != ':') return Empty
    if (n - p < 3 || url.getByte(p + 1) != '/' || url.getByte(p + 2) != '/')
      return Empty
    p += 3
    var st = p
    var brk = false
    while (p < n && !brk) {
      val b = url.getByte(p)
      if (b == '@') { st = p + 1; p += 1 }
      else if (b == ':' || b == '/' || b == '?' || b == '#') brk = true
      else p += 1
    }
    if (p == st) return Empty
    var s = st
    if (withoutWww && p - st > 4 &&
        url.getByte(st) == 'w' && url.getByte(st + 1) == 'w' &&
        url.getByte(st + 2) == 'w' && url.getByte(st + 3) == '.') s = st + 4
    // slice at ASCII boundaries — valid UTF-8 either side
    val bytes = url.getBytes // no copy when the string is array-backed
    UTF8String.fromBytes(bytes, s, p - s)
  }
}

/** `domain(url)` / `domainWithoutWWW(url)` — codegen'd byte scan. */
case class UrlHostExpr(child: Expression, withoutWww: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String =
    if (withoutWww) "domainwithoutwww" else "domain"
  override protected def nullSafeEval(input: Any): Any =
    UrlFns.host(input.asInstanceOf[UTF8String], withoutWww)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UrlFns.host($c, $withoutWww)")
  override protected def withNewChildInternal(newChild: Expression): UrlHostExpr =
    copy(child = newChild)
}
