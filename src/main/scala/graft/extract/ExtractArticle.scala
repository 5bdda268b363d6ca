package graft.extract

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused article extraction as a single Catalyst expression (SURVEY.md §5
  * escape hatch (a), exercised because profiles demanded it).
  *
  * The composed-built-in path (Extract.titleCol/bodyCol/…) calls
  * regexp_extract / get_json_object six times per page; EACH call
  * converts the page's UTF8String to a fresh java.lang.String — ~150 KB
  * of garbage per 25 KB page, which makes extraction GC-bound instead of
  * CPU-bound at high thread counts. This expression converts ONCE and
  * runs all precompiled patterns over that one String, returning the full
  * article struct. Output is byte-identical to the built-in path
  * (equivalence property-tested + the golden gate).
  *
  * Comments come back as the raw embedded JSON payload; the caller
  * parses with from_json (small strings, codegen'd).
  *
  * Codegen: emits a static call into [[ExtractArticle.evalRow]] so the
  * surrounding stage stays one whole-stage-codegen span (no interpreted
  * fallback on the per-page hot path).
  */
case class ExtractArticle(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ExtractArticle.schema
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ExtractArticle.evalRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.extract.ExtractArticle$$.MODULE$$.evalRow($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractArticle =
    copy(child = newChild)
}

object ExtractArticle {

  /** Shared eval body — called from interpreted eval AND generated code. */
  def evalRow(input: UTF8String): InternalRow = {
    val s = input.toString
    def group1(p: Pattern): String = {
      val m = p.matcher(s)
      if (m.find()) m.group(1) else ""
    }
    // Spark's trim strips ONLY 0x20 spaces; String.trim strips all
    // chars <= 0x20 — must match the composed-built-in path exactly
    val title = trimSpaces(group1(TitleP))
    val body = group1(BodyP)
    val pubM = PublishP.matcher(s)
    val publish = if (pubM.find()) tryLong(pubM.group(1)) else null
    val appM = AppMsgP.matcher(s)
    var read: Integer = null
    var like: Integer = null
    if (appM.find()) {
      val snippet = appM.group(1)
      val r = ReadP.matcher(snippet)
      if (r.find()) read = tryInt(r.group(1))
      val l = LikeP.matcher(snippet)
      if (l.find()) like = tryInt(l.group(1))
    }
    val cM = CommentsP.matcher(s)
    val commentsJson = if (cM.find()) UTF8String.fromString(cM.group(1)) else null
    InternalRow(
      UTF8String.fromString(title),
      UTF8String.fromString(body),
      publish, read, like, commentsJson)
  }

  // the same grammar as Extract.TitleRe/BodyRe/… (FIXTURES.md §1),
  // precompiled once per JVM
  private val TitleP = Pattern.compile(Extract.TitleRe, Pattern.DOTALL)
  private val BodyP = Pattern.compile(Extract.BodyRe, Pattern.DOTALL)
  private val PublishP = Pattern.compile(Extract.PublishRe)
  private val AppMsgP = Pattern.compile(Extract.AppMsgExtRe, Pattern.DOTALL)
  private val CommentsP = Pattern.compile(Extract.CommentsRe, Pattern.DOTALL)
  // within the (small) appmsgext snippet — equivalent to
  // get_json_object($.appmsgstat.read_num/like_num) on this grammar
  private val ReadP = Pattern.compile("\"read_num\"\\s*:\\s*(-?\\d+)")
  private val LikeP = Pattern.compile("\"like_num\"\\s*:\\s*(-?\\d+)")

  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  // never-throw numeric parses with the SAME digit bounds as the
  // composed path's tryNum guard (18/9 digits), so the twins agree
  private def digits(s: String): Int =
    if (s.startsWith("-")) s.length - 1 else s.length
  private def tryLong(s: String): java.lang.Long =
    if (digits(s) > 18) null
    else try java.lang.Long.valueOf(s) catch { case _: NumberFormatException => null }
  private def tryInt(s: String): Integer =
    if (digits(s) > 9) null
    else try Integer.valueOf(s) catch { case _: NumberFormatException => null }

  val schema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("body", StringType),
    StructField("publish_unix", LongType),
    StructField("read_count", IntegerType),
    StructField("like_count", IntegerType),
    StructField("comments_json", StringType)))

  /** Column bridge (Spark 4 classic API: Column no longer wraps
    * Expression directly). */
  def apply(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ExtractArticle(ColumnBridge.expression(c)))
  }
}
