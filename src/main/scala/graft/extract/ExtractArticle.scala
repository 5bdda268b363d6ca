package graft.extract

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  */
case class ExtractArticle(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ExtractArticle.schema
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    import ExtractArticle._
    def group1(p: Pattern): String = {
      val m = p.matcher(s)
      if (m.find()) m.group(1) else ""
    }
    val title = group1(TitleP).trim
    val body = group1(BodyP)
    val pubM = PublishP.matcher(s)
    val publish = if (pubM.find()) java.lang.Long.valueOf(pubM.group(1)) else null
    val appM = AppMsgP.matcher(s)
    var read: Integer = null
    var like: Integer = null
    if (appM.find()) {
      val snippet = appM.group(1)
      val r = ReadP.matcher(snippet)
      if (r.find()) read = Integer.valueOf(r.group(1))
      val l = LikeP.matcher(snippet)
      if (l.find()) like = Integer.valueOf(l.group(1))
    }
    val cM = CommentsP.matcher(s)
    val commentsJson = if (cM.find()) UTF8String.fromString(cM.group(1)) else null
    InternalRow(
      UTF8String.fromString(title),
      UTF8String.fromString(body),
      publish, read, like, commentsJson)
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractArticle =
    copy(child = newChild)
}

object ExtractArticle {
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
