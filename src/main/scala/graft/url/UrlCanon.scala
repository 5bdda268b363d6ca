package graft.url

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization + hashing (SURVEY.md §3 S1/S2, SNIPPETS-free).
  *
  * Identity of a crawled page is the canonicalized URL:
  *   - scheme and host lowercased
  *   - fragment dropped
  *   - volatile/tracking query params dropped (the mp.weixin-style
  *     `uin,key,pass_ticket,chksm,scene,…` set — FIXTURES.md §1)
  *   - surviving query params sorted lexicographically
  *   - empty path normalized to "/"
  *
  * Two implementations that MUST agree (property-tested):
  *   - [[canonicalCol]]: pure Catalyst built-ins (parse_url / filter /
  *     array_sort / concat) — whole-stage-codegen-friendly, used in the
  *     distributed pipeline.
  *   - [[canonicalize]]: plain Scala, used in tests and driver-side code.
  *
  * The 64-bit identity hash is Spark's `xxhash64` (seed 42); the Scala
  * twin calls the same catalyst hash function so values are identical.
  */
object UrlCanon {

  /** Query params that do not contribute to URL identity. */
  val VolatileParams: Set[String] = Set(
    "uin", "key", "pass_ticket", "chksm", "scene",
    "devicetype", "version", "nettype", "ascene", "wx_header")

  // (=|$): a valueless volatile param ("?uin") must strip like "?uin=x"
  // — the Scala twin keys on the name alone, so must the column form
  private val volatileRe = s"^(${VolatileParams.mkString("|")})(=|$$)"

  // ---------------------------------------------------------------- column

  /** Catalyst-native canonicalizer over a URL column. */
  def canonicalCol(u: Column): Column = {
    // try_parse_url: Spark 4's parse_url THROWS on an invalid URL — one
    // malformed discovered link must not kill a 1000-executor wave
    val proto = lower(try_parse_url(u, lit("PROTOCOL")))
    val host = lower(try_parse_url(u, lit("HOST")))
    val rawPath = try_parse_url(u, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", lit("/")).otherwise(rawPath)
    val query = try_parse_url(u, lit("QUERY"))
    val kept = array_sort(filter(split(query, "&"),
      p => !(p.rlike(volatileRe) || p === "")))
    val qs = array_join(kept, "&")
    val base = concat(proto, lit("://"), host, path)
    // unparseable URL (null proto/host) → raw url, matching the Scala
    // twin's URISyntaxException fallback
    coalesce(
      when(query.isNull || qs.isNull || qs === "", base)
        .otherwise(concat(base, lit("?"), qs)),
      u)
  }

  /** 64-bit identity hash of the canonical URL (xxhash64, seed 42). */
  def urlHashCol(u: Column): Column = xxhash64(canonicalCol(u))

  /** Host of the raw URL (politeness / robots key). */
  def hostCol(u: Column): Column = lower(try_parse_url(u, lit("HOST")))

  // ---------------------------------------------------------------- scala

  /** Pure-Scala twin of [[canonicalCol]]; must produce identical output. */
  def canonicalize(url: String): String = {
    val uri =
      try new java.net.URI(url)
      catch { case _: java.net.URISyntaxException => return url }
    val proto = Option(uri.getScheme).map(_.toLowerCase).getOrElse(return url)
    val host = Option(uri.getHost).map(_.toLowerCase).getOrElse(return url)
    val rawPath = Option(uri.getRawPath).getOrElse("")
    val path = if (rawPath.isEmpty) "/" else rawPath
    val query = Option(uri.getRawQuery)
    val base = s"$proto://$host$path"
    query match {
      case None => base
      case Some(q) =>
        val kept = q.split("&", -1).toSeq
          .filter(p => p.nonEmpty && !VolatileParams.contains(p.takeWhile(_ != '=')))
          .sorted(Utf8Ordering)
        if (kept.isEmpty) base else base + "?" + kept.mkString("&")
    }
  }

  /** UTF-8 byte order, matching Catalyst's UTF8String/array_sort binary
    * comparison — String.sorted (UTF-16 code-unit order) diverges for
    * params mixing U+E000..U+FFFF with supplementary-plane characters. */
  private val Utf8Ordering: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def host(url: String): String =
    try Option(new java.net.URI(url).getHost).map(_.toLowerCase).orNull
    catch { case _: java.net.URISyntaxException => null }

  /** Scala twin of Spark's xxhash64 (same seed, same UTF8 bytes). */
  def urlHash(url: String): Long = hashOf(canonicalize(url))

  /** xxhash64 of an ALREADY-canonical string. */
  def hashOf(canonical: String): Long =
    XxHash64Function.hash(UTF8String.fromString(canonical), StringType, 42L)
      .asInstanceOf[Long]
}
