package graft

import graft.extract.ExtractArticle
import graft.url.UrlParts
import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql` users get the same fused operators as the DataFrame API:
  *
  *   SELECT url_parts(url).url_hash, extract_article(text).title FROM pages
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "url_parts", exprs => UrlParts(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "extract_article", exprs => ExtractArticle(exprs.head), "scala_udf")
  }
}
