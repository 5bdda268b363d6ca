package graft.frontier

import graft.checkpoint.SnapshotCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merged views over the append-only snapshot deltas (SURVEY.md §3 J5/A4).
  *
  * The crawl writes per-wave delta tables; consumers read a MERGE view:
  * last-write-wins per url_hash on (wave, publish_ts) — the upstream
  * "re-crawl updates read/like counts" semantics without rewriting
  * history (the Iceberg MERGE pattern over our snapshot layer).
  */
object ArticleStore {

  /** Latest version of every article across snapshots 0..k. */
  def articles(catalog: SnapshotCatalog, k: Int): DataFrame = {
    val w = Window.partitionBy(col("url_hash"))
      .orderBy(col("wave").desc, col("publish_ts").desc)
    catalog.readDeltasUpTo(k, "articles_delta")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Explicit upsert merge of a fresh batch onto a current table —
    * full-outer + coalesce, fresh wins (J5). Column sets must match. */
  def upsert(current: DataFrame, fresh: DataFrame): DataFrame = {
    val cols = current.columns.filter(_ != "url_hash")
    val cur = current.select(col("url_hash") +: cols.map(c => col(c).as(s"__old_$c")): _*)
    val fr = fresh.select(col("url_hash") +: cols.map(c => col(c).as(s"__new_$c")): _*)
    cur.join(fr, Seq("url_hash"), "full_outer")
      .select(col("url_hash") +: cols.map(c =>
        coalesce(col(s"__new_$c"), col(s"__old_$c")).as(c)): _*)
  }

  /** Typed comments view over the merged articles (U6): the crawl
    * stores ONE extraction product per page (articles + raw
    * comments_json); this parses the small embedded JSON on read.
    * Last-write-wins applies to comments too — a re-crawl's payload
    * replaces the old one. */
  def comments(catalog: SnapshotCatalog, k: Int): DataFrame =
    graft.extract.Extract.commentsOf(
      articles(catalog, k).select(col("url_hash"), col("comments_json")))

  /** G1 rollup: per-account crawl progress. */
  def accountStats(catalog: SnapshotCatalog, k: Int): DataFrame =
    articles(catalog, k)
      .filter(col("biz") =!= "")
      .groupBy(col("biz"))
      .agg(count(lit(1)).as("n_articles"),
        max(col("publish_ts")).as("newest_publish"),
        sum(col("read_count")).as("total_reads"),
        sum(col("like_count")).as("total_likes"))
}
