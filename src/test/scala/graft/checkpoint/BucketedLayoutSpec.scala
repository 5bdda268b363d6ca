package graft.checkpoint

import graft.SparkSpec
import graft.frontier.Wave
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.functions._

/** Pins the cluster-scale join physics: with BOTH sides persisted
  * bucketed by url_hash and broadcast joins disabled, the fetch join
  * (and by the same layout, the seen-confirm join) is a SortMergeJoin
  * with ZERO shuffle exchanges — the page text never moves. This is the
  * plan a 10^10-row frontier runs; round 2 only claimed it in comments.
  */
class BucketedLayoutSpec extends SparkSpec {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString()
  }

  test("bucketed fetch join: SortMergeJoin with zero exchanges, text never shuffles") {
    val cfg = SynthConfig(nAccounts = 4, articlesPerAccount = 6, longTail = 40)
    val idx = Wave.pageIndex(Synth.pages(spark, cfg).toDF())
    val frontier = Synth.seedFrontier(spark, cfg).toDF()
      .select(col("url_hash"), col("url"), col("kind"), col("wave"))

    BucketedLayout.writeBucketed(idx, "pages_bkt", buckets = 8)
    BucketedLayout.writeBucketed(frontier, "frontier_bkt", buckets = 8)
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedLayout.fetchJoin(spark, "frontier_bkt", "pages_bkt")
      val plan = finalPlan(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1200)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n${plan.take(1200)}")
      assert(!plan.contains("BroadcastHashJoin"))
      // the layout also satisfies the seen-confirm join shape: a
      // url_hash semi-join against the bucketed seen table is exchange-
      // free on the bucketed side too
      BucketedLayout.writeBucketed(
        frontier.select("url_hash"), "seen_bkt", buckets = 8)
      val confirm = spark.table("frontier_bkt")
        .join(spark.table("seen_bkt"), Seq("url_hash"), "left_anti")
      val confirmPlan = finalPlan(confirm)
      assert(!confirmPlan.contains("Exchange"),
        s"bucketed anti-join must be shuffle-free:\n${confirmPlan.take(1200)}")
      // and the join is CORRECT: same rows as the logical join
      val expected = frontier.join(idx.select("url_hash", "text"), Seq("url_hash")).count()
      assert(BucketedLayout.fetchJoin(spark, "frontier_bkt", "pages_bkt").count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
      Seq("pages_bkt", "frontier_bkt", "seen_bkt")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
