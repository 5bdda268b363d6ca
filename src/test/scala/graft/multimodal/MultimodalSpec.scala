package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val assets = Multimodal.assetsFromDocuments(spark, "/root/testdata/sf0.001")

  test("featurize preserves ids, emits fixed-dim features, deterministic") {
    val f1 = Multimodal.featurize(assets).cache()
    assert(f1.count() === assets.count())
    val rows = f1.collect()
    rows.foreach { r =>
      assert(r.feature.length === Multimodal.FeatureDim)
      assert(r.n_bytes > 0 && r.width >= 16 && r.height >= 16 && r.n_frames >= 1)
    }
    // deterministic across partitioning
    val f2 = Multimodal.featurize(assets.repartition(7)).collect()
    val m1 = rows.map(r => r.asset_id -> r.feature.toSeq).toMap
    f2.foreach(r => assert(m1(r.asset_id) === r.feature.toSeq))
    f1.unpersist()
  }

  test("kind drives frame counts; frame sampling explodes every k-th frame") {
    val f = Multimodal.featurize(assets).toDF().cache()
    assert(f.filter($"kind" === "image").agg(max($"n_frames")).as[Int].head() === 1)
    val sampled = Multimodal.sampleFrames(f, everyK = 10)
    val chk = sampled.groupBy("asset_id").count()
      .join(f.filter($"kind" === "video"), Seq("asset_id"))
      .withColumn("expect", ceil($"n_frames".cast("double") / 10.0))
      .filter($"count" =!= $"expect")
    assert(chk.count() === 0)
    f.unpersist()
  }
}
