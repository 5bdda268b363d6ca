package graft

import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {

  test("custom expressions usable from SQL after registration") {
    GraftFunctions.register(spark)
    val cfg = SynthConfig(nAccounts = 2, articlesPerAccount = 5, longTail = 3)
    Synth.pages(spark, cfg).toDF()
      .filter(!col("url").contains("profile_ext"))
      .createOrReplaceTempView("pages_v")
    val rows = spark.sql(
      """SELECT url_parts(url).url_hash AS h,
                url_parts(url).biz AS biz,
                extract_article(text).title AS title,
                extract_article(text).read_count AS reads
         FROM pages_v""").collect()
    assert(rows.length === cfg.nArticles + cfg.longTail)
    rows.foreach { r =>
      assert(!r.isNullAt(0) && r.getString(2).nonEmpty && !r.isNullAt(3))
    }
    // SQL and DataFrame paths agree
    val viaDf = graft.extract.Extract.articles(spark.table("pages_v"))
      .select("url_hash").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === viaDf)
  }

  test("DotMatrix/ArgMaxDot ≡ higher-order twin, codegen'd, null-safe") {
    import spark.implicits._
    val matrix: Seq[Seq[Double]] = Seq(
      Seq(1.0, -1.0, 0.5, 0.25), Seq(-0.75, 2.0, 0.0, 1.0),
      Seq(0.1, 0.2, 0.3, 0.4))
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(-0.5f, 0.25f, -1.5f, 2.5f)),
      (3L, Array(0f, 0f, 0f, 0f)), // all-zero: tie → first row wins
      (4L, null.asInstanceOf[Array[Float]]))
    val df = vecs.toDF("id", "emb")
    val got = df.select(col("id"),
      graft.functions.DotMatrix(col("emb"), matrix).as("dots"),
      graft.functions.DotMatrix.argMax(col("emb"), matrix).as("am"),
      graft.queries.Ivf.dotsColHof(col("emb"), matrix).as("dots_hof"),
      graft.queries.Ivf.cellColHof(col("emb"), matrix).as("am_hof"))
    val rows = got.collect().sortBy(_.getLong(0))
    rows.filter(!_.isNullAt(1)).foreach { r =>
      assert(r.getSeq[Double](1) === r.getSeq[Double](3),
        s"fused dots must equal higher-order dots for id ${r.getLong(0)}")
      assert(r.getInt(2) === r.getInt(4),
        s"fused argmax must equal higher-order argmax for id ${r.getLong(0)}")
    }
    assert(rows.last.isNullAt(1) && rows.last.isNullAt(2), "null emb → null out")
    assert(rows(2).getInt(2) === 0, "exact tie keeps the first matrix row")
    // the fused expressions stay INSIDE whole-stage codegen (a parquet
    // scan — a local relation folds to LocalTableScan with no codegen
    // stage at all)
    val dir = java.nio.file.Files.createTempDirectory("dotm").toString
    vecs.filter(_._2 != null).toDF("id", "emb").write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(graft.functions.DotMatrix.argMax(col("emb"), matrix))
      .queryExecution.executedPlan.toString()
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      s"fused kernel must not break codegen:\n${plan.take(500)}")
  }

  test("DotMatrix/ArgMaxDot malformed-input contract: loud nulls, both eval paths") {
    import spark.implicits._
    val matrix: Seq[Seq[Double]] = Seq(Seq(1.0, 2.0, 3.0), Seq(-1.0, 0.5, 0.0))
    // (id, emb): 1 = well-formed, 2 = SHORT (dim mismatch), 3 = LONG,
    // 4 = null element. Option[Float] elements force containsNull=true.
    val rows: Seq[(Long, Seq[Option[Float]])] = Seq(
      (1L, Seq(Some(1f), Some(2f), Some(3f))),
      (2L, Seq(Some(1f), Some(2f))),
      (3L, Seq(Some(1f), Some(2f), Some(3f), Some(4f))),
      (4L, Seq(Some(1f), None, Some(3f))))
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val got = df.select(col("id"),
        graft.functions.DotMatrix(col("emb"), matrix).as("dots"),
        graft.functions.DotMatrix.argMax(col("emb"), matrix).as("am"))
        .collect().sortBy(_.getLong(0))
      assert(!got(0).isNullAt(1) && got(0).getInt(2) === 0)
      assert(got(0).getSeq[Double](1) === Seq(14.0, 0.0))
      (1 to 3).foreach { i =>
        assert(got(i).isNullAt(1), s"id ${i + 1}: malformed emb must null dots")
        assert(got(i).isNullAt(2), s"id ${i + 1}: malformed emb must null argmax")
      }
    }
    check(rows.toDF("id", "emb")) // LocalTableScan → interpreted eval
    val dir = java.nio.file.Files.createTempDirectory("dotm-null").toString
    rows.toDF("id", "emb").write.mode("overwrite").parquet(dir)
    check(spark.read.parquet(dir)) // parquet scan → whole-stage codegen path
  }

  test("DotMatrix: empty or ragged matrix rejected at construction") {
    intercept[IllegalArgumentException] {
      graft.functions.DotMatrix.argMax(col("emb"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.functions.DotMatrix(col("emb"), Seq(Seq(1.0, 2.0), Seq(3.0)))
    }
  }
}
