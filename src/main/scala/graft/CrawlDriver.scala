package graft

import graft.checkpoint.SnapshotCatalog
import graft.frontier.Wave
import graft.seen.SeenState
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-wave crawl loop over a snapshot catalog (SURVEY.md §8 step 8).
  *
  * Snapshot 0 holds the seed state (frontier, budgets, robots, empty
  * sketches); snapshot k+1 holds wave k's outputs. Each wave reads ONLY
  * from committed snapshots and the immutable pages table, so a killed
  * run resumes from `catalog.latest` and — everything downstream being a
  * pure function of that state — replays the exact crawl ordering
  * (BASELINE.json north_rule replay gate).
  */
object CrawlDriver {

  final case class RunConfig(
      checkpointDir: String,
      nWaves: Int = 3,
      /** run-level seen-sketch capacity (10^10 at cluster scale). */
      seenCapacity: Long = 1000000L,
      nShards: Int = 16,
      waveCfg: Wave.WaveConfig = Wave.WaveConfig(),
      runId: String = "run-0")

  /** Commit snapshot 0 from seed tables. */
  def init(
      spark: SparkSession,
      catalog: SnapshotCatalog,
      frontier0: DataFrame,
      robots: DataFrame,
      budgets: DataFrame,
      cfg: RunConfig): Unit = {
    import spark.implicits._
    val emptyFetched = Seq.empty[graft.model.CrawlOrder].toDS().toDF()
      .withColumn("host", lit("")).withColumn("partition_id", lit(0))
    catalog.commit(0, wave = -1,
      tables = Map(
        "frontier" -> frontier0,
        "fetched" -> emptyFetched,
        "robots" -> robots,
        "budgets" -> budgets),
      sketch = Some(SeenState.empty(cfg.seenCapacity, cfg.nShards).serialize()),
      meta = Map("run_id" -> cfg.runId))
  }

  /** Run wave k (reading snapshot k, committing snapshot k+1).
    * Returns (fetched, extracted, frontierNext) counts. */
  def runWave(
      spark: SparkSession,
      catalog: SnapshotCatalog,
      pagesIdx: DataFrame,
      k: Int,
      cfg: RunConfig): (Long, Long, Long) = {
    val t0 = System.nanoTime()
    val frontier = catalog.readTable(k, "frontier")
    val seenExact = catalog.readDeltasUpTo(k, "fetched").select("url_hash")
    val state = SeenState.deserialize(catalog.readSketch(k).get)
    val robots = catalog.readTable(0, "robots")
    val budgets = catalog.readTable(0, "budgets")

    val r = Wave.run(spark, k, frontier, seenExact, state, robots, budgets,
      pagesIdx, cfg.waveCfg)

    // sketch build + extracted count are independent jobs → concurrent
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fNewState = Future(SeenState.build(r.fetched.select("url_hash"),
      "url_hash", cfg.seenCapacity, cfg.nShards))
    val fExtracted = Future(r.articles.count())
    state.mergeInPlace(Await.result(fNewState, Duration.Inf))
    val extracted = Await.result(fExtracted, Duration.Inf)

    val wallMs = (System.nanoTime() - t0) / 1000000L
    val metrics = Wave.metrics(cfg.runId, k, r.decisions, r.dedupedCount,
      r.deniedCount, extracted, wallMs)

    val counts = catalog.commit(k + 1, wave = k,
      tables = Map(
        "frontier" -> r.frontierNext,
        "fetched" -> r.fetched,
        "articles_delta" -> r.articles,
        "comments_delta" -> r.comments,
        "denied" -> r.denied.select("url_hash", "url", "host"),
        "metrics" -> metrics),
      sketch = Some(state.serialize()),
      meta = Map("run_id" -> cfg.runId))

    val fetched = counts("fetched")
    r.cached.foreach(_.unpersist())
    val totalMs = (System.nanoTime() - t0) / 1000000L
    System.err.println(s"[wave $k] wall=${totalMs}ms (pre-commit=${wallMs}ms) " +
      s"fetched=$fetched extracted=$extracted")
    (fetched, extracted, counts("frontier"))
  }

  /** Resume-aware loop: picks up from the latest committed snapshot and
    * stops early when the frontier drains. */
  def run(spark: SparkSession, catalog: SnapshotCatalog, pagesIdx: DataFrame,
      cfg: RunConfig): Seq[(Int, Long, Long)] = {
    val start = catalog.latest.getOrElse(
      sys.error("catalog not initialized — call init() first"))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var k = start
    var frontierRows = -1L
    while (k < cfg.nWaves && frontierRows != 0L) {
      val (f, e, next) = runWave(spark, catalog, pagesIdx, k, cfg)
      out += ((k, f, e))
      frontierRows = next
      k += 1
    }
    out.toSeq
  }

  /** Standalone main: synthesize a corpus, crawl it for N waves, print a
    * summary. args: [nPages] [nWaves] [checkpointDir] */
  def main(args: Array[String]): Unit = {
    val nPages = args.lift(0).map(_.toInt).getOrElse(2000)
    val nWaves = args.lift(1).map(_.toInt).getOrElse(4)
    val dir = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-crawl").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the per-wave frontier slice is always tiny next to the pages
      // table: broadcast it instead of shuffling the whole page index
      // to disk (at cluster scale the same join is a bucketed SMJ)
      .config("spark.sql.autoBroadcastJoinThreshold", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val synthCfg = SynthConfig.forTargetRows(nPages)
    val pages = Synth.pages(spark, synthCfg).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pagesIdx = Wave.pageIndex(pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pagesIdx.count()

    val catalog = new SnapshotCatalog(dir, spark)
    val cfg = RunConfig(checkpointDir = dir, nWaves = nWaves,
      seenCapacity = math.max(nPages * 4L, 100000L))
    if (catalog.latest.isEmpty) {
      init(spark, catalog,
        Synth.seedFrontier(spark, synthCfg).toDF(),
        Synth.robots(spark, synthCfg).toDF(),
        Synth.budgets(spark, synthCfg).toDF(), cfg)
    }
    val results = run(spark, catalog, pagesIdx, cfg)
    results.foreach { case (k, f, e) =>
      println(s"[crawl] wave $k: fetched=$f extracted=$e")
    }
    val totalArticles = catalog.readDeltasUpTo(catalog.latest.get, "articles_delta").count()
    val totalSeen = catalog.readDeltasUpTo(catalog.latest.get, "fetched").count()
    println(s"[crawl] done: snapshots=${catalog.latest.get} articles=$totalArticles seen=$totalSeen dir=$dir")
    spark.stop()
  }
}
