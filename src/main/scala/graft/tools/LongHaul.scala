package graft.tools

import graft.CrawlDriver
import graft.checkpoint.{Expiry, SnapshotCatalog}
import graft.frontier.{ArticleStore, Wave}
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Long-horizon crawl smoke (round-5 verdict #6): drive the storage-
  * maintenance machinery (compaction bases + expiry + orphan cleanup)
  * through 50+ waves — an order of magnitude past what the unit specs
  * reach — and assert the two properties that make a 1000-wave crawl
  * storable:
  *
  *   1. **Checkpoint dir size plateaus.** With `compactEvery` + expiry
  *      after each run segment, durable bytes must be O(live state +
  *      delta tail), NOT O(waves × frontier): the last cycles' sizes
  *      must be flat (bounded ratio), while an expiry-less twin of the
  *      same timeline grows linearly.
  *   2. **Resume-from-late-snapshot correctness.** A catalog copied at
  *      a late, heavily-expired snapshot must replay the next refresh +
  *      re-crawl cycle IDENTICALLY (same fetched set, same article
  *      rows, same seen set) — the ExpirySpec twin discipline applied
  *      after ~50 waves of accumulated compaction/expiry history.
  *
  * Waves are sustained past frontier drain by refreshing one account
  * per cycle round-robin (retraction → re-fetch), which also keeps the
  * retraction/fetched_base interplay under load the whole horizon.
  *
  * Not part of `sbt test` (runtime ~minutes): run as
  *   sbt "runMain graft.tools.LongHaul [nPages] [targetWaves]"
  * Prints [longhaul] lines; any failed require = non-zero exit.
  */
object LongHaul {
  def main(args: Array[String]): Unit = {
    val nPages = args.lift(0).map(_.toInt).getOrElse(3000)
    val targetWaves = args.lift(1).map(_.toInt).getOrElse(54)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-longhaul")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftPlanner.install(spark)
    import spark.implicits._

    val synthCfg = SynthConfig.forTargetRows(nPages)
    val pages = Synth.pages(spark, synthCfg).toDF()
      .unionByName(Synth.robotsPages(spark).toDF())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pagesIdx = Wave.pageIndex(pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pagesIdx.count()

    def dirBytes(d: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      } finally s.close()
    }
    def copyDir(from: String, to: String): Unit = {
      val src = java.nio.file.Paths.get(from)
      val dst = java.nio.file.Paths.get(to)
      val s = java.nio.file.Files.walk(src)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach { p =>
          java.nio.file.Files.copy(p, dst.resolve(src.relativize(p).toString),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
        }
      } finally s.close()
    }

    val dir = java.nio.file.Files.createTempDirectory("graft-longhaul").toString
    val catalog = new SnapshotCatalog(dir, spark)
    val cfg = CrawlDriver.RunConfig(checkpointDir = dir, nWaves = 0,
      seenCapacity = math.max(nPages * 4L, 100000L), compactEvery = 3,
      runId = "longhaul")
    CrawlDriver.init(spark, catalog,
      Synth.seedFrontier(spark, synthCfg).toDF(),
      Synth.robotsFromPages(pages),
      Synth.budgets(spark, synthCfg).toDF(), cfg,
      accounts = Some(Synth.accounts(spark, synthCfg).toDF()))

    // articles of one account, shaped as refresh (FrontierEntry) rows —
    // every synth account's article urls live on HotHost
    def refreshEntries(c: SnapshotCatalog, account: Int): DataFrame =
      ArticleStore.articles(c, c.latest.get)
        .filter(col("biz") === Synth.biz(account))
        .select(col("url"), col("url_hash"), lit(Synth.HotHost).as("host"),
          col("biz"), lit("detail").as("kind"), lit(0).cast("int").as("wave"),
          lit(0L).as("priority"),
          lit(new java.sql.Timestamp(Synth.BaseUnix * 1000L)).as("discovered_ts"))

    def seenCount(c: SnapshotCatalog): Long =
      CrawlDriver.seenKeys(c, c.latest.get).count()

    // one maintenance cycle: refresh an account (except cycle 0: the
    // initial crawl itself runs several waves), crawl to drain, expire
    def cycle(c: SnapshotCatalog, d: String, i: Int): Unit = {
      if (c.latest.get > 0) {
        val next = CrawlDriver.enqueueRefresh(spark, c,
          refreshEntries(c, i % synthCfg.nAccounts), cfg)
        CrawlDriver.run(spark, c, pagesIdx, cfg.copy(nWaves = next + 2))
      } else {
        CrawlDriver.run(spark, c, pagesIdx, cfg.copy(nWaves = 12))
      }
      val ex = Expiry.expire(c) + Expiry.removeOrphans(c)
      System.err.println(s"[longhaul] cycle $i: waves=${c.latest.get} " +
        s"expired_dirs=${ex.dirsDeleted} freed=${ex.bytesFreed}")
    }

    val sizes = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var i = 0
    while (catalog.latest.get < targetWaves - 2) {
      cycle(catalog, dir, i)
      sizes += ((catalog.latest.get, dirBytes(dir)))
      i += 1
    }
    val waves = catalog.latest.get
    println(s"[longhaul] waves=$waves cycles=$i " +
      s"sizes=${sizes.map { case (w, b) => s"$w:${b / 1024}K" }.mkString(",")}")
    require(waves >= targetWaves - 2, s"horizon too short: $waves")

    // 1. PLATEAU: expiry keeps the dir flat over the back half of the
    // horizon (the crawl is in steady state there: each cycle refreshes
    // one account and folds/expires the tail). Allow generous slack for
    // delta-tail phase within the compaction cadence.
    val back = sizes.drop(sizes.size / 2).map(_._2)
    val ratio = back.max.toDouble / back.min
    println(f"[longhaul] plateau: backhalf min=${back.min / 1024}K max=${back.max / 1024}K ratio=$ratio%.3f")
    require(ratio < 1.5,
      f"checkpoint size must plateau under expiry (backhalf ratio $ratio%.3f)")

    // invariant: one seen row per distinct fetched key (the fetched
    // view stayed consistent through ~$waves waves of fold+expiry)
    val seen = seenCount(catalog)
    val distinctFetched = CrawlDriver.fetchedView(catalog, catalog.latest.get)
      .select("url_hash").distinct().count()
    println(s"[longhaul] seen=$seen distinct_fetched=$distinctFetched")
    require(seen <= distinctFetched,
      "seen keys must be a subset of distinct fetched keys")

    // 2. RESUME-FROM-LATE-SNAPSHOT: copy the heavily-expired catalog and
    // replay one more refresh cycle on both — identical outcomes
    val dir2 = java.nio.file.Files.createTempDirectory("graft-longhaul2").toString
    copyDir(dir, dir2)
    val twin = new SnapshotCatalog(dir2, spark)
    val from = catalog.latest.get
    cycle(catalog, dir, i)
    cycle(twin, dir2, i)
    def fetchedSet(c: SnapshotCatalog): Set[(Long, Int)] =
      c.readDeltasInRange(from + 1, c.latest.get, "fetched").get
        .select(col("url_hash"), col("wave")).as[(Long, Int)].collect().toSet
    val (f1, f2) = (fetchedSet(catalog), fetchedSet(twin))
    require(f1 == f2, s"late-snapshot replay must fetch identically (${f1.size} vs ${f2.size})")
    require(f1.nonEmpty, "the replay cycle must re-fetch the refreshed account")
    require(seenCount(catalog) == seenCount(twin), "seen sets must match after replay")
    println(s"[longhaul] replay: ${f1.size} re-fetches identical on both timelines; " +
      s"seen=${seenCount(catalog)} on both")
    println(s"[longhaul] PASS waves=${catalog.latest.get} dir=${dirBytes(dir) / 1024}K")
    spark.stop()
  }
}
