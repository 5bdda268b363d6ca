package graft.checkpoint

import graft.{CrawlDriver, SparkSpec}
import graft.frontier.{ArticleStore, Wave}
import graft.synth.{Synth, SynthConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot expiry (checkpoint.Expiry): storage reclamation must be
  * invisible to every live consumer — seen set, article view, resume,
  * refresh — proven against an un-expired byte-copy twin. */
class ExpirySpec extends SparkSpec {
  import spark.implicits._

  private val small = SynthConfig(nAccounts = 2, articlesPerAccount = 6, longTail = 0)
  private lazy val corpus1 = Synth.pages(spark, small).toDF()
  private lazy val idx1 = Wave.pageIndex(corpus1).cache()

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("expiry-spec").toString

  private def rc(dir: String, nWaves: Int) = CrawlDriver.RunConfig(dir,
    nWaves = nWaves, seenCapacity = 10000L, nShards = 2, compactEvery = 2)

  /** Crawl the v1 corpus to drain with compaction every 2 snapshots. */
  private def crawledDir(): (String, SnapshotCatalog) = {
    val dir = freshDir()
    val catalog = new SnapshotCatalog(dir, spark)
    val cfg = rc(dir, nWaves = 5)
    CrawlDriver.init(spark, catalog, Synth.seedFrontier(spark, small).toDF(),
      Synth.robots(spark, small).toDF(), Synth.budgets(spark, small).toDF(), cfg)
    CrawlDriver.run(spark, catalog, idx1, cfg)
    (dir, catalog)
  }

  private def copyDir(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val s = Paths.get(src); val d = Paths.get(dst)
    val it = Files.walk(s).iterator()
    while (it.hasNext) {
      val p = it.next()
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def seenSet(c: SnapshotCatalog): Set[Long] =
    CrawlDriver.seenKeys(c, c.latest.get).as[Long].collect().toSet

  private def articleRows(c: SnapshotCatalog): Set[(Long, Int, Int)] =
    ArticleStore.articles(c, c.latest.get)
      .select($"url_hash", $"read_count", $"wave")
      .as[(Long, Int, Int)].collect().toSet

  test("fetched_base fold: one row per seen key, equals seenKeys, survives the fold") {
    val (_, c) = crawledDir()
    val latest = c.latest.get
    val bF = c.latestCommittedWithTable(latest, "fetched_base")
    assert(bF.nonEmpty, "compactEvery=2 must have committed a fetched_base")
    val base = c.readTable(bF.get, "fetched_base")
    // one row per key, and exactly the keys fetched in deltas 0..bF-1
    assert(base.groupBy("url_hash").count().filter($"count" > 1).count() === 0)
    val folded = c.readDeltasInRange(0, bF.get - 1, "fetched").get
      .select("url_hash").as[Long].collect().toSet
    assert(base.select("url_hash").as[Long].collect().toSet === folded)
    // the base-aware seen view equals the raw-delta union
    val raw = c.readDeltasUpTo(latest, "fetched").select("url_hash")
      .as[Long].collect().toSet
    assert(seenSet(c) === raw)
  }

  test("expire: superseded dirs deleted, manifests + lineage survive, live reads intact") {
    val (_, c) = crawledDir()
    val latest = c.latest.get
    val bF = c.latestCommittedWithTable(latest, "fetched_base").get
    val seenBefore = seenSet(c)
    val articlesBefore = articleRows(c)

    val stats = Expiry.expire(c)
    assert(stats.dirsDeleted > 0 && stats.bytesFreed > 0L)
    // loop tables: only seed (0) and latest copies survive
    (1 until latest).foreach { s =>
      assert(!c.hasTable(s, "frontier"), s"frontier at $s must be expired")
      assert(!c.hasTable(s, "seen_sketch"))
    }
    assert(c.hasTable(0, "frontier") && c.hasTable(latest, "frontier"))
    // folded fetched deltas gone, the base that replaced them intact
    (1 until bF).foreach(s => assert(!c.hasTable(s, "fetched")))
    assert(c.hasTable(bF, "fetched_base"))
    // every manifest (lineage + committed row counts) still readable
    (0 to latest).foreach { s =>
      val m = c.manifest(s)
      assert(m.contains("\"tables\""), s"manifest $s must survive expiry")
    }
    // live consumers unchanged
    assert(seenSet(c) === seenBefore)
    assert(articleRows(c) === articlesBefore)
    // idempotent: a second expire finds nothing new to delete
    assert(Expiry.expire(c).dirsDeleted === 0)
  }

  test("removeOrphans: killed-commit leftovers deleted, committed snapshots untouchable") {
    import java.nio.file.{Files, Paths}
    val (dir, c) = crawledDir()
    val latest = c.latest.get
    val seenBefore = seenSet(c)
    // simulate two killed commits: a manifest-less dir at latest+1 (the
    // common mid-commit kill) and a stray manifest.json.tmp (killed
    // between the tmp write and the atomic move)
    val dead1 = c.snapshotPath(latest + 1)
    Files.createDirectories(dead1.resolve("frontier"))
    Files.write(dead1.resolve("frontier").resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    val dead2 = c.snapshotPath(latest + 2)
    Files.createDirectories(dead2)
    Files.write(dead2.resolve("manifest.json.tmp"), "{}".getBytes)
    assert(c.uncommittedSnapshotIds === Seq(latest + 1, latest + 2))
    assert(c.latest.get === latest, "turds must stay invisible to latest")

    val stats = Expiry.removeOrphans(c)
    assert(stats.dirsDeleted === 2 && stats.bytesFreed > 0L)
    assert(!Files.exists(dead1) && !Files.exists(dead2))
    assert(c.uncommittedSnapshotIds.isEmpty)
    // idempotent, and committed state untouched
    assert(Expiry.removeOrphans(c).dirsDeleted === 0)
    assert(c.latest.get === latest)
    assert(seenSet(c) === seenBefore)
    // the primitive refuses to drop a committed snapshot
    intercept[IllegalArgumentException](c.dropUncommittedSnapshot(latest))
    // resume on the cleaned dir still extends normally
    CrawlDriver.run(spark, c, idx1, rc(dir, nWaves = latest + 1))
    assert(c.latest.get >= latest)
  }

  test("post-expiry: resume, refresh and re-crawl behave exactly like the un-expired twin") {
    val (dir, c1) = crawledDir()
    val dir2 = freshDir()
    copyDir(dir, dir2)
    val c2 = new SnapshotCatalog(dir2, spark)
    Expiry.expire(c1) // c1 expired, c2 the un-expired twin

    // resume on the drained corpus: the seen set survived expiry, so
    // NOTHING is re-fetched (never-fetch-twice across expiry)
    val drained = c1.latest.get
    CrawlDriver.run(spark, c1, idx1, rc(dir, nWaves = drained + 2))
    val resumed = c1.latest.get
    if (resumed > drained)
      assert(c1.readDeltasInRange(drained + 1, resumed, "fetched")
        .forall(_.count() === 0L))
    // same resume on the twin so both timelines stay id-aligned
    CrawlDriver.run(spark, c2, idx1, rc(dir2, nWaves = drained + 2))

    // refresh account 0 on BOTH twins, crawl the v2 captures
    val v2 = (0 until small.articlesPerAccount).map(j => Synth.articlePageV2(small, j))
    val idx2 = Wave.pageIndexLatest(corpus1.unionByName(v2.toDF())).cache()
    def refreshEntries(c: SnapshotCatalog): DataFrame =
      ArticleStore.articles(c, c.latest.get).filter($"biz" === "BIZ0000")
        .select($"url", $"url_hash", lit(Synth.HotHost).as("host"), $"biz",
          lit("detail").as("kind"), lit(0).cast("int").as("wave"),
          lit(0L).as("priority"),
          lit(new java.sql.Timestamp(Synth.BaseUnix * 1000L)).as("discovered_ts"))
    def refreshAndRun(c: SnapshotCatalog, d: String): Int = {
      val cfg = rc(d, nWaves = 0)
      val next = CrawlDriver.enqueueRefresh(spark, c, refreshEntries(c), cfg)
      CrawlDriver.run(spark, c, idx2, cfg.copy(nWaves = next + 1))
      next
    }
    val n1 = refreshAndRun(c1, dir)
    val n2 = refreshAndRun(c2, dir2)
    assert(n1 === n2)
    // the re-crawled wave is identical on both twins
    def newFetches(c: SnapshotCatalog, from: Int): Set[(Long, Int)] =
      c.readDeltasInRange(from, c.latest.get, "fetched").get
        .select($"url_hash", $"wave").as[(Long, Int)].collect().toSet
    assert(newFetches(c1, n1) === newFetches(c2, n2))
    assert(newFetches(c1, n1).nonEmpty, "refresh must re-fetch account 0")
    // merged article view identical (refreshed v2 counts on both)
    assert(articleRows(c1) === articleRows(c2))
    // and the seen set is identical after the whole dance
    assert(seenSet(c1) === seenSet(c2))
  }
}
