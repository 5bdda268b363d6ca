package graft.frontier

import graft.SparkSpec
import graft.checkpoint.SnapshotCatalog
import graft.synth.{Synth, SynthConfig}
import graft.CrawlDriver
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class WaveSpec extends SparkSpec {
  import spark.implicits._

  val cfg: SynthConfig = SynthConfig(nAccounts = 8, articlesPerAccount = 25, longTail = 120)
  lazy val pagesIdx: DataFrame = Wave.pageIndex(Synth.pages(spark, cfg).toDF()).cache()

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("wave-spec").toString

  private def crawl(dir: String, nWaves: Int, fromScratch: Boolean = true,
      waveCfg: Wave.WaveConfig = Wave.WaveConfig(),
      robots: DataFrame = null): SnapshotCatalog = {
    val catalog = new SnapshotCatalog(dir, spark)
    val rc = CrawlDriver.RunConfig(dir, nWaves = nWaves, seenCapacity = 50000L,
      nShards = 4, waveCfg = waveCfg)
    if (fromScratch) {
      CrawlDriver.init(spark, catalog, Synth.seedFrontier(spark, cfg).toDF(),
        Option(robots).getOrElse(Synth.robots(spark, cfg).toDF()),
        Synth.budgets(spark, cfg).toDF(), rc)
    }
    CrawlDriver.run(spark, catalog, pagesIdx, rc)
    catalog
  }

  private def orderKey(c: SnapshotCatalog): Seq[(Int, Long, Long)] = {
    val last = c.latest.get
    c.readDeltasUpTo(last, "fetched")
      .select($"wave", $"priority", $"url_hash")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
  }

  test("robots-denied urls are never fetched, and are reported") {
    val c = crawl(freshDir(), 2)
    val denied = c.readDeltasUpTo(c.latest.get, "denied")
    assert(denied.count() > 0)
    // every denied host is a k%13==0 long-tail host with /page/ path
    denied.collect().foreach { r =>
      val host = r.getAs[String]("host")
      val k = "host(\\d+)\\.example".r.findFirstMatchIn(host).get.group(1).toInt
      assert(k % 13 === 0)
    }
    val fetched = c.readDeltasUpTo(c.latest.get, "fetched").select("url_hash")
    assert(fetched.join(denied, Seq("url_hash"), "inner").count() === 0)
  }

  test("robots tie-break: equal-length Allow + Disallow resolves to allow") {
    // RFC 9309 least-restrictive tie-break — and the verdict must be
    // independent of collect_list's post-shuffle rule order
    val frontier = Seq(
      ("https://t.example/a/x", 1L, "t.example", "", "detail", 0, 1L,
        new java.sql.Timestamp(0L))).toDF(
      "url", "url_hash", "host", "biz", "kind", "wave", "priority", "discovered_ts")
    Seq(
      Seq(("t.example", "/a", true), ("t.example", "/a", false)),
      Seq(("t.example", "/a", false), ("t.example", "/a", true))
    ).foreach { ruleRows =>
      val rules = ruleRows.toDF("host", "path_prefix", "allowed")
      val (allowed, denied) = Wave.robotsGate(frontier, rules)
      assert(allowed.count() === 1L && denied.count() === 0L,
        s"tie must resolve to allow for rules $ruleRows")
    }
    // longer disallow still beats shorter allow
    val rules2 = Seq(("t.example", "/", true), ("t.example", "/a", false))
      .toDF("host", "path_prefix", "allowed")
    val (a2, d2) = Wave.robotsGate(frontier, rules2)
    assert(a2.count() === 0L && d2.count() === 1L)
  }

  test("politeness: per host per wave, fetched <= tokens_per_round") {
    val c = crawl(freshDir(), 3)
    val budgets = c.readTable(0, "budgets")
    (1 to c.latest.get).foreach { snap =>
      val perHost = c.readTable(snap, "fetched")
        .withColumn("host", graft.url.UrlCanon.hostCol($"url"))
        .groupBy("host").count()
        .join(budgets, Seq("host"))
        .filter($"count" > $"tokens_per_round")
      assert(perHost.count() === 0, s"budget violated in snapshot $snap")
    }
  }

  test("budget carryover: unused tokens roll forward (capped), state checkpointed") {
    // a tight budget on every host: wave 0 (few list pages per host)
    // underuses -> carry accrues; wave 1 (many details) can then burst
    // up to tokens + carry, while the no-carry run stays at tokens
    def drive(carry: Boolean): SnapshotCatalog = {
      val dir = freshDir()
      val catalog = new SnapshotCatalog(dir, spark)
      val rc = CrawlDriver.RunConfig(dir, nWaves = 3, seenCapacity = 50000L,
        nShards = 4, carryBudgets = carry)
      val budgets = Seq((Synth.HotHost, 12)).toDF("host", "tokens_per_round")
      CrawlDriver.init(spark, catalog, Synth.seedFrontier(spark, cfg).toDF(),
        Synth.robots(spark, cfg).toDF(), budgets, rc)
      CrawlDriver.run(spark, catalog, pagesIdx, rc)
      catalog
    }
    val without = drive(carry = false)
    val withC = drive(carry = true)
    def fetchedAt(c: SnapshotCatalog, snap: Int): Long =
      c.readTable(snap, "fetched").filter($"host" === Synth.HotHost).count()
    // wave 0: 8 list pages on the hot host, budget 12 -> identical
    assert(fetchedAt(without, 1) === fetchedAt(withC, 1))
    val used0 = fetchedAt(withC, 1)
    assert(used0 < 12, "wave 0 must underuse for this test to bite")
    // checkpointed state after wave 0: carry = 12 - used, capped at 12
    val carry1 = withC.readTable(1, "budget_state")
      .filter($"host" === Synth.HotHost).select("carry").as[Int].head()
    assert(carry1 === (12 - used0).toInt)
    // wave 1: no-carry run is clamped to 12; carry run bursts to 12+carry
    assert(fetchedAt(without, 2) === 12L)
    assert(fetchedAt(withC, 2) === 12L + carry1,
      "carry must extend the next wave's allowance exactly")
    // burst is bounded: allowance never exceeds 2 rounds
    (1 to withC.latest.get).foreach { s =>
      val c = withC.readTable(s, "budget_state")
        .filter($"host" === Synth.HotHost).select("carry").as[Int].head()
      assert(c >= 0 && c <= 12)
      assert(fetchedAt(withC, s) <= 24)
    }
  }

  test("no url is ever fetched twice (seen set is exact)") {
    val c = crawl(freshDir(), 4)
    val dupes = c.readDeltasUpTo(c.latest.get, "fetched")
      .groupBy("url_hash").count().filter($"count" > 1)
    assert(dupes.count() === 0)
  }

  test("crawl order is identical across shuffle parallelism (4 vs 9)") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = try { spark.conf.set("spark.sql.shuffle.partitions", "4"); orderKey(crawl(freshDir(), 3)) }
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    val b = try { spark.conf.set("spark.sql.shuffle.partitions", "9"); orderKey(crawl(freshDir(), 3)) }
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    assert(a === b)
  }

  test("kill/resume replays the exact crawl ordering") {
    val full = crawl(freshDir(), 4)
    val dirB = freshDir()
    crawl(dirB, 2) // "killed" after 2 waves
    val resumed = crawl(dirB, 4, fromScratch = false) // resume from latest
    assert(orderKey(resumed) === orderKey(full))
    // and the seen sets agree exactly
    val sa = full.readDeltasUpTo(full.latest.get, "fetched")
      .select("url_hash").as[Long].collect().sorted.toSeq
    val sb = resumed.readDeltasUpTo(resumed.latest.get, "fetched")
      .select("url_hash").as[Long].collect().sorted.toSeq
    assert(sa === sb)
  }

  test("salting splits hot host but preserves per-host budget and determinism") {
    val salted = Wave.WaveConfig(targetBucketRows = 20L)
    val a = orderKey(crawl(freshDir(), 3, waveCfg = salted))
    val b = orderKey(crawl(freshDir(), 3, waveCfg = salted))
    assert(a === b, "salted run must be deterministic")
    val c = crawl(freshDir(), 3, waveCfg = salted)
    val budgets = c.readTable(0, "budgets")
    (1 to c.latest.get).foreach { snap =>
      val over = c.readTable(snap, "fetched")
        .withColumn("host", graft.url.UrlCanon.hostCol($"url"))
        .groupBy("host").count()
        .join(budgets, Seq("host"))
        .filter($"count" > $"tokens_per_round")
      assert(over.count() === 0)
    }
  }

  test("list-then-detail ordering with per-account recency priority") {
    val c = crawl(freshDir(), 3)
    // wave 1 fetches: list pages (priority 0) + newest details per account
    val w1 = c.readTable(2, "fetched")
    val lists = w1.filter($"url".contains("profile_ext"))
    val details = w1.filter(!$"url".contains("profile_ext"))
    assert(lists.count() > 0 && details.count() > 0)
    assert(lists.select(max($"priority")).as[Long].head() === 0L)
    assert(details.select(min($"priority")).as[Long].head() >= 1L)
    // within an account, fetched details are a prefix of the recency rank
    val arts = c.readDeltasUpTo(c.latest.get, "articles_delta")
      .filter($"biz" =!= "")
    val perBiz = arts.groupBy("biz")
      .agg(count("*").as("n"), max("publish_ts").as("newest"))
    assert(perBiz.count() === cfg.nAccounts.toLong)
  }

  test("robots rules ingest from corpus /robots.txt pages (no pre-built table)") {
    val corpus = Synth.pages(spark, cfg).toDF()
      .unionByName(Synth.robotsPages(spark).toDF())
    val ingested = Synth.robotsFromPages(corpus)
    // parsed rules ≡ the pre-built table (as a set)
    val got = ingested.collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    val want = Synth.robots(spark, cfg).collect()
      .map(r => (r.host, r.path_prefix, r.allowed)).toSet
    assert(got === want)
    // and an end-to-end crawl gated by the ingested rules replays the
    // pre-built-rules crawl exactly
    val a = orderKey(crawl(freshDir(), 2))
    val b = orderKey(crawl(freshDir(), 2, robots = ingested))
    assert(a === b)
  }

  test("re-crawl refresh: retraction + re-fetch updates counts last-write-wins") {
    val small = SynthConfig(nAccounts = 2, articlesPerAccount = 6, longTail = 0)
    val corpus1 = Synth.pages(spark, small).toDF()
    val idx1 = Wave.pageIndex(corpus1).cache()
    val dir = freshDir()
    val catalog = new SnapshotCatalog(dir, spark)
    val rc = CrawlDriver.RunConfig(dir, nWaves = 5, seenCapacity = 10000L, nShards = 2)
    CrawlDriver.init(spark, catalog, Synth.seedFrontier(spark, small).toDF(),
      Synth.robots(spark, small).toDF(), Synth.budgets(spark, small).toDF(), rc)
    CrawlDriver.run(spark, catalog, idx1, rc)
    val drained = catalog.latest.get
    val before = ArticleStore.articles(catalog, drained)
    val beforeReads = before.filter($"biz" === "BIZ0000")
      .select("url_hash", "read_count").as[(Long, Int)].collect().toMap
    assert(beforeReads.size === small.articlesPerAccount)

    // the web changed: v2 captures for account 0's articles (read bumped)
    val v2 = (0 until small.articlesPerAccount).map(j => Synth.articlePageV2(small, j))
    val idx2 = Wave.pageIndexLatest(corpus1.unionByName(v2.toDF())).cache()
    // latest-wins index: v1-only urls unchanged, v2 urls picked
    assert(idx2.count() === idx1.count())

    val refreshEntries = before.filter($"biz" === "BIZ0000")
      .select($"url", $"url_hash", lit(Synth.HotHost).as("host"), $"biz",
        lit("detail").as("kind"), lit(0).cast("int").as("wave"),
        lit(0L).as("priority"),
        lit(new java.sql.Timestamp(Synth.BaseUnix * 1000L)).as("discovered_ts"))
    // contract gates: a never-fetched key must be filtered out (its
    // delete could evict a colliding live fingerprint), and a duplicated
    // refresh input must dedupe — the retraction delta carries exactly
    // the seen account-0 keys
    val hostile = refreshEntries
      .unionByName(refreshEntries.limit(2)) // duplicates
      .unionByName(refreshEntries.limit(1)
        .withColumn("url_hash", lit(987654321L))
        .withColumn("url", lit("https://never.fetched/x"))) // unseen key
    val nextWave = CrawlDriver.enqueueRefresh(spark, catalog, hostile, rc)
    val retractedKeys = catalog.readTable(nextWave, "retracted")
      .select("url_hash").as[Long].collect().sorted.toSeq
    assert(retractedKeys === beforeReads.keySet.toSeq.sorted)
    CrawlDriver.run(spark, catalog, idx2, rc.copy(nWaves = nextWave + 1))

    val after = ArticleStore.articles(catalog, catalog.latest.get)
    val afterReads = after.filter($"biz" === "BIZ0000")
      .select("url_hash", "read_count").as[(Long, Int)].collect().toMap
    // merged view serves the REFRESHED counts, one row per url
    assert(afterReads.keySet === beforeReads.keySet)
    (0 until small.articlesPerAccount).foreach { j =>
      val h = graft.url.UrlCanon.urlHash(Synth.articleUrlRaw(small, j))
      assert(afterReads(h) === beforeReads(h) + 1000 + j,
        s"article $j read_count must be the v2 capture")
    }
    // account 1 untouched
    val others = after.filter($"biz" === "BIZ0001")
      .select("url_hash", "read_count").as[(Long, Int)].collect().toMap
    val othersBefore = before.filter($"biz" === "BIZ0001")
      .select("url_hash", "read_count").as[(Long, Int)].collect().toMap
    assert(others === othersBefore)
    // refreshed urls were genuinely fetched TWICE (seen-set retraction worked)
    val fetchCounts = catalog.readDeltasUpTo(catalog.latest.get, "fetched")
      .groupBy("url_hash").count().as[(Long, Long)].collect().toMap
    beforeReads.keySet.foreach(h => assert(fetchCounts(h) === 2L))
    othersBefore.keySet.foreach(h => assert(fetchCounts(h) === 1L))
    // resuming with a different shard count must be refused (the state's
    // key space is pmod(url_hash, nShards))
    intercept[IllegalArgumentException] {
      CrawlDriver.runWave(spark, catalog, idx2, catalog.latest.get,
        rc.copy(nWaves = catalog.latest.get + 1, nShards = 7))
    }
  }

  test("frontier drains to empty on a fully-crawlable corpus") {
    val small = SynthConfig(nAccounts = 2, articlesPerAccount = 8, longTail = 0)
    val idx = Wave.pageIndex(Synth.pages(spark, small).toDF()).cache()
    val dir = freshDir()
    val catalog = new SnapshotCatalog(dir, spark)
    val rc = CrawlDriver.RunConfig(dir, nWaves = 6, seenCapacity = 10000L, nShards = 2)
    CrawlDriver.init(spark, catalog, Synth.seedFrontier(spark, small).toDF(),
      Synth.robots(spark, small).toDF(), Synth.budgets(spark, small).toDF(), rc)
    CrawlDriver.run(spark, catalog, idx, rc)
    val last = catalog.latest.get
    assert(catalog.readTable(last, "frontier").count() === 0)
    val arts = catalog.readDeltasUpTo(last, "articles_delta")
    assert(arts.count() === small.nArticles.toLong)
  }
}
