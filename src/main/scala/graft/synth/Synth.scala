package graft.synth

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.util.SplittableRandom

import graft.model._
import graft.url.UrlCanon
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic synthetic crawl corpus (FIXTURES.md §1–§4, seed 42).
  *
  * Every field of every row is a pure function of (config, row index) —
  * never wall clock, partition index, or iteration order — so the same
  * config yields byte-identical tables at any parallelism. The HTML
  * grammar below is the NORMATIVE definition of the byte-identical
  * extraction invariant (BASELINE.json input_hint; the reference checkout
  * is empty in this sandbox, see SURVEY.md §0).
  *
  * Row-index layout: [0, nList) account list pages, [nList, nList+nArticles)
  * hot-host article detail pages, then `longTail` long-tail pages.
  */
final case class SynthConfig(
    nAccounts: Int,
    articlesPerAccount: Int,
    longTail: Int,
    seed: Long = 42L,
    /** Paragraph-length multiplier: 1 ≈ 1 KB fixture pages (golden-pinned);
      * bench uses larger values so per-page extraction compute approaches
      * real 50–100 KB web pages. Does not perturb the RNG draw sequence. */
    richness: Int = 1) {
  val msgsPerPage = 10
  val pagesPerAccount: Int =
    math.max(1, (articlesPerAccount + msgsPerPage - 1) / msgsPerPage)
  val nList: Int = nAccounts * pagesPerAccount
  val nArticles: Int = nAccounts * articlesPerAccount
  val totalRows: Int = nList + nArticles + longTail
}

object SynthConfig {
  /** ~70% hot-host articles / 30% long-tail at a target row count
    * (FIXTURES.md URL grammar; the hot host fixtures the skew path). */
  def forTargetRows(n: Int): SynthConfig = {
    val nAccounts = math.min(50, math.max(1, n / 100))
    val apa = math.max(1, (n * 7 / 10) / nAccounts)
    val cfgNoTail = SynthConfig(nAccounts, apa, 0)
    SynthConfig(nAccounts, apa, math.max(0, n - cfgNoTail.totalRows))
  }
}

object Synth {
  val HotHost = "mp.weixin.example"
  val NLongTailHosts = 200
  val BaseUnix = 1704067200L // 2024-01-01T00:00:00Z

  // Fixed word list incl. multi-byte CJK tokens to pin UTF-8 byte identity.
  val Words: Array[String] = Array(
    "微信", "公众号", "爬虫", "数据", "分布式", "抓取", "文章", "阅读",
    "spark", "frontier", "crawl", "web", "page", "scale", "shuffle",
    "token", "bucket", "robots", "bloom", "cuckoo", "snapshot", "wave",
    "priority", "host", "article", "comment", "extract", "deterministic",
    "政策", "科技", "经济", "分析", "报告", "深度", "观察", "评论")

  def biz(a: Int): String = "BIZ%04d".format(a)

  // ------------------------------------------------------------- URLs

  /** Raw article URL as it appears in list pages and the pages table —
    * includes volatile params the canonicalizer must strip. */
  def articleUrlRaw(cfg: SynthConfig, artIdx: Int): String = {
    val a = artIdx / cfg.articlesPerAccount
    val r = rng(cfg.seed, 7001, artIdx)
    val sn = hex(r, 12)
    val chksm = hex(r, 8)
    s"https://$HotHost/s?__biz=${biz(a)}&mid=${100000 + artIdx}" +
      s"&idx=${1 + artIdx % 8}&sn=$sn&chksm=$chksm&scene=27"
  }

  def listUrl(a: Int, pageNo: Int): String =
    s"https://$HotHost/mp/profile_ext?action=getmsg&__biz=${biz(a)}&offset=${10 * pageNo}"

  def longTailHost(t: Int): String = {
    // zipf-ish: cube of uniform concentrates mass on low host ids
    val u = rng(42L, 9103, t).nextDouble()
    val k = math.min(NLongTailHosts - 1, (u * u * u * NLongTailHosts).toInt)
    s"host$k.example"
  }

  def longTailUrl(cfg: SynthConfig, t: Int): String =
    s"https://${longTailHost(t)}/page/${cfg.nArticles + t}"

  // ------------------------------------------------------------- pages

  /** Page for global row index idx — pure, deterministic. */
  def pageAt(cfg: SynthConfig, idx: Int): Page = {
    require(idx >= 0 && idx < cfg.totalRows, s"row index $idx out of range")
    val (url, text) =
      if (idx < cfg.nList) {
        val a = idx / cfg.pagesPerAccount
        val p = idx % cfg.pagesPerAccount
        (listUrl(a, p), listPageJson(cfg, a, p))
      } else if (idx < cfg.nList + cfg.nArticles) {
        val art = idx - cfg.nList
        (articleUrlRaw(cfg, art), articleHtml(cfg, artSeedIdx(cfg, art),
          publishUnix(cfg, art)))
      } else {
        val t = idx - cfg.nList - cfg.nArticles
        (longTailUrl(cfg, t), articleHtml(cfg, 500000 + t, BaseUnix + t.toLong))
      }
    val warcTs = new Timestamp((BaseUnix + idx.toLong * 37) * 1000L)
    val lang = pickLang(rng(cfg.seed, 3407, idx))
    Page(url, warcTs, text.getBytes(UTF_8), text, lang)
  }

  private def artSeedIdx(cfg: SynthConfig, art: Int): Int = art

  /** Newest-first within an account: j=0 is the most recent post. */
  def publishUnix(cfg: SynthConfig, artIdx: Int): Long = {
    val a = artIdx / cfg.articlesPerAccount
    val j = artIdx % cfg.articlesPerAccount
    BaseUnix + a.toLong * 100000L - j.toLong * 3600L
  }

  /** Article HTML — whitespace/newlines exact; goldens are byte-compared.
    * `readBump`/`likeBump` model a LATER crawl of the same URL (counters
    * grew); 0 keeps v1 byte-identical to the pinned goldens. */
  def articleHtml(cfg: SynthConfig, seedIdx: Int, pubUnix: Long,
      readBump: Int = 0, likeBump: Int = 0): String = {
    val r = rng(cfg.seed, 1213, seedIdx)
    val title = words(r, 3 + r.nextInt(4))
    val p1 = words(r, (8 + r.nextInt(13)) * cfg.richness)
    val p2 = words(r, (8 + r.nextInt(13)) * cfg.richness)
    val read = r.nextInt(100001) + readBump
    val like = r.nextInt(10001) + likeBump
    val nC = r.nextInt(6)
    val comments = (0 until nC).map { ci =>
      val ctext = words(r, 2 + r.nextInt(5))
      val nick = "user" + r.nextInt(10000)
      val clike = r.nextInt(1000)
      val cts = pubUnix + 60L * (ci + 1)
      s"""{"content":"$ctext","nick_name":"$nick","like_num":$clike,"create_time":$cts}"""
    }.mkString(",")
    s"""<html><head><title>$title</title></head><body>
<h2 class="rich_media_title" id="activity-name">
$title</h2>
<div id="js_content" class="rich_media_content">
<p>$p1</p>
<p>$p2</p>
</div>
<script>var ct = "$pubUnix";var msg_link = "";</script>
<script type="application/json" id="appmsgext">{"appmsgstat":{"read_num":$read,"like_num":$like,"show_read":1}}</script>
<script type="application/json" id="comments">{"elected_comment":[$comments]}</script>
</body></html>"""
  }

  /** List-page payload: WeChat-style outer JSON whose `general_msg_list`
    * is an ESCAPED inner JSON string (upstream fidelity). Every page also
    * carries one non-article item (type 51) to exercise the validity
    * filter (SURVEY.md §3 P4). */
  def listPageJson(cfg: SynthConfig, a: Int, pageNo: Int): String = {
    val lo = pageNo * cfg.msgsPerPage
    val hi = math.min(cfg.articlesPerAccount, lo + cfg.msgsPerPage)
    val items = (lo until hi).map { j =>
      val art = a * cfg.articlesPerAccount + j
      val r = rng(cfg.seed, 4409, art)
      val title = words(r, 3 + r.nextInt(4))
      val cu = articleUrlRaw(cfg, art)
      s"""{"comm_msg_info":{"id":${art + 1},"type":49,"datetime":${publishUnix(cfg, art)}},""" +
        s""""app_msg_ext_info":{"title":"$title","content_url":"$cu","multi_app_msg_item_list":[]}}"""
    } :+ s"""{"comm_msg_info":{"id":${900000 + a * 1000 + pageNo},"type":51,"datetime":$BaseUnix}}"""
    val inner = s"""{"list":[${items.mkString(",")}]}"""
    val canContinue = if (pageNo < cfg.pagesPerAccount - 1) 1 else 0
    val escaped = inner.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"ret":0,"can_msg_continue":$canContinue,"next_offset":${10 * (pageNo + 1)},"general_msg_list":"$escaped"}"""
  }

  // ----------------------------------------------------- spark datasets

  def pages(spark: SparkSession, cfg: SynthConfig): Dataset[Page] = {
    import spark.implicits._
    spark.range(cfg.totalRows.toLong).map(i => pageAt(cfg, i.toInt))
  }

  def accounts(spark: SparkSession, cfg: SynthConfig): Dataset[Account] = {
    import spark.implicits._
    spark.range(cfg.nAccounts.toLong)
      .map(i => Account(biz(i.toInt), s"account-$i", i.toInt))
  }

  /** Default-allow "/" per host; every 13th long-tail host denies /page/. */
  def robots(spark: SparkSession, cfg: SynthConfig): Dataset[RobotsRule] = {
    import spark.implicits._
    val hot = Seq(RobotsRule(HotHost, "/", allowed = true))
    val tail = (0 until NLongTailHosts).flatMap { k =>
      val h = s"host$k.example"
      if (k % 13 == 0) Seq(RobotsRule(h, "/page/", allowed = false), RobotsRule(h, "/", allowed = true))
      else Seq(RobotsRule(h, "/", allowed = true))
    }
    (hot ++ tail).toDS()
  }

  /** Hot host 64 tokens/round, long-tail 8 — forces multi-wave deferral. */
  def budgets(spark: SparkSession, cfg: SynthConfig): Dataset[HostBudget] = {
    import spark.implicits._
    val hot = Seq(HostBudget(HotHost, 64))
    val tail = (0 until NLongTailHosts).map(k => HostBudget(s"host$k.example", 8))
    (hot ++ tail).toDS()
  }

  /** Re-crawled (v2) snapshot of article artIdx's detail page: same URL,
    * later warc_ts, read/like counters bumped deterministically — the
    * refresh path's "the web changed" fixture. */
  def articlePageV2(cfg: SynthConfig, artIdx: Int): Page = {
    val url = articleUrlRaw(cfg, artIdx)
    val text = articleHtml(cfg, artSeedIdx(cfg, artIdx), publishUnix(cfg, artIdx),
      readBump = 1000 + artIdx, likeBump = 77)
    Page(url, new Timestamp((BaseUnix + 86400L) * 1000L),
      text.getBytes(UTF_8), text, pickLang(rng(cfg.seed, 3407, artIdx)))
  }

  // ------------------------------------------------------- robots pages

  /** robots.txt body for synthetic host index i (0 = hot host, i-1 = the
    * long-tail host id). The rules encoded here are the SOURCE the crawl
    * ingests (fetch /robots.txt → RobotsParser → rules table); they
    * parse to exactly the same table as [[robots]]. */
  def robotsPageAt(i: Int): Page = {
    val (host, txt) =
      if (i == 0) (HotHost, "User-agent: *\nAllow: /\n")
      else {
        val k = i - 1
        val h = s"host$k.example"
        if (k % 13 == 0)
          (h, "# crawl-limited host\nUser-agent: *\nDisallow: /page/\nAllow: /\n")
        else (h, "User-agent: *\nAllow: /\n")
      }
    Page(s"https://$host/robots.txt", new Timestamp(BaseUnix * 1000L),
      txt.getBytes(UTF_8), txt, "en")
  }

  /** One /robots.txt page per synthetic host — union into the pages
    * corpus so the crawl can ingest its own rules. */
  def robotsPages(spark: SparkSession): Dataset[Page] = {
    import spark.implicits._
    spark.range((NLongTailHosts + 1).toLong).map(i => robotsPageAt(i.toInt))
  }

  /** Fetch+parse the corpus's /robots.txt pages into the rules table
    * (A1→P3 ingestion: no pre-built rules — the crawl reads the web). */
  def robotsFromPages(pages: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val robotsBodies = pages
      .filter(col("url").endsWith("/robots.txt"))
      .select(UrlCanon.hostCol(col("url")).as("host"), col("text").as("robots_txt"))
    graft.frontier.RobotsParser.parseTable(robotsBodies)
  }

  /** Frontier entry derived from one ACCOUNTS-table row (A2: the seed
    * source is the account list, not a synthesized index). */
  def seedFromAccount(a: Account): FrontierEntry = {
    val u = UrlCanon.canonicalize(listUrl(a.seed_rank, 0))
    FrontierEntry(u, UrlCanon.urlHash(u), HotHost, a.biz, "list", 0,
      a.seed_rank.toLong, new Timestamp(BaseUnix * 1000L))
  }

  /** Long-tail seed t — pure, deterministic. */
  def seedTailAt(cfg: SynthConfig, t: Int): FrontierEntry = {
    val u = UrlCanon.canonicalize(longTailUrl(cfg, t))
    FrontierEntry(u, UrlCanon.urlHash(u), longTailHost(t), "", "detail", 0,
      1000000L + t, new Timestamp(BaseUnix * 1000L))
  }

  /** Wave-0 frontier: list page 0 per ACCOUNTS row + all long-tail URLs.
    * Built DISTRIBUTED (a map over the accounts dataset / row index) —
    * canonicalizing 10^5+ seed URLs on the driver would be a serial
    * stall. */
  def seedFrontier(spark: SparkSession, cfg: SynthConfig): Dataset[FrontierEntry] = {
    import spark.implicits._
    val fromAccounts = accounts(spark, cfg).map(seedFromAccount)
    val tail = spark.range(cfg.longTail.toLong).map(t => seedTailAt(cfg, t.toInt))
    fromAccounts.unionByName(tail)
  }

  // ------------------------------------------------------------- helpers

  private def rng(seed: Long, salt: Long, idx: Int): SplittableRandom =
    new SplittableRandom(seed * 1000003L + salt * 31L + idx.toLong)

  private def words(r: SplittableRandom, n: Int): String =
    (0 until n).map(_ => Words(r.nextInt(Words.length))).mkString(" ")

  private def hex(r: SplittableRandom, n: Int): String =
    (0 until n).map(_ => "0123456789abcdef".charAt(r.nextInt(16))).mkString

  private def pickLang(r: SplittableRandom): String = {
    val u = r.nextDouble()
    if (u < 0.6) "zh"
    else Array("en", "es", "de", "fr").apply((u * 10).toInt % 4)
  }
}
