package graft.frontier

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsParserSpec extends SparkSpec {
  import spark.implicits._

  val txt =
    """# example robots.txt
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /tmp/
      |
      |User-agent: graftbot
      |Disallow: /graft-only/
      |
      |Sitemap: https://h.example/sitemap.xml
      |""".stripMargin

  test("parses groups, allow/disallow, comments; default-allows root") {
    val r = RobotsParser.parse("h.example", txt)
    assert(r.contains(graft.model.RobotsRule("h.example", "/private/", false)))
    assert(r.contains(graft.model.RobotsRule("h.example", "/private/ok/", true)))
    assert(r.contains(graft.model.RobotsRule("h.example", "/tmp/", false)))
    assert(r.contains(graft.model.RobotsRule("h.example", "/", true)))
    assert(!r.exists(_.path_prefix == "/graft-only/"), "* group must not include bot-specific rules")
    val bot = RobotsParser.parse("h.example", txt, agent = "graftbot")
    assert(bot.exists(_.path_prefix == "/graft-only/"))
  }

  test("parsed rules drive the wave gate with longest-prefix-wins") {
    val rules = RobotsParser.parseTable(
      Seq(("h.example", txt)).toDF("host", "robots_txt"))
    val frontier = Seq(
      ("https://h.example/private/x", "h.example"),
      ("https://h.example/private/ok/y", "h.example"),
      ("https://h.example/public/z", "h.example"),
      ("https://other.example/q", "other.example")) // no rules → allow
      .toDF("url", "host")
    val (allowed, denied) = Wave.robotsGate(frontier, rules)
    assert(allowed.select("url").as[String].collect().toSet ===
      Set("https://h.example/private/ok/y", "https://h.example/public/z",
        "https://other.example/q"))
    assert(denied.select("url").as[String].collect().toSet ===
      Set("https://h.example/private/x"))
  }

  test("path-less urls are gated as path / (parse_url returns empty string)") {
    val rules = Seq(("closed.example", "/", false)).toDF("host", "path_prefix", "allowed")
    val frontier = Seq(
      ("https://closed.example", "closed.example"),       // no path at all
      ("https://closed.example/x", "closed.example"))
      .toDF("url", "host")
    val (allowed, denied) = Wave.robotsGate(frontier, rules)
    assert(allowed.count() === 0)
    assert(denied.count() === 2, "a Disallow:/ must also catch the path-less url")
  }

  test("empty User-agent value matches no crawler") {
    val r = RobotsParser.parse("h", "User-agent:\nDisallow: /\n")
    assert(!r.exists(x => x.path_prefix == "/" && !x.allowed))
  }

  test("empty / junk robots.txt default-allows") {
    assert(RobotsParser.parse("h", "") === Seq(graft.model.RobotsRule("h", "/", true)))
    val junk = RobotsParser.parse("h", "%%% not robots\nDisallow /oops-no-colon")
    assert(junk.exists(r => r.path_prefix == "/" && r.allowed))
  }
}
