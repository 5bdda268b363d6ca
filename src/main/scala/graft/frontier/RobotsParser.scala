package graft.frontier

import graft.model.RobotsRule
import org.apache.spark.sql.{DataFrame, Dataset}

/** robots.txt → rules-table parser (SURVEY.md §3 P3/J4 input side).
  *
  * Implements the core of the public robots exclusion protocol
  * (user-agent groups, Allow/Disallow path prefixes, `*` agent,
  * case-insensitive directives, `#` comments; directives outside any
  * user-agent group are ignored). The crawl pipeline
  * consumes the resulting (host, path_prefix, allowed) rules via the
  * broadcast longest-prefix gate in [[Wave.robotsGate]] — parsing is a
  * distributed flatMap over fetched robots.txt bodies.
  */
object RobotsParser {

  /** Rules applying to `agent` (falling back to the `*` group). */
  def parse(host: String, robotsTxt: String, agent: String = "*"): Seq[RobotsRule] = {
    var inMatchingGroup = false
    var groupHasAgents = false // directives before any User-agent are global
    val out = Seq.newBuilder[RobotsRule]
    val wanted = agent.toLowerCase

    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val idx = line.indexOf(':')
        if (idx > 0) {
          val key = line.substring(0, idx).trim.toLowerCase
          val value = line.substring(idx + 1).trim
          key match {
            case "user-agent" =>
              if (!groupHasAgents) { inMatchingGroup = false; groupHasAgents = true }
              val a = value.toLowerCase
              // empty UA value must match nothing ("".contains is always true)
              if (a == "*" || (a.nonEmpty && (a == wanted || wanted.contains(a))))
                inMatchingGroup = true
            case "allow" | "disallow" =>
              groupHasAgents = false
              if (inMatchingGroup && value.nonEmpty)
                out += RobotsRule(host, value, allowed = key == "allow")
            case _ => groupHasAgents = false // crawl-delay/sitemap etc: ignored
          }
        }
      }
    }
    val rules = out.result()
    // default-allow root so hosts with only Disallow rules still permit "/"
    if (rules.exists(r => r.path_prefix == "/" )) rules
    else rules :+ RobotsRule(host, "/", allowed = true)
  }

  /** Distributed parse: (host STRING, robots_txt STRING) → rules table. */
  def parseTable(robotsPages: DataFrame, agent: String = "*"): DataFrame = {
    val spark = robotsPages.sparkSession
    import spark.implicits._
    robotsPages.select("host", "robots_txt").as[(String, String)]
      .flatMap { case (h, txt) => parse(h, Option(txt).getOrElse(""), agent) }
      .toDF()
  }
}
