package graft.streaming

import graft.model.{FetchDecision, FrontierEntry}
import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming politeness variant (SURVEY.md §3 R2 — optional;
  * the batch wave loop is the normative path and this must not gate
  * correctness).
  *
  * The frontier arrives as a stream; per-host token buckets live in
  * `GroupState` keyed by host (`flatMapGroupsWithState`). Within each
  * micro-batch a host's rows are consumed in (priority, url_hash) order —
  * same deterministic contract as the batch path. Tokens deplete
  * cumulatively across batches (stream-lifetime politeness budget);
  * refill policy is a caller concern (e.g. restart the query per crawl
  * round, or extend the state with a round counter).
  */
object StreamingBudget {

  final case class HostTokens(tokensLeft: Int)

  def decide(budgets: Map[String, Int], defaultTokens: Int)(
      host: String,
      rows: Iterator[FrontierEntry],
      state: GroupState[HostTokens]): Iterator[FetchDecision] = {
    var tokens = state.getOption.map(_.tokensLeft)
      .getOrElse(budgets.getOrElse(host, defaultTokens))
    val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(-1)
    val out = rows.toSeq.sortBy(e => (e.priority, e.url_hash)).map { e =>
      val take = tokens > 0
      if (take) tokens -= 1
      FetchDecision(e.url, e.url_hash, e.host, e.biz, e.kind, e.wave,
        e.priority, e.discovered_ts, take, pid)
    }
    state.update(HostTokens(tokens))
    out.iterator
  }

  def apply(
      frontier: Dataset[FrontierEntry],
      budgets: Map[String, Int],
      defaultTokens: Int = 8): Dataset[FetchDecision] = {
    val spark = frontier.sparkSession
    import spark.implicits._
    frontier
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        decide(budgets, defaultTokens))
  }
}
