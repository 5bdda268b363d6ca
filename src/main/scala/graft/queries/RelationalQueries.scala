package graft.queries

import graft.url.UrlCanon
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked relational operator battery (SURVEY.md §3 G/W/J/E/S
  * rows) expressed over the driver's TPC-H-ish testdata so DuckDB can
  * replay each query. Every aggregate/computed column is aliased
  * identically to the oracle SQL; doubles are rounded and timestamps
  * emitted as epoch seconds to make the hash compare representation-
  * stable across engines.
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G1: hash aggregate with partial/final phases
    "q_agg_pricing" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // G2: exact distinct counts
    "q_distinct_orders" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count_distinct(col("l_orderkey")).as("n_orders"),
          count_distinct(col("l_partkey")).as("n_parts"))
    }),

    // G2b: HLL++ approximate distinct — the 10^10-scale metrics path
    // (exact count_distinct shuffles every key; the sketch doesn't).
    // Rows-only: HLL estimates differ across engines by construction;
    // RelationalSpec pins the <5% error bound against the exact count.
    "q_approx_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
    }),

    // W1: per-key recency ranking (the frontier priority window)
    "q_recency_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),

    // W2: per-group budget top-k (the politeness window)
    "q_budget_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"), col("rk"))
    }),

    // W3: first-wins dedupe by key (linenumbers repeat per order in this
    // corpus — tie-break through every output column for determinism).
    // r6 (guide §2.3 "aggregate before you shuffle"): the row_number
    // window shuffled + sorted every lineitem row; min(struct(...)) is
    // the same (l_linenumber, l_partkey)-lexicographic winner but with
    // partial map-side aggregation — the exchange carries one row per
    // order key instead of every line, and there is no sort at all.
    "q_firstwins" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(min(struct(col("l_linenumber"), col("l_partkey"))).as("__m"))
        .select(col("l_orderkey"),
          col("__m.l_linenumber").as("l_linenumber"),
          col("__m.l_partkey").as("l_partkey"))
    }),

    // windows with frames: running sum per user over time
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("run_sum", round(sum(col("value")).over(w), 4))
        .select(col("event_id"), col("user_id"), col("run_sum"))
    }),

    // J1: the fetch equi-join shape (filter pushed below the join)
    "q_fetch_join" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      val l = t(s, d, "lineitem").filter(col("l_quantity") > 45)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          round(col("l_quantity"), 2).as("qty"))
    }),

    // J2: anti join (the seen-set dedupe shape)
    "q_anti_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // J4: semi join (the robots-allowed shape). r6 (guide §2.3): the r5
    // plan broadcast-built a hash relation over EVERY lineitem row;
    // distinct() first collapses the build side to the ~p_partkey key
    // set with partial aggregation before anything is broadcast — same
    // semi-join verdict per part row (membership is duplicate-blind).
    "q_semi_join" -> ((s, d) => {
      val keys = t(s, d, "lineitem").select(col("l_partkey")).distinct()
      t(s, d, "part").filter(col("p_size") >= 25)
        .join(broadcast(keys), col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_brand"))
    }),

    // J3: FK-chain lookup with broadcastable dims
    "q_fk_chain" -> ((s, d) => {
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = broadcast(t(s, d, "nation"))
      val r = broadcast(t(s, d, "region"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    }),

    // J5: upsert merge — last-write-wins old/new totals per key. r6
    // (guide §2.4 "remove shuffles outright"): the r5 plan scanned
    // orders twice, aggregated each branch (2 exchanges) and FULL-OUTER
    // joined them (a third); conditional aggregation computes both
    // branch totals in ONE scan + ONE exchange — sum(when(pred, x))
    // over no matching rows is null, exactly the absent side of the
    // full-outer join, so merged/was_updated are unchanged.
    "q_upsert_merge" -> ((s, d) => {
      val cutoff = lit("1998-01-01").cast("timestamp")
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          round(sum(when(col("o_orderdate") < cutoff, col("o_totalprice"))), 2)
            .as("old_total"),
          round(sum(when(col("o_orderdate") >= cutoff, col("o_totalprice"))), 2)
            .as("new_total"))
        .select(col("o_custkey"),
          coalesce(col("new_total"), col("old_total")).as("merged_total"),
          col("new_total").isNotNull.as("was_updated"))
    }),

    // E1: union + key dedupe (frontier ∪ discovered)
    "q_union_dedupe" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
      val b = o.filter(col("o_totalprice") > 300000)
      a.unionByName(b)
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderkey")).as("first_order"), count(lit(1)).as("n"))
    }),

    // E2: keyed except — urgent orders that are not high-value
    "q_except_orders" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
        .except(o.filter(col("o_totalprice") > 200000).select(col("o_orderkey")))
    }),

    // S1/S2 composite: canonicalize a volatile-param URL built per row
    "q_url_canon" -> ((s, d) => {
      t(s, d, "orders")
        .withColumn("raw_url", concat(
          lit("https://HOST"), pmod(col("o_custkey"), lit(20)),
          lit(".example/s?__biz=BIZ"), col("o_custkey"),
          lit("&chksm=ff&mid="), col("o_orderkey"), lit("&scene=27")))
        .select(col("o_orderkey"), UrlCanon.canonicalCol(col("raw_url")).as("canon_url"))
    }),

    // S9: host extraction + per-host rollup
    "q_host_counts" -> ((s, d) => {
      t(s, d, "orders")
        .withColumn("raw_url", concat(
          lit("https://Host"), pmod(col("o_custkey"), lit(20)), lit(".example/p/"),
          col("o_orderkey")))
        .groupBy(UrlCanon.hostCol(col("raw_url")).as("host"))
        .agg(count(lit(1)).as("n_urls"))
    }),

    // P3/J4: robots longest-prefix gating semantics, oracle-checked —
    // inline rules table, per-url verdict = most specific matching
    // prefix. r6 (guide §2.3): the longest-prefix winner is now a
    // max(struct(prefix_len, allowed)) aggregation over the matched
    // rows (partial map-side agg, no per-key sort) instead of a
    // row_number window — matched prefix lengths are distinct per path
    // (prefixes of one path nest), so max-by-length is the same winner
    // the window picked; the production gate (Wave.robotsGate) already
    // folds the same way.
    "q_robots_prefix" -> ((s, d) => {
      import s.implicits._
      val rules = Seq(
        ("/", true), ("/p1", false), ("/p12", true), ("/p3", false))
        .toDF("path_prefix", "allowed")
      val urls = t(s, d, "orders")
        .select(col("o_orderkey"),
          concat(lit("/p"), pmod(col("o_orderkey"), lit(20))).as("path"))
      urls.join(broadcast(rules), startswith(col("path"), col("path_prefix")))
        .groupBy(col("o_orderkey"), col("path"))
        .agg(max(struct(length(col("path_prefix")).as("len"),
          col("allowed").as("allowed"))).as("__m"))
        .select(col("o_orderkey"), col("path"), col("__m.allowed").as("allowed"))
    }),

    // A2/G1: seed-source progress — accounts (customer) LEFT JOIN their
    // crawl output (orders), zero-progress seeds included. r6 (guide
    // §2.3 "aggregate before you shuffle"): orders is pre-aggregated
    // per custkey BEFORE the join, so the join moves one rolled-up row
    // per customer instead of every order, and the post-join groupBy
    // disappears; count(o_orderkey)/sum over the left join's null row
    // ≡ coalesce(…, 0) on the missing aggregate.
    "q_seed_progress" -> ((s, d) => {
      val perCust = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("__n"), sum(col("o_totalprice")).as("__s"))
      t(s, d, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("__n"), lit(0L)).as("n_orders"),
          round(coalesce(col("__s"), lit(0.0)), 2).as("total_spend"))
    }),

    // J5/A4: the re-crawl shape — last-write-wins per key across
    // repeated captures, first vs latest value + update flag. r6 (guide
    // §2.3): first/last rows are min/max of struct(ts, event_id, value)
    // — (ts, event_id) is the windows' total order, value rides along
    // and never decides (event ids are unique) — computed with partial
    // aggregation in one exchange instead of two full window sorts +
    // a groupBy over the ranked rows.
    "q_recrawl_update" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          round(min(struct(col("ts"), col("event_id"), col("value")))
            .getField("value"), 4).as("first_value"),
          round(max(struct(col("ts"), col("event_id"), col("value")))
            .getField("value"), 4).as("last_value"))
        .withColumn("was_updated", col("first_value") =!= col("last_value"))
    }),

    // S5: JSON payload extraction (the read/like-count shape)
    "q_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
    }),

    // S7: time conversion to epoch + hour bucketing
    "q_time_convert" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          unix_timestamp(col("ts")).as("epoch_s"),
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
    }))

  val oracles: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1,2""",
    "q_distinct_orders" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS n_orders,
         count(DISTINCT l_partkey) AS n_parts
         FROM lineitem GROUP BY 1""",
    "q_recency_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn <= 3""",
    "q_budget_topk" ->
      """SELECT o_orderpriority, o_orderkey, totalprice, rk FROM (
           SELECT o_orderpriority, o_orderkey, round(o_totalprice,2) AS totalprice,
             row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders) WHERE rk <= 5""",
    "q_firstwins" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
           SELECT l_orderkey, l_linenumber, l_partkey,
             row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC, l_partkey ASC) AS rn
           FROM lineitem) WHERE rn = 1""",
    "q_window_running" ->
      """SELECT event_id, user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS run_sum
         FROM events""",
    "q_fetch_join" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, round(l_quantity,2) AS qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F' AND l_quantity > 45""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""",
    "q_semi_join" ->
      """SELECT p_partkey, p_brand FROM part
         WHERE p_size >= 25
           AND EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""",
    "q_fk_chain" ->
      """SELECT r_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey  = o_orderkey
         JOIN customer ON o_custkey   = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY 1""",
    "q_upsert_merge" ->
      """WITH old AS (
           SELECT o_custkey AS k, round(sum(o_totalprice),2) AS old_total
           FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
         fresh AS (
           SELECT o_custkey AS k, round(sum(o_totalprice),2) AS new_total
           FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1)
         SELECT coalesce(old.k, fresh.k) AS o_custkey,
           coalesce(new_total, old_total) AS merged_total,
           new_total IS NOT NULL AS was_updated
         FROM old FULL OUTER JOIN fresh ON old.k = fresh.k""",
    "q_union_dedupe" ->
      """SELECT o_custkey, min(o_orderkey) AS first_order, count(*) AS n FROM (
           SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
           UNION ALL
           SELECT * FROM orders WHERE o_totalprice > 300000)
         GROUP BY 1""",
    "q_except_orders" ->
      """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
         EXCEPT
         SELECT o_orderkey FROM orders WHERE o_totalprice > 200000""",
    "q_url_canon" ->
      """SELECT o_orderkey,
         'https://host' || (o_custkey % 20) || '.example/s?__biz=BIZ' || o_custkey
           || '&mid=' || o_orderkey AS canon_url
         FROM orders""",
    "q_host_counts" ->
      """SELECT 'host' || (o_custkey % 20) || '.example' AS host, count(*) AS n_urls
         FROM orders GROUP BY 1""",
    "q_robots_prefix" ->
      """WITH rules(path_prefix, allowed) AS (
           VALUES ('/', true), ('/p1', false), ('/p12', true), ('/p3', false)),
         urls AS (SELECT o_orderkey, '/p' || (o_orderkey % 20) AS path FROM orders)
         SELECT o_orderkey, path, allowed FROM (
           SELECT u.o_orderkey, u.path, r.allowed,
             row_number() OVER (PARTITION BY u.o_orderkey
               ORDER BY length(r.path_prefix) DESC) AS rn
           FROM urls u JOIN rules r ON starts_with(u.path, r.path_prefix))
         WHERE rn = 1""",
    "q_seed_progress" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
         round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY 1""",
    "q_recrawl_update" ->
      """WITH ranked AS (
           SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl,
             row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rf
           FROM events)
         SELECT user_id,
           round(max(CASE WHEN rf = 1 THEN value END), 4) AS first_value,
           round(max(CASE WHEN rl = 1 THEN value END), 4) AS last_value,
           round(max(CASE WHEN rf = 1 THEN value END), 4)
             <> round(max(CASE WHEN rl = 1 THEN value END), 4) AS was_updated
         FROM ranked GROUP BY 1""",
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val
         FROM events""",
    "q_time_convert" ->
      """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
         CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch
         FROM events""")
}
