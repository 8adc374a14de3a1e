package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{t, dec, money}

/** Relational query surface.
  *
  * SURVEY §2.6: the reference contains no joins / aggregations / windows /
  * set ops of its own — a user of the new engine gets them from Spark
  * built-ins, declared here as the coverage queries the driver verifies
  * against the DuckDB oracle. Every query orders its output and aliases
  * every computed column identically to its oracle SQL.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // ---- aggregation: TPC-H Q1-style pricing summary (groupBy + exact
    // decimal sums + avg + count; partial aggregation map-side) ----
    "q_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          money(col("l_quantity")).as("sum_qty"),
          money(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- broadcast join: 3-way star join over dims small enough to
    // broadcast (no shuffle of the fact side at scale) ----
    "q_join_broadcast" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          money(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"))
    }),

    // ---- shuffle (sort-merge/hash) join: fact-fact join on orderkey ----
    "q_join_large" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- semi join (EXISTS) ----
    "q_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- anti join (NOT EXISTS) ----
    "q_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // ---- regex redaction over a semi-structured column (the
    // PII-scrubbing shape: count matches, replace all, fingerprint the
    // scrubbed text). Spark's regexp_replace is replace-all by default;
    // the oracle passes DuckDB's 'g' flag for the same semantics ----
    "q_redact" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
            .as("n_nums"),
          md5(regexp_replace(col("props"), "[0-9]+", "#")).as("redacted_fp"))
        .orderBy(col("event_id"))),

    // ---- skew-proof aggregation under the hash gate: the salted
    // two-phase sum/count must equal the plain aggregate for ANY salt
    // count (decimal partials keep the sum order-independent) ----
    "q_salted_agg" -> ((s, dir) =>
      graft.operators.Skew.saltedSumCount(
          t(s, dir, "events"), "event_type", dec(col("value")), salts = 8)
        .select(col("event_type"),
          col("sum_value").cast("double").as("sum_value"), col("n"))
        .orderBy(col("event_type"))),

    // ---- hot-key-TARGETED salting: the sample pass detects the heavy
    // event types and salts only those; the oracle is the plain GROUP BY
    // (salting is a physical spread — any detection outcome must produce
    // identical values, which is exactly what the hash gate checks) ----
    "q_salted_agg_targeted" -> ((s, dir) =>
      graft.operators.Skew.saltedSumCountTargeted(
          t(s, dir, "events"), "event_type", dec(col("value")),
          salts = 8, hotRowThreshold = 200L, sampleFraction = 0.1)
        .select(col("event_type"),
          col("sum_value").cast("double").as("sum_value"), col("n"))
        .orderBy(col("event_type"))),

    // ---- date/time scalar breadth over l_shipdate (extract, truncate,
    // month-end, day arithmetic) — only functions with identical
    // cross-engine semantics (dayofweek numbering differs, so it's out) ----
    "q_date_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          year(col("l_shipdate")).as("y"),
          month(col("l_shipdate")).as("m"),
          dayofmonth(col("l_shipdate")).as("d"),
          date_trunc("month", col("l_shipdate")).as("month_start"),
          last_day(col("l_shipdate")).as("month_end"),
          date_add(col("l_shipdate").cast("date"), 30).as("due_date"),
          datediff(lit("2024-12-31").cast("date"),
            col("l_shipdate").cast("date")).as("days_left"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // ---- TPC-H Q17 shape: correlated scalar subquery ("below 20% of
    // this part's average quantity"), decorrelated into a per-part
    // aggregate + join — the plan Catalyst itself produces for the
    // subquery form; threshold arithmetic is a fixed IEEE chain over an
    // exact decimal sum so both engines agree bit-for-bit ----
    "q_tpch_small_qty" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_size") < 10)
      val thr = l.groupBy(col("l_partkey").as("t_partkey"))
        .agg((sum(dec(col("l_quantity"))).cast("double") /
          count(lit(1)).cast("double") * lit(0.2)).as("qty_thr"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(thr, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_thr"))
        .groupBy(col("p_brand"))
        .agg((money(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("p_brand"))
    }),

    // ---- left outer join: order-less customers survive with count 0 ----
    "q_join_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_orders"))
    }),

    // ---- full outer join: per-key union of two aggregates where either
    // side may be absent (coalesce over the null side) ----
    "q_join_full_outer" -> ((s, dir) => {
      val hi = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_hi"))
      val lo = t(s, dir, "orders").filter(col("o_totalprice") < 2000)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_lo"))
      hi.join(lo, Seq("k"), "full_outer")
        .select(col("k").as("custkey"),
          coalesce(col("n_hi"), lit(0L)).as("n_hi"),
          coalesce(col("n_lo"), lit(0L)).as("n_lo"))
        .orderBy(col("custkey"))
    }),

    // ---- explicit grouping sets through the SQL entry point (the
    // DataFrame API only exposes the cube/rollup specializations);
    // grouping() disambiguates real NULLs from subtotal rows ----
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events_gs")
      s.sql("""
        SELECT event_type, user_id % 10 AS bucket,
               grouping(event_type) AS g_type, count(*) AS n
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        ORDER BY event_type NULLS FIRST, bucket NULLS FIRST, g_type""")
    }),

    // ---- window function: top order per customer by row_number ----
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          dec(col("o_totalprice")).cast("double").as("top_price"))
        .orderBy(col("o_custkey"))
    }),

    // ---- window function: running sum over event time per user ----
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_value", sum(dec(col("value"))).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- set ops: nations having customers vs suppliers ----
    "q_set_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.intersect(sp).orderBy(col("nationkey"))
    }),
    "q_set_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.except(sp).orderBy(col("nationkey"))
    }),
    "q_set_union" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sp = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(sp).distinct().orderBy(col("nationkey"))
    }),

    // ---- rollup (grouping sets) ----
    "q_rollup" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val c = t(s, dir, "customer")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // ---- distinct ----
    "q_distinct" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))),

    // ---- scalar function library: string/date/math over orders ----
    "q_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .select(
          col("o_orderkey"),
          upper(col("o_orderpriority")).as("prio_upper"),
          substring(col("o_orderstatus"), 1, 1).as("status_c"),
          length(col("o_orderpriority")).as("prio_len"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          abs(dec(col("o_totalprice")) * lit(-1)).cast("double").as("abs_price"),
          (col("o_orderkey") % 7).as("key_mod"),
          floor(dec(col("o_totalprice"))).cast("long").as("price_floor"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- json extraction from the events props column ----
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
        .orderBy(col("k_bucket"))
    }),

    // ---- event-time tumbling window (batch form; streaming form in
    // graft.stream) ----
    "q_time_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          date_trunc("day", col("ts")).as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          money(col("value")).as("sum_value"))
        .orderBy(col("day"), col("event_type"))
    }),

    // ---- sessionization (gaps-and-islands): a >30-min silence starts a
    // new session; one ordered window pass per user, no self-join ----
    "q_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        // micros, not seconds: unix_timestamp truncates and DuckDB's
        // epoch() is fractional — epoch_us/unix_micros agree exactly
        .withColumn("gap_us",
          expr("unix_micros(ts)") - lag(expr("unix_micros(ts)"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"))
        .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // ---- the same sessionization through the whale-safe chunked
    // operator (per-(user, day-slab) local windows + a summary-level
    // boundary merge — no per-user whole-history sort, so the largest
    // entity no longer bounds wall time). Bit-identical to q_sessionize
    // by construction; its oracle is ALIASED to q_sessionize's so the
    // two formulations cannot drift apart ----
    "q_sessionize_chunked" -> ((s, dir) =>
      graft.operators.Sessionize.chunked(
          t(s, dir, "events"), "user_id", "ts")
        .orderBy(col("user_id"))),

    // ---- session-LEVEL output from the chunked operator: one row per
    // session (id, bounds, size), numbering identical to the
    // single-window formulation; the per-user ordered pass runs over
    // local-session summaries, never the whale's event history ----
    "q_sessions" -> ((s, dir) =>
      graft.operators.Sessionize.chunkedSessions(
          t(s, dir, "events"), "user_id", "ts")
        .orderBy(col("user_id"), col("session_id"))),

    // ---- exact discrete quantiles per group: value at rank ceil(p*n),
    // one window-sort shuffle; approx_percentile is the sketch path ----
    "q_quantiles" -> ((s, dir) =>
      graft.operators.Quantiles.exactDiscrete(
          t(s, dir, "events"), "value", Seq("event_type"), Seq(0.25, 0.5, 0.75))
        .orderBy(col("event_type"), col("p"))),

    // ---- cube (full grouping-set lattice) ----
    "q_cube" -> ((s, dir) =>
      t(s, dir, "events")
        .cube(col("event_type"), (col("user_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), money(col("value")).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first, col("bucket").asc_nulls_first)),

    // ---- pivot: event types to columns (fixed value list so the output
    // schema is static — the scale-safe form; an unlisted pivot needs an
    // extra distinct-values job) ----
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        // an empty (bucket, type) cell pivots to NULL; the oracle's
        // count FILTER yields 0 — align the engines
        .na.fill(0L)
        .orderBy(col("bucket"))),

    // ---- analytic window-function breadth: lag/lead/dense_rank/ntile/
    // percent_rank/cume_dist/first_value over one totally-ordered frame ----
    "q_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          dense_rank().over(w).as("drank"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"),
          first_value(col("o_orderkey")).over(w).as("top_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- TPC-H Q3 shape: segment-filtered 3-way join, top revenue ----
    "q_tpch_shipping" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
    }),

    // ---- rule-based DQ validation (the reference's dq_validation
    // stage, made real): all row-local rules fold into ONE scan via a
    // lazy stack unpivot; unique/ref-integrity add one keyed job each.
    // The unique rule is intentionally violated (multi-line orders) so
    // the report proves it counts, not just passes ----
    "q_dq_validate" -> ((s, dir) => {
      import graft.operators.DataQuality._
      validate(t(s, dir, "lineitem"), Seq(
        NotNull("l_orderkey"),
        InRange("l_quantity", 1, 50),
        Matches("l_returnflag", "^[ARN]$"),
        Unique("l_orderkey"),
        RefIntegrity("l_orderkey", t(s, dir, "orders"), "o_orderkey")))
        .orderBy(col("rule"), col("column"))
    }),

    // ---- deterministic masking (the reference's data_masking stage,
    // made real): keyed pseudonym + partial redaction + numeric
    // generalization, pure projection ----
    "q_mask" -> ((s, dir) =>
      t(s, dir, "customer").select(
        graft.operators.Masking.pseudonym(col("c_custkey"), "s1").as("token"),
        graft.operators.Masking.maskAllButLast("c_name", 4).as("name_masked"),
        graft.operators.Masking.generalize(col("c_acctbal"), 100.0).as("bal_bucket"))
        .orderBy(col("token"))),

    // ---- TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with
    // a non-key predicate; count per priority ----
    "q_tpch_order_priority" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      t(s, dir, "orders")
        .join(l, col("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- TPC-H Q13 shape: outer-join count distribution (two-level
    // aggregation: orders per customer, then customers per order-count;
    // zero-order customers kept by the outer join) ----
    "q_tpch_cust_dist" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus") =!= "F")
      t(s, dir, "customer")
        .join(o, col("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ---- TPC-H Q5 shape: 6-way star join, local-supplier revenue by
    // nation (dims broadcast; the two fact tables shuffle on their keys) ----
    "q_tpch_local_supplier" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
                col("o_orderdate") < lit("1998-01-01"))
      val l = t(s, dir, "lineitem")
      val sp = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(sp), l("l_suppkey") === sp("s_suppkey") &&
          c("c_nationkey") === sp("s_nationkey"))
        .join(broadcast(n), sp("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // ---- TPC-H Q6 shape: the pure scan-filter-aggregate — every
    // predicate must reach the parquet scan (PushedFilters), no join,
    // no shuffle beyond the final 1-row combine ----
    "q_tpch_revenue_gap" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
                col("l_shipdate") < lit("1997-01-01") &&
                col("l_discount") >= lit(0.05d) &&
                col("l_discount") <= lit(0.07d) &&
                col("l_quantity") < lit(24.0d))
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))),

    // ---- TPC-H Q14 shape: promo share — conditional aggregation over
    // one fact⋈dim join, ratio as one fixed IEEE chain over two exact
    // decimal sums ----
    "q_tpch_promo_share" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
                col("l_shipdate") < lit("1996-07-01"))
      val p = t(s, dir, "part")
      val disc = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          (lit(100.0d) *
            (sum(when(col("p_type") === "ECONOMY", disc)
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
             sum(disc).cast("double"))).as("promo_pct"),
          sum(disc).cast("double").as("total_revenue"))
    }),

    // ---- TPC-H Q15 shape: top supplier by revenue — the max is joined
    // back on the EXACT decimal sum (no global window, no single-
    // partition sort; ties all surface, deterministically ordered) ----
    "q_tpch_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
                col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("rev"))
      val mx = rev.agg(max(col("rev")).as("mx"))
      rev.join(broadcast(mx), col("rev") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev").cast("double").as("revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // ---- TPC-H Q19 shape: disjunctive multi-attribute predicates
    // (brand x size x quantity bands) over the fact⋈dim join — the
    // OR-of-ANDs the optimizer must not mangle ----
    "q_tpch_brand_qty" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#11" && col("l_quantity") >= 1 &&
            col("l_quantity") <= 11 && col("p_size") <= 5) ||
          (col("p_brand") === "Brand#13" && col("l_quantity") >= 10 &&
            col("l_quantity") <= 20 && col("p_size") <= 10) ||
          (col("p_brand") === "Brand#14" && col("l_quantity") >= 20 &&
            col("l_quantity") <= 30 && col("p_size") <= 15))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- TPC-H Q10 shape: returned-item revenue per customer, global
    // top 20 (sort + limit plans as TakeOrderedAndProject — no single-
    // partition window; rank on the exact decimal sum) ----
    "q_tpch_returned_top" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("rev"))
        .orderBy(col("rev").desc, col("c_custkey").asc)
        .limit(20)
        .select(col("c_custkey"), col("rev").cast("double").as("revenue"))
    }),

    // ---- sketch tier: HyperLogLog distinct estimate, sanity-bounded
    // against the exact count (the estimate itself is engine-specific,
    // so the oracle checks the exact count and the error bound flag) ----
    "q_approx_distinct" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id")).as("n_approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") /
            col("n_exact").cast("double") <= 0.1).as("within_10pct"))
        .orderBy(col("event_type"))),

    // ---- mergeable quantile sketch (approx_percentile — KLL-style,
    // map-side partials, no sort) next to the exact discrete quantile:
    // the 100 TB percentile path, envelope-gated like the HLL rows (the
    // sketch's value is engine-specific; the exact anchor + bound flag
    // are not) ----
    "q_approx_quantile" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
      val exact = graft.operators.Quantiles
        .exactDiscrete(ev, "value", Seq("event_type"), Seq(0.5))
        .select(col("event_type"), col("q").as("p50_exact"))
      val approx = ev.groupBy(col("event_type"))
        .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("pa"))
      exact.join(approx, "event_type")
        .select(col("event_type"), col("p50_exact"),
          (abs(col("pa") - col("p50_exact")) <=
            lit(0.05d) * abs(col("p50_exact"))).as("within_5pct"))
        .orderBy(col("event_type"))
    }),

    // ---- the sketch MERGE contract (the 100 TB path: shards sketch
    // independently, a tiny union-merge folds them — raw values never
    // re-shuffle): per-(type, shard) HLL sketches union-merge per type,
    // and the merged estimate must land inside the same 10% envelope as
    // the direct sketch. The exact count (its own scan — this is a
    // verification row, the production pipeline keeps only sketches)
    // anchors the oracle; the within-envelope flag is the merge
    // correctness claim the gate pins ----
    "q_hll_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val merged = ev
        .groupBy(col("event_type"), expr("user_id % 8").as("shard"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        .groupBy(col("event_type"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("n_approx"))
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .join(merged, "event_type")
        .select(col("event_type"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") /
            col("n_exact").cast("double") <= 0.1).as("within_10pct"))
        .orderBy(col("event_type"))
    }),
  )

  private val SessionizeOracle: String =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) gap_us
      |  FROM events),
      |s AS (
      |  SELECT user_id,
      |    sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sess_id
      |  FROM g)
      |SELECT user_id, cast(max(sess_id) as bigint) AS n_sessions, count(*) AS n_events
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS n_customers,
        | cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_join_large" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        | cast(cast(o_totalprice as decimal(18,2)) as double) AS top_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id,
        | cast(sum(cast(value as decimal(18,2))) OVER (PARTITION BY user_id
        |   ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double)
        |   AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,

    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,

    "q_set_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier) ORDER BY nationkey""".stripMargin,

    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        | upper(o_orderpriority) AS prio_upper,
        | substring(o_orderstatus, 1, 1) AS status_c,
        | length(o_orderpriority) AS prio_len,
        | concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
        | year(o_orderdate) AS o_year,
        | month(o_orderdate) AS o_month,
        | dayofmonth(o_orderdate) AS o_day,
        | cast(abs(cast(o_totalprice as decimal(18,2)) * -1) as double) AS abs_price,
        | o_orderkey % 7 AS key_mod,
        | cast(floor(cast(o_totalprice as decimal(18,2))) as bigint) AS price_floor
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,

    "q_json_extract" ->
      """SELECT k % 10 AS k_bucket, count(*) AS n, cast(sum(k) as bigint) AS sum_k
        |FROM (SELECT event_id, cast(json_extract_string(props, '$.k') as int) AS k
        |      FROM events)
        |GROUP BY k % 10 ORDER BY k_bucket""".stripMargin,

    "q_time_window" ->
      """SELECT date_trunc('day', ts) AS day, event_type,
        | count(*) AS n_events,
        | cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "q_sessionize" -> SessionizeOracle,
    // aliased, not copied: the chunked operator must reproduce the
    // single-window result exactly
    "q_sessionize_chunked" -> SessionizeOracle,

    // the session-level rows the single-window formulation would emit
    "q_sessions" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
        |         THEN 1 ELSE 0 END ns
        |  FROM events),
        |s AS (
        |  SELECT user_id, us,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY us
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) sid
        |  FROM g)
        |SELECT user_id, cast(sid as bigint) AS session_id,
        |  min(us) AS start_us, max(us) AS end_us, count(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    "q_redact" ->
      """SELECT event_id,
        |  len(regexp_extract_all(props, '[0-9]+')) AS n_nums,
        |  md5(regexp_replace(props, '[0-9]+', '#', 'g')) AS redacted_fp
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type,
        |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_salted_agg_targeted" ->
      """SELECT event_type,
        |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_date_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate,
        |  extract(year FROM l_shipdate) AS y,
        |  extract(month FROM l_shipdate) AS m,
        |  extract(day FROM l_shipdate) AS d,
        |  date_trunc('month', l_shipdate) AS month_start,
        |  last_day(l_shipdate) AS month_end,
        |  cast(l_shipdate as date) + 30 AS due_date,
        |  datediff('day', cast(l_shipdate as date), date '2024-12-31') AS days_left
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_tpch_small_qty" ->
      """WITH thr AS (
        |  SELECT l_partkey AS t_partkey,
        |    cast(sum(cast(l_quantity as decimal(18,2))) as double)
        |      / cast(count(*) as double) * cast(0.2 as double) AS qty_thr
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand,
        |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double)
        |    / cast(7.0 as double) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_size < 10
        |JOIN thr ON t_partkey = l_partkey
        |WHERE l_quantity < qty_thr
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_outer" ->
      """WITH per AS (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey)
        |SELECT n_orders, count(*) AS n_customers
        |FROM per GROUP BY n_orders ORDER BY n_orders""".stripMargin,

    "q_join_full_outer" ->
      """WITH hi AS (SELECT o_custkey k, count(*) n_hi FROM orders
        |            WHERE o_totalprice > 200000 GROUP BY 1),
        |lo AS (SELECT o_custkey k, count(*) n_lo FROM orders
        |       WHERE o_totalprice < 2000 GROUP BY 1)
        |SELECT coalesce(hi.k, lo.k) AS custkey,
        |       coalesce(n_hi, cast(0 as bigint)) AS n_hi,
        |       coalesce(n_lo, cast(0 as bigint)) AS n_lo
        |FROM hi FULL OUTER JOIN lo ON hi.k = lo.k
        |ORDER BY custkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT event_type, user_id % 10 AS bucket,
        |       grouping(event_type) AS g_type, count(*) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST, g_type""".stripMargin,

    // discrete (type-1) quantiles: same rank-selection formula verbatim —
    // no interpolation, so no cross-engine ulp divergence
    "q_quantiles" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) rn,
        |    count(*) OVER (PARTITION BY event_type) n
        |  FROM events),
        |ps AS (SELECT unnest([cast(0.25 as double), cast(0.5 as double),
        |                      cast(0.75 as double)]) p)
        |SELECT event_type, p, value AS q FROM ranked, ps
        |WHERE rn = greatest(cast(ceil(p * n) as bigint), 1)
        |ORDER BY event_type, p""".stripMargin,

    "q_cube" ->
      """SELECT event_type, user_id % 10 AS bucket, count(*) AS n,
        | cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM events GROUP BY CUBE (event_type, user_id % 10)
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT user_id % 10 AS bucket,
        | count(*) FILTER (event_type = 'click') AS click,
        | count(*) FILTER (event_type = 'error') AS error,
        | count(*) FILTER (event_type = 'purchase') AS purchase,
        | count(*) FILTER (event_type = 'signup') AS signup,
        | count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id % 10 ORDER BY bucket""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | lag(o_orderkey, 1) OVER w AS prev_key,
        | lead(o_orderkey, 1) OVER w AS next_key,
        | dense_rank() OVER w AS drank,
        | ntile(4) OVER w AS quartile,
        | percent_rank() OVER w AS prank,
        | cume_dist() OVER w AS cdist,
        | first_value(o_orderkey) OVER w AS top_key
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_tpch_revenue_gap" ->
      """SELECT cast(sum(cast(l_extendedprice as decimal(18,2))
        |              * cast(l_discount as decimal(18,2))) as double) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount >= cast(0.05 as double)
        |  AND l_discount <= cast(0.07 as double)
        |  AND l_quantity < cast(24 as double)""".stripMargin,

    "q_tpch_promo_share" ->
      """SELECT cast(100 as double) *
        |  (cast(sum(CASE WHEN p_type = 'ECONOMY'
        |       THEN cast(l_extendedprice as decimal(18,2))
        |            * (1 - cast(l_discount as decimal(18,2)))
        |       ELSE cast(0 as decimal(18,2)) END) as double)
        |   / cast(sum(cast(l_extendedprice as decimal(18,2))
        |              * (1 - cast(l_discount as decimal(18,2)))) as double))
        |  AS promo_pct,
        |  cast(sum(cast(l_extendedprice as decimal(18,2))
        |           * (1 - cast(l_discount as decimal(18,2)))) as double)
        |  AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-07-01'""".stripMargin,

    "q_tpch_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(cast(l_extendedprice as decimal(18,2))
        |        * (1 - cast(l_discount as decimal(18,2)))) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, cast(rev as double) AS revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev = (SELECT max(rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_brand_qty" ->
      """SELECT cast(sum(cast(l_extendedprice as decimal(18,2))
        |              * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND l_quantity >= 1 AND l_quantity <= 11 AND p_size <= 5)
        |   OR (p_brand = 'Brand#13' AND l_quantity >= 10 AND l_quantity <= 20 AND p_size <= 10)
        |   OR (p_brand = 'Brand#14' AND l_quantity >= 20 AND l_quantity <= 30 AND p_size <= 15)""".stripMargin,

    "q_tpch_returned_top" ->
      """WITH rev AS (
        |  SELECT c_custkey,
        |    sum(cast(l_extendedprice as decimal(18,2))
        |        * (1 - cast(l_discount as decimal(18,2)))) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |       JOIN customer ON o_custkey = c_custkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY c_custkey)
        |SELECT c_custkey, cast(rev as double) AS revenue
        |FROM rev ORDER BY rev DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        | TRUE AS within_10pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // sketch quantile must sit in the envelope; the exact discrete
    // median is the replayable anchor (q_quantiles' ceil convention)
    "q_approx_quantile" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) rn,
        |    count(*) OVER (PARTITION BY event_type) n
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, value AS p50_exact, TRUE AS within_5pct
        |FROM ranked
        |WHERE rn = greatest(cast(ceil(cast(0.5 as double) * n) as bigint), 1)
        |ORDER BY event_type""".stripMargin,

    // merged-sketch estimate must sit in the envelope; the exact count
    // is the replayable anchor (same shape as q_approx_distinct)
    "q_hll_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        | TRUE AS within_10pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_dq_validate" ->
      """SELECT 'not_null' AS rule, 'l_orderkey' AS "column",
        |  cast((SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) as bigint) AS n_violations
        |UNION ALL SELECT 'in_range', 'l_quantity',
        |  cast((SELECT count(*) FROM lineitem
        |        WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50)) as bigint)
        |UNION ALL SELECT 'matches', 'l_returnflag',
        |  cast((SELECT count(*) FROM lineitem
        |        WHERE l_returnflag IS NOT NULL
        |          AND NOT regexp_matches(l_returnflag, '^[ARN]$')) as bigint)
        |UNION ALL SELECT 'unique', 'l_orderkey',
        |  cast((SELECT coalesce(sum(n - 1), 0) FROM
        |        (SELECT count(*) n FROM lineitem GROUP BY l_orderkey
        |         HAVING count(*) > 1)) as bigint)
        |UNION ALL SELECT 'ref_integrity', 'l_orderkey',
        |  cast((SELECT count(*) FROM lineitem
        |        WHERE l_orderkey IS NOT NULL
        |          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) as bigint)
        |ORDER BY rule, "column"""".stripMargin,

    "q_mask" ->
      """SELECT
        |  cast(('0x'||substr(md5('s1:'||cast(c_custkey as varchar)),1,15)) as bigint) AS token,
        |  repeat('*', greatest(length(c_name) - 4, 0)) || right(c_name, 4) AS name_masked,
        |  cast(floor(cast(c_acctbal as double) / cast(100 as double)) as bigint) AS bal_bucket
        |FROM customer ORDER BY token""".stripMargin,

    "q_tpch_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_cust_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_shipping" ->
      """SELECT l_orderkey,
        | cast(sum(cast(l_extendedprice as decimal(18,2))
        |       * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue,
        | o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < timestamp '1998-01-01'
        |  AND l_shipdate > timestamp '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q_tpch_local_supplier" ->
      """SELECT n_name,
        | cast(sum(cast(l_extendedprice as decimal(18,2))
        |       * (1 - cast(l_discount as decimal(18,2)))) as double) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= timestamp '1996-01-01'
        |  AND o_orderdate < timestamp '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
  )
}
