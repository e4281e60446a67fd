package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q.{decSum, moneySum, t}

/** The relational operator inventory (SURVEY.md §2.2–§2.8) re-expressed
  * over the driver's TPC-H-ish testdata, each with a DuckDB oracle.
  *
  * Query keys are prefixed with the SURVEY §2 operator ids they cover
  * (aN = aggregation, wN = window, jN = join, pN = projection/filter,
  * uN = set op, oN = sort/top-k, fN = scalar/higher-order functions).
  */
object RelationalQueries {

  // ---------------------------------------------------------------- A: aggs

  /** A-class groupBy/agg (A8-style counts + decimal-exact double sums);
    * TPC-H Q1 shape over lineitem. Filter pushes to the parquet scan.
    */
  val pricingSummary: Q = Q(
    "a1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  /** A1/A5/A7-style collect_list/collect_set, made deterministic by sorting
    * before string-joining (cf. SURVEY.md §4 landmines on unordered
    * collect_list).
    */
  val collectSorted: Q = Q(
    "a2_collect_set_sorted",
    """SELECT o_custkey,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n_orders"))
  }

  /** A3/A9-style per-group first/min/max rollup (deterministic min/max in
    * place of the reference's nondeterministic `first`, SURVEY.md §4).
    */
  val groupMinMax: Q = Q(
    "a3_group_minmax",
    """SELECT l_orderkey, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS total_qty,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"),
        moneySum(col("l_quantity")).as("total_qty"),
        count(lit(1)).as("n_lines"))
  }

  /** A8/A10 count_distinct (expand-based distinct aggregate). */
  val countDistinctQ: Q = Q(
    "a8_count_distinct",
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"))
  }

  /** A11 whole-row distinct. */
  val distinctQ: Q = Q(
    "a11_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
    t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
  }

  /** A12 keyed dedup. The reference's `dropDuplicates(subset)` picks an
    * arbitrary row (SURVEY.md §4 landmine); our rebuild is the deterministic
    * variant — row_number over an explicit tiebreak ordering.
    */
  val keyedDedup: Q = Q(
    "a12_keyed_dedup",
    """SELECT l_orderkey, l_linenumber, l_partkey FROM (
      |  SELECT l_orderkey, l_linenumber, l_partkey,
      |    row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS rn
      |  FROM lineitem) WHERE rn = 1""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"), col("l_partkey"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** A13 approx_count_distinct (HLL++, rsd 0.01 as in reference
    * Grounding.scala:543–550), driver-checked via its accuracy bound:
    * HLL implementations differ across engines, so the raw estimate has
    * no cross-engine oracle — but the claim that matters
    * (|approx − exact| ≤ 3·rsd·exact) is relational. The exact count is
    * computed in-plan beside the sketch and the bound is emitted as a
    * boolean; DuckDB replays the exact count and expects TRUE, so a
    * Spark estimate straying past ±3 % hash-mismatches. Deterministic:
    * HLL is a pure function of the data. The quantitative bound is
    * additionally spec-locked at sf0.01 AND sf0.1
    * (ApproxDistinctScaleSpec).
    */
  val approxDistinct: Q = Q(
    "a13_approx_count_distinct",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      // pre-dedup instead of countDistinct beside the sketch: a mixed
      // distinct/non-distinct agg plans through an Expand that doubles
      // the scanned stream; HLL is multiplicity-insensitive, so both
      // aggregates run over the distinct pairs — one map-side-combinable
      // shuffle, no Expand
      .groupBy(col("l_returnflag"), col("l_partkey")).agg(lit(1))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          lit(3 * 0.01) * col("exact_parts")).as("within_bound"))
  }

  // ------------------------------------------------------------- W: windows

  /** W2 running aggregate over the default ordered frame (the reference's
    * relevance-vector window, Processing.scala:118–120, relies on exactly
    * this RANGE UNBOUNDED PRECEDING..CURRENT ROW behavior).
    */
  val runningSum: Q = Q(
    "w2_running_sum",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(30,10)))
      |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS DOUBLE) AS running_qty
      |FROM lineitem""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    t(s, dir, "lineitem").select(
      col("l_orderkey"),
      col("l_linenumber"),
      sum(col("l_quantity").cast("decimal(30,10)")).over(w).cast("double").as("running_qty"))
  }

  /** W3 two-level windowed min + filter — the disambiguation shape
    * (reference Grounding.scala:111–142): keep rows whose per-(user,type)
    * min equals the global per-type min.
    */
  val twoLevelMin: Q = Q(
    "w3_two_level_min",
    """SELECT DISTINCT event_type, user_id, min_value FROM (
      |  SELECT event_type, user_id, umin AS min_value,
      |    min(umin) OVER (PARTITION BY event_type) AS gmin
      |  FROM (
      |    SELECT event_type, user_id, value,
      |      min(value) OVER (PARTITION BY user_id, event_type) AS umin
      |    FROM events))
      |WHERE min_value <= gmin""".stripMargin) { (s, dir) =>
    val wUser = Window.partitionBy(col("user_id"), col("event_type"))
    val wType = Window.partitionBy(col("event_type"))
    t(s, dir, "events")
      .withColumn("umin", min(col("value")).over(wUser))
      .withColumn("gmin", min(col("umin")).over(wType))
      .filter(col("umin") <= col("gmin"))
      .select(col("event_type"), col("user_id"), col("umin").as("min_value"))
      .distinct()
  }

  /** W4 dense_rank top-1 per group, ties kept (reference
    * Grounding.scala:195–203 keeps all tied groundings).
    */
  val denseRankTop1: Q = Q(
    "w4_dense_rank_top1",
    """SELECT s_nationkey, s_name, s_acctbal FROM (
      |  SELECT s_nationkey, s_name, s_acctbal,
      |    dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rk
      |  FROM supplier) WHERE rk = 1""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc)
    t(s, dir, "supplier")
      .withColumn("rk", dense_rank().over(w))
      .filter(col("rk") === 1)
      .select(col("s_nationkey"), col("s_name"), col("s_acctbal"))
  }

  /** W5 collect_set over a window + dedup (reference Embedding.scala:41–46),
    * deterministic via sort+join.
    */
  val windowCollectSet: Q = Q(
    "w5_window_collect_set",
    """SELECT l_orderkey,
      |  string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS flags
      |FROM lineitem GROUP BY l_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("l_orderkey"))
    t(s, dir, "lineitem")
      .select(
        col("l_orderkey"),
        array_join(sort_array(collect_set(col("l_returnflag")).over(w)), ",").as("flags"))
      .distinct()
  }

  /** W-class completeness: lead / ntile / percent_rank with fully unique
    * tiebreak orderings (cross-engine determinism).
    */
  val leadNtile: Q = Q(
    "w6_lead_ntile",
    """SELECT o_orderkey,
      |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order,
      |  ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile,
      |  round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6) AS pr
      |FROM orders""".stripMargin) { (s, dir) =>
    val byDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_orderkey"),
      lead(col("o_orderkey"), 1).over(byDate).as("next_order"),
      ntile(4).over(byPrice).as("quartile"),
      round(percent_rank().over(byPrice), 6).as("pr"))
  }

  /** Exact interpolated percentiles (median + p90) per group. */
  val percentiles: Q = Q(
    "a15_percentiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.5)), 6).as("median_qty"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 6).as("p90_price"))
  }

  /** Statistical aggregates: stddev / correlation / covariance, built from
    * exact decimal moments (n, Σx, Σx², Σxy) on both engines. Engines
    * disagree on float-moment accumulation order, so the builtins are not
    * hash-comparable; the moment sums ARE exact (2-dp columns → 4-dp
    * products, decimal-accumulated, unscaled values ≪ 2^53 so the final
    * decimal→double cast is the same IEEE value in Spark and DuckDB), and
    * the closing arithmetic is the identical double expression tree on
    * both sides. Builtin stddev_samp/corr/covar_samp are cross-checked
    * against this formula in RelationalQueriesSpec.
    *
    * The final `+ 0.0` on each rounded output normalizes IEEE negative
    * zero: DuckDB's round() preserves the sign of a tiny negative value
    * (−2.4e−07 → −0.0) while Spark's Round goes through BigDecimal which
    * cannot represent −0 and yields +0.0. `−0.0 + 0.0 = +0.0` on both
    * engines and leaves every other value unchanged.
    */
  val statsAggs: Q = Q(
    "a16_stats_aggs",
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sq,
      |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(15,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sqq,
      |    CAST(sum(CAST(l_discount AS DECIMAL(15,2))) AS DOUBLE) AS sd,
      |    CAST(sum(CAST(CAST(l_discount AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sdd,
      |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sqd,
      |    CAST(sum(CAST(l_tax AS DECIMAL(15,2))) AS DOUBLE) AS st,
      |    CAST(sum(CAST(CAST(l_discount AS DECIMAL(15,2)) * CAST(l_tax AS DECIMAL(15,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sdt
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |  round(sqrt((sqq - sq * sq / n) / (n - 1)), 4) + 0.0 AS sd_qty,
      |  round((sqd - sq * sd / n) / sqrt((sqq - sq * sq / n) * (sdd - sd * sd / n)), 4) + 0.0 AS corr_qd,
      |  round((sdt - sd * st / n) / (n - 1), 6) + 0.0 AS cov_dt
      |FROM m""".stripMargin) { (s, dir) =>
    def d2(c: Column): Column = c.cast("decimal(15,2)")
    def prodSum(a: Column, b: Column): Column =
      sum((d2(a) * d2(b)).cast("decimal(30,4)")).cast("double")
    val m = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(d2(col("l_quantity"))).cast("double").as("sq"),
        prodSum(col("l_quantity"), col("l_quantity")).as("sqq"),
        sum(d2(col("l_discount"))).cast("double").as("sd"),
        prodSum(col("l_discount"), col("l_discount")).as("sdd"),
        prodSum(col("l_quantity"), col("l_discount")).as("sqd"),
        sum(d2(col("l_tax"))).cast("double").as("st"),
        prodSum(col("l_discount"), col("l_tax")).as("sdt"))
    m.select(
      col("l_returnflag"),
      (round(sqrt((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1)), 4) + 0.0)
        .as("sd_qty"),
      (round(
        (col("sqd") - col("sq") * col("sd") / col("n")) /
          sqrt((col("sqq") - col("sq") * col("sq") / col("n")) *
            (col("sdd") - col("sd") * col("sd") / col("n"))), 4) + 0.0).as("corr_qd"),
      (round((col("sdt") - col("sd") * col("st") / col("n")) / (col("n") - 1), 6) + 0.0).as("cov_dt"))
  }

  // --------------------------------------------------------------- J: joins

  /** J1-style broadcast equi-join: fact × broadcast small dim. At 100 TB the
    * part table for a given scale still fits an executor, so the explicit
    * broadcast hint (reference Grounding.scala:585) is the right call here.
    */
  val broadcastJoin: Q = Q(
    "j1_broadcast_join",
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** J5/J6/P11: left-outer join + coalesce null repair (reference
    * Grounding.scala:332–334, Processing.scala:109–112).
    */
  val leftOuterCoalesce: Q = Q(
    "j5_left_outer_coalesce",
    """SELECT c_custkey, c_mktsegment, coalesce(n, 0) AS n_orders
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
      |ON c_custkey = o_custkey""".stripMargin) { (s, dir) =>
    val perCust = t(s, dir, "orders").groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    t(s, dir, "customer")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_mktsegment"), coalesce(col("n"), lit(0L)).as("n_orders"))
  }

  /** J4 anti join (reference Grounding.scala:330 drops rows whose key is
    * already in the LUT).
    */
  val antiJoin: Q = Q(
    "j4_anti_join",
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** Semi join (EXISTS) — completes the join-type inventory. */
  val semiJoin: Q = Q(
    "j2_semi_join",
    """SELECT c_mktsegment, count(*) AS n_customers FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** J11 theta self-join: equi key + inequality residual (the evidence
    * target×disease pairing, reference Evidence.scala:78–83).
    */
  val thetaSelfJoin: Q = Q(
    "j11_theta_self_join",
    """SELECT s_nationkey AS nationkey, count(*) AS n_pairs
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey AND s_suppkey <> c_custkey
      |GROUP BY s_nationkey""".stripMargin) { (s, dir) =>
    val sup = t(s, dir, "supplier")
    val cust = t(s, dir, "customer")
    sup
      .join(cust, sup("s_nationkey") === cust("c_nationkey") && sup("s_suppkey") =!= cust("c_custkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumnRenamed("s_nationkey", "nationkey")
  }

  /** J12 merge of two aggregate branches, left_outer + fill(0) (reference
    * Evidence.scala:141–143).
    */
  val mergeFill: Q = Q(
    "j12_merge_fill",
    """SELECT a.o_custkey AS custkey, a.n_orders, coalesce(b.n_open, 0) AS n_open
      |FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) a
      |LEFT JOIN (SELECT o_custkey, count(*) AS n_open FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) b
      |ON a.o_custkey = b.o_custkey""".stripMargin) { (s, dir) =>
    val orders = t(s, dir, "orders")
    val all = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val open = orders
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_open"))
    all
      .join(open, col("o_custkey") === col("k"), "left_outer")
      .na.fill(0L, Seq("n_open"))
      .select(col("o_custkey").as("custkey"), col("n_orders"), col("n_open"))
  }

  /** J3 double-sided resolution join (reference resolveCooccurrences,
    * Grounding.scala:277–308): a pair stream grounds each side
    * independently against its LUT via left_outer, keeps rows with BOTH
    * sides mapped — the co-occurrence shape where an unmapped side
    * invalidates the pair, not just its column. The LUTs are filtered so
    * each side genuinely drops rows (partial coverage, like a grounding
    * vocabulary).
    */
  val doubleResolutionJoin: Q = Q(
    "j3_double_resolution",
    """SELECT l_orderkey, l_linenumber, p_brand AS brand1, s_name AS name2
      |FROM lineitem
      |LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size <= 25) p
      |  ON l_partkey = p_partkey
      |LEFT JOIN (SELECT s_suppkey, s_name FROM supplier WHERE s_acctbal > 0) s
      |  ON l_suppkey = s_suppkey
      |WHERE p_brand IS NOT NULL AND s_name IS NOT NULL""".stripMargin) { (s, dir) =>
    val side1 = t(s, dir, "part").filter(col("p_size") <= 25)
      .select(col("p_partkey"), col("p_brand"))
    val side2 = t(s, dir, "supplier").filter(col("s_acctbal") > 0)
      .select(col("s_suppkey"), col("s_name"))
    t(s, dir, "lineitem")
      .join(side1, col("l_partkey") === col("p_partkey"), "left_outer")
      .join(side2, col("l_suppkey") === col("s_suppkey"), "left_outer")
      .withColumn("isMapped", col("p_brand").isNotNull && col("s_name").isNotNull)
      .filter(col("isMapped"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("p_brand").as("brand1"), col("s_name").as("name2"))
  }

  /** The shared 3-row rank dim for j6/j7 — the SectionRanks.table shape
    * (a programmatic broadcastable dim covering only PART of the key
    * domain: priorities 4-NOT SPECIFIED / 5-LOW are unranked).
    */
  private def priorityRanks(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("1-URGENT", 1, 1.0), ("2-HIGH", 2, 0.8), ("3-MEDIUM", 3, 0.5))
      .toDF("o_orderpriority", "rank", "weight")
  }

  private val priorityRanksSql =
    """(VALUES ('1-URGENT', 1, 1.0), ('2-HIGH', 2, 0.8), ('3-MEDIUM', 3, 0.5))
      |  AS ranks(o_orderpriority, rank, weight)""".stripMargin

  /** J6 LENIENT rank join (reference literatureIndex,
    * Processing.scala:108–112): left_outer against the partial rank dim,
    * unranked keys kept with the fill defaults (rank 100 / weight 0.01).
    * All 5 priorities survive — contrast j7, the strict policy over the
    * SAME input, which keeps 3.
    */
  val lenientRankJoin: Q = Q(
    "j6_lenient_rank_join",
    s"""SELECT o_orderpriority, coalesce(rank, 100) AS rank,
       |  CAST(coalesce(weight, 0.01) AS DOUBLE) AS weight, count(*) AS n
       |FROM orders LEFT JOIN $priorityRanksSql USING (o_orderpriority)
       |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .join(broadcast(priorityRanks(s)), Seq("o_orderpriority"), "left_outer")
      .na.fill(100, Seq("rank")).na.fill(0.01, Seq("weight"))
      .groupBy(col("o_orderpriority"), col("rank"), col("weight"))
      .agg(count(lit(1)).as("n"))
  }

  /** J7 STRICT rank join (reference trainingSet, Embedding.scala:44–45):
    * the inner join silently drops unranked keys — the embedding-step
    * policy, versus j6's lenient literature-index policy. Same input,
    * 3 surviving priorities instead of 5: the row-count divergence IS the
    * semantic difference the reference encodes in two different steps.
    */
  val strictRankJoin: Q = Q(
    "j7_strict_rank_join",
    s"""SELECT o_orderpriority, rank, CAST(weight AS DOUBLE) AS weight, count(*) AS n
       |FROM orders JOIN $priorityRanksSql USING (o_orderpriority)
       |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .join(broadcast(priorityRanks(s)), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"), col("rank"), col("weight"))
      .agg(count(lit(1)).as("n"))
  }

  /** A7 array-of-arrays training bags (reference trainingSet,
    * Embedding.scala:46–57): per key, one sorted id-set per rank, the
    * rank-ordered list of those sets, plus the flattened overall bag
    * appended as a final element — then one row per bag. Both levels are
    * plain map-side-combinable aggregations with explicit sort keys (the
    * reference used a window + dropDuplicates — physical-order-dependent).
    * Bags serialize to comma-joined strings for cross-engine hashing.
    */
  val trainingBags: Q = Q(
    "a7_training_bags",
    """WITH per_rank AS (
      |  SELECT o_custkey, o_orderpriority,
      |    list_sort(list(DISTINCT o_orderkey)) AS keys
      |  FROM orders GROUP BY 1, 2),
      |bags AS (
      |  SELECT o_custkey,
      |    list(keys ORDER BY o_orderpriority) AS keyss,
      |    flatten(list(keys ORDER BY o_orderpriority)) AS overall
      |  FROM per_rank GROUP BY 1)
      |SELECT o_custkey,
      |  array_to_string(list_transform(t.terms, x -> CAST(x AS VARCHAR)), ',') AS terms
      |FROM bags, unnest(list_append(keyss, overall)) AS t(terms)""".stripMargin) { (s, dir) =>
    val perRank = t(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(sort_array(collect_set(col("o_orderkey"))).as("keys"))
    perRank
      .groupBy(col("o_custkey"))
      .agg(transform(
        array_sort(collect_list(struct(col("o_orderpriority"), col("keys")))),
        r => r.getField("keys")).as("keyss"))
      .withColumn("overall", flatten(col("keyss")))
      .withColumn("all", concat(col("keyss"), array(col("overall"))))
      .select(col("o_custkey"), explode(col("all")).as("terms"))
      .select(col("o_custkey"),
        array_join(transform(col("terms"), x => x.cast("string")), ",").as("terms"))
  }

  // -------------------------------------------- P: projections / predicates

  /** P4–P9 predicate mix: IN-list, range, prefix, regex (reference
    * Processing.scala:87, Grounding.scala:349, 559).
    */
  val filterPredicates: Q = Q(
    "p4_filter_predicates",
    """SELECT doc_id, lang, source FROM documents
      |WHERE lang IN ('en','de') AND n_chars > 100
      |  AND source LIKE 'src1%' AND regexp_matches(text, 'spark')""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .filter(
        col("lang").isInCollection(Seq("en", "de")) &&
          col("n_chars") > 100 &&
          col("source").startsWith("src1") &&
          col("text").rlike("spark"))
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** P10–P12 when/otherwise chain, floor-cast, coalesce (reference
    * Vectors.scala:28–32, Grounding.scala:323–342).
    */
  val caseCastCoalesce: Q = Q(
    "p10_case_cast_coalesce",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice < 1000 THEN 'low'
      |       WHEN o_totalprice < 10000 THEN 'mid'
      |       ELSE 'high' END AS price_band,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  coalesce(CASE WHEN o_orderstatus = 'O' THEN o_orderstatus END, 'NA') AS status_o
      |FROM orders""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") < 1000, "low")
        .when(col("o_totalprice") < 10000, "mid")
        .otherwise("high")
        .as("price_band"),
      floor(col("o_totalprice")).cast("long").as("price_floor"),
      coalesce(when(col("o_orderstatus") === "O", col("o_orderstatus")), lit("NA")).as("status_o"))
  }

  /** P1 struct build + star expansion (reference Processing.scala:35). */
  val structExpand: Q = Q(
    "p1_struct_expand",
    "SELECT l_orderkey AS ok, l_linenumber AS ln, l_quantity FROM lineitem") { (s, dir) =>
    t(s, dir, "lineitem")
      .select(
        struct(col("l_orderkey").as("ok"), col("l_linenumber").as("ln")).as("k"),
        col("l_quantity"))
      .select(col("k.*"), col("l_quantity"))
  }

  // ----------------------------------------------------- U/O: set ops, sort

  /** U1 unionByName + distinct (reference Grounding.scala:531–547). */
  val unionDistinct: Q = Q(
    "u1_union_distinct",
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey FROM supplier""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .select(col("c_nationkey").as("nationkey"))
      .unionByName(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
  }

  /** U2 intersect (distinct semantics in both engines). */
  val intersectQ: Q = Q(
    "u2_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
  }

  /** U3 except (distinct semantics in both engines). */
  val exceptQ: Q = Q(
    "u3_except",
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT
      |SELECT s_nationkey FROM supplier""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
  }

  /** U4/U5 multiset set-ops (ALL semantics — duplicates preserved by
    * multiplicity, the bag algebra distinct-based u2/u3 cannot express).
    */
  val intersectAllQ: Q = Q(
    "u4_intersect_all",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT ALL
      |SELECT s_nationkey FROM supplier""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersectAll(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
  }

  val exceptAllQ: Q = Q(
    "u5_except_all",
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT ALL
      |SELECT s_nationkey FROM supplier""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .exceptAll(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
  }

  /** Fuzzy string matching by edit distance — the short-string twin of
    * the shingle/minhash fuzzy dedup (titles, entity labels, file
    * names): each of 5 probe names takes its nearest supplier name by
    * levenshtein, ties broken by name. The probe side is tiny and
    * broadcast; the candidate scan is one pass — the same
    * queries-broadcast discipline as v1 brute-force kNN.
    */
  val editDistance: Q = Q(
    "f6_edit_distance",
    """WITH probes AS (
      |  SELECT s_suppkey AS probe_id, upper(s_name) AS probe
      |  FROM supplier WHERE s_suppkey <= 5)
      |SELECT probe_id, s_name AS best_match, CAST(d AS INT) AS dist FROM (
      |  SELECT probe_id, s_name, levenshtein(probe, s_name) AS d,
      |    row_number() OVER (PARTITION BY probe_id
      |                       ORDER BY levenshtein(probe, s_name), s_name) AS rn
      |  FROM supplier, probes)
      |WHERE rn = 1""".stripMargin) { (s, dir) =>
    val sup = t(s, dir, "supplier")
    val probes = sup.filter(col("s_suppkey") <= 5)
      .select(col("s_suppkey").as("probe_id"), upper(col("s_name")).as("probe"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("d"), col("s_name"))
    sup.select(col("s_name"))
      .crossJoin(broadcast(probes))
      .select(col("probe_id"), col("s_name"),
        levenshtein(col("probe"), col("s_name")).as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("probe_id"), col("s_name").as("best_match"),
        col("d").cast("int").as("dist"))
  }

  /** Explicit GROUPING SETS with grouping_id — the third grouping-set
    * flavor beyond a14's CUBE and e6's ROLLUP: exactly two chosen
    * subtotal shapes plus the grouping_id disambiguator (the null-vs-
    * subtotal marker a sentinel coalesce cannot distinguish).
    */
  val groupingSets: Q = Q(
    "a18_grouping_sets",
    """SELECT coalesce(l_returnflag, '-') AS flag,
      |  coalesce(l_linestatus, '-') AS status,
      |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("-")).as("flag"),
        coalesce(col("l_linestatus"), lit("-")).as("status"),
        col("gid").cast("long").as("gid"), col("n"))
  }

  /** CUBE grouping sets (all 4 subtotal combinations), null-free via
    * sentinels for hash-compare safety.
    */
  val cubeCounts: Q = Q(
    "a14_cube_counts",
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |  coalesce(l_linestatus, 'ALL') AS status, count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"))
  }

  /** O1/O3 global sort + top-k with a deterministic tiebreak. */
  val orderByTopK: Q = Q(
    "o1_orderby_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  // ------------------------------------------------- F: scalar functions

  /** §2.8 string kernel: lower/translate/substring_index/concat_ws/length
    * (reference Grounding.scala:347, Helpers.scala:94–96,
    * Grounding.scala:263–264, 298).
    */
  val stringFuncs: Q = Q(
    "f1_string_funcs",
    """SELECT p_partkey, lower(p_name) AS name_lower,
      |  translate(p_name, 'aeiou', 'AEIOU') AS name_trans,
      |  split_part(p_brand, '#', 2) AS brand_num,
      |  concat_ws('-', p_type, p_brand) AS type_brand,
      |  length(p_name) AS name_len
      |FROM part""".stripMargin) { (s, dir) =>
    t(s, dir, "part").select(
      col("p_partkey"),
      lower(col("p_name")).as("name_lower"),
      translate(col("p_name"), "aeiou", "AEIOU").as("name_trans"),
      substring_index(col("p_brand"), "#", -1).as("brand_num"),
      concat_ws("-", col("p_type"), col("p_brand")).as("type_brand"),
      length(col("p_name")).as("name_len"))
  }

  /** §2.8 date kernel: year/month/dayofmonth (reference
    * Grounding.scala:337–342).
    */
  val dateFuncs: Q = Q(
    "f2_date_funcs",
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
      |  count(*) AS n, max(CAST(EXTRACT(day FROM o_orderdate) AS INT)) AS max_day
      |FROM orders GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), max(dayofmonth(col("o_orderdate"))).as("max_day"))
  }

  /** §2.8 array kernel: sequence/explode/size (reference
    * Grounding.scala:168ff, Processing.scala:16).
    */
  val arrayFuncs: Q = Q(
    "f3_array_funcs",
    """SELECT o_orderkey, CAST(sum(i) AS BIGINT) AS tri_sum, count(*) AS n
      |FROM (SELECT o_orderkey, unnest(generate_series(1, o_orderkey % 4 + 1)) AS i FROM orders)
      |GROUP BY o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        explode(sequence(lit(1L), col("o_orderkey") % 4 + 1)).as("i"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("i")).as("tri_sum"), count(lit(1)).as("n"))
  }

  /** §2.8 to_json over struct (the literatureIndex sentences column shape,
    * reference Processing.scala:105).
    */
  val jsonFuncs: Q = Q(
    "f4_to_json",
    """SELECT o_orderkey,
      |  to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS j
      |FROM orders""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      to_json(struct(col("o_orderkey").as("k"), col("o_orderstatus").as("s"))).as("j"))
  }

  /** The harmonic relevance kernel (M-class; reference Helpers.scala:98–103)
    * as a grouped score: Σ price_k/k² over each customer's orders sorted
    * descending. Oracle reproduces it with row_number arithmetic.
    */
  val harmonicScore: Q = Q(
    "f5_harmonic_score",
    """SELECT o_custkey, round(sum(o_totalprice / pow(rn, 2)), 4) AS harmonic
      |FROM (SELECT o_custkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
      |      FROM orders)
      |GROUP BY o_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(round(graft.functions.Scoring.harmonicSorted(collect_list(col("o_totalprice"))), 4).as("harmonic"))
  }

  /** Z-order key (core.Layout.zorderKey, bits=8): min-max normalization
    * from a one-row in-plan aggregate, then the Morton bit-interleave
    * fold. The oracle replays the identical IEEE normalization and the
    * unrolled shift/and/or interleave, so the whole layout key — the
    * thing `writeZordered` range-partitions 100 TB by — is hash-checked
    * bit-for-bit. LayoutSpec separately measures the payoff (per-file
    * min-max ranges shrink on both dimensions).
    */
  /** Relative-rank window functions (percent_rank / cume_dist) over the
    * return-flag partitions with a fully unique ordering key. Both are
    * single divisions of exact integers — (rank−1)/(n−1) and
    * rows≤current/n — so the doubles are bit-identical cross-engine with
    * no rounding.
    *
    * Scale note: percent_rank over a 3-value partition key is an
    * inherent key-occupancy funnel — the function needs each group's
    * total count and rank, and the OUTPUT is the input size, so no
    * top-k bound applies. This is the SQL-surface parity shape; at
    * corpus scale derive the same quantity funnel-free with
    * Sampling.shuffleOrder's two-level pattern (per-range counts →
    * broadcast exclusive offsets → per-range local ranks) and divide by
    * the group totals from one combinable agg.
    */
  val rankFuncs: Q = Q(
    "w7_rank_funcs",
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_returnflag
      |             ORDER BY l_quantity, l_orderkey, l_linenumber)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  /** Two-phase salted hot-key aggregation (core.Skew.saltedCount) over
    * lineitem's 3-value return flag — the single-hot-reducer case AQE
    * does not split. The salt spreads each hot key over 16 partial
    * reducers; re-aggregation by key restores exact counts, which the
    * plain GROUP BY oracle verifies.
    */
  val saltedCount: Q = Q(
    "a17_salted_count",
    """SELECT l_returnflag, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    graft.core.Skew.saltedCount(t(s, dir, "lineitem"), Seq("l_returnflag"))
  }

  /** Salted replicated join (core.Skew.saltedJoin) for a skewed left side
    * against a right side too big to broadcast: left rows take a random
    * salt, the right side replicates across all salt values, the join key
    * becomes (key, salt) — each hot key spreads over `salts` reducers.
    * The salt is physical-partitioning-dependent, so the plain-join
    * oracle verifying the SAME aggregate is exactly the claim that
    * matters: result equals an unsalted inner equi-join.
    */
  val saltedJoin: Q = Q(
    "a19_salted_join",
    """SELECT s_name, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name""".stripMargin) { (s, dir) =>
    val left = t(s, dir, "lineitem").select(col("l_suppkey").as("suppkey"), col("l_quantity"))
    val right = t(s, dir, "supplier").select(col("s_suppkey").as("suppkey"), col("s_name"))
    graft.core.Skew.saltedJoin(left, right, "suppkey", salts = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("sum_qty"))
  }

  /** Bloom-pre-filtered semi join (Sketches.bloomSemiJoin): the build
    * side (customers with an urgent order) collapses into ONE broadcast
    * bit-array row and the probe stream drops non-members map-side
    * before any shuffle; the exact semi join then runs on the surviving
    * sliver. The plain-EXISTS oracle verifying identical output IS the
    * operator's claim — bloom probes have no false negatives and the
    * verify join removes the false positives, so the pre-filter changes
    * shuffled volume, never the answer. This is Spark's runtime-filter
    * pattern as a first-class operator for the places the optimizer's
    * injection heuristics don't reach.
    */
  val bloomSemiJoin: Q = Q(
    "j13_bloom_semi_join",
    """SELECT c_mktsegment, count(*) AS n_customers,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
    graft.functions.Sketches.bloomSemiJoin(
      t(s, dir, "customer"), col("c_custkey"),
      t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"), col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("c_custkey")).as("key_sum"))
  }

  val zorderKey: Q = {
    val bits = 8
    val interleave = (0 until bits).map(k =>
      s"(((na >> $k) & 1) << ${2 * k}) | (((nb >> $k) & 1) << ${2 * k + 1})")
      .mkString(" | ")
    Q(
      "p14_zorder_key",
      s"""WITH b AS (
         |  SELECT min(CAST(doc_id AS DOUBLE)) AS mina, max(CAST(doc_id AS DOUBLE)) AS maxa,
         |         min(CAST(n_chars AS DOUBLE)) AS minb, max(CAST(n_chars AS DOUBLE)) AS maxb
         |  FROM documents)
         |SELECT doc_id, CAST($interleave AS BIGINT) AS zkey FROM (
         |  SELECT doc_id,
         |    CAST(floor((CAST(doc_id AS DOUBLE) - mina) * 255 / greatest(maxa - mina, 1e-300)) AS BIGINT) AS na,
         |    CAST(floor((CAST(n_chars AS DOUBLE) - minb) * 255 / greatest(maxb - minb, 1e-300)) AS BIGINT) AS nb
         |  FROM documents CROSS JOIN b)""".stripMargin) { (s, dir) =>
      graft.core.Layout.zorderKey(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", bits = bits)
        .select(col("doc_id"), col("zkey"))
    }
  }

  /** Bounded-heap top-k per group (functions.TopKAgg): top-3 customers
    * by account balance per nation through the combinable k-bounded
    * aggregator, so the map side reduces every partition to ≤ 3 rows per
    * nation BEFORE the exchange — the oracle's window formulation (what
    * a user would write naively) shuffles and sorts the whole table to
    * keep 75 rows of it. Identical output is the aggregator's
    * correctness claim; TopKAggSpec pins partitioning invariance and the
    * ≤ k bound. Balances are compared raw (no arithmetic), custkey is
    * the deterministic tiebreak, rank recovered from the sorted array
    * position.
    */
  val topkAgg: Q = Q(
    "a20_topk_agg",
    """SELECT c_nationkey, rnk, c_custkey, c_acctbal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer) WHERE rnk <= 3""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(graft.functions.TopKAgg.topK(3)(col("c_acctbal"), col("c_custkey")).as("top"))
      .select(col("c_nationkey"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("c_nationkey"), (col("i") + 1).as("rnk"),
        col("e.id").as("c_custkey"), col("e.score").as("c_acctbal"))
  }

  /** Mergeable distinct-count sketches (DataSketches HLL): per
    * (returnflag, linestatus) sub-sketches built with hll_sketch_agg,
    * then UNIONED across linestatus with hll_union_agg before
    * estimating — the pattern approx_count_distinct cannot express
    * (its HLL±± buffer never leaves the aggregation), and the one an
    * incremental corpus pipeline needs: persist per-batch sketch
    * BLOBs, merge at read time without touching raw data. Checked the
    * a13 way: the exact count (pre-deduped, no Expand) rides beside
    * the estimate and the oracle replays the |approx−exact| ≤ 3·rsd
    * bound as a boolean (lgConfigK = 12 → rsd ≈ 1.04/√4096 ≈ 1.63%);
    * the estimate itself is a pure function of the value SET, so the
    * boolean is deterministic.
    */
  val hllSketchMerge: Q = Q(
    "a22_hll_sketch_merge",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_bound
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val sketched = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx_parts"))
    val exact = li
      .groupBy(col("l_returnflag"), col("l_partkey")).agg(lit(1))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("exact_parts"))
    exact
      .join(broadcast(sketched), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          lit(3 * 0.0163) * col("exact_parts")).as("within_bound"))
  }

  val all: Seq[Q] = Seq(
    hllSketchMerge,
    pricingSummary, collectSorted, groupMinMax, countDistinctQ, distinctQ,
    keyedDedup, approxDistinct, trainingBags, runningSum, twoLevelMin, denseRankTop1,
    windowCollectSet, broadcastJoin, leftOuterCoalesce, antiJoin, semiJoin,
    doubleResolutionJoin, lenientRankJoin, strictRankJoin,
    thetaSelfJoin, mergeFill, filterPredicates, caseCastCoalesce, structExpand,
    unionDistinct, intersectQ, exceptQ, intersectAllQ, exceptAllQ, editDistance, groupingSets, cubeCounts, orderByTopK, stringFuncs,
    dateFuncs, arrayFuncs, jsonFuncs, harmonicScore, leadNtile, percentiles,
    statsAggs, saltedCount, saltedJoin, rankFuncs, zorderKey, bloomSemiJoin,
    topkAgg)
}
