package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q.{decSum, t}

/** Event-time operators over the `events` table (event_id, ts, user_id,
  * event_type, value, props-json) — tumbling windows, sessionization,
  * lag/lead deltas, JSON extraction, pivot. These are the batch twins of
  * the Structured Streaming surface in graft.streaming: identical window
  * and session semantics, verifiable against the DuckDB oracle.
  *
  * The driver has shipped the parquet `ts` under two physical encodings
  * across rounds: TIMESTAMP(NANOS) — which the sessions read as long
  * nanos via spark.sql.legacy.parquet.nanosAsLong — and TIMESTAMP(MICROS)
  * without UTC adjustment, which Spark reads as TIMESTAMP_NTZ. [[events]]
  * normalizes both to one integer epoch-micros column `ts_us` — exactly
  * DuckDB's epoch_us(ts) — so all time arithmetic below is integer-exact
  * cross-engine regardless of encoding. (Double arithmetic would corrupt
  * the low bits: 1.7e18 ns exceeds the 2^53 double mantissa; the NTZ→LTZ
  * cast is exact because every session pins timeZone=UTC.)
  */
object EventQueries {

  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  /** events loader; adds `ts_us` (long epoch micros) per the note above. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "events")
    val us = df.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast("timestamp"))
      case _                => unix_micros(col("ts"))
    }
    df.withColumn("ts_us", us)
  }

  private def tsMicros: Column = col("ts_us")
  private def tsCol: Column = timestamp_micros(tsMicros)

  /** Tumbling 1-hour window aggregation per event type — the canonical
    * event-time rollup (map-side-combinable single shuffle on
    * (hour, type)).
    */
  val hourlyAgg: Q = Q(
    "e1_hourly_agg",
    """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    events(s, dir)
      .groupBy(date_trunc("hour", tsCol).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value"))
  }

  /** Sessionization with a 30-minute inactivity gap: lag → new-session
    * flag → running sum = session id → per-session rollup. Two window
    * passes over the same (user_id, ts) partitioning — one shuffle, both
    * windows pipelined in a single sort.
    */
  val sessionize: Q = Q(
    "e2_sessionize",
    """WITH flagged AS (
      |  SELECT user_id, epoch_us(ts) AS tu, event_id,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, tu,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  max(tu) - min(tu) AS duration_us
      |FROM numbered GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    events(s, dir)
      .select(col("user_id"), tsMicros.as("tu"), col("event_id"))
      .withColumn("prev", lag(col("tu"), 1).over(w))
      .withColumn(
        "new_sess",
        when(col("prev").isNull || col("tu") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), (max(col("tu")) - min(col("tu"))).as("duration_us"))
  }

  /** JSON property extraction + rollup (semi-structured payloads are the
    * norm in event pipelines; extraction is codegen'd, no UDF).
    */
  val jsonProps: Q = Q(
    "e3_json_props",
    """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |  count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"),
        count(lit(1)).as("n"))
  }

  /** lag-based inter-event deltas per user (the feature behind
    * time-since-last-action signals).
    */
  val lagDeltas: Q = Q(
    "e4_lag_deltas",
    """SELECT event_id, user_id,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us
      |FROM events""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    events(s, dir)
      .select(col("event_id"), col("user_id"), tsMicros.as("tu"))
      .select(col("event_id"), col("user_id"), (col("tu") - lag(col("tu"), 1).over(w)).as("delta_us"))
  }

  /** Per-user exponentially-decayed value (EWMA) — the recency-weighted
    * engagement/importance signal: events fold in (ts, event_id) order
    * and the running value halves per whole HOUR of gap before adding
    * the next event's value (ew' = v + ew / 2^k, k = gap hours capped at
    * 62). Every step is EXACT in IEEE doubles — the decay is a division
    * by a power of two and the gap count is integer `div` — so both
    * engines produce bit-identical results with no rounding tolerance
    * anywhere. One combinable shuffle on user_id; the ordered fold runs
    * over each user's own event list, never a corpus-wide window.
    */
  val ewmaDecay: Q = Q(
    "e13_ewma_decay",
    """WITH s AS (
      |  SELECT user_id, count(*) AS n_events,
      |    list({'tu': epoch_us(ts), 'eid': event_id, 'v': value}
      |         ORDER BY epoch_us(ts), event_id) AS a
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events,
      |  list_reduce(a, (acc, x) -> {'tu': x.tu, 'eid': acc.eid,
      |    'v': x.v + acc.v / CAST(1::BIGINT <<
      |           CAST(least((x.tu - acc.tu) // 3600000000, 62) AS INT) AS DOUBLE)}).v
      |    AS ewma
      |FROM s""".stripMargin) { (s, dir) =>
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"), tsMicros.as("tu"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("tu"), col("event_id").as("eid"),
          col("value").as("v")))).as("a"))
      .select(col("user_id"), col("n_events"),
        expr("""aggregate(a,
          |  named_struct('tu', a[0].tu, 'v', cast(0 as double)),
          |  (acc, x) -> named_struct('tu', x.tu,
          |    'v', x.v + acc.v / cast(shiftleft(cast(1 as bigint),
          |           cast(least((x.tu - acc.tu) div 3600000000, 62) as int)) as double)),
          |  acc -> acc.v)""".stripMargin).as("ewma"))
  }

  /** Pivot: per-user event-type counts as columns. Spark's relational
    * pivot operator; the oracle spells out the equivalent conditional
    * aggregation.
    */
  val pivotCounts: Q = Q(
    "e5_pivot_counts",
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
    events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
  }

  /** Unpivot (melt): the inverse of e5's pivot — the wide per-user count
    * matrix back to long (user_id, event_type, n) form, zero-filled
    * combinations included (what the wide form materializes). Spark's
    * native unpivot operator; the oracle replays it as a VALUES cross
    * join + CASE.
    */
  val unpivotCounts: Q = Q(
    "e14_unpivot",
    """WITH counts AS (
      |  SELECT user_id,
      |    count(*) FILTER (event_type = 'click') AS click,
      |    count(*) FILTER (event_type = 'error') AS error,
      |    count(*) FILTER (event_type = 'purchase') AS purchase,
      |    count(*) FILTER (event_type = 'signup') AS signup,
      |    count(*) FILTER (event_type = 'view') AS view
      |  FROM events GROUP BY user_id)
      |SELECT user_id, t.event_type,
      |  CASE t.event_type WHEN 'click' THEN click WHEN 'error' THEN error
      |       WHEN 'purchase' THEN purchase WHEN 'signup' THEN signup
      |       ELSE view END AS n
      |FROM counts, (VALUES ('click'), ('error'), ('purchase'), ('signup'),
      |              ('view')) t(event_type)""".stripMargin) { (s, dir) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(s, dir)
      .groupBy(col("user_id")).pivot("event_type", types).count()
      .na.fill(0L, types)
      .unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "n")
  }

  /** ROLLUP grouping sets over (event_type, hour) — subtotal + grand-total
    * rows, with grouping() markers folded into sentinel labels so the
    * output is null-free (hash-compare-safe) while keeping ANSI ROLLUP
    * semantics in both engines.
    */
  val rollupCounts: Q = Q(
    "e6_rollup_counts",
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |  coalesce(CAST(date_trunc('hour', ts) AS VARCHAR), 'ALL') AS hour, count(*) AS n
      |FROM events GROUP BY ROLLUP (event_type, date_trunc('hour', ts))""".stripMargin) { (s, dir) =>
    events(s, dir)
      .rollup(col("event_type"), date_trunc("hour", tsCol).as("hour"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss"), lit("ALL")).as("hour"),
        col("n"))
  }

  /** from_json typed parsing (vs e3's path extraction): the props payload
    * parsed against an explicit schema, then aggregated. At scale the
    * schema'd parse is codegen'd and prunes unparsed fields.
    */
  val fromJsonTyped: Q = Q(
    "e7_from_json_typed",
    """SELECT user_id,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
      |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
    events(s, dir)
      .select(col("user_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k").as("k"))
      .groupBy(col("user_id"))
      .agg(sum(col("k")).as("k_sum"), max(col("k")).as("k_max"))
  }

  /** MapType ops used internally (map_from_entries + element_at over the
    * per-user type→count map) with a scalar output so the result remains
    * engine-comparable; oracle computes the same lookup without maps.
    */
  val mapOps: Q = Q(
    "e8_map_ops",
    """SELECT user_id,
      |  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS clicks,
      |  count(DISTINCT event_type) AS n_types
      |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
    events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
      .select(
        col("user_id"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
        size(map_keys(col("m"))).cast("long").as("n_types"))
  }

  /** As-of join — for each purchase, the most recent click by the same
    * user at or before the purchase time. Spark has no ASOF operator; a
    * naive inequality join degenerates to a per-user cross product. This
    * is the scalable composition: tag both sides, union, and take a
    * running `last(click_ts) ignore nulls` over (user, time) — ONE shuffle
    * on user_id, linear work, no range blowup at any scale. Clicks sort
    * before purchases at equal timestamps (side 0 < 1), giving the
    * inclusive `>=` ASOF semantics; equal-timestamp click ties carry the
    * same tu so the output is deterministic.
    */
  val asofJoin: Q = Q(
    "e9_asof_join",
    """SELECT p.event_id, p.user_id, c.tu AS click_tu, p.tu - c.tu AS gap_us
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS tu FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS tu FROM events
      |      WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.tu >= c.tu""".stripMargin) { (s, dir) =>
    val ev = events(s, dir)
      .select(col("event_id"), col("user_id"), tsMicros.as("tu"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tu"), col("event_id"),
        lit(1).as("side"), lit(null).cast("long").as("ctu"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tu"), lit(null).cast("long").as("event_id"),
        lit(0).as("side"), col("tu").as("ctu"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("click_tu", last(col("ctu"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("click_tu"),
        (col("tu") - col("click_tu")).as("gap_us"))
  }

  /** Bounded range join — clicks within the 60 s before each error, per
    * user. The scalable plan bucketizes time into bins of exactly the
    * window length: each error probes its own bin and the previous one
    * (fan-out fixed at 2), the join is pure equi on (user, bin), and a
    * residual filter trims the bin edges. A (user, bin) hot spot stays
    * bounded by actual 60 s traffic, versus the unbounded per-user cross
    * product an inequality join would build.
    */
  val rangeJoinBucketed: Q = Q(
    "e10_range_join_bucketed",
    """SELECT e.event_id, e.user_id, count(c.tu) AS n_clicks
      |FROM (SELECT event_id, user_id, epoch_us(ts) AS tu FROM events
      |      WHERE event_type = 'error') e
      |LEFT JOIN (SELECT user_id, epoch_us(ts) AS tu FROM events
      |      WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id AND c.tu >= e.tu - 60000000 AND c.tu <= e.tu
      |GROUP BY e.event_id, e.user_id""".stripMargin) { (s, dir) =>
    val winUs = 60L * 1000 * 1000
    val ev = events(s, dir)
      .select(col("event_id"), col("user_id"), tsMicros.as("tu"), col("event_type"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("tu"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tu").as("c_tu"),
        expr(s"tu div $winUs").as("c_bin"))
    val hits = errors
      .withColumn("bin", explode(array(expr(s"tu div $winUs") - 1, expr(s"tu div $winUs"))))
      .join(clicks,
        col("user_id") === col("c_user") && col("bin") === col("c_bin"))
      .filter(col("c_tu") >= col("tu") - winUs && col("c_tu") <= col("tu"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_clicks"))
    errors.select(col("event_id"), col("user_id"))
      .join(hits, Seq("event_id"), "left")
      .na.fill(0L, Seq("n_clicks"))
  }

  /** Ordered funnel (view → click → purchase): stage k counts users whose
    * first stage-k event strictly follows their entry into stage k-1. A
    * ladder of per-user min-aggregations and equi-joins — each stage is
    * one shuffle on user_id over an already-filtered stream, no window
    * over full history.
    */
  val funnel: Q = Q(
    "e11_funnel",
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS tu, event_type FROM events),
      |v AS (SELECT user_id, min(tu) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(tu) AS t2 FROM ev e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND tu > t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(tu) AS t3 FROM ev e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND tu > t2 GROUP BY e.user_id)
      |SELECT stage, count(*) AS users FROM (
      |  SELECT '1_view' AS stage, user_id FROM v
      |  UNION ALL SELECT '2_click', user_id FROM c
      |  UNION ALL SELECT '3_purchase', user_id FROM p)
      |GROUP BY stage""".stripMargin) { (s, dir) =>
    val ev = events(s, dir)
      .select(col("user_id"), tsMicros.as("tu"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tu")).as("t1"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("tu") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("tu")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("tu") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("tu")).as("t3"))
    v.select(lit("1_view").as("stage"), col("user_id"))
      .unionByName(c.select(lit("2_click").as("stage"), col("user_id")))
      .unionByName(p.select(lit("3_purchase").as("stage"), col("user_id")))
      .groupBy(col("stage")).agg(count(lit(1)).as("users"))
  }

  /** Cohort retention: users grouped by first-seen day, counted per
    * day-offset of later activity. Two shuffles (per-user min, then the
    * (cohort, offset) rollup) — the standard retention matrix at any
    * scale.
    */
  val cohortRetention: Q = Q(
    "e12_cohort_retention",
    """WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |firstseen AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id),
      |activity AS (
      |  SELECT DISTINCT e.user_id, cohort, day - cohort AS day_offset
      |  FROM ev e JOIN firstseen USING (user_id))
      |SELECT cohort, day_offset, count(*) AS users
      |FROM activity GROUP BY cohort, day_offset""".stripMargin) { (s, dir) =>
    val ev = events(s, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    ev.join(first, "user_id")
      .select(col("user_id"), col("cohort"), (col("day") - col("cohort")).as("day_offset"))
      .distinct()
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** Type-2 slowly-changing dimension built from the event stream —
    * the warehouse gaps-and-islands op: per user, consecutive runs of
    * the same event_type collapse into versioned validity intervals
    * (valid_from = first event, valid_to = next version's start, open
    * for the current version). Change detection is a null-safe lag
    * compare; the island id is the running sum of change flags. All
    * three window passes and the rollup share the ONE user_id
    * partitioning — a single shuffle, the sorts pipeline; nothing is
    * corpus-wide. At 100 TB the dimension build stays a per-entity
    * linear scan exactly like e2's sessionization.
    */
  val scd2Dimension: Q = Q(
    "e15_scd2",
    """WITH ordered AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
      |    CASE WHEN lag(event_type)
      |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |         IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      |  FROM events),
      |islands AS (
      |  SELECT user_id, event_type, tu, event_id,
      |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS BIGINT) AS version
      |  FROM ordered),
      |dim AS (
      |  SELECT user_id, event_type, version,
      |    min(tu) AS valid_from_us, count(*) AS n_events
      |  FROM islands GROUP BY user_id, event_type, version)
      |SELECT user_id, event_type, version, valid_from_us,
      |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us,
      |  n_events
      |FROM dim""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
    events(s, dir)
      .select(col("user_id"), col("event_type"), tsMicros.as("tu"), col("event_id"))
      .withColumn("chg",
        when(!(lag(col("event_type"), 1).over(w) <=> col("event_type")), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(w))
      .groupBy(col("user_id"), col("event_type"), col("version"))
      .agg(min(col("tu")).as("valid_from_us"), count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wv))
      .select(col("user_id"), col("event_type"), col("version"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"))
  }

  /** Hopping (sliding) 1-hour window with a 15-minute hop, per event
    * type — the streaming hop-window's batch twin (e1 is the tumbling
    * special case). Spark's `window(ts, len, slide)` explodes each event
    * into exactly len/slide = 4 member windows BEFORE the aggregation,
    * so the shuffle carries a bounded 4× fan-out of map-side-combined
    * partials — never per-window rescans of the input. The oracle
    * replays the same membership set arithmetically: the windows
    * containing t are the 4 whose starts occupy the slide slots
    * t_slot−3 … t_slot.
    */
  val hoppingAgg: Q = Q(
    "e16_hopping_agg",
    """SELECT (epoch_us(ts) // 900000000 - k) * 900000000 AS wstart_us,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS total_value
      |FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    events(s, dir)
      .groupBy(window(tsCol, "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value"))
      .select(unix_micros(col("w.start")).as("wstart_us"), col("event_type"),
        col("n"), col("total_value"))
  }

  /** Time-series gap fill with linear interpolation — the
    * regularize-before-modeling step: per user, the hourly value series
    * gains a row for every missing hour between consecutive present
    * hours, carrying the linearly interpolated value and a filled flag.
    *
    * The scalable shape is lead + bounded explode, NOT a calendar
    * cross-join: each present row generates only its own gap's hours
    * (`sequence(hour, next_hour − 1)`), so fan-out is the user's actual
    * gap length, there is no corpus-wide hour spine to join, and the one
    * shuffle is the (user_id, hour) pre-aggregation the window then
    * reuses. Gaps longer than `maxGap` hours are left unfilled (the
    * boundary rows stay) — the fan-out bound that keeps a years-dormant
    * user from exploding into thousands of rows; both engines replay the
    * same cap. Interpolation arithmetic is the identical IEEE expression
    * tree in both engines (exact hourly sums via decimal, then one
    * divide-multiply-add), so filled values are bit-identical.
    */
  val gapFill: Q = {
    val maxGap = 48L
    Q(
      "e17_gap_fill",
      s"""WITH hourly AS (
         |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
         |    CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS v
         |  FROM events GROUP BY 1, 2),
         |nexted AS (
         |  SELECT user_id, hour, v,
         |    lead(hour) OVER (PARTITION BY user_id ORDER BY hour) AS nh,
         |    lead(v) OVER (PARTITION BY user_id ORDER BY hour) AS nv
         |  FROM hourly)
         |SELECT user_id, h AS hour,
         |  CASE WHEN h = hour THEN v
         |       ELSE v + (nv - v) * (CAST(h - hour AS DOUBLE) / CAST(nh - hour AS DOUBLE))
         |  END AS v,
         |  CAST(CASE WHEN h = hour THEN 0 ELSE 1 END AS BIGINT) AS filled
         |FROM (
         |  SELECT user_id, hour, v, nh, nv,
         |    unnest(CASE WHEN nh IS NULL OR nh - hour > $maxGap
         |                THEN [hour] ELSE range(hour, nh) END) AS h
         |  FROM nexted)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      events(s, dir)
        .groupBy(col("user_id"), expr("ts_us div 3600000000").as("hour"))
        .agg(decSum(col("value")).as("v"))
        .withColumn("nh", lead(col("hour"), 1).over(w))
        .withColumn("nv", lead(col("v"), 1).over(w))
        .withColumn("h",
          explode(when(col("nh").isNull || col("nh") - col("hour") > maxGap,
            array(col("hour")))
            .otherwise(sequence(col("hour"), col("nh") - 1))))
        .select(col("user_id"), col("h").as("hour"),
          when(col("h") === col("hour"), col("v"))
            .otherwise(col("v") + (col("nv") - col("v")) *
              ((col("h") - col("hour")).cast("double") /
                (col("nh") - col("hour")).cast("double"))).as("v"),
          when(col("h") === col("hour"), 0L).otherwise(1L).as("filled"))
    }
  }

  /** Rolling z-score anomaly signal: each event's value scored against
    * the mean/stddev of the SAME user's previous 10 events (a bounded
    * ROWS frame — state per key is O(frame), the streaming-compatible
    * shape, never a growing window). Cross-engine exactness comes from
    * the decimal-sum discipline: Σv and Σv² accumulate as DECIMAL(30,10)
    * (order-independent), and the variance/z arithmetic is the identical
    * IEEE expression tree in both engines. Events with fewer than 2
    * predecessors or zero variance get z = NULL rather than a division
    * artifact.
    */
  val rollingZscore: Q = Q(
    "e18_rolling_zscore",
    """WITH framed AS (
      |  SELECT event_id, user_id, value,
      |    count(*) OVER w AS n,
      |    CAST(sum(CAST(value AS DECIMAL(30,10))) OVER w AS DOUBLE) AS s,
      |    CAST(sum(CAST(value * value AS DECIMAL(30,10))) OVER w AS DOUBLE) AS s2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id, value,
      |  CASE WHEN n >= 2 AND s2 / n - (s / n) * (s / n) > 0
      |       THEN (value - s / n) / sqrt(s2 / n - (s / n) * (s / n))
      |  END AS z
      |FROM framed""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
      .rowsBetween(-10, -1)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"), tsMicros.as("tu"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s",
        sum(col("value").cast("decimal(30,10)")).over(w).cast("double"))
      .withColumn("s2",
        sum((col("value") * col("value")).cast("decimal(30,10)")).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("value"),
        when(col("n") >= 2 &&
          col("s2") / col("n") - (col("s") / col("n")) * (col("s") / col("n")) > 0,
          (col("value") - col("s") / col("n")) /
            sqrt(col("s2") / col("n") - (col("s") / col("n")) * (col("s") / col("n"))))
          .as("z"))
  }

  val all: Seq[Q] = Seq(hourlyAgg, sessionize, jsonProps, lagDeltas, ewmaDecay,
    pivotCounts, unpivotCounts, rollupCounts, fromJsonTyped, mapOps, asofJoin, rangeJoinBucketed,
    funnel, cohortRetention, scd2Dimension, hoppingAgg, gapFill, rollingZscore)
}
