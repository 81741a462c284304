"""Catalog entries for the §2.5 gap operators: linear interpolation,
adaptive moving average, rolling trend slope, kernel smoothing — all over
the daily events series (rounded on both sides before windowing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import _t, query

_DAILY = """
    daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(round(sum(value), 4) AS DOUBLE) AS v
      FROM events GROUP BY 1)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.round(F.sum("value"), 4).cast("double").alias("v")
    )


@query(
    "interpolate_daily_gaps",
    oracle=f"""
    WITH {_DAILY},
    g AS (
      SELECT d, CASE WHEN (row_number() OVER (ORDER BY d)) % 5 = 2
                     THEN NULL ELSE v END AS v
      FROM daily),
    m AS (SELECT d, v, row_number() OVER (ORDER BY d) AS t FROM g),
    x AS (
      SELECT d, v, t,
        last_value(v IGNORE NULLS) OVER wb AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wb AS pt,
        first_value(v IGNORE NULLS) OVER wf AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER wf AS nt
      FROM m
      WINDOW wb AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT d,
           CAST(round(CASE WHEN v IS NOT NULL THEN v
                           WHEN pv IS NULL THEN NULL
                           WHEN nv IS NULL THEN pv
                           ELSE pv + (nv - pv) * (t - pt) * 1.0 / (nt - pt) END,
                4) AS DOUBLE) AS v_interp
    FROM x
    """,
)
def interpolate_daily_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of synthesized gaps (interpolate_data,
    gofast/utils/base_utils.py:5628)."""
    from gofast_spark.operators import interpolate_data

    daily = _daily(spark, sf_dir)
    w = Window.orderBy("d")
    gapped = daily.select(
        "d",
        F.when(F.row_number().over(w) % 5 == 2, None).otherwise(F.col("v")).alias("v"),
    )
    out = interpolate_data(gapped, "v", "d")
    return out.select(
        "d", F.round("v_interp", 4).cast("double").alias("v_interp")
    )


@query(
    "adaptive_ma_daily",
    oracle=f"""
    WITH {_DAILY},
    idx AS (SELECT d, v, row_number() OVER (ORDER BY d) AS rn FROM daily),
    n AS (SELECT CAST(count(*) * 0.1 AS INTEGER) AS ws FROM daily)
    SELECT a.d, CAST(round(avg(b.v), 4) AS DOUBLE) AS v_ama
    FROM idx a JOIN idx b ON abs(a.rn - b.rn) <= (SELECT ws FROM n)
    GROUP BY a.d
    """,
)
def adaptive_ma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-adaptive symmetric mean (adaptive_moving_average,
    gofast/utils/spatial_utils.py:5043) — Spark runs one window over the
    ±ws frame; the oracle replays it as a banded self-join."""
    from gofast_spark.operators import adaptive_moving_average

    out = adaptive_moving_average(
        _daily(spark, sf_dir), "v", "d", window_size_factor=0.1, out_col="v_ama"
    )
    return out.select("d", F.round("v_ama", 4).cast("double").alias("v_ama"))


@query(
    "rolling_slope_daily",
    oracle=f"""
    WITH {_DAILY},
    m AS (
      SELECT d, v,
             CAST(date_diff('day', DATE '2024-01-01', d) AS DOUBLE) AS t
      FROM daily),
    s AS (
      SELECT d,
             count(v) OVER w AS n, sum(t) OVER w AS st, sum(v) OVER w AS sv,
             sum(t * v) OVER w AS stv, sum(t * t) OVER w AS stt
      FROM m
      WINDOW w AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT d,
           CAST(round(CASE WHEN n * stt - st * st = 0 THEN NULL
                ELSE (n * stv - st * sv) / (n * stt - st * st) END, 6) AS DOUBLE)
             AS v_slope_14
    FROM s
    """,
)
def rolling_slope_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling OLS slope (TrendFeatureExtractor,
    gofast/transformers/ts.py:141) from four windowed sums."""
    from gofast_spark.operators import rolling_slope

    daily = _daily(spark, sf_dir).withColumn(
        "t", F.datediff(F.col("d"), F.lit("2024-01-01")).cast("double")
    )
    out = rolling_slope(daily, "v", "t", "d", window_size=14)
    return out.select(
        "d", F.round("v_slope_14", 6).cast("double").alias("v_slope_14")
    )


@query(
    "smooth1d_triangle_daily",
    oracle=f"""
    WITH {_DAILY},
    l AS (
      SELECT d, v,
             lag(v, 2) OVER w AS m2, lag(v, 1) OVER w AS m1,
             lead(v, 1) OVER w AS p1, lead(v, 2) OVER w AS p2
      FROM daily WINDOW w AS (ORDER BY d))
    SELECT d,
           CAST(round(
             (coalesce(m2, 0) * 1 + coalesce(m1, 0) * 2 + v * 3
              + coalesce(p1, 0) * 2 + coalesce(p2, 0) * 1)
             / ((CASE WHEN m2 IS NULL THEN 0 ELSE 1 END)
                + (CASE WHEN m1 IS NULL THEN 0 ELSE 2 END) + 3
                + (CASE WHEN p1 IS NULL THEN 0 ELSE 2 END)
                + (CASE WHEN p2 IS NULL THEN 0 ELSE 1 END)), 4) AS DOUBLE)
             AS v_smooth
    FROM l
    """,
)
def smooth1d_triangle_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle-kernel smoothing, edge-renormalized (smooth1d,
    gofast/utils/base_utils.py:5221)."""
    from gofast_spark.operators import smooth1d

    out = smooth1d(
        _daily(spark, sf_dir), "v", "d", half_width=2, kernel="triangle",
        out_col="v_smooth",
    )
    return out.select(
        "d", F.round("v_smooth", 4).cast("double").alias("v_smooth")
    )


@query(
    "drop_consecutive_dups_events",
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, event_type,
             lag(event_type) OVER w AS prev,
             row_number() OVER w AS rn
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
    SELECT event_id, user_id, event_type FROM o
    WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    """,
)
def drop_consecutive_dups_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate compaction (operators/windows.py
    drop_consecutive_duplicates): each user's event stream keeps only
    its event_type CHANGE POINTS — the CDC/slowly-changing-state
    primitive that shrinks repeated-state streams by the run length.
    One key-partitioned window; null-safe comparison."""
    from gofast_spark.operators.windows import drop_consecutive_duplicates

    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    return drop_consecutive_duplicates(
        e, ["user_id"], "event_id", ["event_type"]
    )


@query(
    "funnel_events_vcp",
    oracle="""
    WITH f1 AS (
      SELECT user_id AS u, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    f2 AS (
      SELECT e.user_id AS u, min(e.ts) AS t
      FROM events e JOIN f1 ON f1.u = e.user_id
      WHERE e.event_type = 'click' AND e.ts >= f1.t
      GROUP BY e.user_id),
    f3 AS (
      SELECT e.user_id AS u, min(e.ts) AS t
      FROM events e JOIN f2 ON f2.u = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= f2.t
      GROUP BY e.user_id),
    c AS (SELECT (SELECT count(*) FROM f1) AS n1,
                 (SELECT count(*) FROM f2) AS n2,
                 (SELECT count(*) FROM f3) AS n3)
    SELECT 1 AS step_idx, 'view' AS step, CAST(n1 AS BIGINT) AS n_users,
           CAST(n1 AS DOUBLE) / n1 AS conv_from_prev,
           CAST(n1 AS DOUBLE) / n1 AS conv_from_first FROM c
    UNION ALL
    SELECT 2, 'click', CAST(n2 AS BIGINT),
           CAST(n2 AS DOUBLE) / n1, CAST(n2 AS DOUBLE) / n1 FROM c
    UNION ALL
    SELECT 3, 'purchase', CAST(n3 AS BIGINT),
           CAST(n3 AS DOUBLE) / n2, CAST(n3 AS DOUBLE) / n1 FROM c
    """,
)
def funnel_events_vcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase ordered funnel (operators/funnel.py):
    each step is one user-keyed join of the type-pruned event slice
    against the previous frontier, per-user min reach times, sequential
    at-or-after semantics — the oracle replays the identical chain."""
    from gofast_spark.operators.funnel import funnel

    e = _t(spark, sf_dir, "events")
    return funnel(e, "user_id", "ts", "event_type", ["view", "click", "purchase"])


@query(
    "retention_cohorts_events",
    oracle="""
    WITH ev AS (
      SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             event_type AS ty FROM events
      WHERE ts IS NOT NULL),
    first AS (
      SELECT u, min(s) AS t0 FROM ev WHERE ty = 'signup' GROUP BY u),
    active AS (
      SELECT DISTINCT ev.u,
             CAST(floor(t0 / 604800.0) AS BIGINT) AS cohort,
             CAST(floor((s - t0) / 604800.0) AS BIGINT) AS "offset"
      FROM ev JOIN first ON first.u = ev.u
      WHERE s >= t0 AND floor((s - t0) / 604800.0) < 8),
    sizes AS (
      SELECT CAST(floor(t0 / 604800.0) AS BIGINT) AS cohort,
             count(*) AS cohort_size
      FROM first GROUP BY 1)
    SELECT a.cohort, a."offset", CAST(count(*) AS BIGINT) AS n_active,
           CAST(any_value(cohort_size) AS BIGINT) AS cohort_size,
           CAST(count(*) / CAST(any_value(cohort_size) AS DOUBLE) AS DOUBLE)
             AS retention
    FROM active a JOIN sizes sz ON sz.cohort = a.cohort
    GROUP BY a.cohort, a."offset"
    """,
)
def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly signup-cohort retention triangle (operators/funnel.py
    retention_cohorts): entry times from one groupBy over the signup
    slice, one user-keyed join of the full stream, one (cohort, offset)
    distinct-count — unix-day arithmetic replayed verbatim in SQL."""
    from gofast_spark.operators.funnel import retention_cohorts

    e = _t(spark, sf_dir, "events")
    return retention_cohorts(
        e, "user_id", "ts", cohort_type="signup", type_col="event_type",
        period_days=7, max_periods=8,
    )


@query(
    "rfm_segments_events",
    oracle="""
    WITH base AS (
      SELECT user_id AS user,
             CAST(date_diff('day', CAST(max(ts) AS DATE), DATE '2024-12-31')
               AS DOUBLE) AS recency,
             CAST(count(*) AS DOUBLE) AS frequency,
             CAST(sum(value) AS DOUBLE) AS monetary
      FROM events WHERE ts IS NOT NULL GROUP BY user_id),
    cuts AS (
      SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS rq,
             quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fq,
             quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mq
      FROM base),
    scored AS (
      SELECT user, recency, frequency, monetary,
             1 + CAST(recency > rq[1] AS INT) + CAST(recency > rq[2] AS INT)
               + CAST(recency > rq[3] AS INT) + CAST(recency > rq[4] AS INT)
               AS r_raw,
             1 + CAST(frequency > fq[1] AS INT) + CAST(frequency > fq[2] AS INT)
               + CAST(frequency > fq[3] AS INT) + CAST(frequency > fq[4] AS INT)
               AS f_score,
             1 + CAST(monetary > mq[1] AS INT) + CAST(monetary > mq[2] AS INT)
               + CAST(monetary > mq[3] AS INT) + CAST(monetary > mq[4] AS INT)
               AS m_score
      FROM base CROSS JOIN cuts)
    SELECT user, recency, frequency, monetary,
           CAST(6 - r_raw AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(6 - r_raw AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS rfm
    FROM scored
    """,
)
def rfm_segments_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of event users (operators/funnel.py
    rfm_segments; Hughes 1994): one user groupBy, exact quintile cuts
    as one aggregate of the user-sized frame, codegen scoring; fixed
    reference date keeps it deterministic; oracle replays cuts +
    comparisons with quantile_cont."""
    from gofast_spark.operators.funnel import rfm_segments

    e = _t(spark, sf_dir, "events")
    return rfm_segments(
        e, "user_id", "ts", "value", ref_date="2024-12-31"
    )


@query(
    "funnel_latencies_events",
    oracle="""
    WITH ev AS (
      SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             event_type AS ty FROM events
      WHERE ts IS NOT NULL),
    f1 AS (SELECT u, min(s) AS t FROM ev WHERE ty = 'view' GROUP BY u),
    f2 AS (
      SELECT ev.u, f1.t AS prev, min(ev.s) AS t
      FROM ev JOIN f1 ON f1.u = ev.u
      WHERE ev.ty = 'click' AND ev.s >= f1.t GROUP BY ev.u, f1.t),
    f3 AS (
      SELECT ev.u, f2.t AS prev, min(ev.s) AS t
      FROM ev JOIN f2 ON f2.u = ev.u
      WHERE ev.ty = 'purchase' AND ev.s >= f2.t GROUP BY ev.u, f2.t)
    SELECT 1 AS step_idx, 'view->click' AS transition,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(floor(avg(t - prev) * 1000000 + 0.5) AS BIGINT)
             AS avg_latency_us,
           CAST(floor(quantile_cont(CAST(t - prev AS DOUBLE), 0.5)
                * 1000000 + 0.5) AS BIGINT) AS median_latency_us
    FROM f2
    UNION ALL
    SELECT 2, 'click->purchase', CAST(count(*) AS BIGINT),
           CAST(floor(avg(t - prev) * 1000000 + 0.5) AS BIGINT),
           CAST(floor(quantile_cont(CAST(t - prev AS DOUBLE), 0.5)
                * 1000000 + 0.5) AS BIGINT)
    FROM f3
    """,
)
def funnel_latencies_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transition funnel latencies (operators/funnel.py
    funnel_latencies): the same frontier chain as funnel_events_vcp
    with mean + exact-median seconds between reach times, aggregated
    over user-sized frames only.  r8 driver red (hash-only): the
    oracle's DuckDB ``epoch(ts)`` keeps microseconds while the engine's
    ``unix_timestamp`` floors to whole seconds — sub-second latency
    mass diverged below the old 6-sig-digit local gate.  The oracle now
    floors epoch to match the engine's second semantics exactly, and
    both sides present micro-unit integers (identical IEEE doubles →
    identical floor(x*1e6+0.5))."""
    from gofast_spark.operators.funnel import funnel_latencies

    e = _t(spark, sf_dir, "events")
    out = funnel_latencies(
        e, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )
    return out.select(
        "step_idx",
        "transition",
        "n_users",
        F.floor(F.col("avg_latency_sec") * 1000000.0 + 0.5)
        .cast("bigint")
        .alias("avg_latency_us"),
        F.floor(F.col("median_latency_sec") * 1000000.0 + 0.5)
        .cast("bigint")
        .alias("median_latency_us"),
    )


@query(
    "markov_transitions_events",
    oracle="""
    WITH ev AS (
      SELECT user_id AS u, ts, event_type AS ty FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    p AS (
      SELECT ty AS from_type,
             lead(ty) OVER (PARTITION BY u ORDER BY ts, ty) AS to_type
      FROM ev),
    c AS (
      SELECT from_type, to_type, count(*) AS n FROM p
      WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
    r AS (SELECT from_type, sum(n) AS rt FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
           CAST(c.n / CAST(r.rt AS DOUBLE) AS DOUBLE) AS p
    FROM c JOIN r ON r.from_type = c.from_type
    """,
)
def markov_transitions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream
    (operators/funnel.py markov_transitions): consecutive per-user
    events under the deterministic (ts, type) ordering, one partitioned
    lead window + one (from, to) groupBy + a vocab-sized row-normalizer
    broadcast.  The oracle replays the identical window."""
    from gofast_spark.operators.funnel import markov_transitions

    e = _t(spark, sf_dir, "events")
    return markov_transitions(e, "user_id", "ts", "event_type")


@query(
    "funnel_by_segment_events",
    oracle="""
    WITH mins AS (
      SELECT user_id,
             CAST(user_id % 3 AS INT) AS segment,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
      FROM events WHERE ts IS NOT NULL GROUP BY user_id)
    SELECT segment, CAST(1 AS INT) AS step_idx, 'view' AS step,
           count(CASE WHEN t0 IS NOT NULL THEN 1 END) AS n_users
    FROM mins GROUP BY segment
    UNION ALL
    SELECT segment, CAST(2 AS INT), 'click',
           count(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL
                       AND t1 >= t0 THEN 1 END)
    FROM mins GROUP BY segment
    UNION ALL
    SELECT segment, CAST(3 AS INT), 'purchase',
           count(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL
                       AND t1 >= t0 AND t2 IS NOT NULL
                       AND t2 >= t1 THEN 1 END)
    FROM mins GROUP BY segment
    """,
)
def funnel_by_segment_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented first-touch funnel (operators/funnel.py
    first_touch_mins/counts with ``by=``): per-segment step counts from
    ONE (user, segment) state groupBy + one segment-grouped fold — the
    funnel-times-dimension breakdown a growth dashboard pivots on,
    still exactly streaming-maintainable (the segment is a user
    attribute riding the min state)."""
    from gofast_spark.operators.funnel import (
        first_touch_counts,
        first_touch_mins,
    )

    steps = ["view", "click", "purchase"]
    e = _t(spark, sf_dir, "events").withColumn(
        "segment", (F.col("user_id") % 3).cast("int")
    )
    mins = first_touch_mins(
        e, "user_id", "ts", "event_type", steps, by="segment"
    )
    return first_touch_counts(mins, steps, by="segment")


@query(
    "funnel_windowed_events",
    oracle="""
    WITH ev AS (
      SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             event_type AS ty FROM events
      WHERE ts IS NOT NULL),
    f1 AS (
      SELECT u, min(s) AS t FROM ev WHERE ty = 'view' GROUP BY u),
    f2 AS (
      SELECT e.u, min(e.s) AS t
      FROM ev e JOIN f1 ON f1.u = e.u
      WHERE e.ty = 'click' AND e.s >= f1.t AND e.s <= f1.t + 86400
      GROUP BY e.u),
    f3 AS (
      SELECT e.u, min(e.s) AS t
      FROM ev e JOIN f2 ON f2.u = e.u
      WHERE e.ty = 'purchase' AND e.s >= f2.t AND e.s <= f2.t + 86400
      GROUP BY e.u),
    c AS (SELECT (SELECT count(*) FROM f1) AS n1,
                 (SELECT count(*) FROM f2) AS n2,
                 (SELECT count(*) FROM f3) AS n3)
    SELECT 1 AS step_idx, 'view' AS step, CAST(n1 AS BIGINT) AS n_users,
           CAST(n1 AS DOUBLE) / n1 AS conv_from_prev,
           CAST(n1 AS DOUBLE) / n1 AS conv_from_first FROM c
    UNION ALL
    SELECT 2, 'click', CAST(n2 AS BIGINT),
           CAST(n2 AS DOUBLE) / n1, CAST(n2 AS DOUBLE) / n1 FROM c
    UNION ALL
    SELECT 3, 'purchase', CAST(n3 AS BIGINT),
           CAST(n3 AS DOUBLE) / n2, CAST(n3 AS DOUBLE) / n1 FROM c
    """,
)
def funnel_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hour conversion-window funnel (operators/funnel.py
    funnel_windowed): sequential view -> click -> purchase where each
    step must land within a day of the previous reach — the bounded
    -window form real product funnels use; same checkpointed frontier
    chain as ``funnel`` with one extra codegen predicate."""
    from gofast_spark.operators.funnel import funnel_windowed

    e = _t(spark, sf_dir, "events")
    return funnel_windowed(
        e, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], window_sec=86_400,
    )


@query(
    "ewma_daily_events",
    oracle=f"""
    WITH {_DAILY},
    idx AS (SELECT d, v, CAST(row_number() OVER (ORDER BY d) AS DOUBLE)
                AS rn FROM daily),
    c AS (SELECT d, rn, v * power(0.5, -rn) AS cv FROM idx),
    s AS (
      SELECT d, rn, cv,
             sum(cv) OVER wc AS scv,
             first_value(cv) OVER wc AS c1
      FROM c
      WINDOW wc AS (ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT d,
           CAST(round(power(0.5, rn) * (0.5 * (scv - c1) + c1), 4)
             AS DOUBLE) AS v_ewma
    FROM s
    """,
)
def ewma_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA over the daily revenue series (ts/engineering.py ewma;
    Hunter JQT 1986): the recursive filter as ONE cumulative window via
    the r^{-i} scaled-sum closed form — no UDF, no driver loop.  With
    alpha = 0.5 every coefficient is dyadic, so both engines compute
    identical doubles; the oracle replays the same closed form."""
    from gofast_spark.ts.engineering import ewma

    out = ewma(_daily(spark, sf_dir), "d", "v", alpha=0.5, out_col="v_ewma")
    return out.select(
        "d", F.round("v_ewma", 4).cast("double").alias("v_ewma")
    )


_BROWN_P1 = f"""
    {_DAILY},
    idx AS (SELECT d, v, CAST(row_number() OVER (ORDER BY d) AS DOUBLE)
                AS rn FROM daily),
    c AS (SELECT d, v, rn, v * power(0.5, -rn) AS cv FROM idx),
    s AS (
      SELECT d, v, rn, cv,
             sum(cv) OVER wc AS scv,
             first_value(cv) OVER wc AS c1
      FROM c
      WINDOW wc AS (ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    p1 AS (SELECT d, v, rn,
                  power(0.5, rn) * (0.5 * (scv - c1) + c1) AS s1 FROM s),
    pairs AS (
      SELECT t.rn AS t, t.d, t.v, t.s1, i.rn AS i, i.s1 AS s1_i
      FROM p1 t JOIN p1 i ON i.rn <= t.rn),
    terms AS (
      SELECT t, d, v, s1,
             CAST(floor((CASE WHEN i = 1 THEN power(0.5, t - 1)
                         ELSE 0.5 * power(0.5, t - i) END)
                        * s1_i * 1000000 + 0.5) AS BIGINT) AS u
      FROM pairs),
    sm AS (
      SELECT d, v, s1, sum(u) / 1000000.0 AS s2
      FROM terms GROUP BY t, d, v, s1)
"""


@query(
    "brown_smoothing_daily_events",
    oracle=f"""
    WITH {_BROWN_P1}
    SELECT d, CAST(v AS DOUBLE) AS v,
           CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
           CAST(2 * s1 - s2 AS DOUBLE) AS level,
           CAST(s1 - s2 AS DOUBLE) AS trend
    FROM sm
    """,
)
def brown_smoothing_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing of the daily revenue
    series (ts/engineering.py double_ewma; Brown 1959, Gardner 1985):
    pass 1 is the engine-exact dyadic scaled-sum EWMA, pass 2 the
    series-sized banded self-join with micro-unit-quantized terms so
    no float sum depends on partition order.  All outputs are
    unrounded — both engines produce bit-identical doubles."""
    from gofast_spark.ts.engineering import double_ewma

    out = double_ewma(_daily(spark, sf_dir), "d", "v", alpha=0.5)
    return out.select(
        "d", "v", "s1", "s2", "level", "trend"
    )


@query(
    "brown_forecast_daily_events",
    oracle=f"""
    WITH {_BROWN_P1},
    last AS (
      SELECT 2 * s1 - s2 AS level, s1 - s2 AS trend
      FROM sm ORDER BY d DESC LIMIT 1)
    SELECT h, CAST(level + h * trend AS DOUBLE) AS forecast
    FROM last, (SELECT unnest(generate_series(1, 7)) AS h)
    """,
)
def brown_forecast_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day-ahead Brown linear forecast from the final smoothing
    state (ts/engineering.py brown_forecast): the last state picked
    in-plan via max_by (no global sort), horizon rows from one
    sequence explode; forecasts are arithmetic on engine-identical
    doubles, so unrounded parity holds."""
    from gofast_spark.ts.engineering import brown_forecast, double_ewma

    sm = double_ewma(_daily(spark, sf_dir), "d", "v", alpha=0.5)
    out = brown_forecast(sm, "d", horizon=7)
    return out.select(F.col("h").cast("bigint").alias("h"), "forecast")


@query(
    "cohort_ltv_events",
    oracle="""
    WITH ev AS (
      SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             value AS a, event_type AS ty
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    first AS (
      SELECT u, min(s) AS t0 FROM ev WHERE ty = 'signup' GROUP BY u),
    rev AS (
      SELECT CAST(floor(t0 / 604800.0) AS BIGINT) AS cohort,
             CAST(floor((s - t0) / 604800.0) AS BIGINT) AS "offset",
             sum(CAST(floor(CAST(a AS DOUBLE) * 1e6 + 0.5) AS HUGEINT))
               AS r
      FROM ev JOIN first ON first.u = ev.u
      WHERE s >= t0 AND floor((s - t0) / 604800.0) < 8
      GROUP BY 1, 2),
    sizes AS (
      SELECT CAST(floor(t0 / 604800.0) AS BIGINT) AS cohort,
             count(*) AS cohort_size
      FROM first GROUP BY 1)
    SELECT rev.cohort, rev."offset",
           CAST(any_value(cohort_size) AS BIGINT) AS cohort_size,
           CAST(any_value(r) AS DOUBLE) / 1e6 AS revenue,
           CAST(sum(any_value(r)) OVER wc AS DOUBLE) / 1e6
             AS cum_revenue,
           CAST(sum(any_value(r)) OVER wc AS DOUBLE) / 1e6
             / CAST(any_value(cohort_size) AS DOUBLE) AS ltv_per_user
    FROM rev JOIN sizes sz ON sz.cohort = rev.cohort
    GROUP BY rev.cohort, rev."offset"
    WINDOW wc AS (PARTITION BY rev.cohort ORDER BY rev."offset"
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def cohort_ltv_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly signup-cohort LTV curve (operators/funnel.py cohort_ltv)
    — cumulative revenue per cohort user by cohort age, the monetary
    companion to `retention_cohorts_events`; exact micro-unit sums,
    matrix-sized cumulative window."""
    from gofast_spark.operators.funnel import cohort_ltv

    e = _t(spark, sf_dir, "events")
    return cohort_ltv(
        e, "user_id", "ts", "value", cohort_type="signup",
        type_col="event_type", period_days=7, max_periods=8,
    ).select(
        "cohort", "offset", "cohort_size", "revenue", "cum_revenue",
        "ltv_per_user",
    )


@query(
    "seasonal_naive_mase_daily",
    oracle=f"""
    WITH {_DAILY},
    l AS (
      SELECT v, lag(v, 1) OVER (ORDER BY d) AS l1,
             lag(v, 7) OVER (ORDER BY d) AS ls
      FROM daily),
    a AS (
      SELECT count(CASE WHEN v IS NOT NULL AND l1 IS NOT NULL
                        THEN 1 END) AS n_naive,
             count(CASE WHEN v IS NOT NULL AND ls IS NOT NULL
                        THEN 1 END) AS n_seasonal,
             sum(CAST(floor(abs(v - l1) * 1000000 + 0.5) AS BIGINT)) AS e1,
             sum(CAST(floor(abs(v - ls) * 1000000 + 0.5) AS BIGINT)) AS es
      FROM l)
    SELECT CAST(n_naive AS BIGINT) AS n_naive,
           CAST(n_seasonal AS BIGINT) AS n_seasonal,
           CAST(e1 AS DOUBLE) / 1000000.0 / CAST(n_naive AS DOUBLE)
             AS mae_naive,
           CAST(es AS DOUBLE) / 1000000.0 / CAST(n_seasonal AS DOUBLE)
             AS mae_seasonal,
           (CAST(es AS DOUBLE) / 1000000.0 / CAST(n_seasonal AS DOUBLE))
             / (CAST(e1 AS DOUBLE) / 1000000.0 / CAST(n_naive AS DOUBLE))
             AS mase_seasonal
    FROM a
    """,
)
def seasonal_naive_mase_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline benchmark over the daily revenue series
    (ts/engineering.py seasonal_naive_accuracy; Hyndman & Koehler, IJF
    2006): naive vs weekly seasonal-naive in-sample MAE and the
    seasonal variant's MASE — the scale-free bar any real forecast
    must clear.  Two lag windows + one aggregate; absolute errors
    micro-unit-quantized so both MAEs and their ratio are
    deterministic integer functions."""
    from gofast_spark.ts.engineering import seasonal_naive_accuracy

    return seasonal_naive_accuracy(
        _daily(spark, sf_dir), "d", "v", season=7
    )


@query(
    "ddm_drift_daily_events",
    oracle="""
    WITH dd AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n,
             sum(CAST(event_type = 'error' AS BIGINT)) AS e
      FROM events GROUP BY 1),
    cum AS (
      SELECT d, row_number() OVER (ORDER BY d) AS rn,
             sum(n) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cum_n,
             sum(e) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cum_err
      FROM dd),
    ps AS (
      SELECT d, rn, cum_n, cum_err,
             CAST(cum_err AS DOUBLE) / CAST(cum_n AS DOUBLE) AS p
      FROM cum),
    sc2 AS (
      SELECT d, rn, cum_n, cum_err,
             CAST(floor((p + sqrt(p * (1.0 - p) / CAST(cum_n AS DOUBLE)))
               * 1000000000 + 0.5) AS BIGINT) AS ps_u9,
             CAST(floor(sqrt(p * (1.0 - p) / CAST(cum_n AS DOUBLE))
               * 1000000000 + 0.5) AS BIGINT) AS s_u9
      FROM ps),
    keyed AS (
      SELECT d, rn, cum_n, cum_err, ps_u9, s_u9,
             min(ps_u9 * 2097152 + rn) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS minkey
      FROM sc2),
    fl AS (
      SELECT k.d, k.cum_n, k.cum_err, k.ps_u9,
             CAST((k.minkey - k.minkey % 2097152) // 2097152 AS BIGINT)
               AS ps_min_u9,
             m.s_u9 AS s_min_u9
      FROM keyed k JOIN sc2 m ON m.rn = k.minkey % 2097152)
    SELECT d AS "order", CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_err AS BIGINT) AS cum_err, ps_u9, ps_min_u9,
           s_min_u9,
           CASE WHEN ps_u9 >= ps_min_u9 + 3 * s_min_u9 THEN 'drift'
                WHEN ps_u9 >= ps_min_u9 + 2 * s_min_u9 THEN 'warning'
                ELSE 'stable' END AS state
    FROM fl
    """,
)
def ddm_drift_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift Detection Method over the daily error-rate stream
    (ts/changepoint.py ddm_drift; Gama, Medas, Castillo & Rodrigues,
    SBIA 2004): the cumulative error proportion's p + s tracked
    against its running minimum, warning at 2 sigma and drift at 3
    sigma above it — the standard concept-drift monitor for a model
    serving pipeline.  The joint (value, index) running min is a
    packed-integer key (earliest-index tie-break, engine-exact); s at
    the minimizing index via one rollup-sized equi-join."""
    from gofast_spark.ts.changepoint import ddm_drift

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("bigint")).alias("err"),
    )
    return ddm_drift(daily, "d", "n", "err")
