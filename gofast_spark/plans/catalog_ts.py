"""Catalog entries for the time-series pack (SURVEY §2.11) over the
events table — daily-aggregated series features, ACF, trend, splits,
frequency inference, each hash-matched against DuckDB.

The daily series rounds its sum to 4 decimals on BOTH sides before any
windowing, so every downstream feature starts from bit-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import _t, query

_DAILY_SQL = """
    SELECT CAST(ts AS DATE) AS d,
           CAST(round(sum(value), 4) AS DOUBLE) AS v,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS t
    FROM events GROUP BY 1, 3
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.col("ts").cast("date").alias("d"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).alias("t"),
    ).agg(F.round(F.sum("value"), 4).cast("double").alias("v"))


@query(
    "ts_engineering_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT d,
           lag(v, 1) OVER w AS v_lag_1,
           lag(v, 7) OVER w AS v_lag_7,
           CAST(round(avg(v) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS v_rollmean_7,
           CAST(round(v - lag(v, 1) OVER w, 4) AS DOUBLE) AS v_diff,
           CAST(round(sin(2 * pi() * t / 365.0), 6) AS DOUBLE) AS fourier_sin_1,
           CAST(round(cos(2 * pi() * t / 365.0), 6) AS DOUBLE) AS fourier_cos_1
    FROM daily WINDOW w AS (ORDER BY d)
    """,
)
def ts_engineering_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass lag/rolling/diff/Fourier bundle (ts_engineering,
    gofast/utils/ts_utils.py:2482)."""
    from gofast_spark.ts import ts_engineering

    out = ts_engineering(
        _daily(spark, sf_dir),
        "v",
        "d",
        lags=(1, 7),
        roll_windows=(7,),
        diff=True,
        fourier_k=1,
        fourier_period=365.0,
        time_index_col="t",
    )
    return out.select(
        "d",
        "v_lag_1",
        "v_lag_7",
        F.round("v_rollmean_7", 4).cast("double").alias("v_rollmean_7"),
        F.round("v_diff", 4).cast("double").alias("v_diff"),
        F.round("fourier_sin_1", 6).cast("double").alias("fourier_sin_1"),
        F.round("fourier_cos_1", 6).cast("double").alias("fourier_cos_1"),
    )


@query(
    "acf_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
      SELECT v,
             lag(v, 1) OVER (ORDER BY d) AS l1,
             lag(v, 2) OVER (ORDER BY d) AS l2,
             lag(v, 7) OVER (ORDER BY d) AS l7
      FROM daily)
    SELECT CAST(round(corr(v, l1), 6) AS DOUBLE) AS acf_1,
           CAST(round(corr(v, l2), 6) AS DOUBLE) AS acf_2,
           CAST(round(corr(v, l7), 6) AS DOUBLE) AS acf_7
    FROM l
    """,
)
def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF at lags 1/2/7 as corr-with-lag aggregates (ts_corr_analysis,
    gofast/utils/ts_utils.py:2913)."""
    from gofast_spark.ts import acf

    out = acf(_daily(spark, sf_dir), "v", "d", lags=(1, 2, 7))
    return out.select(
        F.round("acf_1", 6).cast("double").alias("acf_1"),
        F.round("acf_2", 6).cast("double").alias("acf_2"),
        F.round("acf_7", 6).cast("double").alias("acf_7"),
    )


@query(
    "trend_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT CAST(round(covar_samp(t, v) / var_samp(t), 6) AS DOUBLE) AS slope,
           CAST(round(avg(v) - (covar_samp(t, v) / var_samp(t)) * avg(t), 4) AS DOUBLE) AS intercept,
           CAST(round(pow(corr(t, v), 2), 6) AS DOUBLE) AS r2,
           count(v) AS n
    FROM daily
    """,
)
def trend_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global OLS trend in one aggregate (trend_analysis,
    gofast/utils/ts_utils.py:720)."""
    from gofast_spark.ts import trend_analysis

    out = trend_analysis(_daily(spark, sf_dir), "v", "t")
    return out.select(
        F.round("slope", 6).cast("double").alias("slope"),
        F.round("intercept", 4).cast("double").alias("intercept"),
        F.round("r2", 6).cast("double").alias("r2"),
        "n",
    )


@query(
    "ts_split_counts_events",
    oracle="""
    WITH m AS (
      SELECT event_type, cume_dist() OVER (ORDER BY ts, event_id) AS cd
      FROM events)
    SELECT event_type,
           CAST(count(*) FILTER (cd <= 0.8) AS BIGINT) AS n_train,
           CAST(count(*) FILTER (cd > 0.8) AS BIGINT) AS n_test
    FROM m GROUP BY event_type
    """,
)
def ts_split_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fractional time split via cume_dist (ts_split,
    gofast/utils/ts_utils.py:3577); the cutoff/approx modes are the
    scale paths."""
    from gofast_spark.ts import ts_split

    e = _t(spark, sf_dir, "events")
    train, test = ts_split(e, "ts", test_frac=0.2, tiebreak="event_id")
    tr = train.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_train"))
    te = test.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_test"))
    return tr.join(te, "event_type", "outer").fillna(0, ["n_train", "n_test"])


@query(
    "infer_frequency_events",
    oracle="""
    WITH s AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts FROM events),
    g AS (SELECT sec - lag(sec) OVER (ORDER BY ts) AS gap FROM s)
    SELECT gap AS freq_seconds, CAST(count(*) AS BIGINT) AS n_gaps
    FROM g WHERE gap IS NOT NULL
    GROUP BY gap ORDER BY n_gaps DESC, gap ASC LIMIT 1
    """,
)
def infer_frequency_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant inter-event gap (smart_ts_detector / get_time_steps,
    gofast/core/array_manager.py:881, gofast/utils/mathext.py:1631)."""
    from gofast_spark.ts import infer_frequency

    return infer_frequency(_t(spark, sf_dir, "events"), "ts")


@query(
    "ts_outlier_z_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT d,
           CAST(round((v - avg(v) OVER w) / stddev_samp(v) OVER w, 4) AS DOUBLE) AS rolling_z
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def ts_outlier_z_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outlier signal (ts_outlier_detector,
    gofast/utils/ts_utils.py:3843)."""
    from gofast_spark.ts import ts_outlier_detector

    out = ts_outlier_detector(_daily(spark, sf_dir), "v", "d", window=7)
    return out.select(
        "d", F.round("rolling_z", 4).cast("double").alias("rolling_z")
    )


@query(
    "kpss_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    st AS (SELECT avg(v) AS mu, count(*) AS n FROM daily),
    e AS (SELECT d, v - mu AS e, n FROM daily, st),
    s AS (
      SELECT d, e, n,
             sum(e) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS S,
             lag(e, 1) OVER (ORDER BY d) AS e1,
             lag(e, 2) OVER (ORDER BY d) AS e2,
             lag(e, 3) OVER (ORDER BY d) AS e3,
             lag(e, 4) OVER (ORDER BY d) AS e4,
             lag(e, 5) OVER (ORDER BY d) AS e5
      FROM e
    )
    SELECT 'daily' AS series,
           CAST(round(
             (sum(S * S) / (max(n) * max(n))) /
             ((sum(e * e)
               + 2 * ((1 - 1/6.0) * sum(e * e1)
                    + (1 - 2/6.0) * sum(e * e2)
                    + (1 - 3/6.0) * sum(e * e3)
                    + (1 - 4/6.0) * sum(e * e4)
                    + (1 - 5/6.0) * sum(e * e5))) / max(n)),
             6) AS DOUBLE) AS kpss_stat,
           CAST(5 AS BIGINT) AS lags,
           CAST(max(n) AS BIGINT) AS n
    FROM s
    """,
)
def kpss_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic on the daily revenue series
    (trend_analysis strategy='kpss', gofast/utils/ts_utils.py:720).  The
    oracle rebuilds the statistic from its definition: Bartlett-weighted
    long-run variance over 5 lags, partial-sum quadratic over n^2."""
    from gofast_spark.ts import kpss_test

    daily = _daily(spark, sf_dir).withColumn("series", F.lit("daily"))
    out = kpss_test(daily, "series", "d", "v", regression="c", nlags=5)
    return out.select(
        "series",
        F.round("kpss_stat", 6).cast("double").alias("kpss_stat"),
        "lags",
        "n",
    )


@query(
    "seasonal_decompose_daily",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS d, round(sum(value), 4) AS v
      FROM events GROUP BY 1),
    tr AS (
      SELECT d, v,
             CASE WHEN count(*) OVER w = 7 THEN avg(v) OVER w END AS trend,
             datediff('day', DATE '1970-01-01', d) % 7 AS phase
      FROM d WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    pm AS (SELECT phase, avg(v - trend) AS pmean FROM tr GROUP BY phase),
    gm AS (SELECT avg(pmean) AS g FROM pm)
    SELECT tr.d,
           CAST(round(tr.trend, 4) AS DOUBLE) AS trend,
           CAST(round(pm.pmean - gm.g, 4) AS DOUBLE) AS seasonal,
           CAST(round(tr.v - tr.trend - (pm.pmean - gm.g), 4) AS DOUBLE) AS resid
    FROM tr JOIN pm ON tr.phase = pm.phase, gm
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue, period 7 —
    trend (centered MA), seasonal (re-centered phase means), residual —
    all native window/groupBy stages (ts.decompose.seasonal_decompose;
    reference decompose_ts, gofast/utils/ts_utils.py:2263)."""
    from gofast_spark.ts import seasonal_decompose

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.round(F.sum("value"), 4).cast("double").alias("v")
    )
    out = seasonal_decompose(daily, "v", "d", period=7)
    return out.select(
        "d",
        F.round("trend", 4).cast("double").alias("trend"),
        F.round("seasonal", 4).cast("double").alias("seasonal"),
        F.round("resid", 4).cast("double").alias("resid"),
    )


@query(
    "savgol_interior_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
             CAST(round(sum(value), 4) AS DOUBLE) AS v
      FROM events GROUP BY 1),
    o AS (SELECT d, v,
            row_number() OVER (ORDER BY d) AS rn,
            count(*) OVER () AS n,
            lag(v, 3) OVER (ORDER BY d) AS m3,
            lag(v, 2) OVER (ORDER BY d) AS m2,
            lag(v, 1) OVER (ORDER BY d) AS m1,
            lead(v, 1) OVER (ORDER BY d) AS p1,
            lead(v, 2) OVER (ORDER BY d) AS p2,
            lead(v, 3) OVER (ORDER BY d) AS p3
          FROM daily)
    SELECT d,
           CAST(round((-2*m3 + 3*m2 + 6*m1 + 7*v + 6*p1 + 3*p2 - 2*p3) / 21,
                      4) AS DOUBLE) AS sg
    FROM o WHERE rn >= 4 AND rn <= n - 3
    """,
)
def savgol_interior_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Savitzky-Golay smoothing (window 7, poly 2) of daily revenue via
    the scipy-free applyInPandas kernel (ts.decompose.savgol_smooth;
    reference savgol_filter, gofast/utils/spatial_utils.py:3937).

    Interior points only: for wl=7/poly=2 the center projection row is
    exactly (-2,3,6,7,6,3,-2)/21 (classic SG coefficients), so DuckDB
    replays it as a lag/lead weighted sum; the polynomial edge fits are
    covered by unit tests (tests/test_ts_pack.py).  The driver-side
    windows below run on the already-aggregated daily frame — bounded by
    the calendar, not the data."""
    from pyspark.sql import Window

    from gofast_spark.ts import savgol_smooth

    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("ts").cast("date").cast("string").alias("d"))
        .agg(F.round(F.sum("value"), 4).cast("double").alias("v"))
        .withColumn("g", F.lit("all"))
    )
    sg = savgol_smooth(daily, "g", "d", "v", window_length=7, polyorder=2)
    w = Window.orderBy("d")
    out = (
        sg.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
        .where((F.col("rn") >= 4) & (F.col("rn") <= F.col("n") - 3))
    )
    return out.select("d", F.round("v_sg", 4).cast("double").alias("sg"))


@query(
    "pacf_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
      SELECT v,
             lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2,
             lag(v, 3) OVER w AS l3, lag(v, 4) OVER w AS l4
      FROM daily WINDOW w AS (ORDER BY d)),
    a AS (
      SELECT corr(v, l1) AS r1, corr(v, l2) AS r2,
             corr(v, l3) AS r3, corr(v, l4) AS r4
      FROM l),
    k2 AS (
      SELECT *, (r2 - r1 * r1) / (1 - r1 * r1) AS p22 FROM a),
    k2f AS (
      SELECT *, r1 - p22 * r1 AS p21 FROM k2),
    k3 AS (
      SELECT *, (r3 - (p21 * r2 + p22 * r1)) / (1 - (p21 * r1 + p22 * r2))
             AS p33 FROM k2f),
    k3f AS (
      SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32 FROM k3),
    k4 AS (
      SELECT *, (r4 - (p31 * r3 + p32 * r2 + p33 * r1))
             / (1 - (p31 * r1 + p32 * r2 + p33 * r3)) AS p44 FROM k3f)
    SELECT CAST(round(r1, 6) AS DOUBLE) AS pacf_1,
           CAST(round(p22, 6) AS DOUBLE) AS pacf_2,
           CAST(round(p33, 6) AS DOUBLE) AS pacf_3,
           CAST(round(p44, 6) AS DOUBLE) AS pacf_4
    FROM k4
    """,
)
def pacf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PACF lags 1-4 fully in-plan: the distributed ACF aggregate feeds
    an unrolled Durbin-Levinson recursion as chained projections — no
    driver collect (ts_corr_analysis PACF half,
    gofast/utils/ts_utils.py:2913; VERDICT r6 #6).  The oracle replays
    the identical recursion as a DuckDB CTE chain."""
    from gofast_spark.ts import pacf_frame

    out = pacf_frame(_daily(spark, sf_dir), "v", "d", max_lag=4)
    return out.select(
        *[
            F.round(f"pacf_{k}", 6).cast("double").alias(f"pacf_{k}")
            for k in range(1, 5)
        ]
    )


@query(
    "changepoint_daily_events",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(trunc(value * 1000000 + 0.5) AS BIGINT))
               AS DOUBLE) AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    cum AS (
      SELECT d,
             coalesce(sum(y) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
               AS sl,
             coalesce(count(y) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS nl
      FROM daily),
    t AS (SELECT sum(y) AS s, count(*) AS n FROM daily),
    g AS (
      SELECT d AS change_at,
             sl * sl / CAST(nl AS DOUBLE)
               + (s - sl) * (s - sl) / CAST(n - nl AS DOUBLE)
               - s * s / CAST(n AS DOUBLE) AS gain,
             nl AS n_left, n - nl AS n_right,
             sl / CAST(nl AS DOUBLE) AS mean_left,
             (s - sl) / CAST(n - nl AS DOUBLE) AS mean_right
      FROM cum, t WHERE nl > 0 AND n - nl > 0)
    SELECT change_at, gain,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           mean_left, mean_right
    FROM g ORDER BY gain DESC, change_at LIMIT 1
    """,
)
def changepoint_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMOC changepoint of daily event value (ts/changepoint.py
    best_changepoint; Hinkley 1970 / Scott & Knott 1974 — the core step
    of binary segmentation): micro-unit-exact daily rollup, one
    cumulative window over the day-sized series, in-plan argmax with
    the (gain DESC, earliest day) tie-break — the raw stream is only
    touched by the rollup.  All gains derive from exact integers
    through one fixed expression order; the oracle replays them
    unrounded."""
    from gofast_spark.ts.changepoint import best_changepoint

    e = _t(spark, sf_dir, "events")
    daily = (
        e.where(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(
                F.expr("CAST(value * 1000000 + 0.5 AS BIGINT)")
            ).cast("double").alias("y")
        )
    )
    return best_changepoint(daily, "d", "y")


@query(
    "mann_kendall_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (SELECT row_number() OVER (ORDER BY d) AS rn, v AS x FROM daily),
    pairs AS (
      SELECT CAST(sign(b.x - a.x) AS BIGINT) AS sg,
             (b.x - a.x) / CAST(b.rn - a.rn AS DOUBLE) AS slope
      FROM idx a JOIN idx b ON a.rn < b.rn),
    sf AS (SELECT sum(sg) AS s, quantile_cont(slope, 0.5) AS sen_slope
           FROM pairs),
    ties AS (
      SELECT sum(t * (t - 1) * (2 * t + 5)) AS tie_term, sum(t) AS n
      FROM (SELECT count(*) AS t FROM idx GROUP BY x)),
    fin AS (
      SELECT s, sen_slope, n,
             (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
              * (2.0 * CAST(n AS DOUBLE) + 5.0)
              - CAST(tie_term AS DOUBLE)) / 18.0 AS var_s
      FROM sf, ties)
    SELECT CAST(s AS BIGINT) AS s,
           CAST(round(var_s, 6) AS DOUBLE) AS var_s,
           CAST(round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                                           / sqrt(var_s)
                           WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                                           / sqrt(var_s)
                           ELSE 0.0 END, 6) AS DOUBLE) AS z,
           CAST(round(sen_slope, 4) AS DOUBLE) AS sen_slope,
           CAST(n AS BIGINT) AS n
    FROM fin
    """,
)
def mann_kendall_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test + Sen's slope over the daily
    revenue series (ts/engineering.py mann_kendall; Mann 1945, Sen
    1968): S and the tie correction stay exact integers from a
    days-sized banded self-join; z and the median slope are the only
    float reductions.  The distributed trend readout the reference
    computes with scipy on a driver array (trend_analysis,
    gofast/utils/mathext.py)."""
    from gofast_spark.ts.engineering import mann_kendall

    out = mann_kendall(_daily(spark, sf_dir).select("d", "v"), "d", "v")
    return out.select(
        "s",
        F.round("var_s", 6).cast("double").alias("var_s"),
        F.round("z", 6).cast("double").alias("z"),
        F.round("sen_slope", 4).cast("double").alias("sen_slope"),
        "n",
    )


@query(
    "granger_clicks_purchases",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             count(*) FILTER (event_type = 'click') AS x,
             count(*) FILTER (event_type = 'purchase') AS y
      FROM events GROUP BY 1),
    lagged AS (
      SELECT y,
             lag(y) OVER (ORDER BY d) AS l,
             lag(x) OVER (ORDER BY d) AS x
      FROM daily
      QUALIFY l IS NOT NULL AND x IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(l) AS DOUBLE) AS sl,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y * l) AS DOUBLE) AS syl,
             CAST(sum(y * x) AS DOUBLE) AS syx,
             CAST(sum(l * x) AS DOUBLE) AS slx,
             CAST(sum(l * l) AS DOUBLE) AS sll,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy
      FROM lagged),
    solve AS (
      SELECT n, sy, syl, syx, syy, sl, sll,
             n * (sll * sxx - slx * slx)
               - sl * (sl * sxx - slx * sx)
               + sx * (sl * slx - sll * sx) AS det,
             sy * (sll * sxx - slx * slx)
               - sl * (syl * sxx - slx * syx)
               + sx * (syl * slx - sll * syx) AS dc,
             n * (syl * sxx - slx * syx)
               - sy * (sl * sxx - slx * sx)
               + sx * (sl * syx - syl * sx) AS da,
             n * (sll * syx - syl * slx)
               - sl * (sl * syx - syl * sx)
               + sy * (sl * slx - sll * sx) AS db
      FROM m),
    fit AS (
      SELECT n, syy - ((dc / det) * sy + (da / det) * syl
                       + (db / det) * syx) AS sse_u,
             (n * syl - sl * sy) / (n * sll - sl * sl) AS ar,
             sy, sl, syl, syy
      FROM solve),
    res AS (
      SELECT n, sse_u,
             syy - ((sy - ar * sl) / n) * sy - ar * syl AS sse_r
      FROM fit)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(sse_r AS DOUBLE) AS sse_r,
           CAST(sse_u AS DOUBLE) AS sse_u,
           CAST((sse_r - sse_u) / (sse_u / (n - 3.0)) AS DOUBLE) AS f_stat
    FROM res
    """,
)
def granger_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality F-test, clicks -> purchases, on daily counts
    (ts/causality.py granger_causality; Granger 1969): one day-keyed
    aggregate builds the 30-row series, then a lag window + ONE exact
    -integer moment aggregate; the 3x3 Cramer solve and F statistic
    are scalar arithmetic on identical doubles, so the result is
    unrounded bit-exact in both engines."""
    from gofast_spark.ts.causality import granger_causality

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
    )
    return granger_causality(daily, "d", "x", "y", scale=1.0)


@query(
    "ar_forecast_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
      SELECT d, v,
             lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2,
             lag(v, 3) OVER w AS l3
      FROM daily WINDOW w AS (ORDER BY d)),
    a AS (
      SELECT corr(v, l1) AS r1, corr(v, l2) AS r2, corr(v, l3) AS r3
      FROM l),
    k2 AS (
      SELECT *, (r2 - r1 * r1) / (1 - r1 * r1) AS p22 FROM a),
    k2f AS (
      SELECT *, r1 - p22 * r1 AS p21 FROM k2),
    k3 AS (
      SELECT *, (r3 - (p21 * r2 + p22 * r1)) / (1 - (p21 * r1 + p22 * r2))
             AS p33 FROM k2f),
    k3f AS (
      SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32 FROM k3),
    last AS (
      SELECT v AS v0, l1 AS v1, l2 AS v2 FROM l ORDER BY d DESC LIMIT 1),
    mu AS (SELECT avg(v) AS mu FROM daily),
    e AS (
      SELECT p31, p32, p33, mu,
             v0 - mu AS e0, v1 - mu AS e1, v2 - mu AS e2
      FROM k3f, last, mu),
    s1 AS (SELECT *, 0.0 + p31 * e0 + p32 * e1 + p33 * e2 AS d1 FROM e),
    s2 AS (SELECT *, 0.0 + p31 * d1 + p32 * e0 + p33 * e1 AS d2 FROM s1),
    s3 AS (SELECT *, 0.0 + p31 * d2 + p32 * d1 + p33 * e0 AS d3 FROM s2),
    s4 AS (SELECT *, 0.0 + p31 * d3 + p32 * d2 + p33 * d1 AS d4 FROM s3),
    s5 AS (SELECT *, 0.0 + p31 * d4 + p32 * d3 + p33 * d2 AS d5 FROM s4)
    SELECT CAST(h AS BIGINT) AS h, CAST(round(f, 4) AS DOUBLE) AS forecast
    FROM (
      SELECT 1 AS h, mu + d1 AS f FROM s5 UNION ALL
      SELECT 2, mu + d2 FROM s5 UNION ALL
      SELECT 3, mu + d3 FROM s5 UNION ALL
      SELECT 4, mu + d4 FROM s5 UNION ALL
      SELECT 5, mu + d5 FROM s5)
    """,
)
def ar_forecast_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-step AR(3) Yule-Walker forecast of daily revenue
    (ts/engineering.py ar_forecast; Box & Jenkins 1970): coefficients
    are the final Durbin-Levinson row over the distributed ACF — the
    pacf_daily_events chain — and the forecast recursion unrolls as
    five chained projections over one broadcast state row; the last-p
    observations come from ONE max_by aggregate, never a global sort.
    The oracle replays the identical recursion."""
    from gofast_spark.ts.engineering import ar_forecast

    out = ar_forecast(_daily(spark, sf_dir), "v", "d", p=3, horizon=5)
    return out.select(
        "h", F.round("forecast", 4).cast("double").alias("forecast")
    )


@query(
    "forecast_accuracy_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    pr AS (
      SELECT d, v, lag(v, 7) OVER (ORDER BY d) AS f FROM daily),
    kept AS (SELECT d, v, f FROM pr WHERE f IS NOT NULL),
    base AS (
      SELECT v AS y, f, lag(v) OVER (ORDER BY d) AS p FROM kept),
    agg AS (
      SELECT count(*) AS n,
             sum(CAST(floor(2.0 * abs(y - f) / (abs(y) + abs(f)) * 1000000
                            + 0.5) AS BIGINT)) AS ssm,
             sum(CAST(floor(abs(y - f) * 1000000 + 0.5) AS BIGINT)) AS se,
             sum(CAST(floor(abs(y - p) * 1000000 + 0.5) AS BIGINT)) AS sne,
             count(p) AS nn,
             sum(CAST(floor((y - f) * (y - f) * 1000 + 0.5) AS BIGINT))
               AS se2,
             sum(CAST(floor((y - p) * (y - p) * 1000 + 0.5) AS BIGINT))
               AS sne2
      FROM base)
    SELECT n,
           CAST(ssm / (n * 1000000.0) AS DOUBLE) AS smape,
           CAST((se / (n * 1000000.0)) / (sne / (nn * 1000000.0)) AS DOUBLE)
             AS mase,
           CAST(sqrt(CAST(se2 AS DOUBLE) / CAST(sne2 AS DOUBLE)) AS DOUBLE)
             AS theil_u2
    FROM agg
    """,
)
def forecast_accuracy_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sMAPE / MASE / Theil U2 of the weekly seasonal-naive forecast of
    daily revenue (metrics.forecast_accuracy; Hyndman & Koehler 2006):
    one series window builds lag-7 predictions, one aggregate with
    micro/milli-unit-quantized terms scores them — unrounded outputs
    are exact-integer divisions, bit-identical in both engines."""
    from pyspark.sql import Window

    from gofast_spark.metrics import forecast_accuracy

    daily = _daily(spark, sf_dir)
    w = Window.orderBy("d")
    pr = daily.select(
        "d", "v", F.lag("v", 7).over(w).alias("f")
    ).where(F.col("f").isNotNull())
    return forecast_accuracy(pr, "d", "v", "f")


@query(
    "cusum_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (SELECT d, CAST(floor(v * 10000 + 0.5) AS BIGINT) AS vu FROM daily),
    tot AS (SELECT CAST(sum(vu) AS BIGINT) AS s, count(*) AS n FROM u),
    dev AS (
      SELECT d, vu, n,
             n * vu - s - n * 1000000 AS dp,
             s - n * vu - n * 1000000 AS dn
      FROM u, tot),
    p AS (
      SELECT d, vu, n,
             sum(dp) OVER w AS pp, sum(dn) OVER w AS pn
      FROM dev
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)),
    m AS (
      SELECT d, vu, n, pp, pn,
             least(CAST(0 AS BIGINT), CAST(min(pp) OVER w AS BIGINT)) AS mp,
             least(CAST(0 AS BIGINT), CAST(min(pn) OVER w AS BIGINT)) AS mn
      FROM p
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW))
    SELECT d, CAST(vu / 10000.0 AS DOUBLE) AS v,
           CAST(CAST(pp - mp AS DOUBLE) / (n * 10000.0) AS DOUBLE)
             AS cusum_pos,
           CAST(CAST(pn - mn AS DOUBLE) / (n * 10000.0) AS DOUBLE)
             AS cusum_neg,
           CAST(CAST(pp - mp AS BIGINT) > n * 5000000 AS INT) AS alarm_pos,
           CAST(CAST(pn - mn AS BIGINT) > n * 5000000 AS INT) AS alarm_neg
    FROM m
    """,
)
def cusum_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tabular CUSUM monitor on daily revenue (ts/changepoint.py cusum;
    Page 1954): the max(0, ...) recursions as prefix-sum minus running
    -minimum windows — no recursion, no driver loop; state is exact
    integers scaled by n so the in-control mean S/n never rounds.
    Slack k=100, threshold h=500 on the 1e-4 grid."""
    from gofast_spark.ts.changepoint import cusum

    out = cusum(_daily(spark, sf_dir), "d", "v", k=100.0, h=500.0)
    return out.select(
        "d", "v", "cusum_pos", "cusum_neg",
        F.col("alarm_pos").cast("int").alias("alarm_pos"),
        F.col("alarm_neg").cast("int").alias("alarm_neg"),
    )


@query(
    "chow_test_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    d AS (
      SELECT CAST(t AS BIGINT) AS t,
             CAST(floor(v * 1000 + 0.5) AS BIGINT) AS y
      FROM daily WHERE t IS NOT NULL AND v IS NOT NULL),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS np, CAST(sum(t) AS DOUBLE) AS stp,
             CAST(sum(t * t) AS DOUBLE) AS sttp,
             CAST(sum(y) AS DOUBLE) AS syp,
             CAST(sum(t * y) AS DOUBLE) AS styp,
             CAST(sum(y * y) AS DOUBLE) AS syyp,
             CAST(sum(CASE WHEN t < 15 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             CAST(sum(CASE WHEN t < 15 THEN t ELSE 0 END) AS DOUBLE) AS st1,
             CAST(sum(CASE WHEN t < 15 THEN t * t ELSE 0 END) AS DOUBLE)
               AS stt1,
             CAST(sum(CASE WHEN t < 15 THEN y ELSE 0 END) AS DOUBLE) AS sy1,
             CAST(sum(CASE WHEN t < 15 THEN t * y ELSE 0 END) AS DOUBLE)
               AS sty1,
             CAST(sum(CASE WHEN t < 15 THEN y * y ELSE 0 END) AS DOUBLE)
               AS syy1,
             CAST(sum(CASE WHEN t >= 15 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
             CAST(sum(CASE WHEN t >= 15 THEN t ELSE 0 END) AS DOUBLE) AS st2,
             CAST(sum(CASE WHEN t >= 15 THEN t * t ELSE 0 END) AS DOUBLE)
               AS stt2,
             CAST(sum(CASE WHEN t >= 15 THEN y ELSE 0 END) AS DOUBLE) AS sy2,
             CAST(sum(CASE WHEN t >= 15 THEN t * y ELSE 0 END) AS DOUBLE)
               AS sty2,
             CAST(sum(CASE WHEN t >= 15 THEN y * y ELSE 0 END) AS DOUBLE)
               AS syy2
      FROM d),
    fit AS (
      SELECT n1, n2,
             syyp - ((syp - ((np * styp - stp * syp)
                             / (np * sttp - stp * stp)) * stp) / np) * syp
                  - ((np * styp - stp * syp)
                     / (np * sttp - stp * stp)) * styp AS sp,
             syy1 - ((sy1 - ((n1 * sty1 - st1 * sy1)
                             / (n1 * stt1 - st1 * st1)) * st1) / n1) * sy1
                  - ((n1 * sty1 - st1 * sy1)
                     / (n1 * stt1 - st1 * st1)) * sty1 AS s1,
             syy2 - ((sy2 - ((n2 * sty2 - st2 * sy2)
                             / (n2 * stt2 - st2 * st2)) * st2) / n2) * sy2
                  - ((n2 * sty2 - st2 * sy2)
                     / (n2 * stt2 - st2 * st2)) * sty2 AS s2,
             np
      FROM m)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(sp / 1000000.0 AS DOUBLE) AS sse_pooled,
           CAST(s1 / 1000000.0 AS DOUBLE) AS sse_1,
           CAST(s2 / 1000000.0 AS DOUBLE) AS sse_2,
           CAST(((sp - s1 - s2) / 2.0) / ((s1 + s2) / (np - 4.0)) AS DOUBLE)
             AS f_stat
    FROM fit
    """,
)
def chow_test_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test at day 15 of the daily revenue trend
    (ts/changepoint.py chow_test; Chow 1960): pooled + two-segment OLS
    from ONE conditional exact-integer moment aggregate — milli-unit
    squares stay inside int64 — so the F statistic is unrounded
    bit-exact in both engines."""
    from gofast_spark.ts.changepoint import chow_test

    return chow_test(_daily(spark, sf_dir), "t", "v", split=15.0)


@query(
    "croston_sparse_purchases",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS BIGINT) AS t,
             count(*) FILTER (event_type = 'purchase' AND value > 900)
               AS v
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1),
    nz AS (SELECT t, v FROM daily WHERE v <> 0),
    g AS (
      SELECT t, v,
             coalesce(t - lag(t) OVER (ORDER BY t), 1) AS gap,
             CAST(row_number() OVER (ORDER BY t) AS DOUBLE) AS rn
      FROM nz),
    c AS (
      SELECT t, v, gap, rn,
             v * power(0.5, -rn) AS cz,
             gap * power(0.5, -rn) AS cp
      FROM g),
    s AS (
      SELECT t, v, gap, rn,
             sum(cz) OVER wc AS sz, first_value(cz) OVER wc AS z1,
             sum(cp) OVER wc AS sp, first_value(cp) OVER wc AS p1
      FROM c
      WINDOW wc AS (ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    sm AS (
      SELECT t, v, gap,
             power(0.5, rn) * (0.5 * (sz - z1) + z1) AS z_hat,
             power(0.5, rn) * (0.5 * (sp - p1) + p1) AS p_hat
      FROM s)
    SELECT t, CAST(v AS BIGINT) AS v, CAST(gap AS BIGINT) AS interval,
           CAST(z_hat AS DOUBLE) AS z_hat,
           CAST(p_hat AS DOUBLE) AS p_hat,
           CAST(z_hat / p_hat AS DOUBLE) AS croston_rate
    FROM sm
    """,
)
def croston_sparse_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston intermittent-demand forecast of high-value purchase
    days (ts/engineering.py croston_forecast; Croston 1972): the
    nonzero-day filter + one lag window for inter-demand gaps, then
    TWO engine-exact dyadic EWMA closed forms (integer inputs, no
    float-order dependence) — the per-period rate z_hat/p_hat is
    unrounded bit-exact."""
    from gofast_spark.ts.engineering import croston_forecast

    e = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
        .cast("bigint")
        .alias("t")
    ).agg(
        F.count(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 900),
                1,
            )
        ).alias("v")
    )
    out = croston_forecast(daily, "t", "v", alpha=0.5)
    return out.select(
        "t", F.col("v").cast("bigint").alias("v"),
        F.col("interval").cast("bigint").alias("interval"),
        "z_hat", "p_hat", "croston_rate",
    )


@query(
    "ljung_box_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    l AS (
      SELECT v,
             lag(v, 1) OVER (ORDER BY t) AS l1,
             lag(v, 2) OVER (ORDER BY t) AS l2,
             lag(v, 3) OVER (ORDER BY t) AS l3,
             lag(v, 4) OVER (ORDER BY t) AS l4,
             lag(v, 5) OVER (ORDER BY t) AS l5
      FROM daily),
    a AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             corr(v, l1) AS r1, corr(v, l2) AS r2, corr(v, l3) AS r3,
             corr(v, l4) AS r4, corr(v, l5) AS r5
      FROM l)
    SELECT CAST(round(n * (n + 2.0) *
             (r1*r1/(n-1) + r2*r2/(n-2) + r3*r3/(n-3)
              + r4*r4/(n-4) + r5*r5/(n-5)), 6) AS DOUBLE) AS q_stat,
           CAST(5 AS INTEGER) AS dof,
           CAST(n AS BIGINT) AS n
    FROM a
    """,
)
def ljung_box_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box whiteness test on the daily revenue series
    (ts/engineering.py ljung_box; Ljung & Box 1978) — Q from the same
    corr-with-lag ACF the `acf_daily_events` entry verifies, one window
    projection + one aggregate row."""
    from gofast_spark.ts.engineering import ljung_box

    out = ljung_box(_daily(spark, sf_dir), "v", "t", max_lag=5)
    return out.select(
        F.round("q_stat", 6).alias("q_stat"), "dof", "n"
    )


@query(
    "theta_forecast_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    e AS (
      SELECT t, v,
             CAST(row_number() OVER (ORDER BY t) AS DOUBLE) AS rn,
             CAST(floor(v * 1e4 + 0.5) AS BIGINT) AS vu
      FROM daily),
    c AS (SELECT t, rn, vu, v * power(0.5, -rn) AS cz FROM e),
    s AS (
      SELECT t, rn, vu,
             power(0.5, rn) * (0.5 * (sum(cz) OVER wc
                                      - first_value(cz) OVER wc)
                               + first_value(cz) OVER wc) AS sm
      FROM c
      WINDOW wc AS (ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    m AS (
      SELECT count(*) AS n,
             sum(CAST(t AS HUGEINT)) AS st,
             sum(CAST(t AS HUGEINT) * t) AS stt,
             sum(CAST(vu AS HUGEINT)) AS sv,
             sum(CAST(t AS HUGEINT) * vu) AS stv,
             arg_max(sm, t) AS level
      FROM s),
    sl AS (
      SELECT n, level,
             CAST(n * stv - st * sv AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) / 1e4 AS slope
      FROM m)
    SELECT CAST(h AS INTEGER) AS h,
           CAST(level + slope / 2.0 *
                (CAST(h AS DOUBLE) - 1.0 + 2.0
                 - power(0.5, CAST(n AS DOUBLE)) * 2.0) AS DOUBLE)
             AS forecast
    FROM sl, range(1, 8) AS r(h)
    """,
)
def theta_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method 7-day forecast of daily revenue
    (ts/engineering.py theta_forecast; Assimakopoulos & Nikolopoulos
    2000 via Hyndman & Billah 2003's SES-with-drift equivalence): the
    dyadic-alpha EWMA closed form supplies the level, exact integer
    moments the trend slope — bit-reproducible, presented unrounded."""
    from gofast_spark.ts.engineering import theta_forecast

    return theta_forecast(
        _daily(spark, sf_dir), "t", "v", alpha=0.5, horizon=7
    )


@query(
    "runs_test_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    med AS (SELECT quantile_cont(v, 0.5) AS m FROM daily),
    sided AS (
      SELECT t, CAST(v > m AS INTEGER) AS s FROM daily, med
      WHERE v <> m),
    mk AS (
      SELECT s,
             CASE WHEN lag(s) OVER (ORDER BY t) IS NULL
                    OR lag(s) OVER (ORDER BY t) <> s
                  THEN 1 ELSE 0 END AS nr
      FROM sided),
    a AS (SELECT sum(nr) AS r, sum(s) AS n1, sum(1 - s) AS n2 FROM mk)
    SELECT CAST(r AS BIGINT) AS runs,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST((CAST(r AS DOUBLE)
                 - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                       / ((n1 + n2) * (n1 + n2) * ((n1 + n2) - 1.0)))
             AS DOUBLE) AS z
    FROM a
    """,
)
def runs_test_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz randomness test of the daily revenue series
    about its median (stats/inferential.py runs_test; Wald &
    Wolfowitz 1940) — one exact-percentile broadcast, one lag window
    over the rollup series, exact integer run counts."""
    from gofast_spark.stats.inferential import runs_test

    return runs_test(_daily(spark, sf_dir), "v", "t")


@query(
    "page_hinkley_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    b AS (
      SELECT t, v,
             CAST(floor(v * 1e4 + 0.5) AS BIGINT) AS vu
      FROM daily),
    st AS (
      SELECT t, v,
             CAST(vu AS DOUBLE) / 1e4
               - (CAST(sum(vu) OVER wc AS DOUBLE) / 1e4)
                 / CAST(row_number() OVER (ORDER BY t) AS DOUBLE)
               - 0.0 AS d
      FROM b
      WINDOW wc AS (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    acc AS (
      SELECT t, v, sum(d) OVER wc AS m
      FROM st
      WINDOW wc AS (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT t, v, m,
           m - min(m) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS ph,
           (m - min(m) OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)) > 100000.0 AS alarm
    FROM acc
    """,
)
def page_hinkley_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift detection over the daily revenue series
    (ts/changepoint.py page_hinkley; Page 1954) — exact-integer
    running means, two chained ordered cumulative windows, the CUSUM
    family's streaming drift test."""
    from gofast_spark.ts.changepoint import page_hinkley

    return page_hinkley(
        _daily(spark, sf_dir), "t", "v", delta=0.0, lam=100000.0
    )


def _periodogram_oracle(max_freq: int = 10) -> str:
    terms = []
    for k in range(1, max_freq + 1):
        c = (f"sum(CAST(floor(v * cos(6.283185307179586 * {k}.0 * tt / nd)"
             f" * 1e3 + 0.5) AS BIGINT)) AS c{k}")
        s = (f"sum(CAST(floor(v * sin(6.283185307179586 * {k}.0 * tt / nd)"
             f" * 1e3 + 0.5) AS BIGINT)) AS s{k}")
        terms += [c, s]
    rows = " UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS k, "
        f"(pow(CAST(c{k} AS DOUBLE) / 1e3, 2.0)"
        f" + pow(CAST(s{k} AS DOUBLE) / 1e3, 2.0))"
        f" / CAST(n AS DOUBLE) AS power FROM a"
        for k in range(1, max_freq + 1)
    )
    return f"""
    WITH daily AS ({_DAILY_SQL}),
    b AS (
      SELECT CAST(t AS DOUBLE) AS tt, v,
             CAST(cnt AS DOUBLE) AS nd, cnt AS n
      FROM daily, (SELECT count(*) AS cnt FROM daily)),
    a AS (SELECT any_value(n) AS n, {", ".join(terms)} FROM b)
    {rows}
    """


@query("periodogram_daily_events", oracle=_periodogram_oracle())
def periodogram_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schuster periodogram of the daily revenue series at harmonics
    1..10 (ts/engineering.py periodogram; Schuster 1898) — pinned
    2-pi literal, per-summand quantization so the spectral sums are
    exact integers, one aggregate + in-plan explode."""
    from gofast_spark.ts.engineering import periodogram

    return periodogram(_daily(spark, sf_dir), "t", "v", max_freq=10)


@query(
    "quantile_bands_daily_events",
    oracle="""
    SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
             AS INTEGER) AS t,
           CAST(count(*) AS BIGINT) AS n,
           CAST(quantile_cont(CAST(value AS DOUBLE), 0.1) AS DOUBLE)
             AS p10,
           CAST(quantile_cont(CAST(value AS DOUBLE), 0.5) AS DOUBLE)
             AS p50,
           CAST(quantile_cont(CAST(value AS DOUBLE), 0.9) AS DOUBLE)
             AS p90
    FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    GROUP BY 1
    """,
)
def quantile_bands_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day p10/p50/p90 value bands — the monitoring-dashboard
    percentile ribbon.  GROUPED exact percentiles (each day's state is
    day-sized, map-side combinable — unlike a global percentile this
    shape is fine at 100 TB; the cross-engine quantile_cont parity is
    the verified F.percentile contract)."""
    e = _t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    v = F.col("value").cast("double")
    return e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
        .cast("int").alias("t")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.percentile(v, 0.1).cast("double").alias("p10"),
        F.percentile(v, 0.5).cast("double").alias("p50"),
        F.percentile(v, 0.9).cast("double").alias("p90"),
    )


@query(
    "max_drawdown_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    d AS (SELECT t, v - lag(v) OVER (ORDER BY t) AS dv FROM daily),
    b AS (
      SELECT t, CAST(floor(dv * 1e4 + 0.5) AS BIGINT) AS vu
      FROM d WHERE dv IS NOT NULL),
    c AS (
      SELECT t, sum(vu) OVER wc AS c
      FROM b
      WINDOW wc AS (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    p AS (
      SELECT t, c, max(c) OVER wc AS peak
      FROM c
      WINDOW wc AS (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    r AS (SELECT t, c, peak, peak - c AS dd FROM p)
    SELECT CAST(dd AS DOUBLE) / 1e4 AS max_drawdown,
           t AS trough_t,
           CAST(peak AS DOUBLE) / 1e4 AS peak_value,
           CAST(c AS DOUBLE) / 1e4 AS trough_value
    FROM r ORDER BY dd DESC, t LIMIT 1
    """,
)
def max_drawdown_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of daily revenue from its running peak
    (ts/engineering.py max_drawdown over the day-over-day changes;
    Magdon-Ismail & Atiya 2004) — exact-integer cumulative windows,
    one argmax row-pick with earliest-trough ties."""
    from pyspark.sql import Window

    from gofast_spark.ts.engineering import max_drawdown

    w = Window.orderBy("t")
    d = _daily(spark, sf_dir).select(
        "t", (F.col("v") - F.lag("v").over(w)).alias("dv")
    ).where(F.col("dv").isNotNull())
    return max_drawdown(d, "t", "dv", units=1e4)


@query(
    "newey_west_se_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    b AS (SELECT t, CAST(floor(v * 1e4 + 0.5) AS BIGINT) AS vu
          FROM daily),
    m AS (SELECT count(*) AS n, sum(CAST(vu AS HUGEINT)) AS s FROM b),
    d AS (
      SELECT t,
             (CAST(vu AS DOUBLE)
              - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 1e4 AS dd,
             n, s
      FROM b, m),
    l AS (
      SELECT n, s, dd,
             lag(dd, 1) OVER (ORDER BY t) AS d1,
             lag(dd, 2) OVER (ORDER BY t) AS d2,
             lag(dd, 3) OVER (ORDER BY t) AS d3,
             lag(dd, 4) OVER (ORDER BY t) AS d4,
             lag(dd, 5) OVER (ORDER BY t) AS d5
      FROM d),
    a AS (
      SELECT any_value(n) AS n, any_value(s) AS s,
             sum(CAST(floor(dd * dd + 0.5) AS BIGINT)) AS g0,
             sum(CAST(floor(dd * d1 + 0.5) AS BIGINT)) AS g1,
             sum(CAST(floor(dd * d2 + 0.5) AS BIGINT)) AS g2,
             sum(CAST(floor(dd * d3 + 0.5) AS BIGINT)) AS g3,
             sum(CAST(floor(dd * d4 + 0.5) AS BIGINT)) AS g4,
             sum(CAST(floor(dd * d5 + 0.5) AS BIGINT)) AS g5
      FROM l),
    f AS (
      SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e4 AS mean,
             CAST(n AS DOUBLE) AS nd, n,
             CAST(g0 AS DOUBLE) / CAST(n AS DOUBLE) AS gg0,
             CAST(g0 AS DOUBLE) / CAST(n AS DOUBLE)
             + 2.0 * (1.0 - 1.0 / 6.0)
               * (CAST(g1 AS DOUBLE) / CAST(n AS DOUBLE))
             + 2.0 * (1.0 - 2.0 / 6.0)
               * (CAST(g2 AS DOUBLE) / CAST(n AS DOUBLE))
             + 2.0 * (1.0 - 3.0 / 6.0)
               * (CAST(g3 AS DOUBLE) / CAST(n AS DOUBLE))
             + 2.0 * (1.0 - 4.0 / 6.0)
               * (CAST(g4 AS DOUBLE) / CAST(n AS DOUBLE))
             + 2.0 * (1.0 - 5.0 / 6.0)
               * (CAST(g5 AS DOUBLE) / CAST(n AS DOUBLE)) AS lrv
      FROM a)
    SELECT mean, sqrt(gg0 / nd) AS se_iid, sqrt(lrv / nd) AS se_nw,
           lrv, CAST(n AS BIGINT) AS n
    FROM f
    """,
)
def newey_west_se_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAC (Newey-West, Bartlett kernel, L=5) standard error of the
    daily-revenue mean (ts/engineering.py newey_west_se; Newey & West
    1987) — the serial-correlation-robust uncertainty beside the
    acf/ljung_box diagnostics; exact quantized lag-product sums."""
    from gofast_spark.ts.engineering import newey_west_se

    return newey_west_se(_daily(spark, sf_dir), "t", "v", max_lag=5)


@query(
    "seasonal_strength_daily",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS d, round(sum(value), 4) AS v
      FROM events GROUP BY 1),
    tr AS (
      SELECT d, v,
             CASE WHEN count(*) OVER w = 7 THEN avg(v) OVER w END
               AS trend,
             datediff('day', DATE '1970-01-01', d) % 7 AS phase
      FROM d WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING)),
    pm AS (SELECT phase, avg(v - trend) AS pmean FROM tr GROUP BY phase),
    gm AS (SELECT avg(pmean) AS g FROM pm),
    comp AS (
      SELECT tr.v - tr.trend - (pm.pmean - gm.g) AS resid,
             (pm.pmean - gm.g) AS seasonal, tr.trend AS trend
      FROM tr JOIN pm ON tr.phase = pm.phase, gm
      WHERE tr.trend IS NOT NULL),
    b AS (
      SELECT CAST(floor(resid * 1e4 + 0.5) AS BIGINT) AS r,
             CAST(floor((seasonal + resid) * 1e4 + 0.5) AS BIGINT) AS sr,
             CAST(floor((trend + resid) * 1e4 + 0.5) AS BIGINT) AS trr
      FROM comp),
    a AS (
      SELECT count(*) AS n,
             sum(CAST(r AS HUGEINT)) AS s_r,
             sum(CAST(r AS HUGEINT) * r) AS ss_r,
             sum(CAST(sr AS HUGEINT)) AS s_sr,
             sum(CAST(sr AS HUGEINT) * sr) AS ss_sr,
             sum(CAST(trr AS HUGEINT)) AS s_tr,
             sum(CAST(trr AS HUGEINT) * trr) AS ss_tr
      FROM b),
    f AS (
      SELECT n,
             CAST(n * ss_r - s_r * s_r AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE) / 1e8 AS vr,
             CAST(n * ss_sr - s_sr * s_sr AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE) / 1e8 AS vsr,
             CAST(n * ss_tr - s_tr * s_tr AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE) / 1e8 AS vtr
      FROM a)
    SELECT greatest(0.0, 1.0 - vr / vsr) AS f_seasonal,
           greatest(0.0, 1.0 - vr / vtr) AS f_trend,
           vr AS var_resid,
           CAST(n AS BIGINT) AS n
    FROM f
    """,
)
def seasonal_strength_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal + trend strength of daily revenue (ts/decompose.py
    seasonal_strength; the Hyndman FPP STL feature pair) — composes
    the verified classical decomposition into the variance-ratio
    readout, quantized components, exact-moment variances."""
    from gofast_spark.ts.decompose import seasonal_strength

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.round(F.sum("value"), 4).cast("double").alias("v")
    )
    return seasonal_strength(daily, "v", "d", period=7)


def _vr_oracle(qs=(2, 4, 8)) -> str:
    wins = ",\n             ".join(
        f"""CASE WHEN count(*) OVER (ORDER BY t
               ROWS BETWEEN {q - 1} PRECEDING AND CURRENT ROW) = {q}
             THEN sum(vu) OVER (ORDER BY t
               ROWS BETWEEN {q - 1} PRECEDING AND CURRENT ROW) END
             AS sq{q}"""
        for q in qs
    )
    aggs = []
    for q in qs:
        aggs.append(
            f"count(sq{q}) AS n{q}, sum(CAST(sq{q} AS HUGEINT)) AS s{q}, "
            f"sum(CAST(sq{q} AS HUGEINT) * sq{q}) AS ss{q}"
        )
    sel = []
    for q in qs:
        # radicand from small exact integers (see ts/engineering.py:
        # DuckDB's DECIMAL-literal -> double conversion is 1 ulp off
        # for a 17-digit phi**0.5 literal)
        vq = (f"(CAST(n{q} * ss{q} - s{q} * s{q} AS DOUBLE)"
              f" / CAST(n{q} * (n{q} - 1) AS DOUBLE))")
        v1 = ("(CAST(n0 * ss0 - s0 * s0 AS DOUBLE)"
              " / CAST(n0 * (n0 - 1) AS DOUBLE))")
        vr = f"{vq} / ({q}.0 * {v1})"
        sel.append(
            f"SELECT CAST({q} AS INTEGER) AS q, {vr} AS vr,"
            f" ({vr} - 1.0) * sqrt(CAST(n0 AS DOUBLE)"
            f" * {3 * q * q}.0 / {2 * (2 * q - 1) * (q - 1)}.0) AS z,"
            f" CAST(n{q} AS BIGINT) AS n_windows FROM a"
        )
    body = " UNION ALL ".join(sel)
    return f"""
    WITH daily AS ({_DAILY_SQL}),
    b AS (SELECT t, CAST(floor(v * 1e4 + 0.5) AS BIGINT) AS vu
          FROM daily),
    p AS (
      SELECT vu,
             {wins}
      FROM b),
    a AS (
      SELECT count(vu) AS n0, sum(CAST(vu AS HUGEINT)) AS s0,
             sum(CAST(vu AS HUGEINT) * vu) AS ss0,
             {", ".join(aggs)}
      FROM p)
    {body}
    """


@query("variance_ratio_daily", oracle=_vr_oracle())
def variance_ratio_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance ratios of daily revenue at horizons
    2/4/8 (ts/engineering.py variance_ratio; Lo & MacKinlay 1988) —
    overlapping q-sum windows over exact quantized integers, one
    projection + one aggregate, in-plan explode."""
    from gofast_spark.ts.engineering import variance_ratio

    return variance_ratio(_daily(spark, sf_dir), "t", "v", qs=(2, 4, 8))


@query(
    "permutation_sign_test_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    d AS (
      SELECT CAST(t AS BIGINT) AS t,
             v - lag(v) OVER (ORDER BY t) AS dv
      FROM daily),
    b AS (
      SELECT t, CAST(floor(dv * 1e4 + 0.5) AS BIGINT) AS vu
      FROM d WHERE dv IS NOT NULL),
    obs AS (SELECT sum(CAST(vu AS HUGEINT)) AS o, count(*) AS n FROM b),
    perms AS (
      SELECT b.t, b.vu, p
      FROM b, (SELECT CAST(range AS INT) + 1 AS p FROM range(500))),
    st AS (
      SELECT p,
             sum(CAST((CAST(('0x' || substr(md5(CAST(t AS VARCHAR)
                   || ':' || CAST(p AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 2 * 2 - 1) AS HUGEINT) * vu) AS s
      FROM perms GROUP BY p),
    h AS (
      SELECT sum(CASE WHEN abs(s) >= abs(o) THEN 1 ELSE 0 END) AS hits,
             any_value(o) AS o, any_value(n) AS n
      FROM st, obs)
    SELECT CAST(o AS DOUBLE) / CAST(n AS DOUBLE) / 1e4
             AS observed_mean,
           CAST(hits + 1 AS DOUBLE) / 501.0 AS p_value,
           CAST(n AS BIGINT) AS n,
           CAST(500 AS INTEGER) AS n_perms
    FROM h
    """,
)
def permutation_sign_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher sign-flip permutation test that day-over-day revenue
    changes are symmetric about zero (stats/resampling.py
    permutation_sign_test; Fisher 1935, Phipson & Smyth 2010 add-one
    p) — 500 md5-deterministic sign vectors over the rollup series,
    exact integer permutation sums, bit-replayable 'randomness'."""
    from pyspark.sql import Window

    from gofast_spark.stats.resampling import permutation_sign_test

    w = Window.orderBy("t")
    d = _daily(spark, sf_dir).select(
        F.col("t").cast("bigint").alias("t"),
        (F.col("v") - F.lag("v").over(w)).alias("dv"),
    ).where(F.col("dv").isNotNull())
    return permutation_sign_test(d, "t", "dv", n_perms=500)


@query(
    "engle_granger_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS BIGINT) AS t,
             CAST(round(sum(CASE WHEN event_type = 'click' THEN value
                            ELSE 0 END), 4) AS DOUBLE) AS x,
             CAST(round(sum(CASE WHEN event_type = 'purchase' THEN value
                            ELSE 0 END), 4) AS DOUBLE) AS y
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    b AS (
      SELECT t, CAST(floor(x * 1e4 + 0.5) AS BIGINT) AS xu,
             CAST(floor(y * 1e4 + 0.5) AS BIGINT) AS yu
      FROM daily),
    m AS (
      SELECT count(*) AS n,
             sum(CAST(xu AS HUGEINT)) AS sx,
             sum(CAST(yu AS HUGEINT)) AS sy,
             sum(CAST(xu AS HUGEINT) * xu) AS sxx,
             sum(CAST(xu AS HUGEINT) * yu) AS sxy
      FROM b),
    f AS (
      SELECT n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS bb,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS a_u
      FROM m),
    r AS (
      SELECT t,
             CAST(floor(CAST(yu AS DOUBLE) - a_u
                        - bb * CAST(xu AS DOUBLE) + 0.5) AS BIGINT)
               AS e,
             bb, a_u / 1e4 AS a
      FROM b, f),
    l AS (
      SELECT a, bb,
             lag(e) OVER (ORDER BY t) AS el,
             e - lag(e) OVER (ORDER BY t) AS de
      FROM r),
    g AS (
      SELECT any_value(a) AS alpha, any_value(bb) AS beta,
             count(*) AS mm,
             sum(CAST(el AS HUGEINT) * el) AS see,
             sum(CAST(el AS HUGEINT) * de) AS sed,
             sum(CAST(de AS HUGEINT) * de) AS sdd
      FROM l WHERE el IS NOT NULL)
    SELECT alpha, beta,
           CAST(sed AS DOUBLE) / CAST(see AS DOUBLE) AS gamma,
           (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
             / sqrt(((CAST(sdd AS DOUBLE)
                      - (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
                        * CAST(sed AS DOUBLE))
                     / (CAST(mm AS DOUBLE) - 1.0))
                    / CAST(see AS DOUBLE)) AS t_stat,
           CAST(mm AS BIGINT) AS n
    FROM g
    """,
)
def engle_granger_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger cointegration of daily purchase vs click revenue
    (ts/causality.py engle_granger; Engle & Granger 1987) — exact-
    moment OLS, quantized residuals, lag-0 ADF t on the residual
    series; the levels companion to `granger_clicks_purchases`."""
    from gofast_spark.ts.causality import engle_granger

    e = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = e.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
        .cast("bigint").alias("t")
    ).agg(
        F.round(F.sum(F.when(F.col("event_type") == "click",
                             F.col("value")).otherwise(0)), 4)
        .cast("double").alias("x"),
        F.round(F.sum(F.when(F.col("event_type") == "purchase",
                             F.col("value")).otherwise(0)), 4)
        .cast("double").alias("y"),
    )
    return engle_granger(daily, "t", "y", "x", units=1e4)


def _haar_oracle(levels: int = 3) -> str:
    parts = []
    for lv in range(1, levels + 1):
        parts.append(f"""SELECT {lv} AS level, count(*) AS n_blocks,
        sum(d * d) AS e_u FROM (
          SELECT CAST(floor(t / {2 ** lv}) AS BIGINT) AS b,
                 sum(CASE WHEN CAST(floor(t / {2 ** (lv - 1)}) AS BIGINT)
                            % 2 = 0
                          THEN CAST(vu AS HUGEINT)
                          ELSE -CAST(vu AS HUGEINT) END) AS d,
                 count(*) AS c
          FROM b GROUP BY 1) WHERE c = {2 ** lv} GROUP BY 1""")
    union = " UNION ALL ".join(parts)
    return f"""
    WITH daily AS ({_DAILY_SQL}),
    b AS (
      SELECT CAST(t AS BIGINT) AS t,
             CAST(floor(v * 1e4 + 0.5) AS BIGINT) AS vu
      FROM daily),
    lv AS ({union}),
    tot AS (
      SELECT sum(CAST(e_u AS DOUBLE) / power(2.0, CAST(level AS DOUBLE)))
               AS tt
      FROM lv)
    SELECT CAST(level AS INTEGER) AS level,
           CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(e_u AS DOUBLE) / power(2.0, CAST(level AS DOUBLE)) / 1e8
             AS energy,
           CAST(e_u AS DOUBLE) / power(2.0, CAST(level AS DOUBLE)) / tt
             AS energy_share
    FROM lv, tot
    """


@query("haar_energy_daily", oracle=_haar_oracle())
def haar_energy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet detail-energy by time scale for daily revenue
    (ts/decompose.py haar_energy; Haar 1910, Mallat 1989) — exact
    integer block sums, one small groupBy per level; which scales
    carry the variation."""
    from gofast_spark.ts.decompose import haar_energy

    return haar_energy(_daily(spark, sf_dir), "t", "v", levels=3)


def _spec_entropy_oracle(max_freq: int = 10) -> str:
    terms = []
    for k in range(1, max_freq + 1):
        terms.append(
            f"sum(CAST(floor(v * cos(6.283185307179586 * {k}.0 * tt / nd)"
            f" * 1e3 + 0.5) AS BIGINT))::HUGEINT AS c{k}")
        terms.append(
            f"sum(CAST(floor(v * sin(6.283185307179586 * {k}.0 * tt / nd)"
            f" * 1e3 + 0.5) AS BIGINT))::HUGEINT AS s{k}")
    p2 = {k: f"(c{k} * c{k} + s{k} * s{k})" for k in range(1, max_freq + 1)}
    tot = " + ".join(p2[k] for k in range(1, max_freq + 1))
    shares = ", ".join(
        f"CAST({p2[k]} AS DOUBLE) / CAST({tot} AS DOUBLE) AS p{k}"
        for k in range(1, max_freq + 1)
    )
    h = " + ".join(
        f"CASE WHEN p{k} > 0.0 THEN -p{k} * ln(p{k}) ELSE 0.0 END"
        for k in range(1, max_freq + 1)
    )
    return f"""
    WITH daily AS ({_DAILY_SQL}),
    b AS (
      SELECT CAST(t AS DOUBLE) AS tt, v, CAST(cnt AS DOUBLE) AS nd
      FROM daily, (SELECT count(*) AS cnt FROM daily)),
    a AS (SELECT {", ".join(terms)} FROM b),
    p AS (SELECT {shares} FROM a)
    SELECT ({h}) / ln({float(max_freq)!r}) AS spectral_entropy,
           CAST({max_freq} AS INTEGER) AS k
    FROM p
    """


@query("spectral_entropy_daily", oracle=_spec_entropy_oracle())
def spectral_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy of the daily revenue series over
    harmonics 1..10 (ts/engineering.py spectral_entropy; the
    tsfeatures forecastability measure, cf. Goerg 2013) — exact
    quantized spectral sums, fixed-order share/entropy expressions."""
    from gofast_spark.ts.engineering import spectral_entropy

    return spectral_entropy(_daily(spark, sf_dir), "t", "v", max_freq=10)


@query(
    "cusum_by_type_events",
    oracle="""
    WITH daily AS (
      SELECT event_type AS g, CAST(ts AS DATE) AS d,
             CAST(round(sum(value), 4) AS DOUBLE) AS v
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
    u AS (
      SELECT g, d, CAST(floor(v * 10000 + 0.5) AS BIGINT) AS vu
      FROM daily),
    tot AS (
      SELECT g, CAST(sum(vu) AS BIGINT) AS s, count(*) AS n
      FROM u GROUP BY g),
    dev AS (
      SELECT u.g, d, vu, n,
             n * vu - s - n * 200000 AS dp,
             s - n * vu - n * 200000 AS dn
      FROM u JOIN tot ON tot.g = u.g),
    p AS (
      SELECT g, d, vu, n,
             sum(dp) OVER w AS pp, sum(dn) OVER w AS pn
      FROM dev
      WINDOW w AS (PARTITION BY g ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    m AS (
      SELECT g, d, vu, n, pp, pn,
             least(CAST(0 AS BIGINT), CAST(min(pp) OVER w AS BIGINT)) AS mp,
             least(CAST(0 AS BIGINT), CAST(min(pn) OVER w AS BIGINT)) AS mn
      FROM p
      WINDOW w AS (PARTITION BY g ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT g AS "group", d, CAST(vu / 10000.0 AS DOUBLE) AS v,
           CAST(CAST(pp - mp AS DOUBLE) / (n * 10000.0) AS DOUBLE)
             AS cusum_pos,
           CAST(CAST(pn - mn AS DOUBLE) / (n * 10000.0) AS DOUBLE)
             AS cusum_neg,
           CAST(CAST(pp - mp AS BIGINT) > n * 1000000 AS INT) AS alarm_pos,
           CAST(CAST(pn - mn AS BIGINT) > n * 1000000 AS INT) AS alarm_neg
    FROM m
    """,
)
def cusum_by_type_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM monitors over each type's daily revenue
    (ts/changepoint.py cusum_grouped; Page 1954): one scan runs an
    independent mean-shift monitor per segment via group-partitioned
    prefix-sum/running-min windows, each with its own exact rational
    in-control mean — the per-source monitoring readout next to the
    pooled cusum_daily_events.  Slack k=20, threshold h=100 on the
    1e-4 grid (per-type series carry ~1/5 the pooled daily mass)."""
    from gofast_spark.ts.changepoint import cusum_grouped

    e = _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    daily = e.groupBy(
        F.col("event_type").alias("ty"),
        F.col("ts").cast("date").alias("d"),
    ).agg(F.round(F.sum("value"), 4).cast("double").alias("v"))
    out = cusum_grouped(daily, "d", "v", "ty", k=20.0, h=100.0)
    return out.select(
        "group", "d", "v", "cusum_pos", "cusum_neg",
        F.col("alarm_pos").cast("int").alias("alarm_pos"),
        F.col("alarm_neg").cast("int").alias("alarm_neg"),
    )


def _adf_oracle() -> str:
    """Full replay of ts/longrun.adf_relational: u4 grid, centered
    level regressor (integer floor-div mean — `//` truncates in
    DuckDB vs floors in python, identical on this positive revenue
    domain), integer Gram moments, fixed-order Cramer 3x3, then the
    t statistic from the gamma cofactor."""
    A = [["nn", "sx1", "sx2"], ["sx1", "s11", "s12"], ["sx2", "s12", "s22"]]
    bb = ["sy", "s1y", "s2y"]
    det = _det3_sql_ts(A)
    ws = []
    for j in range(3):
        Aj = [[bb[i] if c == j else A[i][c] for c in range(3)]
              for i in range(3)]
        ws.append(f"({_det3_sql_ts(Aj)}) / ({det})")
    quad = " + ".join(
        f"w{i} * {A[i][j]} * w{j}" for i in range(3) for j in range(3)
    )
    return f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (
      SELECT d, CAST(floor(v * 10000.0 + 0.5) AS BIGINT) AS yu
      FROM daily),
    lagd AS (
      SELECT yu, lag(yu, 1) OVER (ORDER BY d) AS l1,
             lag(yu, 2) OVER (ORDER BY d) AS l2
      FROM u),
    base AS (SELECT * FROM lagd WHERE l2 IS NOT NULL),
    pre AS (
      SELECT count(*) AS n, CAST(sum(l1) // count(*) AS BIGINT) AS mbar
      FROM base),
    mom AS (
      SELECT CAST(pre.n AS DOUBLE) AS nn, pre.n AS n_int,
             CAST(sum(l1 - mbar) AS DOUBLE) AS sx1,
             CAST(sum(l1 - l2) AS DOUBLE) AS sx2,
             CAST(sum((l1 - mbar) * (l1 - mbar)) AS DOUBLE) AS s11,
             CAST(sum((l1 - mbar) * (l1 - l2)) AS DOUBLE) AS s12,
             CAST(sum((l1 - l2) * (l1 - l2)) AS DOUBLE) AS s22,
             CAST(sum(yu - l1) AS DOUBLE) AS sy,
             CAST(sum((l1 - mbar) * (yu - l1)) AS DOUBLE) AS s1y,
             CAST(sum((l1 - l2) * (yu - l1)) AS DOUBLE) AS s2y,
             CAST(sum((yu - l1) * (yu - l1)) AS DOUBLE) AS syy
      FROM base, pre GROUP BY pre.n),
    wts AS (
      SELECT n_int, nn, sy, s1y, s2y, syy, sx2, s22,
             {ws[0]} AS w0, {ws[1]} AS w1, {ws[2]} AS w2,
             sx1, s11, s12
      FROM mom),
    fin AS (
      SELECT n_int, w1 AS gamma,
             (syy - 2.0 * (w0 * sy + w1 * s1y + w2 * s2y) + ({quad}))
               / (nn - 3.0) AS s2,
             (nn * s22 - sx2 * sx2) / ({det}) AS inv11
      FROM wts)
    SELECT CAST(n_int AS BIGINT) AS n_obs,
           CAST(round(gamma, 6) AS DOUBLE) AS gamma,
           CAST(round(gamma / sqrt(s2 * inv11), 4) AS DOUBLE)
             AS t_gamma,
           gamma / sqrt(s2 * inv11) < -2.86 AS reject_5pct
    FROM fin
    """


def _det3_sql_ts(m) -> str:
    """Same fixed expression order as ml.regression._det3."""
    return (
        f"{m[0][0]} * ({m[1][1]} * {m[2][2]} - {m[1][2]} * {m[2][1]})"
        f" - {m[0][1]} * ({m[1][0]} * {m[2][2]} - {m[1][2]} * {m[2][0]})"
        f" + {m[0][2]} * ({m[1][0]} * {m[2][1]} - {m[1][1]} * {m[2][0]})"
    )


@query("adf_test_daily", oracle=_adf_oracle())
def adf_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Augmented Dickey-Fuller unit-root test (one augmentation lag,
    constant) on daily revenue (ts/longrun.py adf_relational; Dickey &
    Fuller 1979, Said & Dickey 1984; reference trend_analysis
    strategy='adf' gofast/utils/ts_utils.py:720 wraps statsmodels
    adfuller — ts/decompose.adf_test keeps that form; this is the
    oracle-replayable relational one): integer Gram moments on the u4
    grid with a centered level regressor, Cramer 3x3, t from the
    gamma cofactor, 5%% decision at the Fuller critical value."""
    from gofast_spark.ts.longrun import adf_relational

    return adf_relational(_daily(spark, sf_dir), "d", "v")


def _co_oracle() -> str:
    return f"""
    WITH daily AS ({_DAILY_SQL}),
    m1 AS (
      SELECT count(*) AS n,
             CAST(sum(CAST(t AS BIGINT)) AS DOUBLE) AS st,
             CAST(sum(CAST(t AS BIGINT) * CAST(t AS BIGINT)) AS DOUBLE)
               AS stt,
             CAST(sum(CAST(floor(v * 10000.0 + 0.5) AS BIGINT))
               AS DOUBLE) AS sv,
             CAST(sum(CAST(t AS BIGINT)
                      * CAST(floor(v * 10000.0 + 0.5) AS BIGINT))
               AS DOUBLE) AS stv
      FROM daily),
    fit1 AS (
      SELECT n,
             ((sv * stt - st * stv)
              / (CAST(n AS DOUBLE) * stt - st * st)) / 10000.0 AS a_ols,
             ((CAST(n AS DOUBLE) * stv - st * sv)
              / (CAST(n AS DOUBLE) * stt - st * st)) / 10000.0 AS b_ols
      FROM m1),
    rows_e AS (
      SELECT d, v, CAST(t AS DOUBLE) AS t,
             v - (a_ols + b_ols * CAST(t AS DOUBLE)) AS e
      FROM daily, fit1),
    lagd AS (
      SELECT v, t, e,
             lag(e) OVER (ORDER BY d) AS ep,
             lag(v) OVER (ORDER BY d) AS vp,
             lag(t) OVER (ORDER BY d) AS tp
      FROM rows_e),
    base AS (SELECT * FROM lagd WHERE ep IS NOT NULL),
    m2 AS (
      SELECT CAST(sum(CAST(floor(e * ep * 1000000.0 + 0.5) AS BIGINT))
               AS DOUBLE) AS sep,
             CAST(sum(CAST(floor(ep * ep * 1000000.0 + 0.5) AS BIGINT))
               AS DOUBLE) AS spp
      FROM base),
    rho_c AS (SELECT sep / spp AS rho FROM m2),
    m3 AS (
      SELECT CAST(count(*) AS DOUBLE) AS m,
             CAST(sum(CAST(floor((t - rho * tp) * 1000000.0 + 0.5)
               AS BIGINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(floor((t - rho * tp) * (t - rho * tp)
               * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(sum(CAST(floor((v - rho * vp) * 1000000.0 + 0.5)
               AS BIGINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(floor((t - rho * tp) * (v - rho * vp)
               * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) AS sxy
      FROM base, rho_c)
    SELECT CAST((SELECT n FROM fit1) AS BIGINT) AS n,
           CAST(round((SELECT b_ols FROM fit1), 6) AS DOUBLE) AS b_ols,
           CAST(round((SELECT rho FROM rho_c), 6) AS DOUBLE) AS rho,
           CAST(round((m * sxy / 1000000.0
                       - sx / 1000000.0 * (sy / 1000000.0))
                      / (m * sxx / 1000000.0
                         - sx / 1000000.0 * (sx / 1000000.0)), 6)
                AS DOUBLE) AS b_co
    FROM m3
    """


@query("cochrane_orcutt_daily", oracle=_co_oracle())
def cochrane_orcutt_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochrane-Orcutt AR(1) error correction for the daily-revenue
    trend regression (ts/longrun.py cochrane_orcutt; Cochrane & Orcutt
    JASA 1949) — the serial-correlation companion of
    durbin_watson_daily: OLS slope, residual-lag rho, and the
    quasi-differenced refit slope, every coefficient chain replayed
    over quantized integer moments."""
    from gofast_spark.ts.longrun import cochrane_orcutt

    return cochrane_orcutt(_daily(spark, sf_dir), "d", "v", "t")


def _hurst_oracle() -> str:
    """Replay of ts/longrun.hurst_rs at sizes (5, 10, 15): exact
    integer block ranges (m*S_t identity), quantized ln(R/S), then the
    3-point slope PIVOTED into fixed columns so the float sums happen
    in one declared order on both engines."""
    ys = {
        m: f"(CAST(slq{m} AS DOUBLE) / 1000000.0"
           f" / CAST(nb{m} AS DOUBLE))"
        for m in (5, 10, 15)
    }
    xs = {m: f"ln(CAST({m} AS DOUBLE))" for m in (5, 10, 15)}
    sx = f"(({xs[5]} + {xs[10]}) + {xs[15]})"
    sy = f"(({ys[5]} + {ys[10]}) + {ys[15]})"
    sxx = (
        f"(({xs[5]} * {xs[5]} + {xs[10]} * {xs[10]})"
        f" + {xs[15]} * {xs[15]})"
    )
    sxy = (
        f"(({xs[5]} * {ys[5]} + {xs[10]} * {ys[10]})"
        f" + {xs[15]} * {ys[15]})"
    )
    hurst = (
        f"(3.0 * {sxy} - {sx} * {sy})"
        f" / (3.0 * {sxx} - {sx} * {sx})"
    )
    return f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (
      SELECT CAST(floor(v * 10000.0 + 0.5) AS BIGINT) AS yu,
             row_number() OVER (ORDER BY d) - 1 AS t
      FROM daily),
    sizes AS (SELECT unnest([5, 10, 15]) AS m),
    tagged AS (
      SELECT m, yu,
             CAST(floor(CAST(t AS DOUBLE) / CAST(m AS DOUBLE))
               AS BIGINT) AS blk,
             t % m AS i
      FROM u, sizes),
    scored AS (
      SELECT m, blk, i, yu,
             count(*) OVER (PARTITION BY m, blk) AS cnt,
             sum(yu) OVER (PARTITION BY m, blk) AS sb,
             sum(yu * yu) OVER (PARTITION BY m, blk) AS qb,
             sum(yu) OVER (PARTITION BY m, blk ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM tagged),
    kept AS (SELECT * FROM scored WHERE cnt = m),
    per_blk AS (
      SELECT m, blk,
             max(CAST(m AS BIGINT) * cum - (i + 1) * sb) AS mx,
             min(CAST(m AS BIGINT) * cum - (i + 1) * sb) AS mn,
             max(sb) AS sb, max(qb) AS qb
      FROM kept GROUP BY 1, 2),
    lnq AS (
      SELECT m,
             CAST(floor(ln((CAST(mx - mn AS DOUBLE) / CAST(m AS DOUBLE))
                  / sqrt(CAST(qb AS DOUBLE) / CAST(m AS DOUBLE)
                         - (CAST(sb AS DOUBLE) / CAST(m AS DOUBLE))
                           * (CAST(sb AS DOUBLE) / CAST(m AS DOUBLE))))
                  * 1000000.0 + 0.5) AS BIGINT) AS lq
      FROM per_blk WHERE qb * m - sb * sb > 0),
    per_size AS (
      SELECT m, count(*) AS n_blocks, sum(lq) AS slq
      FROM lnq GROUP BY 1),
    piv AS (
      SELECT max(CASE WHEN m = 5 THEN n_blocks END) AS nb5,
             max(CASE WHEN m = 5 THEN slq END) AS slq5,
             max(CASE WHEN m = 10 THEN n_blocks END) AS nb10,
             max(CASE WHEN m = 10 THEN slq END) AS slq10,
             max(CASE WHEN m = 15 THEN n_blocks END) AS nb15,
             max(CASE WHEN m = 15 THEN slq END) AS slq15
      FROM per_size)
    SELECT p.m, CAST(p.n_blocks AS BIGINT) AS n_blocks,
           CAST(p.slq AS BIGINT) AS sum_ln_rs_u6,
           CAST(round({hurst}, 6) AS DOUBLE) AS hurst
    FROM per_size p, piv
    ORDER BY p.m
    """


@query("hurst_rs_daily", oracle=_hurst_oracle())
def hurst_rs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by rescaled-range analysis at
    block sizes 5/10/15 (ts/longrun.py hurst_rs; Hurst 1951,
    Mandelbrot & Wallis 1969) — the long-memory companion of
    variance_ratio_daily: exact integer block ranges via the
    ``m * S_t`` identity, quantized ln(R/S), fixed-order 3-point
    slope."""
    from gofast_spark.ts.longrun import hurst_rs

    return hurst_rs(
        _daily(spark, sf_dir), "d", "v", block_sizes=(5, 10, 15)
    )


@query(
    "theil_sen_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (
      SELECT CAST(floor(v * 10000.0 + 0.5) AS BIGINT) AS vu,
             CAST(t AS BIGINT) AS t
      FROM daily),
    pairs AS (
      SELECT a.t AS at, a.vu AS av, b.t AS bt, b.vu AS bv
      FROM u a JOIN u b ON a.t < b.t),
    sl AS (
      SELECT CAST(bv - av AS DOUBLE) / 10000.0
               / CAST(bt - at AS DOUBLE) AS s,
             row_number() OVER (ORDER BY CAST(bv - av AS DOUBLE)
               / 10000.0 / CAST(bt - at AS DOUBLE), at, bt) AS i,
             count(*) OVER () AS np
      FROM pairs),
    med AS (
      SELECT s AS sen, np FROM sl
      WHERE i = CAST(floor((CAST(np AS DOUBLE) + 1.0) / 2.0)
                AS BIGINT)),
    resid AS (
      SELECT CAST(vu AS DOUBLE) / 10000.0
               - (SELECT sen FROM med) * CAST(t AS DOUBLE) AS b0,
             row_number() OVER (ORDER BY CAST(vu AS DOUBLE) / 10000.0
               - (SELECT sen FROM med) * CAST(t AS DOUBLE), t) AS i,
             count(*) OVER () AS n
      FROM u),
    mi AS (
      SELECT b0, n FROM resid
      WHERE i = CAST(floor((CAST(n AS DOUBLE) + 1.0) / 2.0) AS BIGINT))
    SELECT CAST((SELECT n FROM mi) AS BIGINT) AS n,
           CAST((SELECT np FROM med) AS BIGINT) AS n_pairs,
           (SELECT sen FROM med) AS slope,
           (SELECT b0 FROM mi) AS intercept
    """,
)
def theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue (ts/longrun.py
    theil_sen; Theil 1950, Sen JASA 1968) — the slope companion of
    mann_kendall_daily_events: lower-median of all pairwise
    integer-grid slopes with (slope, i, j) tie-breaks, lower-median
    intercept, no interpolation anywhere."""
    from gofast_spark.ts.longrun import theil_sen

    return theil_sen(_daily(spark, sf_dir), "d", "v", "t")


@query(
    "ccf_clicks_purchases",
    oracle="""
    WITH x AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS v FROM events
      WHERE ts IS NOT NULL AND event_type = 'click' GROUP BY 1),
    y AS (
      SELECT CAST(ts AS DATE) AS dy, count(*) AS y FROM events
      WHERE ts IS NOT NULL AND event_type = 'purchase' GROUP BY 1),
    lags AS (SELECT CAST(unnest(range(-3, 4)) AS INT) AS lag),
    keyed AS (
      SELECT lag, x.v AS x, x.d + lag AS dk FROM x, lags),
    joined AS (SELECT lag, x, y FROM keyed JOIN y ON dk = dy),
    agg AS (
      SELECT lag, count(*) AS m, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy,
             sum(x * y) AS sxy
      FROM joined GROUP BY 1)
    SELECT lag, CAST(m AS BIGINT) AS n,
           (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS r
    FROM agg ORDER BY lag
    """,
)
def ccf_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between daily click and purchase
    counts at lags -3..3 (ts/causality.py cross_correlation; Box &
    Jenkins 1970 ch. 11) — the lead-lag screen beside
    granger_clicks_purchases: one lag-exploded join, integer Pearson
    moments per lag, every r a replayed expression."""
    from gofast_spark.ts.causality import cross_correlation

    e = _t(spark, sf_dir, "events")

    def daily(tp):
        return (
            e.where(
                F.col("ts").isNotNull() & (F.col("event_type") == tp)
            )
            .groupBy(F.col("ts").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("v"))
        )

    return cross_correlation(
        daily("click"), daily("purchase"), "d", "v", max_lag=3
    )


@query(
    "turning_points_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (
      SELECT d, CAST(floor(v * 10000.0 + 0.5) AS BIGINT) AS v
      FROM daily),
    lagd AS (
      SELECT v, lag(v, 1) OVER (ORDER BY d) AS p,
             lead(v, 1) OVER (ORDER BY d) AS nx
      FROM u),
    base AS (
      SELECT * FROM lagd WHERE p IS NOT NULL AND nx IS NOT NULL),
    agg AS (
      SELECT count(*) + 2 AS n,
             sum(CAST((p < v AND v > nx) OR (p > v AND v < nx)
                 AS BIGINT)) AS t
      FROM base)
    SELECT CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS t_points,
           2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0 AS expected,
           (CAST(t AS DOUBLE)
            - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
             / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0) AS z
    FROM agg
    """,
)
def turning_points_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test on daily revenue
    (ts/engineering.py turning_points_test; Kendall & Stuart vol. 3)
    — the local-extrema companion of runs_test_daily_events: integer
    comparisons on the u4 grid, classical i.i.d. moments."""
    from gofast_spark.ts.engineering import turning_points_test

    return turning_points_test(_daily(spark, sf_dir), "d", "v")


@query(
    "von_neumann_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (SELECT d, CAST(floor(v * 10000 + 0.5) AS BIGINT) AS x
          FROM daily),
    l AS (SELECT x, x - lag(x) OVER (ORDER BY d) AS dd FROM u),
    a AS (
      SELECT sum(CASE WHEN dd IS NOT NULL
                      THEN CAST(dd AS HUGEINT) * dd ELSE 0 END) AS sd2,
             sum(CAST(x AS HUGEINT) * x) AS sx2,
             sum(CAST(x AS HUGEINT)) AS sx,
             count(*) AS n
      FROM l)
    SELECT CAST(round(CAST(n * n * sd2 AS DOUBLE)
             / CAST((n - 1) * (n * sx2 - sx * sx) AS DOUBLE), 6)
             AS DOUBLE) AS vn_ratio,
           CAST(round((CAST(n * n * sd2 AS DOUBLE)
               / CAST((n - 1) * (n * sx2 - sx * sx) AS DOUBLE) - 2.0)
             / sqrt(4.0 * (CAST(n AS DOUBLE) - 2.0)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)),
             6) AS DOUBLE) AS z,
           CAST(n AS BIGINT) AS n
    FROM a
    """,
)
def von_neumann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Von Neumann successive-difference ratio of the daily series
    (ts/engineering.py von_neumann_ratio; von Neumann 1941) — the
    finite-sample Durbin-Watson relative beside the runs and
    turning-points randomness screens: integer difference/deviation
    moments, one double division."""
    from gofast_spark.ts.engineering import von_neumann_ratio

    out = von_neumann_ratio(_daily(spark, sf_dir), "v", "d")
    return out.select(
        F.round("vn_ratio", 6).cast("double").alias("vn_ratio"),
        F.round("z", 6).cast("double").alias("z"),
        "n",
    )


@query(
    "cox_stuart_daily_events",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (
      SELECT CAST(floor(v * 10000 + 0.5) AS BIGINT) AS x,
             row_number() OVER (ORDER BY d) AS t
      FROM daily),
    tot AS (SELECT count(*) AS n FROM u),
    a AS (
      SELECT u.x, u.t, tot.n FROM u, tot
      WHERE u.t <= tot.n - floor((tot.n + 1) / 2)),
    p AS (
      SELECT a.x AS x1, b.x AS x2, a.n
      FROM a JOIN u b ON a.t + floor((a.n + 1) / 2) = b.t),
    g AS (
      SELECT sum(CASE WHEN x2 > x1 THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN x2 < x1 THEN 1 ELSE 0 END) AS nm,
             count(*) AS npairs, max(n) AS n
      FROM p)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(npairs AS BIGINT) AS n_pairs,
           CAST(np AS BIGINT) AS n_plus,
           CAST(nm AS BIGINT) AS n_minus,
           CAST(round(CAST(np - nm AS DOUBLE)
             / sqrt(CAST(np + nm AS DOUBLE)), 6) AS DOUBLE) AS z
    FROM g
    """,
)
def cox_stuart_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart sign test for trend on the daily series
    (ts/engineering.py cox_stuart_test; Cox & Stuart 1955) — the
    half-split sign screen beside mann_kendall_daily_events: one
    indexed self-equi-join on the rollup-sized frame, integer sign
    counts, one normal deviate."""
    from gofast_spark.ts.engineering import cox_stuart_test

    out = cox_stuart_test(_daily(spark, sf_dir), "v", "d")
    return out.select(
        "n", "n_pairs", "n_plus", "n_minus",
        F.round("z", 6).cast("double").alias("z"),
    )


@query(
    "seasonal_mann_kendall_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (SELECT t % 7 AS g, d, v FROM daily),
    idx AS (
      SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY d) AS rn
      FROM u),
    p AS (
      SELECT sum(CASE WHEN b.v > a.v THEN 1
                      WHEN b.v < a.v THEN -1 ELSE 0 END) AS s
      FROM idx a JOIN idx b ON a.g = b.g AND a.rn < b.rn),
    ties AS (SELECT g, v, count(*) AS tt FROM idx GROUP BY g, v),
    per AS (
      SELECT g, sum(tt * (tt - 1) * (2 * tt + 5)) AS tie_term,
             sum(tt) AS n_g
      FROM ties GROUP BY g),
    vt AS (
      SELECT sum(n_g * (n_g - 1) * (2 * n_g + 5) - tie_term) AS var18,
             sum(n_g) AS n, count(*) AS k
      FROM per)
    SELECT CAST(s AS BIGINT) AS s,
           CAST(round(CAST(var18 AS DOUBLE) / 18.0, 6) AS DOUBLE)
             AS var_s,
           CAST(round(CASE
             WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
               / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
               / sqrt(CAST(var18 AS DOUBLE) / 18.0)
             ELSE 0.0 END, 6) AS DOUBLE) AS z,
           CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS n_seasons
    FROM p, vt
    """,
)
def seasonal_mann_kendall_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonal Mann-Kendall over the daily series with day-of-week
    seasons (ts/engineering.py seasonal_mann_kendall; Hirsch-Slack
    -Smith 1982) — within-season pairs only, so the weekly cycle
    cannot masquerade as trend; the deseasonalized companion of
    mann_kendall_daily_events."""
    from gofast_spark.ts.engineering import seasonal_mann_kendall

    d = _daily(spark, sf_dir).withColumn("season", F.col("t") % 7)
    out = seasonal_mann_kendall(d, "d", "v", "season")
    return out.select(
        "s",
        F.round("var_s", 6).cast("double").alias("var_s"),
        F.round("z", 6).cast("double").alias("z"),
        "n",
        "n_seasons",
    )


@query(
    "dixon_q_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (SELECT CAST(floor(v * 10000 + 0.5) AS BIGINT) AS x FROM daily),
    r AS (
      SELECT x, row_number() OVER (ORDER BY x) AS ra,
             row_number() OVER (ORDER BY x DESC) AS rd,
             count(*) OVER () AS n
      FROM u),
    a AS (
      SELECT min(x) AS lo, max(x) AS hi,
             min(CASE WHEN ra = 2 THEN x END) AS second,
             min(CASE WHEN rd = 2 THEN x END) AS penult,
             max(n) AS n
      FROM r)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(lo AS DOUBLE) / 10000.0 AS x_min,
           CAST(second AS DOUBLE) / 10000.0 AS x_second,
           CAST(penult AS DOUBLE) / 10000.0 AS x_penult,
           CAST(hi AS DOUBLE) / 10000.0 AS x_max,
           CASE WHEN hi > lo THEN CAST(round(
             CAST(second - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE), 6)
             AS DOUBLE) END AS q_low,
           CASE WHEN hi > lo THEN CAST(round(
             CAST(hi - penult AS DOUBLE) / CAST(hi - lo AS DOUBLE), 6)
             AS DOUBLE) END AS q_high
    FROM a
    """,
)
def dixon_q_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q gap-over-range ratios for the daily series extremes
    (ts/engineering.py dixon_q; Dixon 1950) — the small-sample
    order-statistic outlier screen beside grubbs_test_acctbal."""
    from gofast_spark.ts.engineering import dixon_q

    out = dixon_q(_daily(spark, sf_dir), "v")
    return out.select(
        "n", "x_min", "x_second", "x_penult", "x_max",
        F.round("q_low", 6).cast("double").alias("q_low"),
        F.round("q_high", 6).cast("double").alias("q_high"),
    )


@query(
    "holt_forecast_daily",
    oracle=f"""
    WITH RECURSIVE daily AS ({_DAILY_SQL}),
    u AS (
      SELECT row_number() OVER (ORDER BY d) AS t,
             CAST(floor(v * 10000 + 0.5) AS BIGINT) AS y
      FROM daily),
    nn AS (SELECT max(t) AS n FROM u),
    rec AS (
      SELECT 2 AS t,
             (SELECT y FROM u WHERE t = 2) AS l,
             (SELECT y FROM u WHERE t = 2)
               - (SELECT y FROM u WHERE t = 1) AS b
      UNION ALL
      SELECT r.t + 1,
             CAST(floor((u.y + 1 * (r.l + r.b)) / 2) AS BIGINT),
             CAST(floor((
               (CAST(floor((u.y + 1 * (r.l + r.b)) / 2) AS BIGINT) - r.l)
               + 3 * r.b) / 4) AS BIGINT)
      FROM rec r JOIN u ON u.t = r.t + 1
      WHERE r.t < (SELECT n FROM nn)),
    fin AS (SELECT l, b FROM rec ORDER BY t DESC LIMIT 1),
    h AS (SELECT unnest(range(1, 8)) AS h)
    SELECT CAST(h AS INT) AS h,
           CAST(l + h * b AS DOUBLE) / 10000.0 AS forecast,
           CAST(l AS DOUBLE) / 10000.0 AS level,
           CAST(b AS DOUBLE) / 10000.0 AS trend
    FROM h, fin
    """,
)
def holt_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of the daily series with dyadic
    alpha = 1/2, beta = 1/4 (ts/engineering.py holt_forecast; Holt
    1957, Gardner 1985) — exact integer recursion folded in-plan via
    F.aggregate; the two-parameter companion of Brown's double EWMA;
    DuckDB replays the identical floor recursion as a recursive
    CTE."""
    from gofast_spark.ts.engineering import holt_forecast

    out = holt_forecast(_daily(spark, sf_dir), "v", "d")
    return out.select("h", "forecast", "level", "trend")


@query(
    "von_neumann_by_type_events",
    oracle="""
    WITH daily AS (
      SELECT event_type AS g, CAST(ts AS DATE) AS d,
             CAST(round(sum(value), 4) AS DOUBLE) AS v
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
    u AS (
      SELECT g, d, CAST(floor(v * 10000 + 0.5) AS BIGINT) AS x
      FROM daily),
    l AS (
      SELECT g, x, x - lag(x) OVER (PARTITION BY g ORDER BY d) AS dd
      FROM u),
    a AS (
      SELECT g,
             sum(CASE WHEN dd IS NOT NULL
                      THEN CAST(dd AS HUGEINT) * dd ELSE 0 END) AS sd2,
             sum(CAST(x AS HUGEINT) * x) AS sx2,
             sum(CAST(x AS HUGEINT)) AS sx,
             count(*) AS n
      FROM l GROUP BY g)
    SELECT g AS event_type,
           CASE WHEN n > 2 AND (n - 1) * (n * sx2 - sx * sx) > 0
                THEN CAST(round(CAST(n * n * sd2 AS DOUBLE)
                  / CAST((n - 1) * (n * sx2 - sx * sx) AS DOUBLE), 6)
                  AS DOUBLE) END AS vn_ratio,
           CASE WHEN n > 2 AND (n - 1) * (n * sx2 - sx * sx) > 0
                THEN CAST(round((CAST(n * n * sd2 AS DOUBLE)
                    / CAST((n - 1) * (n * sx2 - sx * sx) AS DOUBLE) - 2.0)
                  / sqrt(4.0 * (CAST(n AS DOUBLE) - 2.0)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)),
                  6) AS DOUBLE) END AS z,
           CAST(n AS BIGINT) AS n
    FROM a
    """,
)
def von_neumann_by_type_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type von Neumann ratio over each type's daily series
    (ts/engineering.py von_neumann_by_group) — one scan with
    group-partitioned lag windows, the per-segment randomness screen
    beside the pooled von_neumann_daily."""
    from gofast_spark.ts.engineering import von_neumann_by_group

    e = _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    daily = e.groupBy(
        F.col("event_type").alias("event_type"),
        F.col("ts").cast("date").alias("d"),
    ).agg(F.round(F.sum("value"), 4).cast("double").alias("v"))
    out = von_neumann_by_group(daily, "v", "d", "event_type")
    return out.select(
        "event_type",
        F.round("vn_ratio", 6).cast("double").alias("vn_ratio"),
        F.round("z", 6).cast("double").alias("z"),
        "n",
    )


@query(
    "cum_periodogram_daily",
    oracle=f"""
    WITH pg AS ({_periodogram_oracle()}),
    q AS (
      SELECT k, CAST(floor(power * 1000000.0) AS BIGINT) AS p FROM pg),
    c AS (
      SELECT k, sum(p) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS cum
      FROM q),
    t AS (SELECT max(cum) AS tot, max(k) AS m FROM c),
    d AS (
      SELECT max(abs(CAST(cum AS HUGEINT) * m - CAST(k AS HUGEINT) * tot))
               AS dnum,
             max(m) AS m, max(tot) AS tot
      FROM c, t WHERE k < m)
    SELECT CAST(round(CAST(dnum AS DOUBLE)
             / (CAST(m AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS DOUBLE)
             AS d_stat,
           CAST(m AS INT) AS m
    FROM d
    """,
)
def cum_periodogram_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett cumulative-periodogram white-noise screen over the
    daily series harmonics (ts/engineering.py cum_periodogram_test;
    Bartlett 1955) — sup gap between the normalized spectral CDF and
    the diagonal, integer cum/sup arithmetic over the 10-harmonic
    frame; the broadband companion of periodogram_daily_events."""
    from gofast_spark.ts.engineering import cum_periodogram_test

    out = cum_periodogram_test(_daily(spark, sf_dir), "t", "v")
    return out.select(
        F.round("d_stat", 6).cast("double").alias("d_stat"), "m"
    )


@query(
    "record_counts_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    u AS (
      SELECT d, CAST(floor(v * 10000 + 0.5) AS BIGINT) AS x FROM daily),
    fl AS (
      SELECT CASE WHEN max(x) OVER w IS NULL THEN 1
                  WHEN x > max(x) OVER w THEN 1 ELSE 0 END AS hi,
             CASE WHEN min(x) OVER w IS NULL THEN 1
                  WHEN x < min(x) OVER w THEN 1 ELSE 0 END AS lo,
             row_number() OVER (ORDER BY d) AS rn
      FROM u
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING))
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(hi) AS BIGINT) AS n_record_high,
           CAST(sum(lo) AS BIGINT) AS n_record_low,
           CAST(round(CAST(sum(CAST(floor(1000000000.0 / rn) AS BIGINT))
             AS DOUBLE) / 1000000000.0, 6) AS DOUBLE) AS expected
    FROM fl
    """,
)
def record_counts_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record statistics of the daily series (ts/engineering.py
    record_counts; Foster & Stuart 1954): running-maximum/minimum
    counts against the assumption-free H_n expectation — the cheapest
    trend screen beside cox_stuart_daily_events."""
    from gofast_spark.ts.engineering import record_counts

    out = record_counts(_daily(spark, sf_dir), "v", "d")
    return out.select(
        "n", "n_record_high", "n_record_low",
        F.round("expected", 6).cast("double").alias("expected"),
    )


import math as _math

_BC_L1 = _math.floor(_math.log(0.3 / 0.2) * 1e6)
_BC_L0 = _math.floor(_math.log(0.7 / 0.8) * 1e6)


@query(
    "bernoulli_cusum_daily",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS k,
             count(*) AS n
      FROM events WHERE event_type IS NOT NULL GROUP BY 1),
    inc AS (
      SELECT d, k, n,
             k * CAST({_BC_L1} AS BIGINT)
               + (n - k) * CAST({_BC_L0} AS BIGINT) AS i
      FROM daily),
    pp AS (
      SELECT d, k, n,
             sum(i) OVER w AS p
      FROM inc
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)),
    s AS (
      SELECT d, k, n,
             p - least(CAST(0 AS BIGINT), CAST(min(p) OVER w AS BIGINT))
               AS sv
      FROM pp
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW))
    SELECT d, CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           CAST(sv / 1000000.0 AS DOUBLE) AS cusum,
           CAST(sv > 5000000 AS INT) AS alarm
    FROM s
    """,
)
def bernoulli_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli CUSUM on the daily purchase share (ts/changepoint.py
    bernoulli_cusum; Page 1954, Reynolds & Stoumbos 1999) —
    u6-quantized LLR increments against p0=0.2 vs p1=0.3, h=5; the
    conversion-rate companion of cusum_daily_events via the same
    prefix-sum/running-min identity."""
    from gofast_spark.ts.changepoint import bernoulli_cusum

    e = _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("k"),
        F.count(F.lit(1)).alias("n"),
    )
    out = bernoulli_cusum(daily, "d", "k", "n", p0=0.2, p1=0.3, h=5.0)
    return out.select(
        "d", "k", "n",
        F.col("cusum").alias("cusum"),
        "alarm",
    )


@query(
    "poisson_dispersion_by_type_events",
    oracle="""
    WITH daily AS (
      SELECT event_type AS g, CAST(ts AS DATE) AS d, count(*) AS c
      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
    a AS (
      SELECT g, count(*) AS n,
             sum(CAST(c AS HUGEINT)) AS s,
             sum(CAST(c AS HUGEINT) * c) AS ss
      FROM daily GROUP BY g)
    SELECT g AS event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS DOUBLE) AS mean_daily,
           CASE WHEN s > 0 AND n > 1 THEN CAST(round(
             ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
               / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
             / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS DOUBLE)
           END AS dispersion,
           CASE WHEN s > 0 AND n > 1 THEN CAST(round(
             ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
               / CAST(n AS DOUBLE)) / (CAST(s AS DOUBLE)
               / CAST(n AS DOUBLE))), 6) AS DOUBLE)
           END AS chi2
    FROM a
    """,
)
def poisson_dispersion_by_type_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-type Poisson dispersion of DAILY event counts (Fisher's
    variance/mean index per segment; the grouped companion of
    poisson_dispersion_user_events): one daily groupBy + one type
    aggregate, integer moments, closed-form index and chi-square."""
    e = _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    daily = e.groupBy(
        F.col("event_type").alias("event_type"),
        F.col("ts").cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast("decimal(19,0)")).alias("s"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).alias("ss"),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    var = (ss - s * s / n) / (n - 1.0)
    mean = s / n
    ok = (F.col("s") > 0) & (F.col("n") > 1)
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(mean, 6).cast("double").alias("mean_daily"),
        F.round(F.when(ok, var / mean), 6).cast("double").alias(
            "dispersion"
        ),
        F.round(F.when(ok, (ss - s * s / n) / mean), 6)
        .cast("double")
        .alias("chi2"),
    )
