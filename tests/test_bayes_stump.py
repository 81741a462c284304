"""ml/bayes.py + ml/stump.py vs plain-Python/numpy references."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _gnb_data(spark, n=300, seed=11):
    rng = np.random.RandomState(seed)
    rows = []
    for cls, (mx, my) in {"a": (0.0, 0.0), "b": (3.0, 1.0),
                          "c": (-2.0, 2.0)}.items():
        for _ in range(n // 3):
            rows.append(Row(y=cls,
                            x1=float(rng.randn() + mx),
                            x2=float(rng.randn() * 2 + my)))
    return rows, spark.createDataFrame(rows)


def test_gaussian_nb_matches_sklearn_formulas(spark):
    from gofast_spark.ml.bayes import fit_gaussian_nb, predict_gaussian_nb

    rows, df = _gnb_data(spark)
    model = fit_gaussian_nb(df, ["x1", "x2"], "y")
    # reference moments
    by = {}
    for r in rows:
        by.setdefault(r.y, []).append((r.x1, r.x2))
    max_var = 0.0
    ref = {}
    for c, pts in by.items():
        a = np.array(pts)
        mu = a.mean(axis=0)
        var = a.var(axis=0)  # population variance, sklearn's ML estimate
        ref[c] = (mu, var)
        max_var = max(max_var, float(var.max()))
    eps = 1e-9 * max_var
    for c in model["classes"]:
        mu, var = ref[c]
        assert model["means"][c] == pytest.approx(list(mu), rel=1e-9)
        assert model["vars"][c] == pytest.approx(list(var + eps), rel=1e-6)
        assert model["priors"][c] == pytest.approx(len(by[c]) / len(rows))

    # predictions match the driver-side formula applied per row
    got = {(r["x1"], r["x2"]): r["prediction"]
           for r in predict_gaussian_nb(df, model).collect()}
    wrong = 0
    for r in rows:
        best, best_ll = None, -math.inf
        for c in model["classes"]:
            ll = math.log(model["priors"][c])
            for i, x in enumerate((r.x1, r.x2)):
                mu = model["means"][c][i]
                v = model["vars"][c][i]
                ll += -0.5 * math.log(2 * math.pi * v) \
                      - (x - mu) ** 2 / (2 * v)
            if ll > best_ll:
                best, best_ll = c, ll
        wrong += got[(r.x1, r.x2)] != best
    assert wrong == 0
    # sanity: well-separated classes classify mostly correctly
    acc = sum(got[(r.x1, r.x2)] == r.y for r in rows) / len(rows)
    assert acc > 0.8


def test_stump_matches_exhaustive_search(spark):
    from gofast_spark.ml.stump import fit_stump

    rng = np.random.RandomState(5)
    xs = rng.rand(500) * 10
    ys = (xs > 6.28).astype(int)
    flip = rng.rand(500) < 0.05
    ys = np.where(flip, 1 - ys, ys)
    df = spark.createDataFrame(
        [(float(x), int(y)) for x, y in zip(xs, ys)], "x double, y int"
    )
    lo, hi, bins = 0.0, 10.0, 50
    got = fit_stump(df, "x", "y", lo=lo, hi=hi, bins=bins).collect()[0]

    # exhaustive reference over the same grid
    width = (hi - lo) / bins
    best = None
    n, pos = len(ys), int(ys.sum())

    def gini(p, m):
        q = p / m
        return 2.0 * q * (1.0 - q)

    for b in range(bins):
        thr = lo + b * width
        mask = xs < thr
        nl, pl = int(mask.sum()), int(ys[mask].sum())
        if nl == 0 or nl == n:
            continue
        g = gini(pos, n) - nl / n * gini(pl, nl) \
            - (n - nl) / n * gini(pos - pl, n - nl)
        if best is None or g > best[1] + 1e-15:
            best = (thr, g, nl, n - nl, pl, pos - pl)
    assert got["threshold"] == pytest.approx(best[0])
    assert got["gain"] == pytest.approx(best[1], rel=1e-12)
    assert (got["n_left"], got["n_right"]) == (best[2], best[3])
    assert (got["pos_left"], got["pos_right"]) == (best[4], best[5])
    # recovered threshold is near the true boundary
    assert abs(got["threshold"] - 6.28) < 2 * width


def test_stump_validates_args(spark):
    from gofast_spark.ml.stump import fit_stump

    df = spark.createDataFrame([(1.0, 1)], "x double, y int")
    with pytest.raises(ValueError, match="bins"):
        fit_stump(df, "x", "y", lo=0.0, hi=1.0, bins=1)
    with pytest.raises(ValueError, match="hi > lo"):
        fit_stump(df, "x", "y", lo=1.0, hi=1.0)


def test_boosted_stumps_reduce_sse_each_round(spark):
    from gofast_spark.ml.boost import fit_boosted_stumps

    rng = np.random.RandomState(9)
    xs = rng.rand(400) * 10
    ys = np.where(xs < 4, 10.0, 50.0) + np.where(xs < 7, 0.0, 30.0) \
        + rng.randn(400)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)], "x double, y double"
    )
    model = {r["round"]: r for r in fit_boosted_stumps(
        df, "x", "y", lo=0.0, hi=10.0, bins=40, rounds=3).collect()}
    assert set(model) == {0, 1, 2, 3}
    base = model[0]["left_u3"] / 1e3
    assert base == pytest.approx(float(ys.mean()), abs=0.001)

    # apply the model in python and check SSE strictly decreases
    pred = np.full_like(ys, model[0]["left_u3"], dtype=np.int64)
    y_u = np.trunc(ys * 1e3 + 0.5).astype(np.int64)
    sses = [float((((y_u - pred) / 1e3) ** 2).sum())]
    for k in (1, 2, 3):
        thr, lv, rv = (model[k]["threshold"], model[k]["left_u3"],
                       model[k]["right_u3"])
        pred = pred + np.where(xs < thr, lv, rv)
        sses.append(float((((y_u - pred) / 1e3) ** 2).sum()))
    assert sses[1] < sses[0] and sses[2] < sses[1]
    # first split should land near one of the true breakpoints
    assert min(abs(model[1]["threshold"] - 4), abs(model[1]["threshold"] - 7)) <= 0.5


def test_kmeans_lloyd_recovers_separated_clusters(spark):
    from gofast_spark.ml.kmeans_exact import fit_kmeans_lloyd

    import hashlib

    rng = np.random.RandomState(3)
    centers = [(-5.0, -5.0), (5.0, 5.0), (-5.0, 5.0), (5.0, -5.0)]

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    # Lloyd from arbitrary seeds can hit a local optimum; pin the FOUR
    # LOWEST-HASH ids (the operator's seeds) to distinct clusters so
    # convergence to the true centers is guaranteed
    seeds = sorted(range(400), key=h)[:4]
    cluster = {i: i % 4 for i in range(400)}
    for c, s in enumerate(seeds):
        cluster[s] = c
    rows = []
    for i in range(400):
        cx, cy = centers[cluster[i]]
        rows.append((i, float(cx + rng.randn() * 0.3),
                     float(cy + rng.randn() * 0.3)))
    df = spark.createDataFrame(rows, "id bigint, a double, b double")
    out = fit_kmeans_lloyd(df, "id", ["a", "b"], 4, iterations=3).collect()
    assert len(out) == 4
    assert sum(r["n_points"] for r in out) == 400
    got = sorted(
        (round(r["c0_u6"] / 1e6), round(r["c1_u6"] / 1e6)) for r in out
    )
    assert got == sorted(centers)
    # determinism under repartitioning
    out2 = fit_kmeans_lloyd(
        df.repartition(13), "id", ["a", "b"], 4, iterations=3
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_dbscan_two_blobs_and_noise(spark):
    from gofast_spark.ml.dbscan import dbscan

    rng = np.random.RandomState(7)
    rows = []
    i = 0
    for cx, cy in ((0.0, 0.0), (10.0, 10.0)):
        for _ in range(40):
            rows.append((i, float(cx + rng.randn() * 0.2),
                         float(cy + rng.randn() * 0.2)))
            i += 1
    rows.append((i, 100.0, 100.0))  # isolated noise point
    df = spark.createDataFrame(rows, "id bigint, a double, b double")
    out = dbscan(df, "id", ["a", "b"], eps=1.0, min_pts=4).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[80]["role"] == "noise" and by_id[80]["cluster"] is None
    c0 = {by_id[j]["cluster"] for j in range(40)}
    c1 = {by_id[j]["cluster"] for j in range(40, 80)}
    assert c0 == {0} and c1 == {40}, (c0, c1)  # min-member labels
    assert all(by_id[j]["role"] in ("core", "border") for j in range(80))
    # determinism under repartitioning
    out2 = dbscan(df.repartition(9), "id", ["a", "b"],
                  eps=1.0, min_pts=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_changepoint_finds_planted_shift(spark):
    from gofast_spark.ts.changepoint import best_changepoint
    import datetime

    rng = np.random.RandomState(13)
    rows = []
    d0 = datetime.date(2024, 1, 1)
    for i in range(120):
        level = 10.0 if i < 70 else 25.0
        rows.append((d0 + datetime.timedelta(days=i),
                     float(level + rng.randn() * 0.5)))
    df = spark.createDataFrame(rows, "d date, y double")
    got = best_changepoint(df, "d", "y").collect()[0]
    assert got["change_at"] == d0 + datetime.timedelta(days=70)
    assert got["n_left"] == 70 and got["n_right"] == 50
    assert got["mean_left"] == pytest.approx(10.0, abs=0.3)
    assert got["mean_right"] == pytest.approx(25.0, abs=0.3)

    # < 2 points: no split exists
    tiny = spark.createDataFrame([(d0, 1.0)], "d date, y double")
    out = best_changepoint(tiny, "d", "y").collect()
    assert len(out) == 1 and out[0]["change_at"] is None


def test_split_conformal_coverage_guarantee(spark):
    from gofast_spark.ml.conformal import split_conformal_group_mean

    rng = np.random.RandomState(21)
    rows = []
    for i in range(4000):
        g = ["a", "b", "c"][i % 3]
        base = {"a": 10.0, "b": 50.0, "c": 200.0}[g]
        rows.append((i, g, float(base + rng.randn() * 5.0)))
    df = spark.createDataFrame(rows, "id bigint, g string, y double")
    out = split_conformal_group_mean(
        df, "g", "y", id_col="id", alpha=0.1
    ).collect()[0]
    # distribution-free guarantee: expected coverage >= 90%; allow
    # finite-sample slack on the lower side
    assert out["coverage"] >= 0.85
    assert out["coverage"] <= 1.0
    # qhat should sit near the 90th percentile of |N(0,5)| ~ 8.2
    assert 6.0 < out["qhat"] < 11.0
    # tighter alpha -> wider interval
    wide = split_conformal_group_mean(
        df, "g", "y", id_col="id", alpha=0.01
    ).collect()[0]
    assert wide["qhat"] > out["qhat"]


def test_cuped_reduces_variance_preserves_effect(spark):
    from gofast_spark.stats.cuped import cuped_report

    rng = np.random.RandomState(17)
    rows = []
    for u in range(1500):
        variant = u % 2
        activity = float(rng.gamma(4.0, 10.0))  # stable user trait
        lift = 5.0 if variant == 1 else 0.0
        # pre and post both driven by the trait -> correlated
        rows.append((u, variant, "2024-01-05 00:00:00",
                     activity + float(rng.randn())))
        rows.append((u, variant, "2024-01-20 00:00:00",
                     activity + lift + float(rng.randn())))
    df = spark.createDataFrame(
        rows, "u bigint, variant int, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["variant"]: r for r in cuped_report(
        df, "u", "ts", "value", "variant",
        experiment_start="2024-01-10").collect()}
    for v in (0, 1):
        # pre/post correlation ~ var(trait)/(var(trait)+1) ~ 0.997
        assert out[v]["var_reduction"] > 0.8
        assert out[v]["var_adj"] < out[v]["var_post"] * 0.2
    # the treatment effect survives adjustment
    eff_raw = out[1]["mean_post"] - out[0]["mean_post"]
    eff_adj = out[1]["mean_adj"] - out[0]["mean_adj"]
    assert eff_adj == pytest.approx(5.0, abs=1.0)
    assert abs(eff_adj - eff_raw) < 3.0


def test_multi_feature_boosting_selects_signal_feature(spark):
    from gofast_spark.ml.boost import fit_boosted_stumps_multi

    rng = np.random.RandomState(29)
    rows = []
    for i in range(600):
        noise_f = float(rng.rand() * 10)           # no signal
        signal_f = float(rng.rand() * 10)
        y = (30.0 if signal_f > 5 else 5.0) + float(rng.randn())
        rows.append((noise_f, signal_f, y))
    df = spark.createDataFrame(rows, "nf double, sf double, y double")
    model = fit_boosted_stumps_multi(
        df, [("nf", 0.0, 10.0, 20), ("sf", 0.0, 10.0, 20)], "y", rounds=2
    ).collect()
    r1 = [r for r in model if r["round"] == 1][0]
    assert r1["feature"] == "sf", "round 1 must pick the signal feature"
    assert abs(r1["threshold"] - 5.0) <= 0.5
