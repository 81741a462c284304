"""isotonic_fit vs a pure-Python pool-adjacent-violators reference."""

from __future__ import annotations


def _pav(pairs):
    """Classic weighted PAV over (weight, value) blocks in order."""
    merged = []
    for w, v in pairs:
        merged.append([w, w * v])
        while (
            len(merged) > 1
            and merged[-2][1] / merged[-2][0] > merged[-1][1] / merged[-1][0]
        ):
            w2, s2 = merged.pop()
            merged[-1][0] += w2
            merged[-1][1] += s2
    # expand back: one fitted value per original block
    vals = []
    i = 0
    for w, sm in merged:
        mean = sm / w
        total = w
        while total > 0:
            total -= pairs[i][0]
            vals.append(mean)
            i += 1
    return vals


def test_isotonic_matches_pav(spark):
    from gofast_spark.ml.isotonic import isotonic_fit

    # scores spread over 8 bins, labels deliberately non-monotone
    rows = []
    data = {0: (5, 3), 1: (4, 1), 2: (6, 5), 3: (3, 0),
            4: (8, 6), 5: (2, 2), 6: (7, 3), 7: (5, 5)}
    for b, (n, pos) in data.items():
        for i in range(n):
            rows.append(((b + 0.5) / 8.0, 1 if i < pos else 0))
    df = spark.createDataFrame(rows, ["s", "y"])
    got = {
        r["bin"]: r for r in isotonic_fit(df, "s", "y", bins=8).collect()
    }
    pairs = [(data[b][0], data[b][1] / data[b][0]) for b in sorted(data)]
    want = _pav(pairs)
    assert len(got) == 8
    for b in sorted(data):
        assert abs(got[b]["iso"] - want[b]) < 1e-9, (b, got[b]["iso"], want[b])
    # monotone non-decreasing
    seq = [got[b]["iso"] for b in sorted(got)]
    assert all(a <= b + 1e-12 for a, b in zip(seq, seq[1:]))


def test_isotonic_monotone_input_is_identity(spark):
    from gofast_spark.ml.isotonic import isotonic_fit

    rows = []
    for b in range(6):
        for i in range(10):
            rows.append(((b + 0.5) / 6.0, 1 if i < b + 2 else 0))
    df = spark.createDataFrame(rows, ["s", "y"])
    out = isotonic_fit(df, "s", "y", bins=6).collect()
    for r in out:
        assert abs(r["iso"] - r["pos_rate"]) < 1e-9


def test_isotonic_excludes_out_of_domain(spark):
    from gofast_spark.ml.isotonic import isotonic_fit

    df = spark.createDataFrame(
        [(-0.2, 1), (0.25, 1), (0.75, 0), (1.5, 0)], ["s", "y"]
    )
    out = isotonic_fit(df, "s", "y", bins=2).collect()
    assert sum(r["n"] for r in out) == 2
