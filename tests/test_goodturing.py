"""good_turing_spectrum vs a pure-Python Gale-Sampson LGT reference."""

from __future__ import annotations

import math


def _lgt(texts):
    import re
    from collections import Counter

    toks = []
    for t in texts:
        n = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        if n:
            toks.extend(n.split(" "))
    counts = Counter(toks)
    spec = Counter(counts.values())
    rs = sorted(spec)
    out = {}
    xs, ys = [], []
    for idx, r in enumerate(rs):
        q = rs[idx - 1] if idx > 0 else 0
        t = rs[idx + 1] if idx + 1 < len(rs) else 2 * r - q
        z = 2.0 * spec[r] / (t - q)
        xs.append(math.log(r))
        ys.append(math.log(z))
        out[r] = {"n_r": spec[r], "z_r": z}
    m = len(xs)
    q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    sx = sum(q6(x) for x in xs)
    sy = sum(q6(y) for y in ys)
    sxx = sum(q6(x * x) for x in xs)
    sxy = sum(q6(x * y) for x, y in zip(xs, ys))
    n_tokens = sum(r * n for r, n in spec.items())
    b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    for r in rs:
        rstar = (r + 1) * ((r + 1) / r) ** b
        out[r]["r_star"] = rstar
        out[r]["p_gt"] = rstar / n_tokens
    return out, spec.get(1, 0) / n_tokens


def test_good_turing_matches_reference(spark):
    from gofast_spark.text.goodturing import good_turing_spectrum

    texts = [
        "the cat sat on the mat",
        "the dog ate the cat food",
        "a dog and a cat and a rat",
        "rat mat cat hat bat",
        "the the the a a on",
        "unique tokens appear here once only",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {r["r"]: r for r in good_turing_spectrum(df, "text").collect()}
    want, p0 = _lgt(texts)
    assert set(got) == set(want)
    for r, wr in want.items():
        assert got[r]["n_r"] == wr["n_r"]
        assert abs(got[r]["z_r"] - wr["z_r"]) < 1e-12
        assert abs(got[r]["r_star"] - wr["r_star"]) < 1e-6
        assert abs(got[r]["p_gt"] - wr["p_gt"]) < 1e-9
        assert abs(got[r]["p0"] - p0) < 1e-12


def test_good_turing_smoothed_counts_positive_increasing(spark):
    from gofast_spark.text.goodturing import good_turing_spectrum

    texts = ["w%d w%d common common common" % (i, i % 3) for i in range(30)]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = sorted(
        good_turing_spectrum(df, "text").collect(), key=lambda r: r["r"]
    )
    assert all(r["r_star"] > 0 for r in rows)
    stars = [r["r_star"] for r in rows]
    assert stars == sorted(stars)


def test_heaps_law_reference(spark):
    import math
    import re
    from gofast_spark.text.goodturing import heaps_law
    from gofast_spark.text.hashing import md5_hash64  # noqa: F401

    texts = {
        i: " ".join(
            f"w{(i * 13 + j * 7) % 40}" for j in range(5 + i % 4)
        )
        for i in range(25)
    }
    df = spark.createDataFrame(
        [(str(i), t) for i, t in texts.items()], ["doc_id", "text"]
    )
    row = heaps_law(df, "doc_id", "text").collect()[0]
    # reference: replicate shuffle order via the same md5 rank
    import hashlib

    def shuf(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    order = sorted(texts, key=lambda i: (shuf(i), str(i)))
    seen, xs, ys, cum = set(), [], [], 0
    for i in order:
        toks = re.sub(r" +", " ", texts[i].lower()).strip().split(" ")
        cum += len(toks)
        seen |= set(toks)
        xs.append(math.log(cum))
        ys.append(math.log(len(seen)))
    q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    m = len(xs)
    sx = sum(q6(x) for x in xs)
    sy = sum(q6(y) for y in ys)
    sxx = sum(q6(x * x) for x in xs)
    sxy = sum(q6(x * y) for x, y in zip(xs, ys))
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / m)
    assert row["n_docs"] == 25
    assert row["vocab"] == len(seen)
    assert row["n_tokens"] == cum
    assert abs(row["beta"] - beta) < 1e-9
    assert abs(row["k"] - k) < 1e-9
    assert 0.0 < row["beta"] <= 1.0
