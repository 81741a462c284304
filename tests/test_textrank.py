"""textrank_keywords vs a pure-Python PageRank on the same graph."""

from __future__ import annotations


def _ref_textrank(texts, min_len, iters, d):
    import re

    docs = []
    for t in texts:
        n = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        if n:
            docs.append([w for w in n.split(" ") if len(w) >= min_len])
    edges = set()
    for tk in docs:
        if len(tk) < 2:
            continue
        for a, b in zip(tk, tk[1:]):
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
    nodes = sorted({s for s, _ in edges})
    n = len(nodes)
    outdeg = {u: sum(1 for s, _ in edges if s == u) for u in nodes}
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        inc = {u: 0.0 for u in nodes}
        for s, t in edges:
            inc[t] += rank[s] / outdeg[s]
        rank = {u: (1 - d) / n + d * inc[u] for u in nodes}
    return rank


def test_textrank_matches_reference(spark):
    from gofast_spark.text.keywords import textrank_keywords

    texts = [
        "spark runs distributed queries over large data",
        "distributed queries need shuffle and partitions",
        "large data needs partitions and spark",
        "the cat sat on a mat",  # short words filtered out
        "queries queries everywhere queries",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r["token"]: r["rank"]
        for r in textrank_keywords(df, "text", top_k=100).collect()
    }
    want = _ref_textrank(texts, 3, 5, 0.85)
    assert set(got) == set(want)
    for t, r in want.items():
        assert abs(got[t] - r) < 1e-9, t
    # a hub token must outrank a leaf
    assert got["queries"] > got["mat"] if "mat" in got else True


def test_textrank_filters_short_tokens(spark):
    from gofast_spark.text.keywords import textrank_keywords

    df = spark.createDataFrame(
        [("a an to of big word big word",)], ["text"]
    )
    toks = {
        r["token"] for r in textrank_keywords(df, "text", top_k=50).collect()
    }
    assert toks == {"big", "word"}
