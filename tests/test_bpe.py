"""BPE merge learning (text/bpe.py) vs a pure-Python reference."""

from __future__ import annotations

from collections import Counter

import pytest

CORPUS = [
    (1, "low low low lower lowest"),
    (2, "new newer newest low"),
    (3, "wide wider widest new new"),
]
N_MERGES = 6


def _python_bpe(texts: list[str], n: int):
    freqs = Counter()
    for t in texts:
        for w in t.split():
            freqs[w] += 1
    vocab = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += freqs[w]
        if not pc:
            break
        # count desc, then lexicographic pair asc — the tie rule the
        # Spark side encodes via ORDER BY cnt DESC, pair
        best = min(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), cnt = best
        merges.append((f"{a} {b}", cnt))
        for w, syms in vocab.items():
            out, prev = [], ""
            for x in syms:
                if prev == "":
                    prev = x
                elif prev == a and x == b:
                    prev = prev + x
                else:
                    out.append(prev)
                    prev = x
            if prev:
                out.append(prev)
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_merges_match_python(corpus):
    from gofast_spark.text.bpe import bpe_learn_merges

    got = sorted(
        (
            (r["rank"], r["pair"], r["freq"])
            for r in bpe_learn_merges(
                corpus, "text", num_merges=N_MERGES
            ).collect()
        )
    )
    want, _ = _python_bpe([t for _, t in CORPUS], N_MERGES)
    assert got == [(i + 1, p, c) for i, (p, c) in enumerate(want)]


def test_segment_replays_merges(corpus):
    from gofast_spark.text.bpe import bpe_learn_merges, bpe_segment

    merges = [
        r["pair"]
        for r in bpe_learn_merges(corpus, "text", num_merges=N_MERGES)
        .orderBy("rank")
        .collect()
    ]
    seg = {
        r["doc_id"]: r["segmented"]
        for r in bpe_segment(corpus, "text", merges).collect()
    }
    _, vocab = _python_bpe([t for _, t in CORPUS], N_MERGES)
    for did, text in CORPUS:
        want = " | ".join(" ".join(vocab[w]) for w in text.split())
        assert seg[did] == want, did


def test_single_char_words_no_crash(spark):
    from gofast_spark.text.bpe import bpe_learn_merges

    df = spark.createDataFrame([(1, "a b c a b a")], ["doc_id", "text"])
    rows = bpe_learn_merges(df, "text", num_merges=2).collect()
    # no adjacent pairs exist inside 1-char words -> zero merge rows
    assert rows == []
