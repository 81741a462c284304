"""MLM token masking + T5 span corruption (text/masking.py)."""

from __future__ import annotations

import hashlib

import pytest


def _u(seed: int, doc_id: int, pos: int) -> float:
    key = f"{seed}|{doc_id}|{pos}".encode()
    h = int(hashlib.md5(key).hexdigest()[:15], 16)
    return (h % 2**31) / 2**31


TEXT = "the quick brown fox jumps over the lazy dog and runs away fast"
SEED, RATE = 7, 0.3


def _flags(doc_id: int, toks: list[str]) -> list[bool]:
    return [_u(SEED, doc_id, i) < RATE for i in range(len(toks))]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, TEXT), (2, "aa bb cc"), (3, "solo")], ["doc_id", "text"]
    )


def test_mlm_mask_matches_python(corpus):
    from gofast_spark.text.masking import mlm_token_mask

    out = {
        r["doc_id"]: r
        for r in mlm_token_mask(
            corpus, mask_rate=RATE, seed=SEED
        ).collect()
    }
    for did, text in [(1, TEXT), (2, "aa bb cc"), (3, "solo")]:
        toks = text.split()
        fl = _flags(did, toks)
        want_masked = " ".join(
            "[MASK]" if f else t for t, f in zip(toks, fl)
        )
        want_targets = " ".join(
            f"{i}:{t}" for i, (t, f) in enumerate(zip(toks, fl)) if f
        )
        r = out[did]
        assert r["masked_text"] == want_masked
        assert r["targets"] == want_targets
        assert r["n_tokens"] == len(toks)
        assert r["n_masked"] == sum(fl)


def test_span_corruption_matches_python(corpus):
    from gofast_spark.text.masking import span_corruption

    out = {
        r["doc_id"]: r
        for r in span_corruption(
            corpus, mask_rate=RATE, seed=SEED
        ).collect()
    }
    for did, text in [(1, TEXT), (2, "aa bb cc"), (3, "solo")]:
        toks = text.split()
        fl = _flags(did, toks)
        inputs, targets, span = [], [], -1
        for i, (t, f) in enumerate(zip(toks, fl)):
            new = f and (i == 0 or not fl[i - 1])
            if new:
                span += 1
                inputs.append(f"<extra_id_{span}>")
                targets.append(f"<extra_id_{span}> {t}")
            elif f:
                targets.append(t)
            else:
                inputs.append(t)
        r = out[did]
        assert r["inputs"] == " ".join(inputs), did
        assert r["targets"] == " ".join(targets), did
        assert r["n_spans"] == span + 1, did


def test_masking_deterministic_and_shuffle_free(corpus):
    from gofast_spark.text.masking import mlm_token_mask

    a = mlm_token_mask(corpus, mask_rate=RATE, seed=SEED).collect()
    b = mlm_token_mask(
        corpus.repartition(5), mask_rate=RATE, seed=SEED
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    plan = (
        mlm_token_mask(corpus, mask_rate=RATE, seed=SEED)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
