"""Semantic tests for the LLM-pipeline layer: the MinHash-LSH dedup finds
the fixture's planted near-duplicates, SimHash agrees on them, similarity
search returns sane neighbors, and the multimodal plumbing round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def documents(spark, sf_small):
    import os

    return spark.read.parquet(os.path.join(sf_small, "documents.parquet"))


@pytest.fixture(scope="module")
def embeddings(spark, sf_small):
    import os

    return spark.read.parquet(os.path.join(sf_small, "embeddings.parquet"))


def test_near_dup_pairs_finds_planted_duplicates(spark, documents):
    from gofast_spark.dedup import near_dup_pairs

    pairs = near_dup_pairs(documents, "doc_id", "text", threshold=0.8).collect()
    assert len(pairs) > 0  # the fixture plants near-duplicate docs
    assert all(r["jaccard"] >= 0.8 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_simhash_close_on_near_dups(spark, documents):
    from gofast_spark.dedup import near_dup_pairs, simhash

    sig = simhash(documents, "doc_id", "text", bits=16)
    pairs = near_dup_pairs(documents, "doc_id", "text", threshold=0.9)
    joined = (
        pairs.join(sig.selectExpr("doc_id AS id_a", "simhash AS sh_a"), "id_a")
        .join(sig.selectExpr("doc_id AS id_b", "simhash AS sh_b"), "id_b")
        .select(
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
        )
        .collect()
    )
    assert joined
    dup_avg = sum(r["hamming"] for r in joined) / len(joined)
    # random pairs: shifted self-join as a background sample
    a = sig.selectExpr("doc_id AS i", "simhash AS sh_a")
    b = sig.selectExpr("doc_id + 7 AS i", "simhash AS sh_b")
    rand_pairs = a.join(b, "i").select(
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    ).collect()
    rand_avg = sum(r["hamming"] for r in rand_pairs) / len(rand_pairs)
    # similarity-preserving: near-dups are markedly closer than random pairs
    assert dup_avg < rand_avg / 2


def test_exact_dedup_keeps_one_per_group(spark):
    from gofast_spark.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], ["id", "k"]
    )
    out = exact_dedup(df, "k", keep="first", order_by="id", group_size_col="n")
    rows = {r["k"]: (r["id"], r["n"]) for r in out.collect()}
    assert rows == {"x": (1, 2), "y": (3, 1)}


def test_cosine_topk_self_similarity_and_order(spark, embeddings):
    from gofast_spark.sim import cosine_topk

    q = embeddings.where(F.col("vec_id") == 0)
    out = cosine_topk(embeddings, q, "vec_id", "embedding", k=5).collect()
    assert len(out) == 5
    sims = [r["cos_sim"] for r in sorted(out, key=lambda r: r["rank"])]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0001 <= s <= 1.0001 for s in sims)


def test_lsh_topk_subset_of_bucket(spark, embeddings):
    from gofast_spark.sim import hyperplane_bucket, lsh_topk

    q = embeddings.where(F.col("vec_id") < 3)
    out = lsh_topk(embeddings, q, "vec_id", "embedding", dim=64, bits=4, k=5)
    got = out.collect()
    assert got
    # every neighbor must share the query's bucket by construction
    buckets = embeddings.select(
        "vec_id", hyperplane_bucket(F.col("embedding"), dim=64, bits=4).alias("b")
    )
    bmap = {r["vec_id"]: r["b"] for r in buckets.collect()}
    for r in got:
        assert bmap[r["vec_id"]] == bmap[r["query_id"]] == r["bucket"]


def test_blob_features_plumbing(spark):
    from gofast_spark.multimodal import attach_blob_meta, blob_features, decode_image

    df = spark.createDataFrame([(1, bytearray(b"abc")), (2, bytearray(b""))], ["id", "payload"])
    meta = attach_blob_meta(df, "payload", media_type="image", codec="png")
    m = {r["id"]: r["payload_meta"] for r in meta.collect()}
    assert m[1]["n_bytes"] == 3 and m[1]["media_type"] == "image"
    feats = {r["id"]: r for r in blob_features(df, "id", "payload").collect()}
    assert feats[1]["n_bytes"] == 3
    assert feats[1]["head_byte"] == ord("a")
    assert feats[2]["n_bytes"] == 0
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_language_id_and_quality_bounds(spark):
    from gofast_spark.text import language_id, quality_score

    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"),
         (2, "der hund und die katze ist ein tier")],
        ["id", "text"],
    )
    out = {r["id"]: r for r in language_id(quality_score(df, "text"), "text").collect()}
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "de"
    assert 0.0 <= out[1]["quality"] <= 1.0


def test_vectorize_text_columns(spark, documents):
    from gofast_spark.text import vectorize_text_columns

    models, out = vectorize_text_columns(documents.limit(50), "text")
    vec = out.select("tfidf").first()["tfidf"]
    assert vec.size > 0 and vec.numNonzeros() > 0


def test_ngram_jaccard_exact_vs_bruteforce(spark, documents):
    """ngram_jaccard_pairs with max_df=None must equal the brute-force
    all-pairs Jaccard; the minhash-LSH pair set is a subset of it."""
    from pyspark.sql import functions as F

    from gofast_spark.dedup import (
        doc_shingles,
        near_dup_pairs,
        ngram_jaccard_pairs,
    )

    docs = documents.limit(60)
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    # brute force: full cross of shingle sets
    sh = doc_shingles(docs, "doc_id", "text", k=3).collect()
    sets: dict = {}
    for r in sh:
        sets.setdefault(r["doc_id"], set()).add(r["sh_hash"])
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= 0.5:
                want[(a, b)] = round(j, 6)
    assert got == want
    # LSH at the same threshold finds a subset of the exact pairs
    lsh = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert lsh <= set(want)


def test_ngram_jaccard_max_df_blocks_boilerplate(spark):
    """A shingle shared by every doc must not generate candidates when
    max_df excludes it, while rare-shingle pairs survive."""
    from gofast_spark.dedup import ngram_jaccard_pairs

    boiler = "terms of service apply to this document"
    rows = [(i, f"{boiler} unique{i} filler{i} pad{i}") for i in range(10)]
    # two genuinely similar docs sharing rare shingles
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.3, max_df=5
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (100, 101) in pairs
    # the boilerplate-only docs share only >max_df shingles -> blocked
    assert all(p == (100, 101) for p in pairs)


def test_resize_image_blobs_plumbing(spark):
    """Binary-in/binary-out resize plumbing: schema, Arrow batch shape,
    deterministic stub payloads (real decode swaps in in production)."""
    from gofast_spark.multimodal import resize_image_blobs

    df = spark.createDataFrame(
        [(1, b"someimagebytes" * 4), (2, b""), (3, None)],
        "doc_id bigint, payload binary",
    )
    out = resize_image_blobs(df, "doc_id", "payload", target=(128, 96))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 3
    assert all(r["width"] == 128 and r["height"] == 96 for r in rows.values())
    assert isinstance(rows[1]["resized"], (bytes, bytearray))
    # deterministic: same input -> same payload
    again = {r["doc_id"]: r["resized"] for r in
             resize_image_blobs(df, "doc_id", "payload", target=(128, 96)).collect()}
    assert again[1] == rows[1]["resized"]


def test_sample_video_frames_fanout(spark):
    """Frame sampling fans out 1->n_frames rows per video with ordered
    timestamps and per-frame payloads."""
    from gofast_spark.multimodal import sample_video_frames

    df = spark.createDataFrame(
        [(10, b"fakevideopayload" * 8), (20, b"x")],
        "vid bigint, payload binary",
    )
    out = sample_video_frames(df, "vid", "payload", n_frames=4)
    rows = out.collect()
    assert len(rows) == 8
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r["vid"], []).append(r)
    for vid, fr in per_vid.items():
        fr.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in fr] == [0, 1, 2, 3]
        ts = [r["ts_ms"] for r in fr]
        assert ts == sorted(ts) and ts[0] == 0
        assert all(isinstance(r["frame"], (bytes, bytearray)) for r in fr)
