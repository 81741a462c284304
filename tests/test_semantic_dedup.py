"""SemDeDup semantic dedup (dedup/semantic.py): micro-corpus semantics,
keep-rule behavior, and plan shape (cell equi-join, no corpus cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gofast_spark.dedup import assign_semantic_cells, semantic_dedup


def _corpus(spark):
    # 4-d unit-ish vectors: ids 1/2 nearly parallel (cos ~ 1), id 3
    # orthogonal to them, ids 4/5 parallel to each other, id 6 isolated.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.14, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.1, 0.99, 0.0, 0.0]),
        (6, [0.0, 0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "id bigint, v array<double>")


def test_single_cell_lowest_id(spark):
    out = semantic_dedup(
        _corpus(spark), "id", "v", threshold=0.9, nlist=1, keep="lowest_id"
    ).collect()
    dup = {r["id"]: r["is_dup"] for r in out}
    # pairs above 0.9: (1,2) and (4,5); lowest id survives each
    assert dup == {1: 0, 2: 1, 3: 0, 4: 0, 5: 1, 6: 0}
    # single cell => every row in cell of the one landmark
    assert {r["cell"] for r in out} == {0}


def test_farthest_rule_keeps_low_centroid_sim(spark):
    # with kmeans=None landmarks the single landmark IS some corpus row;
    # force a known centroid instead to make cent_sim ordering explicit
    centroids = [[1.0, 0.0, 0.0, 0.0]]
    out = semantic_dedup(
        _corpus(spark),
        "id",
        "v",
        threshold=0.9,
        centroids=centroids,
        keep="farthest",
    ).collect()
    dup = {r["id"]: r["is_dup"] for r in out}
    # pair (1,2): cent_sim(1)=1.0 > cent_sim(2) => 2 outranks 1 (farther
    # from the centroid survives): 1 is the duplicate.
    assert dup[1] == 1 and dup[2] == 0
    # pair (4,5): cent_sim(4)=0.0 < cent_sim(5)=~0.1 => 4 survives
    assert dup[4] == 0 and dup[5] == 1
    assert dup[3] == 0 and dup[6] == 0


def test_survivor_filter_and_schema(spark):
    out = semantic_dedup(
        _corpus(spark), "id", "v", threshold=0.9, nlist=2, keep="lowest_id"
    )
    assert set(out.columns) == {"id", "v", "cell", "cent_sim", "is_dup"}
    survivors = out.where(F.col("is_dup") == 0)
    # dedup never removes everything and always removes something here
    n = survivors.count()
    assert 0 < n < 6


def test_threshold_one_keeps_all_distinct(spark):
    out = semantic_dedup(
        _corpus(spark), "id", "v", threshold=1.000001, nlist=1
    )
    assert out.where(F.col("is_dup") == 1).count() == 0


def test_bad_keep_raises(spark):
    with pytest.raises(ValueError):
        semantic_dedup(_corpus(spark), "id", "v", keep="first")


def test_assign_cells_partitions_corpus(spark):
    cells = assign_semantic_cells(_corpus(spark), "id", "v", nlist=3)
    rows = cells.collect()
    assert len(rows) == 6  # exactly one cell per row
    assert {r["cell"] for r in rows} <= {0, 1, 2}
    for r in rows:
        assert -1.0 <= r["cent_sim"] <= 1.0 + 1e-9


def test_plan_no_corpus_cartesian(spark, sf_small):
    from tests.test_plans import _plan

    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    df = semantic_dedup(e, "vec_id", "embedding", threshold=0.3, nlist=4)
    plan = _plan(df)
    # only the nlist-row landmark frame may be nested-loop joined; the
    # within-cell pair stage must be a real equi-join on the cell id
    assert "CartesianProduct" not in plan
    assert df.count() > 0
