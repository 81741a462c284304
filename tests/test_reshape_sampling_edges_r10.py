"""Direct edge-case tests for operators/reshape.py and
operators/sampling.py — previously exercised only through catalog
entries (alignment fills, null-safe diffs, split determinism under
data growth, weighted-draw degenerate weights)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestReshape:
    def test_to_wide_pinned_values_prefix_and_bad_aggfunc(self, spark):
        from gofast_spark.operators.reshape import to_wide

        df = spark.createDataFrame(
            [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)],
            "id int, k string, v double",
        )
        out = to_wide(
            df, "id", "k", "v", values=["a", "b", "missing"], prefix="p_"
        )
        assert out.columns == ["id", "p_a", "p_b", "p_missing"]
        rows = {r["id"]: r for r in out.collect()}
        assert rows[2]["p_a"] == 30.0 and rows[2]["p_b"] is None
        assert rows[1]["p_missing"] is None
        with pytest.raises(ValueError):
            to_wide(df, "id", "k", "v", aggfunc="nope")

    def test_to_long_roundtrips_to_wide(self, spark):
        from gofast_spark.operators.reshape import to_long, to_wide

        wide = spark.createDataFrame(
            [(1, 10.0, 100.0), (2, 20.0, 200.0)], "id int, x double, y double"
        )
        long = to_long(wide, "id", ["x", "y"])
        assert set(long.columns) == {"id", "variable", "value"}
        assert long.count() == 4
        back = to_wide(long, "id", "variable", "value", values=["x", "y"])
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, wide.collect())
        )

    def test_concat_frames_axis0_fills_missing_axis1_needs_keys(self, spark):
        from gofast_spark.operators.reshape import concat_frames

        a = spark.createDataFrame([(1, "x")], "id int, a string")
        b = spark.createDataFrame([(2, 5.0)], "id int, b double")
        out = concat_frames([a, b]).orderBy("id").collect()
        assert out[0]["b"] is None and out[1]["a"] is None
        with pytest.raises(ValueError):
            concat_frames([a, b], axis=1)
        j = concat_frames([a, b], axis=1, keys=["id"])
        assert j.count() == 2  # outer join keeps both ids

    def test_add_frames_outer_alignment_fill(self, spark):
        from gofast_spark.operators.reshape import add_frames

        a = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, v double")
        b = spark.createDataFrame([(2, 1.0), (3, 3.0)], "id int, v double")
        got = {r["id"]: r["v"] for r in add_frames(a, b, "id").collect()}
        assert got == {1: 10.0, 2: 21.0, 3: 3.0}
        got5 = {
            r["id"]: r["v"]
            for r in add_frames(a, b, "id", fill_value=5.0).collect()
        }
        assert got5 == {1: 15.0, 2: 21.0, 3: 8.0}

    def test_set_helpers_and_null_safe_compare(self, spark):
        from gofast_spark.operators.reshape import (
            compare_frames,
            find_intersection,
            find_unique_elements,
            generate_comparison,
        )

        a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "k int")
        b = spark.createDataFrame([(2,), (4,)], "k int")
        assert sorted(
            r["k"] for r in find_intersection(a, b, "k").collect()
        ) == [2]
        assert sorted(
            r["k"] for r in find_unique_elements(a, b, "k").collect()
        ) == [1, 3]
        assert compare_frames(a, a)
        assert not compare_frames(a, a.distinct())  # multiset, not set

        x = spark.createDataFrame([(1, None), (2, "u")], "id int, c string")
        y = spark.createDataFrame([(1, None), (2, "w")], "id int, c string")
        got = {
            r["id"]: r["c_equal"]
            for r in generate_comparison(x, y, "id", ["c"]).collect()
        }
        assert got == {1: True, 2: False}  # eqNullSafe: null == null

    def test_frame_union_suffixes_duplicates(self, spark):
        from gofast_spark.operators.reshape import frame_union

        a = spark.createDataFrame([(1, 1.0)], "id int, f double")
        b = spark.createDataFrame([(1, 2.0)], "id int, f double")
        out = frame_union([a, b], "id")
        assert set(out.columns) == {"id", "f", "f_1"}
        r = out.first()
        assert (r["f"], r["f_1"]) == (1.0, 2.0)

    def test_repeat_feature_accross_cross_size(self, spark):
        from gofast_spark.operators.reshape import repeat_feature_accross

        spine = spark.createDataFrame(
            [(2020,), (2021,), (2021,)], "year int"
        )
        feats = spark.createDataFrame(
            [("s1", 1.0), ("s2", 2.0)], "site string, v double"
        )
        out = repeat_feature_accross(spine, feats, spine_col="year")
        assert out.count() == 4  # 2 distinct years x 2 feature rows


class TestSampling:
    def test_hash_bucket_negative_keys_nonnegative(self, spark):
        from gofast_spark.operators.sampling import hash_bucket

        df = spark.createDataFrame(
            [(k,) for k in (-5, -1, 0, 1, 5)], "k bigint"
        )
        got = [
            r[0]
            for r in df.select(hash_bucket(F.col("k"), buckets=10)).collect()
        ]
        assert all(0 <= b < 10 for b in got)

    def test_split_by_id_stable_under_growth(self, spark):
        """A row's train/test side never changes when the table grows —
        the property the hash-of-id split exists for."""
        from gofast_spark.operators.sampling import split_train_test_by_id

        small = spark.createDataFrame([(i,) for i in range(50)], "id bigint")
        big = spark.createDataFrame([(i,) for i in range(200)], "id bigint")
        _, test_small = split_train_test_by_id(small, "id")
        _, test_big = split_train_test_by_id(big, "id")
        s = {r["id"] for r in test_small.collect()}
        bset = {r["id"] for r in test_big.collect()}
        assert s == {i for i in bset if i < 50}

    def test_split_disjoint_exhaustive(self, spark):
        from gofast_spark.operators.sampling import (
            split_data,
            split_train_test_by_id,
        )

        df = spark.createDataFrame([(i,) for i in range(300)], "id bigint")
        train, test = split_train_test_by_id(df, "id", test_ratio=0.25)
        assert train.count() + test.count() == 300
        assert train.join(test, "id").count() == 0

        parts = split_data(df, [0.5, 0.3, 0.2], key="id")
        assert sum(p.count() for p in parts) == 300
        assert parts[0].join(parts[1], "id").count() == 0
        assert parts[1].join(parts[2], "id").count() == 0

    def test_batch_sampling_range_and_determinism(self, spark):
        from gofast_spark.operators.sampling import batch_sampling

        df = spark.createDataFrame([(i,) for i in range(100)], "id bigint")
        a = batch_sampling(df, "id", n_batches=4).collect()
        b = batch_sampling(df, "id", n_batches=4).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert {r["batch_id"] for r in a} == {0, 1, 2, 3}

    def test_random_sampling_exact_n_and_validation(self, spark):
        from gofast_spark.operators.sampling import random_sampling

        df = spark.createDataFrame([(i,) for i in range(500)], "id bigint")
        assert random_sampling(df, n=37).count() == 37
        assert random_sampling(df, n=1000).count() == 500  # n >= total
        with pytest.raises(ValueError):
            random_sampling(df)
        sampled = random_sampling(df, fraction=0.2, key="id")
        again = random_sampling(df, fraction=0.2, key="id")
        assert sorted(map(tuple, sampled.collect())) == sorted(
            map(tuple, again.collect())
        )

    def test_resample_data_consistent_keys(self, spark):
        from gofast_spark.operators.sampling import resample_data

        a = spark.createDataFrame(
            [(i, "a") for i in range(100)], "id bigint, tag string"
        )
        b = spark.createDataFrame(
            [(i, "b") for i in range(100)], "id bigint, tag string"
        )
        ra, rb = resample_data([a, b], "id", fraction=0.3)
        assert {r["id"] for r in ra.collect()} == {
            r["id"] for r in rb.collect()
        }

    def test_weighted_sample_degenerate_weights(self, spark):
        from gofast_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
            "id bigint, w double",
        )
        out = weighted_sample(df, "id", "w", k=10).collect()
        # zero/negative/null weights can never be drawn; k caps at the
        # eligible count
        assert sorted(r["id"] for r in out) == [1, 5]
        one = weighted_sample(df, "id", "w", k=1).collect()
        assert len(one) == 1 and one[0]["id"] in (1, 5)

    def test_spatial_sampling_cell_labels(self, spark):
        from gofast_spark.operators.sampling import spatial_sampling

        df = spark.createDataFrame(
            [(i, float(i % 7), float(-i % 5)) for i in range(100)],
            "id bigint, x double, y double",
        )
        out = spatial_sampling(
            df, "x", "y", "id", cell_size=2.0, fraction=0.5, cell_col="cell"
        )
        rows = out.collect()
        assert 0 < len(rows) < 100
        for r in rows:
            cx, cy = r["cell"].split("_")
            assert int(cx) == int(r["x"] // 2.0)
            assert int(cy) == int(r["y"] // 2.0)
