"""Direct edge-case tests for operators/checks.py, operators/windows.py
and operators/filters.py — rank tie methods vs pandas semantics,
interpolation gap classes, min_periods guards, error policies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestChecks:
    def test_exist_features_policies(self, spark):
        from gofast_spark.operators.checks import exist_features

        df = spark.createDataFrame([(1, 2)], "a int, b int")
        assert exist_features(df, ["a", "b"])
        with pytest.raises(KeyError):
            exist_features(df, ["a", "zz"])
        with pytest.warns(UserWarning):
            assert exist_features(df, ["zz"], error="warn") is False
        assert exist_features(df, ["zz"], error="ignore") is False

    def test_is_in_if_modes(self, spark):
        from gofast_spark.operators.checks import is_in_if

        df = spark.createDataFrame([(1, 2)], "a int, b int")
        assert is_in_if(df, "a")
        assert is_in_if(["x", "y"], ["x"])
        with pytest.raises(ValueError):
            is_in_if(df, ["a", "c"])
        assert is_in_if(df, ["a", "c"], error="ignore",
                        return_diff=True) == ["c"]

    def test_data_extractor_condition_kinds(self, spark):
        from gofast_spark.operators.checks import data_extractor

        df = spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(10)],
            "id int, g string, v double",
        )
        eq = data_extractor(df, conditions={"g": "a"})
        assert eq.count() == 5
        rng = data_extractor(df, conditions={"v": (2.0, 4.0)})
        assert sorted(r["id"] for r in rng.collect()) == [2, 3, 4]
        isin = data_extractor(
            df, columns=["id"], conditions={"id": [1, 3, 99]}
        )
        assert isin.columns == ["id"]
        assert sorted(r["id"] for r in isin.collect()) == [1, 3]

    def test_confidence_ratio_and_coverage(self, spark):
        from gofast_spark.operators.checks import (
            compute_coverage,
            get_confidence_ratio,
        )

        df = spark.createDataFrame(
            [(1.0, None), (2.0, 5.0), (None, 6.0), (4.0, 7.0)],
            "x double, y double",
        )
        got = {
            r["column"]: r["ratio"]
            for r in get_confidence_ratio(df).collect()
        }
        assert got == {"x": 0.75, "y": 0.75}

        iv = spark.createDataFrame(
            [(1.0, 0.0, 2.0), (5.0, 0.0, 2.0), (1.5, 1.0, 2.0)],
            "y double, lo double, hi double",
        )
        r = compute_coverage(iv, "y", "lo", "hi").first()
        assert r["coverage"] == pytest.approx(2 / 3) and r["n"] == 3

    def test_soft_bin_stat_constant_column(self, spark):
        from gofast_spark.operators.checks import soft_bin_stat

        df = spark.createDataFrame(
            [(3.0, 1), (3.0, 0), (3.0, 1)], "v double, t int"
        )
        out = soft_bin_stat(df, "v", "t", bins=4).collect()
        assert len(out) == 1 and out[0]["bin"] == 0
        assert out[0]["target_rate"] == pytest.approx(2 / 3)


class TestWindows:
    def test_rank_methods_match_pandas_semantics(self, spark):
        """values [10, 20, 20, 30]: pandas rank() gives min=[1,2,2,4],
        max=[1,3,3,4], dense=[1,2,2,3], average=[1,2.5,2.5,4]."""
        from gofast_spark.operators.windows import rank_data

        df = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0)], "id int, v double"
        )
        expect = {
            "min": [1.0, 2.0, 2.0, 4.0],
            "max": [1.0, 3.0, 3.0, 4.0],
            "dense": [1.0, 2.0, 2.0, 3.0],
            "average": [1.0, 2.5, 2.5, 4.0],
        }
        for method, exp in expect.items():
            got = [
                r["v_rank"]
                for r in rank_data(df, "v", method=method)
                .orderBy("id")
                .collect()
            ]
            assert got == exp, method
        with pytest.raises(ValueError):
            rank_data(df, "v", method="nope")

    def test_moving_average_min_periods(self, spark):
        from gofast_spark.operators.windows import moving_average

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 6)], "t int, v double"
        )
        full = moving_average(df, "v", 3, "t").orderBy("t").collect()
        # pandas rolling(3): first two rows NULL, then trailing means
        assert [r["v_ma_3"] for r in full] == [None, None, 2.0, 3.0, 4.0]
        relaxed = (
            moving_average(df, "v", 3, "t", min_periods=1)
            .orderBy("t")
            .collect()
        )
        assert [r["v_ma_3"] for r in relaxed] == [1.0, 1.5, 2.0, 3.0, 4.0]

    def test_differencing_second_order(self, spark):
        from gofast_spark.operators.windows import differencing

        # v = t^2 -> second difference is the constant 2
        df = spark.createDataFrame(
            [(t, float(t * t)) for t in range(6)], "t int, v double"
        )
        out = differencing(df, "v", "t", order=2).orderBy("t").collect()
        assert [r["v_diff"] for r in out] == [None, None, 2.0, 2.0, 2.0, 2.0]

    def test_fill_directions_and_interpolate_gap_classes(self, spark):
        from gofast_spark.operators.windows import (
            fill_forward,
            interpolate_data,
        )

        rows = [
            (1, None), (2, 10.0), (3, None), (4, None), (5, 16.0), (6, None)
        ]
        df = spark.createDataFrame(rows, "t int, v double")
        ff = [
            r["v"]
            for r in fill_forward(df, "v", "t").orderBy("t").collect()
        ]
        assert ff == [None, 10.0, 10.0, 10.0, 16.0, 16.0]
        bf = [
            r["v"]
            for r in fill_forward(df, "v", "t", direction="bfill")
            .orderBy("t")
            .collect()
        ]
        assert bf == [10.0, 10.0, 16.0, 16.0, 16.0, None]
        # interpolate: leading NULL stays, interior gap blends linearly
        # by row position, trailing NULL ffills
        interp = [
            r["v_interp"]
            for r in interpolate_data(df, "v", "t").orderBy("t").collect()
        ]
        assert interp == [None, 10.0, 12.0, 14.0, 16.0, 16.0]

    def test_rolling_slope_exact_line(self, spark):
        from gofast_spark.operators.windows import rolling_slope

        df = spark.createDataFrame(
            [(t, 3.0 * t + 7.0) for t in range(8)], "t int, v double"
        )
        out = (
            rolling_slope(df, "v", "t", "t", window_size=4)
            .orderBy("t")
            .collect()
        )
        # single-row window -> degenerate denominator -> NULL; all other
        # windows see an exact line with slope 3
        assert out[0]["v_slope_4"] is None
        assert [r["v_slope_4"] for r in out[1:]] == pytest.approx([3.0] * 7)

    def test_drop_consecutive_duplicates_null_runs(self, spark):
        from gofast_spark.operators.windows import (
            drop_consecutive_duplicates,
        )

        rows = [
            ("k", 1, "on"), ("k", 2, "on"), ("k", 3, None), ("k", 4, None),
            ("k", 5, "on"),
        ]
        df = spark.createDataFrame(rows, "key string, t int, state string")
        out = (
            drop_consecutive_duplicates(df, ["key"], "t", ["state"])
            .orderBy("t")
            .collect()
        )
        # NULL -> NULL repeats collapse too (eqNullSafe)
        assert [r["t"] for r in out] == [1, 3, 5]


class TestFilters:
    def test_filter_df_ops_dropna_and_callable(self, spark):
        from gofast_spark.operators.filters import filter_df

        df = spark.createDataFrame(
            [(1.0,), (None,), (3.0,), (5.0,)], "v double"
        )
        assert filter_df(df, "v", ">", 2.0).count() == 2
        assert filter_df(df, "v", "==", 3.0).count() == 1
        assert filter_df(df, "v", dropna=True,
                         operator=lambda c: c < 100).count() == 3
        with pytest.raises(ValueError):
            filter_df(df, "v", "~=", 1.0)

    def test_group_and_filter_conditions_and_sort(self, spark):
        from gofast_spark.operators.filters import group_and_filter

        df = spark.createDataFrame(
            [("a", 1), ("a", 5), ("b", 2), ("c", 9)], "g string, v int"
        )
        out = group_and_filter(
            df, "g", ["a", "b"], conditions={"v": (">", 1)},
            sort_by="v", ascending=False,
        ).collect()
        assert [(r["g"], r["v"]) for r in out] == [("a", 5), ("b", 2)]

    def test_filter_by_isin_modes(self, spark):
        from gofast_spark.operators.filters import filter_by_isin

        main = spark.createDataFrame([(i,) for i in range(6)], "k int")
        o1 = spark.createDataFrame([(1,), (2,)], "x int")
        o2 = spark.createDataFrame([(2,), (3,)], "y int")
        union = filter_by_isin(main, "k", [(o1, "x"), (o2, "y")])
        assert sorted(r["k"] for r in union.collect()) == [1, 2, 3]
        inter = filter_by_isin(
            main, "k", [(o1, "x"), (o2, "y")], mode="intersection"
        )
        assert sorted(r["k"] for r in inter.collect()) == [2]
        anti = filter_by_isin(
            main, "k", [(o1, "x"), (o2, "y")], invert=True
        )
        assert sorted(r["k"] for r in anti.collect()) == [0, 4, 5]
