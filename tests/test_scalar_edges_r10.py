"""Direct edge-case tests for scalar-function modules that were only
exercised through catalog entries (functions/strings, functions/encoding,
functions/spatial, quality/skew) — empty strings, constant columns,
regex-special delimiters, boundary buckets."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _one(spark, col, value="", typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(col.alias("out")).first()["out"]


class TestStrings:
    def test_snake_case_boundaries(self, spark):
        from gofast_spark.functions.strings import to_snake_case

        cases = {
            "CamelCaseHTTP": "camel_case_http",
            "already_snake": "already_snake",
            "  spaces and-dashes  ": "spaces_and_dashes",
            "": "",
            "X": "x",
        }
        df = spark.createDataFrame([(k,) for k in cases], "v string")
        got = {r["v"]: r["out"] for r in
               df.select("v", to_snake_case("v").alias("out")).collect()}
        assert got == cases

    def test_camel_case(self, spark):
        from gofast_spark.functions.strings import to_camel_case

        assert _one(spark, to_camel_case("v"), "hello world_foo") == (
            "helloWorldFoo"
        )
        assert _one(
            spark, to_camel_case("v", upper_first=True), "hello world"
        ) == "HelloWorld"
        assert _one(spark, to_camel_case("v"), "single") == "single"

    def test_slugify_default_and_regex_special_delim(self, spark):
        from gofast_spark.functions.strings import slugify

        assert _one(spark, slugify("v"), "-Hello,  World!-") == "hello-world"
        # '.' is a regex metachar: an unescaped trim pattern '^.+|.+$'
        # would delete the whole slug
        assert _one(spark, slugify("v", delim="."), "Hello, World") == (
            "hello.world"
        )
        # '$' in the replacement is a group reference unless escaped
        assert _one(spark, slugify("v", delim="$"), "a b") == "a$b"

    def test_capitalize_and_truncate(self, spark):
        from gofast_spark.functions.strings import (
            capitalize_first,
            truncate_text,
        )

        assert _one(spark, capitalize_first("v"), "hello world") == (
            "Hello world"
        )
        assert _one(spark, capitalize_first("v"), "") == ""
        assert _one(spark, truncate_text("v", 5), "abcde") == "abcde"  # == n
        assert _one(spark, truncate_text("v", 5), "abcdef") == "abcde..."
        assert _one(spark, truncate_text("v", 5), "ab") == "ab"

    def test_anonymize_text_defaults(self, spark):
        from gofast_spark.functions.strings import anonymize_text

        got = _one(
            spark, anonymize_text("v"),
            "mail a.b+c@ex-1.co.uk pin 12345 code 123",
        )
        assert got == "mail [EMAIL] pin [NUM] code 123"


class TestEncoding:
    def test_to_categories_equal_range_boundaries(self, spark):
        from gofast_spark.functions.encoding import to_categories

        df = spark.createDataFrame(
            [(float(i),) for i in range(10)], "x double"
        )
        out = to_categories(df, "x", k=3).orderBy("x").collect()
        # width = 3.0; buckets 0:[0,3) 1:[3,6) 2:[6,9]; max lands in k-1
        assert [r["x_bin"] for r in out] == [0, 0, 0, 1, 1, 1, 2, 2, 2, 2]
        assert out[0]["x_cat"] == "< 3.0"
        assert out[-1]["x_cat"] == ">= 6.0"

    def test_to_categories_constant_column(self, spark):
        from gofast_spark.functions.encoding import to_categories

        df = spark.createDataFrame([(7.0,), (7.0,)], "x double")
        out = to_categories(df, "x", k=4).collect()
        assert all(r["x_bin"] == 0 for r in out)

    def test_label_encode_sorted_ids(self, spark):
        from gofast_spark.functions.encoding import label_encode

        df = spark.createDataFrame(
            [("pear",), ("apple",), ("pear",), ("fig",)], "fruit string"
        )
        got = {
            r["fruit"]: r["fruit_id"]
            for r in label_encode(df, "fruit").collect()
        }
        assert got == {"apple": 0, "fig": 1, "pear": 2}

    def test_map_values_default_and_binarize(self, spark):
        from gofast_spark.functions.encoding import binarize, map_values

        df = spark.createDataFrame([("a",), ("z",)], "k string")
        got = {
            r["k"]: r["k2"]
            for r in map_values(
                df, "k", {"a": 1}, default=-1, out_col="k2"
            ).collect()
        }
        assert got == {"a": 1, "z": -1}
        df2 = spark.createDataFrame([(0.5,), (2.5,)], "x double")
        assert [r["x_bin"] for r in
                binarize(df2, "x", 1.0).orderBy("x").collect()] == [0, 1]

    def test_one_hot_pinned_values_keep_schema(self, spark):
        from gofast_spark.functions.encoding import one_hot_encode

        df = spark.createDataFrame([("a",), ("b",)], "c string")
        out = one_hot_encode(df, "c", values=["a", "b", "unseen"])
        assert {"c_a", "c_b", "c_unseen"} <= set(out.columns)
        assert out.agg(F.sum("c_unseen")).first()[0] == 0


class TestSpatial:
    def test_haversine_known_values(self, spark):
        from gofast_spark.functions.spatial import haversine_km

        df = spark.createDataFrame(
            [(0.0, 0.0, 0.0, 1.0), (10.0, 20.0, 10.0, 20.0)],
            "lat1 double, lon1 double, lat2 double, lon2 double",
        )
        got = [
            r[0]
            for r in df.select(
                haversine_km(
                    F.col("lat1"), F.col("lon1"),
                    F.col("lat2"), F.col("lon2"),
                )
            ).collect()
        ]
        # 1 degree of longitude at the equator = R * pi/180
        assert got[0] == pytest.approx(6371.0 * math.pi / 180, rel=1e-9)
        assert got[1] == 0.0

    def test_bearing_cardinal_directions(self, spark):
        from gofast_spark.functions.spatial import bearing_deg

        df = spark.createDataFrame(
            [(0.0, 0.0, 1.0, 0.0), (0.0, 0.0, 0.0, 1.0),
             (1.0, 0.0, 0.0, 0.0)],
            "lat1 double, lon1 double, lat2 double, lon2 double",
        )
        got = [
            r[0]
            for r in df.select(
                bearing_deg(
                    F.col("lat1"), F.col("lon1"),
                    F.col("lat2"), F.col("lon2"),
                )
            ).collect()
        ]
        assert got[0] == pytest.approx(0.0, abs=1e-9)  # due north
        assert got[1] == pytest.approx(90.0, abs=1e-9)  # due east
        assert got[2] == pytest.approx(180.0, abs=1e-9)  # due south


class TestSkew:
    def test_boxcox_lambda_log_domain(self, spark):
        """exp(z) data: the MLE lambda on the grid is 0 (log transform)."""
        from gofast_spark.quality.skew import boxcox_lambda

        vals = [math.exp(z / 10.0) for z in range(-20, 21)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        assert boxcox_lambda(df, "x") == 0.0

    def test_boxcox_lambda_identity_domain(self, spark):
        """Already-symmetric data prefers lambda near 1 over log."""
        from gofast_spark.quality.skew import boxcox_lambda

        df = spark.createDataFrame(
            [(float(v),) for v in range(1, 42)], "x double"
        )
        assert abs(boxcox_lambda(df, "x") - 1.0) <= 0.4

    def test_handle_skew_shifts_nonpositive(self, spark):
        from gofast_spark.quality.skew import handle_skew

        df = spark.createDataFrame([(-4.0,), (0.0,), (5.0,)], "x double")
        out = handle_skew(df, ["x"], method="log").orderBy("x").collect()
        # shift = -(-4) + 1 = 5 -> log(1), log(5), log(10): all finite
        assert [r["x"] for r in out] == pytest.approx(
            [math.log(1.0), math.log(5.0), math.log(10.0)]
        )
        with pytest.raises(ValueError):
            handle_skew(df, ["x"], method="nope")

    def test_skewness_profile_symmetric(self, spark):
        from gofast_spark.quality.skew import skewness_profile

        df = spark.createDataFrame(
            [(float(v), float(v) ** 3) for v in range(-5, 6)],
            "a double, b double",
        )
        got = {
            r["column"]: r["skewness"]
            for r in skewness_profile(df, ["a", "b"]).collect()
        }
        assert got["a"] == pytest.approx(0.0, abs=1e-12)
        assert got["b"] == pytest.approx(0.0, abs=1e-12)
