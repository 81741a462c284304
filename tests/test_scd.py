"""SCD2 history maintenance (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from gofast_spark.operators.scd import scd2_as_of, scd2_init, scd2_merge


def _d(day):
    return dt.datetime(2024, 1, day)


def _hist(spark):
    snap = spark.createDataFrame(
        [(1, "NY", _d(1)), (2, "LA", _d(1))],
        "k bigint, city string, eff timestamp",
    )
    return scd2_init(snap, "eff")


def _merge(spark, hist, rows):
    up = spark.createDataFrame(rows, "k bigint, city string, eff timestamp")
    return scd2_merge(hist, up, "k", ["city"], "eff")


def test_change_closes_and_opens(spark):
    out = _merge(spark, _hist(spark), [(1, "SF", _d(5))]).collect()
    by = {(r["k"], r["is_current"]): r for r in out}
    assert len(out) == 3
    closed = by[(1, False)]
    assert closed["city"] == "NY" and closed["valid_to"] == _d(5)
    opened = by[(1, True)]
    assert opened["city"] == "SF" and opened["valid_from"] == _d(5)
    assert opened["valid_to"] is None
    assert by[(2, True)]["city"] == "LA"


def test_unchanged_is_noop(spark):
    hist = _hist(spark)
    out = _merge(spark, hist, [(1, "NY", _d(5))])
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, hist.collect())
    )


def test_new_key_inserts_open_row(spark):
    out = _merge(spark, _hist(spark), [(3, "CHI", _d(4))]).collect()
    row = [r for r in out if r["k"] == 3][0]
    assert row["is_current"] and row["valid_from"] == _d(4)
    assert len(out) == 3


def test_latest_update_wins_within_batch(spark):
    out = _merge(
        spark, _hist(spark), [(1, "SF", _d(3)), (1, "SEA", _d(7))]
    ).collect()
    opened = [r for r in out if r["k"] == 1 and r["is_current"]][0]
    assert opened["city"] == "SEA" and opened["valid_from"] == _d(7)


def test_as_of_reconstruction(spark):
    hist = _merge(spark, _hist(spark), [(1, "SF", _d(5))])
    before = {
        r["k"]: r["city"] for r in scd2_as_of(hist, _d(3)).collect()
    }
    after = {
        r["k"]: r["city"] for r in scd2_as_of(hist, _d(6)).collect()
    }
    assert before == {1: "NY", 2: "LA"}
    assert after == {1: "SF", 2: "LA"}


def test_second_merge_round_trips(spark):
    hist = _merge(spark, _hist(spark), [(1, "SF", _d(5))])
    hist2 = _merge(spark, hist, [(1, "SEA", _d(9)), (2, "LA", _d(9))])
    rows = hist2.collect()
    # k=1: NY(closed@5), SF(closed@9), SEA(open); k=2 unchanged
    k1 = sorted(
        (r["city"], r["valid_to"]) for r in rows if r["k"] == 1
    )
    assert k1 == [("NY", _d(5)), ("SEA", None), ("SF", _d(9))]
    assert len([r for r in rows if r["k"] == 2]) == 1


def test_stale_redelivery_is_noop(spark):
    """Replaying an older batch after a newer one must not corrupt the
    open row (valid_to earlier than valid_from would hide the newest
    version from every as-of query)."""
    hist = _merge(spark, _hist(spark), [(1, "SF", _d(5))])
    hist2 = _merge(spark, hist, [(1, "SEA", _d(9))])
    replayed = _merge(spark, hist2, [(1, "SF", _d(5))])
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, hist2.collect())
    )


def test_untracked_columns_carry_through(spark):
    snap = spark.createDataFrame(
        [(1, "NY", "10001", _d(1))],
        "k bigint, city string, zip string, eff timestamp",
    )
    hist = scd2_init(snap, "eff")
    up = spark.createDataFrame(
        [(1, "SF", _d(5)), (2, "LA", _d(5))],
        "k bigint, city string, eff timestamp",
    )
    out = scd2_merge(hist, up, "k", ["city"], "eff").collect()
    opened = [r for r in out if r["k"] == 1 and r["is_current"]][0]
    assert opened["city"] == "SF" and opened["zip"] == "10001"
    inserted = [r for r in out if r["k"] == 2][0]
    assert inserted["zip"] is None
