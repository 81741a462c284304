"""Join operators (SURVEY §2.3).

Equi-joins are thin wrappers — Catalyst picks broadcast vs sort-merge and
AQE rewrites skewed joins at runtime.  The custom work (SURVEY §4.2.1) is
the tolerance / nearest-match family: rounded-key equi-join as the fast
path, range join + ``row_number`` over distance for true nearest-match.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _suffix_right_overlap(
    res: DataFrame, rt: DataFrame, overlap: set[str], suffix: str
) -> DataFrame:
    """Rename right-side columns whose names collide with left-side names
    (pandas ``suffixes`` behavior).  The target name is escalated
    (``x_right`` -> ``x_right_right``) when the left frame already carries
    a column of that name, so no genuine left column is silently
    overwritten by ``withColumn``.
    """
    taken = set(res.columns)
    for c in sorted(overlap):
        new = f"{c}{suffix}"
        while new in taken:
            new = f"{new}{suffix}"
        res = res.withColumn(new, rt[c]).drop(rt[c])
        taken.add(new)
    return res


def merge_frames(
    frames: Sequence[DataFrame],
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """n-way equi-join fold.

    Reference: ``Frames.merge`` (gofast/dataops/core.py:569-577, 622-633) —
    ``pd.merge`` folded left across the list.  Spark-side this is a single
    logical plan; Catalyst reorders and broadcasts small sides (dimension
    tables under the autoBroadcast threshold never shuffle the fact table).
    """
    keys = [on] if isinstance(on, str) else list(on)
    return reduce(lambda a, b: a.join(b, on=keys, how=how), frames)


def merge_datasets(
    *frames: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    fill_missing: dict | None = None,
    drop_duplicates: bool = False,
) -> DataFrame:
    """Varargs equi-join with post-pass fill / dedup.

    Reference: ``merge_datasets`` (gofast/utils/data_utils.py:5429).
    """
    out = merge_frames(list(frames), on=on, how=how)
    if fill_missing:
        out = out.fillna(fill_missing)
    if drop_duplicates:
        out = out.dropDuplicates()
    return out


def merge_frames_on_index(
    *frames: DataFrame,
    index_col: str,
    join_type: str = "outer",
    axis: int = 1,
    suffix: str = "_{i}",
) -> DataFrame:
    """Column-align multiple frames on an explicit row-key column.

    Reference: ``merge_frames_on_index`` (gofast/dataops/quality.py:1060)
    sets ``index_col`` as the pandas index on every frame and concatenates
    along ``axis`` (1 = column-wise outer join on the index).  Spark has no
    row index, so the engine-wide policy (SURVEY §3.2) is explicit keys:
    the same column plays the index role and the concat becomes a fold of
    equi-joins on it — hash-partitionable, so Catalyst broadcasts small
    sides and AQE handles skew exactly as for any other join.

    ``axis=0`` is the row-wise concat, matching ``pd.concat(axis=0)`` of
    indexed frames: ``join_type='outer'`` unions by name with missing
    columns NULL-filled; ``join_type='inner'`` keeps only the columns
    common to every frame (first frame's column order), as
    ``pd.concat(join='inner')`` does.

    Columns (other than the key) appearing in several frames get a
    positional suffix (``suffix.format(i=k)`` for the k-th frame, 0-based)
    so the output names are unique — the pandas overlap behavior.
    """
    if not frames:
        raise ValueError("merge_frames_on_index needs at least one frame")
    for df in frames:
        if index_col not in df.columns:
            raise KeyError(f"index_col {index_col!r} missing from a frame")
    if axis == 0:
        if join_type == "inner":
            common = [
                c
                for c in frames[0].columns
                if all(c in f.columns for f in frames[1:])
            ]
            return reduce(
                lambda a, b: a.unionByName(b),
                [f.select(*common) for f in frames],
            )
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
        )
    how = {"outer": "full_outer"}.get(join_type, join_type)
    used: set[str] = set()
    renamed = []
    for i, df in enumerate(frames):
        mapping = {}
        for c in df.columns:
            if c == index_col:
                continue
            if c not in used:
                used.add(c)
                continue
            # escalate until unique: the positional suffix alone can
            # collide with a column that already exists in some frame
            # (e.g. frame 2 carries both "x" and "x_1")
            new = f"{c}{suffix.format(i=i)}"
            bump = 2
            while new in used:
                new = f"{c}{suffix.format(i=i)}_{bump}"
                bump += 1
            mapping[c] = new
            used.add(new)
        renamed.append(df.withColumnsRenamed(mapping) if mapping else df)
    return reduce(lambda a, b: a.join(b, on=index_col, how=how), renamed)


def pair_data(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    decimals: int = 7,
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Tolerance equi-join: keys rounded to ``decimals`` before equality.

    Reference: ``pair_data`` (gofast/utils/data_utils.py:3355) pairs frames
    on coordinates rounded to 7 decimals.  We join on ``round(col, d)``
    derived keys — still a hash-partitionable equi-join, so it scales like
    any other join (no cross product).  Right-side columns whose names
    collide with left-side names are suffixed (pandas ``suffixes``
    behavior) so the output has unique column names.
    """
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(left.columns) & set(right.columns)
    lk = [F.round(left[k], decimals).alias(f"__k_{k}") for k in keys]
    rk = [F.round(right[k], decimals).alias(f"__k_{k}") for k in keys]
    lt = left.select("*", *lk)
    rt = right.select("*", *rk)
    cond = [lt[f"__k_{k}"] == rt[f"__k_{k}"] for k in keys]
    out = lt.join(rt, on=cond, how=how)
    out = out.drop(*[f"__k_{k}" for k in keys])
    return _suffix_right_overlap(out, rt, overlap, suffix)


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    *,
    threshold: float,
    keep: str = "closest",
    tiebreak: str | None = None,
    left_key: str | Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Nearest-match join within a distance threshold (1-D).

    Reference: ``dual_merge`` with ``find_closest=True``
    (gofast/utils/spatial_utils.py:2318-2477) and ``find_closest``
    (gofast/core/checks.py:1322).

    Strategy (SURVEY §4.2.1): a **band join** — bucket both sides by
    ``floor(value / threshold)`` and join each left bucket to right buckets
    {b-1, b, b+1}.  That turns the O(n·m) range predicate into an equi-join
    on the bucket key (hash-partitionable, AQE-skew-safe), then
    ``row_number()`` over distance keeps the closest match per left row.
    ``keep='all'`` returns every within-threshold pair.

    ``left_key`` names the per-row identity of the left side for the
    closest-pick window (narrow shuffle key at scale).  Without it a
    synthetic row id is generated so genuinely duplicate left rows each
    keep their own match instead of collapsing into one window partition.

    Deterministic: ties broken by ``tiebreak`` column (ascending) when given.
    Right-side columns whose names collide with left-side names are
    suffixed (pandas ``suffixes`` behavior, as in pair_data) so the output
    has unique column names.
    """
    overlap = set(left.columns) & set(right.columns)
    row_id = None
    if keep != "all" and left_key is None:
        row_id = "__left_rid"
        left = left.withColumn(row_id, F.monotonically_increasing_id())
    b = F.floor(F.col(left_on) / F.lit(threshold)).alias("__b")
    lt = left.select("*", b)
    offsets = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("__off")
    rt = right.select("*", F.floor(F.col(right_on) / F.lit(threshold)).alias("__rb"), offsets)
    rt = rt.withColumn("__b", F.col("__rb") + F.col("__off")).drop("__rb", "__off")
    # qualified refs on both sides: left_on == right_on must not be ambiguous
    dist = F.abs(lt[left_on] - rt[right_on])
    joined = lt.join(rt, on="__b", how="inner").where(dist <= threshold)
    joined = joined.withColumn("__dist", dist)

    def _suffix_overlap(res: DataFrame) -> DataFrame:
        return _suffix_right_overlap(res, rt, overlap, suffix)

    if keep == "all":
        # each within-threshold pair matches under exactly one bucket offset
        # (|floor(x/t) - floor(y/t)| <= 1), so no dedup pass is needed
        return _suffix_overlap(joined.drop("__b", "__dist"))
    if left_key is not None:
        part_cols = [left_key] if isinstance(left_key, str) else list(left_key)
        part = [lt[c] for c in part_cols]
    else:
        part = [F.col(row_id)]
    order = [F.col("__dist").asc()]
    if tiebreak:
        tb = rt[tiebreak] if tiebreak in right.columns else F.col(tiebreak)
        order.append(tb.asc())
    w = Window.partitionBy(*part).orderBy(*order)
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__b", "__dist", "__rn")
    )
    if row_id is not None:
        out = out.drop(row_id)
    return _suffix_overlap(out)


def nearest_join_2d(
    left: DataFrame,
    right: DataFrame,
    left_on: tuple[str, str],
    right_on: tuple[str, str],
    *,
    threshold: float,
    keep: str = "closest",
    tiebreak: str | None = None,
    left_key: str | Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Nearest-match join in two dimensions (euclidean distance within
    ``threshold``).

    Reference: ``dual_merge`` with ``find_closest=True`` over
    (longitude, latitude) (gofast/utils/spatial_utils.py:2318-2477).

    Strategy: 2-D band join — both sides bucket to a grid of cell size
    ``threshold``; each right row replicates into its 3x3 cell
    neighborhood, the join is an equi-join on the cell id, and the true
    euclidean predicate filters inside the cell match.  Replication factor
    is a constant 9, so the cost stays linear and hash-partitionable —
    never a cross product.  Colliding right-side column names are suffixed
    (pandas ``suffixes`` behavior, as in pair_data).
    """
    lx, ly = left_on
    rx, ry = right_on
    overlap = set(left.columns) & set(right.columns)
    row_id = None
    if keep != "all" and left_key is None:
        row_id = "__left_rid"
        left = left.withColumn(row_id, F.monotonically_increasing_id())
    lt = left.select(
        "*",
        F.floor(F.col(lx) / F.lit(threshold)).alias("__bx"),
        F.floor(F.col(ly) / F.lit(threshold)).alias("__by"),
    )
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("__o")
    rt = right.select(
        "*",
        F.floor(F.col(rx) / F.lit(threshold)).alias("__rbx"),
        F.floor(F.col(ry) / F.lit(threshold)).alias("__rby"),
        offs,
    )
    rt = (
        rt.withColumn("__bx", F.col("__rbx") + F.col("__o.dx"))
        .withColumn("__by", F.col("__rby") + F.col("__o.dy"))
        .drop("__rbx", "__rby", "__o")
    )
    dist = F.sqrt(
        F.pow(lt[lx] - rt[rx], 2) + F.pow(lt[ly] - rt[ry], 2)
    )
    joined = (
        lt.join(rt, on=["__bx", "__by"], how="inner")
        .where(dist <= threshold)
        .withColumn("__dist", dist)
    )

    def _suffix_overlap(res: DataFrame) -> DataFrame:
        return _suffix_right_overlap(res, rt, overlap, suffix)

    if keep == "all":
        return _suffix_overlap(joined.drop("__bx", "__by", "__dist"))
    if left_key is not None:
        part_cols = [left_key] if isinstance(left_key, str) else list(left_key)
        part = [lt[c] for c in part_cols]
    else:
        part = [F.col(row_id)]
    order = [F.col("__dist").asc()]
    if tiebreak:
        tb = rt[tiebreak] if tiebreak in right.columns else F.col(tiebreak)
        order.append(tb.asc())
    w = Window.partitionBy(*part).orderBy(*order)
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__bx", "__by", "__dist", "__rn")
    )
    if row_id is not None:
        out = out.drop(row_id)
    return _suffix_overlap(out)


def dual_merge(
    df1: DataFrame,
    df2: DataFrame,
    feature_cols: tuple[str, str] = ("longitude", "latitude"),
    *,
    find_closest: bool = False,
    threshold: float = 0.01,
    how: str = "inner",
    decimals: int = 7,
    left_key: str | Sequence[str] | None = None,
) -> DataFrame:
    """Reference-signature facade (dual_merge,
    gofast/utils/spatial_utils.py:2318): exact mode joins on coordinates
    rounded to ``decimals`` (pair_data fast path); ``find_closest`` mode
    runs the 2-D band nearest join within ``threshold``."""
    if not find_closest:
        return pair_data(df1, df2, on=list(feature_cols), decimals=decimals, how=how)
    return nearest_join_2d(
        df1,
        df2,
        (feature_cols[0], feature_cols[1]),
        (feature_cols[0], feature_cols[1]),
        threshold=threshold,
        left_key=left_key,
    )


def interpolate_grid(
    points: DataFrame,
    grid: DataFrame,
    *,
    point_xy: tuple[str, str],
    grid_xy: tuple[str, str],
    value_col: str,
    radius: float,
    power: float = 2.0,
    out_col: str = "value_idw",
) -> DataFrame:
    """Inverse-distance-weighted interpolation of scattered point values
    onto grid locations.

    Reference: ``interpolate_grid`` (gofast/core/utils.py:1393) — scipy
    griddata on in-memory arrays.  Here neighbor gathering reuses the 2-D
    band join (``keep='all'`` within ``radius`` — bucketed, linear), and
    the IDW estimate is a weighted-average aggregate per grid cell:
    ``sum(v / d^p) / sum(1 / d^p)``, with an exact-match short-circuit
    for d = 0.  Grid cells with no in-radius neighbor are dropped (no
    extrapolation).
    """
    gx, gy = grid_xy
    px, py = point_xy
    pairs = nearest_join_2d(
        grid, points, (gx, gy), (px, py), threshold=radius, keep="all"
    )
    d = F.sqrt(F.pow(F.col(gx) - F.col(px), 2) + F.pow(F.col(gy) - F.col(py), 2))
    w = 1.0 / F.pow(d, power)
    v = F.col(value_col)
    return (
        pairs.groupBy(gx, gy)
        .agg(
            F.max((d == 0).cast("int")).alias("__exact"),
            F.first(F.when(d == 0, v), ignorenulls=True).alias("__vexact"),
            (F.sum(F.when(d > 0, v * w)) / F.sum(F.when(d > 0, w))).alias("__vidw"),
        )
        .select(
            gx,
            gy,
            F.when(F.col("__exact") == 1, F.col("__vexact"))
            .otherwise(F.col("__vidw"))
            .alias(out_col),
        )
    )


def truncate_data(
    df: DataFrame,
    base: DataFrame,
    coord_cols: Sequence[str],
    *,
    base_cols: Sequence[str] | None = None,
    decimals: int = 7,
    invert: bool = False,
) -> DataFrame:
    """Restrict ``df`` to rows whose (rounded) coordinates appear in
    ``base`` — a left-semi join on derived rounded keys (left-anti with
    ``invert``).

    Reference: ``truncate_data`` (gofast/utils/data_utils.py:2623).
    """
    bcols = list(base_cols or coord_cols)
    lt = df.select("*", *[
        F.round(F.col(c), decimals).alias(f"__k_{i}") for i, c in enumerate(coord_cols)
    ])
    rt = base.select(*[
        F.round(F.col(c), decimals).alias(f"__k_{i}") for i, c in enumerate(bcols)
    ]).dropDuplicates()
    cond = [lt[f"__k_{i}"] == rt[f"__k_{i}"] for i in range(len(coord_cols))]
    how = "left_anti" if invert else "left_semi"
    return lt.join(rt, on=cond, how=how).drop(
        *[f"__k_{i}" for i in range(len(coord_cols))]
    )
