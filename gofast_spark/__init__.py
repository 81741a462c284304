"""gofast-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of earthai-tech/gofast.

The reference (read-only at /root/reference) is an eager, single-node
pandas/numpy operator library.  This package re-expresses the same operator
semantics Spark-first: every public op is a pure ``DataFrame -> DataFrame``
(or ``DataFrame -> (DataFrame, report)``) function built from declarative
DataFrame/SQL primitives so Catalyst supplies planning, pushdown, pruning
and join-strategy selection that the reference delegates to pandas.

Sub-packages mirror SURVEY.md §2:

- :mod:`gofast_spark.sources`    — readers/writers (§2.1)
- :mod:`gofast_spark.operators`  — filters/joins/aggs/windows/reshape/sampling (§2.2–2.7)
- :mod:`gofast_spark.quality`    — missing/duplicates/outliers/skew/scaling/audit (§2.8)
- :mod:`gofast_spark.functions`  — scalar string/date/math/spatial functions (§2.9)
- :mod:`gofast_spark.stats`      — descriptive + inferential statistics (§2.10)
- :mod:`gofast_spark.ts`         — time-series operators (§2.11)
- :mod:`gofast_spark.text`       — text analysis / LLM-pipeline ops
- :mod:`gofast_spark.dedup`      — exact + near-duplicate detection
- :mod:`gofast_spark.sim`        — embedding similarity search
- :mod:`gofast_spark.sim`        — embedding similarity search
- :mod:`gofast_spark.multimodal` — binary media columns + Arrow feature UDFs
- :mod:`gofast_spark.streaming`  — Structured Streaming surface (§2.12)
- :mod:`gofast_spark.sql`        — DBAnalysis SQL facade (gofast/query.py parity)
- :mod:`gofast_spark.ml`         — MLlib pipeline mirrors (§2.14)
- :mod:`gofast_spark.metrics`    — evaluation metrics as aggregations (§2.14)
- :mod:`gofast_spark.core`       — fluent Data/Frames deferred-op facades (§3.2)
"""

from gofast_spark.core import Data, Frames, MergeableFrames, MergeableSeries
from gofast_spark.session import get_session

__version__ = "0.2.0"

__all__ = [
    "get_session",
    "Data",
    "Frames",
    "MergeableFrames",
    "MergeableSeries",
    "__version__",
]
