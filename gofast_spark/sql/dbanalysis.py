"""``DBAnalysis`` — the reference's SQL entry point, re-homed on Spark SQL.

Reference: gofast/query.py:111-911.  There, ``fit`` copies a pandas frame
into SQLite and every method regex-validates the SQL's *intent* before
handing it to the SQLite planner.  Here ``fit`` registers temp views and
``spark.sql`` hands the string to Catalyst — distributed planning replaces
SQLite, the intent validators port verbatim, and results stay lazy
DataFrames (``return_type='raw'`` collects, mirroring the reference's
fetchall path).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


class NotFittedError(RuntimeError):
    pass


class DBAnalysis:
    """Query a set of DataFrames through SQL.

    Parity map (reference gofast/query.py):

    - ``fit(df, table)``        <- :115  (``to_sql`` -> temp view)
    - ``query(sql)``            <- :223
    - ``aggregate(sql)``        <- :267  (must contain an aggregate fn)
    - ``joinTables(sql)``       <- :327  (must contain JOIN)
    - ``subqueriesAndTempTables(sqls)`` <- :386 (CTE / subquery check)
    - ``windowFunctions(sql)``  <- :639  (must contain OVER (...))
    - ``manipulate``/``transform`` are no-ops by design: temp views are
      immutable; use DataFrame writers for DML (documented divergence).
    """

    _AGG_RE = re.compile(r"\b(COUNT|SUM|AVG|MAX|MIN)\s*\(", re.IGNORECASE)
    _JOIN_RE = re.compile(r"\bJOIN\b", re.IGNORECASE)
    _WINDOW_RE = re.compile(r"\bOVER\s*\(", re.IGNORECASE)
    _SUBQ_RE = re.compile(r"\bWITH\b|\(\s*SELECT\b", re.IGNORECASE)

    def __init__(self, spark: SparkSession, *, verbose: int = 0):
        self.spark = spark
        self.verbose = verbose
        self.tables_: list[str] = []

    # -- lifecycle ---------------------------------------------------------

    def fit(self, data: DataFrame | dict[str, DataFrame], table_name: str | None = None):
        """Register frame(s) as queryable tables.

        Accepts a single frame + name (reference signature) or a dict of
        name -> frame.  Views are session-scoped and zero-copy — no data
        movement happens until a query runs (unlike the reference's
        ``to_sql`` materialization).
        """
        if isinstance(data, dict):
            items = data.items()
        else:
            if table_name is None:
                raise ValueError("table_name required when fitting a single frame")
            items = [(table_name, data)]
        for name, df in items:
            df.createOrReplaceTempView(name)
            if name not in self.tables_:
                self.tables_.append(name)
        return self

    def _check_fitted(self):
        if not self.tables_:
            raise NotFittedError("call fit() with at least one table first")

    def _run(self, sql: str, return_type: str):
        if return_type not in ("dataframe", "raw"):
            raise ValueError("Invalid return_type. Choose 'dataframe' or 'raw'.")
        out = self.spark.sql(sql)
        return out.collect() if return_type == "raw" else out

    # -- query methods (each validates intent like the reference) ----------

    def query(self, sql: str, return_type: str = "dataframe"):
        self._check_fitted()
        return self._run(sql, return_type)

    def aggregate(self, sql: str, return_type: str = "dataframe"):
        self._check_fitted()
        if not self._AGG_RE.search(sql):
            raise ValueError("The query does not appear to be an aggregation query.")
        return self._run(sql, return_type)

    def joinTables(self, sql: str, return_type: str = "dataframe"):
        self._check_fitted()
        if not self._JOIN_RE.search(sql):
            raise ValueError("The query does not appear to be a join query.")
        return self._run(sql, return_type)

    def subqueriesAndTempTables(self, sqls: str | list[str], return_type: str = "dataframe"):
        self._check_fitted()
        sql_list = [sqls] if isinstance(sqls, str) else list(sqls)
        for s in sql_list:
            if not self._SUBQ_RE.search(s):
                raise ValueError(
                    "One or more queries do not appear to be subquery/CTE queries."
                )
        results = [self._run(s, return_type) for s in sql_list]
        return results[0] if len(results) == 1 else results

    def windowFunctions(self, sql: str, return_type: str = "dataframe"):
        self._check_fitted()
        if not self._WINDOW_RE.search(sql):
            raise ValueError(
                "The query does not appear to contain SQL window functions."
            )
        return self._run(sql, return_type)
