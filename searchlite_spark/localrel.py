"""Tiny literal DataFrames as Arrow LocalRelations.

``spark.createDataFrame(list_of_rows, schema)`` goes through the
Python-RDD path: the literal rows become a ``Scan ExistingRDD`` whose
every evaluation launches a Python worker task, and broadcasting it
(the per-query key-info / phrase-mapping tables are all broadcast)
submits a whole Spark job just to collect a handful of rows.  Routing
the same rows through a pandas DataFrame instead lets the Arrow
conversion path embed them as a ``LocalRelation`` in the logical plan
(`spark.sql.execution.arrow.localRelationThreshold`, default 48 MB):
``LocalTableScan.executeCollect`` returns the rows driver-side, so a
``BroadcastExchange`` over it costs ZERO jobs and zero Python tasks.

Measured on the bench suite (sf1.0, local[32]): one fewer Spark job
per broadcast table per query — e.g. bm25_topk 3 jobs -> 2, phrase
5 -> 3 (see OPTIMIZATION_r07.md).

Values are passed through as Python objects (object-dtype Series), so
None/NULL, nested lists and mixed ints survive exactly as the RDD path
would convert them; any conversion failure falls back to the original
``createDataFrame`` call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with literal rows
    embedded as a LocalRelation (no Python-RDD scan, no broadcast job).

    rows: list of tuples matching ``schema`` (a DDL string).  Falls
    back to the stock RDD path on any conversion error so callers never
    see a behavior change."""
    rows = list(rows)
    try:
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.types import _parse_datatype_string

        struct = _parse_datatype_string(schema)
        names = [f.name for f in struct.fields]
        if not rows:
            # empty literal: a one-NULL-row LocalRelation filtered to
            # nothing — PropagateEmptyRelation folds it to an empty
            # LocalRelation, where an empty list would fall back to an
            # RDD scan costing a (num_partitions)-task job per action
            pdf = pd.DataFrame(
                {name: pd.Series([None], dtype="object") for name in names},
                columns=names,
            )
            return spark.createDataFrame(pdf, schema).where(F.lit(False))
        pdf = pd.DataFrame(
            {
                name: pd.Series([r[i] for r in rows], dtype="object")
                for i, name in enumerate(names)
            },
            columns=names,
        )
        return spark.createDataFrame(pdf, schema)
    except Exception:  # pragma: no cover - defensive fallback
        return spark.createDataFrame(rows, schema)
