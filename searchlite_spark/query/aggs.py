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
    """Matched docs with the requested doc fields.  The match score is
    deliberately dropped: a doc field may itself be named `score`
    (top_hits, which needs the match score, uses `matches` directly)."""
    cols = ["doc_id"] + [f for f in dict.fromkeys(fields) if f]
    return matches.select("doc_id").join(docs.select(*cols), "doc_id")


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


def date_histogram_agg(
    md: DataFrame,
    field: str,
    interval: str,
    offset: int = 0,
    missing: int | None = None,
    min_doc_count: int = 1,
) -> DataFrame:
    """(key LONG epoch-millis, doc_count LONG).

    Fixed intervals replicate the reference's *ceil* quirk for
    bucket_start (aggs/mod.rs:3391-3395: bucket = ceil((v-offset)/step)
    — NOT floor); calendar intervals (day/week(Mon)/month/quarter/year)
    truncate in UTC."""
    vals = _explode_if_array(md, field)
    col = F.col(field).cast("long")
    if missing is not None:
        col = F.coalesce(col, F.lit(int(missing)))
    fixed_ms = _parse_fixed_interval(interval)
    if fixed_ms is not None:
        step = F.lit(fixed_ms)
        off = F.lit(int(offset))
        key = (
            F.ceil((col - off).cast("double") / step.cast("double")).cast("long")
            * step
            + off
        )
    else:
        unit = _parse_calendar_unit(interval)
        ts = F.timestamp_millis(col - F.lit(int(offset)))
        if unit == "week":
            trunc = F.date_trunc("week", ts)  # ISO Monday in Spark
        else:
            trunc = F.date_trunc(unit, ts)
        key = (F.unix_timestamp(trunc) * 1000 + F.lit(int(offset))).cast("long")
    out = (
        vals.where(col.isNotNull())
        .select("doc_id", key.alias("key"))
        .distinct()
        .groupBy("key")
        .agg(F.count("*").alias("doc_count"))
    )
    if min_doc_count > 0:
        out = out.where(F.col("doc_count") >= min_doc_count)
    return out.orderBy("key")


def _parse_fixed_interval(spec: str) -> int | None:
    """Fixed interval to millis (aggs/mod.rs:3474-3498 style: ms/s/m/h/d
    numeric multiples).  Calendar specs return None."""
    s = spec.strip().lower()
    if s in ("day", "week", "month", "quarter", "year", "1w", "1m", "1q", "1y"):
        return None if s != "1d" else 86_400_000
    import re as _re

    m = _re.fullmatch(r"(\d+)(ms|s|m|h|d)", s)
    if not m:
        return None
    n, unit = int(m.group(1)), m.group(2)
    mult = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}[unit]
    return n * mult


def _offset_millis(off) -> int:
    """date_histogram ``offset``: int millis, or a fixed-interval string
    like "1h" (validate_aggregations accepts both shapes — the executor
    must parse exactly what validation admits, not raise ValueError)."""
    if off is None:
        return 0
    if isinstance(off, str) and not off.lstrip("-").isdigit():
        ms = _parse_fixed_interval(off)
        if ms is None:
            raise AggregationConfigError(
                f"date_histogram: unsupported offset {off!r}"
            )
        return ms
    return int(off or 0)


def _parse_calendar_unit(spec: str) -> str:
    s = spec.strip().lower()
    mapping = {
        "day": "day", "1d": "day",
        "week": "week", "1w": "week",
        "month": "month", "1m": "month",
        "quarter": "quarter", "1q": "quarter",
        "year": "year", "1y": "year",
    }
    if s not in mapping:
        raise ValueError(f"unsupported date_histogram interval `{spec}`")
    return mapping[s]


def composite_agg(
    md: DataFrame,
    sources: list[dict],
    size: int = 10,
    after: dict | None = None,
) -> DataFrame:
    """Paginated cartesian buckets over terms/histogram sources
    (aggs/mod.rs:1689-1841): deterministic key order, keyset `after`
    resume.  Returns one column per source name + doc_count."""
    cols, names = [], []
    fields = []
    for src in sources:
        (kind, body), = src.items() if "type" not in src else [(src["type"], src)]
        name = body["name"]
        names.append(name)
        fields.append(body["field"])
        if kind == "terms":
            cols.append(F.col(body["field"]).alias(name))
        elif kind == "histogram":
            interval = float(body["interval"])
            cols.append(
                (F.floor(F.col(body["field"]) / interval) * interval).alias(name)
            )
        else:
            raise ValueError(f"unsupported composite source `{kind}`")
    grouped = (
        md.select("doc_id", *[c for c in dict.fromkeys(fields)])
        .select("doc_id", *cols)
        .groupBy(*names)
        .agg(F.count("*").alias("doc_count"))
        .orderBy(*[F.col(n).asc() for n in names])
    )
    if after:
        # keyset predicate: strictly greater in lexicographic key order
        pred = F.lit(False)
        eq = F.lit(True)
        for n in names:
            pred = pred | (eq & (F.col(n) > F.lit(after[n])))
            eq = eq & (F.col(n) == F.lit(after[n]))
        grouped = grouped.where(pred)
    return grouped.limit(size)


def significant_terms_agg(
    matches: DataFrame,
    docs: DataFrame,
    field: str,
    size: int = 10,
    background_filter: list[dict] | None = None,
    min_doc_count: int = 1,
) -> DataFrame:
    """Foreground vs background doc-frequency ratio
    (aggs/mod.rs:131-282): score = (fg/fg_total)/(bg/bg_total).

    background_filter (aggs/mod.rs:240-282): the background set is the
    corpus restricted by a Filter-AST predicate instead of the full
    corpus; a foreground key absent from the filtered background keeps
    its bucket with bg=0 and score=0.0 (mod.rs:2527-2531).  One extra
    filtered aggregation over the slim fast-field projection — the
    filter is a pushdown-able Column predicate, never a second corpus
    materialization."""
    from searchlite_spark.query.filters import compile_filters

    md = _matched_docs(matches, docs, [field])
    fg = (
        _explode_if_array(md, field)
        .where(F.col(field).isNotNull())
        .select("doc_id", F.col(field).alias("key"))
        .distinct()
        .groupBy("key")
        .agg(F.count("*").alias("fg"))
    )
    bg_docs = docs
    if background_filter:
        bg_docs = docs.where(compile_filters(docs, list(background_filter)))
    bg = (
        _explode_if_array(bg_docs.select("doc_id", field), field)
        .where(F.col(field).isNotNull())
        .select("doc_id", F.col(field).alias("key"))
        .distinct()
        .groupBy("key")
        .agg(F.count("*").alias("bg"))
    )
    fg_total = md.select("doc_id").distinct().count()
    bg_total = bg_docs.count()
    if fg_total == 0 or bg_total == 0:
        return fg.select("key", "fg", F.lit(0).alias("bg"), F.lit(0.0).alias("score")).limit(0)
    out = fg.join(bg, "key", "left").withColumn(
        "bg", F.coalesce(F.col("bg"), F.lit(0))
    ).withColumn(
        "score",
        F.when(
            F.col("bg") > 0,
            (F.col("fg") / F.lit(float(fg_total)))
            / (F.col("bg") / F.lit(float(bg_total))),
        ).otherwise(F.lit(0.0)),
    )
    if min_doc_count > 0:
        out = out.where(F.col("fg") >= min_doc_count)
    return out.orderBy(F.col("score").desc(), F.col("key").asc()).limit(size)


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
    md: DataFrame, field: str, percents: list[float] | None = None,
    approximate: bool = False, accuracy: int = 10_000,
) -> DataFrame:
    """Exact percentiles (sorted linear interpolation) — matches the
    reference's <=256-value exact path; returns one row per percent.

    approximate=True is the big-N path (the reference switches to a
    t-digest sketch above 256 values, aggs/mod.rs:466-600): Spark's
    percentile_approx sketch is mergeable map-side, so the exact
    full-sort never happens — use it whenever the matched set can
    exceed executor memory."""
    percents = percents or [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0]
    vals = _explode_if_array(md, field).where(F.col(field).isNotNull())
    fracs = [p / 100.0 for p in percents]
    fn = "approx_percentile" if approximate else "percentile"
    extra = f", {int(accuracy)}" if approximate else ""
    row = vals.agg(
        F.expr(
            f"{fn}({field}, array({','.join(str(f) for f in fracs)}){extra})"
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


def sample_uniform(id_col: str = "doc_id", seed: int = 0):
    """Deterministic per-doc uniform in [0, 1): the top 60 bits of
    md5(seed ':' doc_id) scaled down.  md5 (not xxhash64) so the exact
    same draw is expressible in ANSI SQL for the oracle gate."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(int(seed))), F.lit(":"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(1 << 60))


def sampler_filter(
    matches: DataFrame, probability: float, seed: int = 0
) -> DataFrame:
    """Deterministic probability sampling of the match set
    (aggs/mod.rs:47-129): doc kept iff u(seed, doc_id) < probability.
    Same seed -> same subset, independent of partitioning/cluster size."""
    if not (0.0 < probability <= 1.0):
        raise ValueError("sampler probability must be in (0, 1]")
    return matches.where(sample_uniform(seed=seed) < F.lit(float(probability)))


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


def _norm_spec(spec: dict) -> tuple[str, dict]:
    """Accept both the reference's internally-tagged shape
    ({"type": "terms", "field": ...}) and the external shorthand
    ({"terms": {"field": ...}})."""
    if "type" in spec:
        return spec["type"], spec
    (kind, body), = spec.items()
    return kind, body


_METRIC_KINDS = ("stats", "extended_stats", "value_count", "cardinality",
                 "percentiles", "avg", "sum", "min", "max")

_PIPELINE_KINDS = ("bucket_sort", "avg_bucket", "sum_bucket", "derivative",
                   "moving_avg", "bucket_script")


class AggregationConfigError(ValueError):
    """Request-level aggregation misconfiguration (the reference's
    AggregationError::{InvalidConfig, UnsupportedFieldType,
    MissingFastField}, reader.rs:3720-3790)."""


class TooManyBucketsError(AggregationConfigError):
    """Bucket cardinality exceeded MAX_BUCKETS (the reference hard-caps
    at 10k, aggs/mod.rs:43).  Raised instead of materializing an
    unbounded bucket list on the driver — a histogram with a tiny
    `interval` over a wide field at web scale is otherwise a driver OOM."""


def _collect_buckets(df: DataFrame, agg_name: str):
    """Final driver-side bucket materialization, capped at MAX_BUCKETS.

    Every bucket-producing agg must funnel its final ``.collect()``
    through here: the ``limit(MAX_BUCKETS + 1)`` bounds the rows shipped
    to the driver regardless of the group-by cardinality (the groupBy
    itself stays distributed), and the +1 sentinel distinguishes
    "exactly at cap" from "over cap"."""
    rows = df.limit(MAX_BUCKETS + 1).collect()
    if len(rows) > MAX_BUCKETS:
        raise TooManyBucketsError(
            f"aggregation `{agg_name}` produced more than "
            f"{MAX_BUCKETS} buckets; narrow the interval/query or use "
            "composite pagination"
        )
    return rows


def _ensure_keyword_fast(schema, field: str, agg: str) -> None:
    if field not in schema.keyword_field_names:
        raise AggregationConfigError(
            f"aggregation `{agg}`: field `{field}` is not a fast keyword "
            "field"
        )


def _ensure_numeric_fast(schema, field: str, agg: str) -> None:
    if field not in schema.numeric_field_names:
        raise AggregationConfigError(
            f"aggregation `{agg}`: field `{field}` is not a fast numeric "
            "field"
        )


def _ensure_keyword_or_numeric_fast(schema, field: str, agg: str) -> None:
    if (
        field not in schema.keyword_field_names
        and field not in schema.numeric_field_names
    ):
        raise AggregationConfigError(
            f"aggregation `{agg}`: field `{field}` is not a fast keyword "
            "or numeric field"
        )


def _validate_sampling(name: str, sampling) -> None:
    """reader.rs:3791-3833 — size/probability exclusivity + ranges."""
    if sampling is None:
        return
    size = sampling.get("size")
    prob = sampling.get("probability")
    if size is not None and prob is not None:
        raise AggregationConfigError(
            f"aggregation `{name}` sampling cannot set both size and "
            "probability"
        )
    if prob is not None and not (0.0 <= float(prob) <= 1.0):
        raise AggregationConfigError(
            f"aggregation `{name}` sampling probability must be between "
            "0 and 1"
        )
    if size is not None and int(size) == 0:
        raise AggregationConfigError(
            f"aggregation `{name}` sampling size must be greater than 0"
        )
    if sampling.get("seed") is not None and size is None and prob is None:
        raise AggregationConfigError(
            f"aggregation `{name}` sampling seed requires size or "
            "probability to be set"
        )


def _parse_bound(v):
    """Accept a number or an ISO date/datetime string (the reference's
    parse_date, types.rs)."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            pass
        from datetime import datetime

        for fmt in ("%Y-%m-%d", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S"):
            try:
                return datetime.strptime(v, fmt).timestamp() * 1000.0
            except ValueError:
                continue
    return None


def _validate_bounds_pair(name: str, kind: str, body: dict) -> None:
    """extended_bounds/hard_bounds ordering + containment
    (reader.rs:3835-3876 histogram, 3905-3974 date_histogram)."""

    def norm(b, label):
        if b is None:
            return None
        lo, hi = (
            (b.get("min"), b.get("max")) if isinstance(b, dict) else (b[0], b[1])
        )
        lo_v, hi_v = _parse_bound(lo), _parse_bound(hi)
        if lo_v is None or hi_v is None:
            raise AggregationConfigError(
                f"{kind} `{name}` {label} is not a valid date/number"
            )
        if lo_v > hi_v:
            raise AggregationConfigError(f"{kind} `{name}` {label}.min > max")
        return lo_v, hi_v

    ext = norm(body.get("extended_bounds"), "extended_bounds")
    hard = norm(body.get("hard_bounds"), "hard_bounds")
    if ext and hard and (ext[0] < hard[0] or ext[1] > hard[1]):
        raise AggregationConfigError(
            f"{kind} `{name}` extended_bounds must be within hard_bounds"
        )


_FILTER_BODY_KEYS = {
    "KeywordEq": ("field", "value"),
    "KeywordIn": ("field", "values"),
    "I64Range": ("field", "min", "max"),
    "F64Range": ("field", "min", "max"),
}


def _validate_filter_ast(nodes, name: str, label: str) -> None:
    """Structural check of a Filter-AST list (reader.rs:3641-3975
    rejects malformed configs before any execution): every node is a
    one-key dict of a known combinator/leaf, leaves carry their
    required body keys.  Runs driver-side before any job."""
    if not isinstance(nodes, (list, tuple)):
        raise AggregationConfigError(
            f"`{name}` {label} must be a list of filter nodes"
        )

    def walk(node):
        if not isinstance(node, dict) or len(node) != 1:
            raise AggregationConfigError(
                f"`{name}` {label}: each filter node is a one-key dict, "
                f"got {node!r}"
            )
        (kind, body), = node.items()
        if kind in _FILTER_BODY_KEYS:
            missing = [k for k in _FILTER_BODY_KEYS[kind] if k not in (body or {})]
            if missing:
                raise AggregationConfigError(
                    f"`{name}` {label}: {kind} is missing {missing}"
                )
        elif kind in ("And", "Or"):
            for sub in body or []:
                walk(sub)
        elif kind == "Not":
            walk(body)
        elif kind == "Nested":
            if not isinstance(body, dict) or "path" not in body or "filter" not in body:
                raise AggregationConfigError(
                    f"`{name}` {label}: Nested requires `path` and `filter`"
                )
            walk(body["filter"])
        else:
            raise AggregationConfigError(
                f"`{name}` {label}: unsupported filter `{kind}`"
            )

    for n in nodes:
        walk(n)


def validate_aggregations(schema, aggs: dict) -> None:
    """Config validation matrix (reader.rs:3641-3718), applied BEFORE
    any job runs: field-kind checks per agg type, sampling exclusivity,
    histogram interval/bounds rules, date_histogram interval grammar.
    The repo's fast-field model: every keyword/numeric schema field is
    fast (Parquet is columnar), text fields are never fast."""
    for name, spec in (aggs or {}).items():
        kind, body = _norm_spec(spec)
        sampling = body.get("sampling")
        if kind in ("terms", "significant_terms", "rare_terms"):
            _ensure_keyword_fast(schema, body["field"], name)
            _validate_sampling(name, sampling)
            if kind == "significant_terms" and body.get("background_filter") is not None:
                _validate_filter_ast(
                    body["background_filter"], name, "background_filter"
                )
            validate_aggregations(schema, body.get("aggs") or {})
        elif kind in ("range", "date_range"):
            _ensure_numeric_fast(schema, body["field"], name)
            _validate_sampling(name, sampling)
            validate_aggregations(schema, body.get("aggs") or {})
        elif kind == "histogram":
            _ensure_numeric_fast(schema, body["field"], name)
            if float(body.get("interval", 0)) <= 0.0:
                raise AggregationConfigError(
                    f"histogram `{name}` requires interval > 0"
                )
            _validate_bounds_pair(name, "histogram", body)
            _validate_sampling(name, sampling)
            validate_aggregations(schema, body.get("aggs") or {})
        elif kind == "date_histogram":
            _ensure_numeric_fast(schema, body["field"], name)
            cal = body.get("calendar_interval")
            fixed = body.get("fixed_interval")
            iv = body.get("interval")
            if cal is None and fixed is None and iv is None:
                raise AggregationConfigError(
                    f"date_histogram `{name}` requires `calendar_interval`"
                    " or `fixed_interval`"
                )
            for label, spec_s, want_cal in (
                ("calendar_interval", cal, True),
                ("fixed_interval", fixed, False),
            ):
                if spec_s is None:
                    continue
                if want_cal:
                    try:
                        _parse_calendar_unit(spec_s)
                    except ValueError:
                        raise AggregationConfigError(
                            f"date_histogram `{name}` calendar_interval "
                            f"`{spec_s}` is not supported"
                        ) from None
                elif _parse_fixed_interval(spec_s) is None:
                    raise AggregationConfigError(
                        f"date_histogram `{name}` fixed_interval "
                        f"`{spec_s}` is invalid"
                    )
            off = body.get("offset")
            if isinstance(off, str) and _parse_fixed_interval(off) is None:
                raise AggregationConfigError(
                    f"date_histogram `{name}` offset `{off}` is invalid"
                )
            _validate_bounds_pair(name, "date_histogram", body)
            _validate_sampling(name, sampling)
            validate_aggregations(schema, body.get("aggs") or {})
        elif kind in ("stats", "extended_stats", "value_count",
                      "percentiles", "percentile_ranks",
                      "avg", "sum", "min", "max"):
            _ensure_numeric_fast(schema, body["field"], name)
        elif kind == "cardinality":
            _ensure_keyword_or_numeric_fast(schema, body["field"], name)
        elif kind == "filter":
            _validate_sampling(name, sampling)
            validate_aggregations(schema, body.get("aggs") or {})
        elif kind == "composite":
            for src in body.get("sources", []):
                skind, sbody = _norm_spec(src["source"]) if "source" in src \
                    else _norm_spec({k: v for k, v in src.items()
                                     if k != "name"})
                if skind == "terms":
                    _ensure_keyword_fast(schema, sbody["field"], name)
                elif skind == "histogram":
                    _ensure_numeric_fast(schema, sbody["field"], name)
            _validate_sampling(name, sampling)
            validate_aggregations(schema, body.get("aggs") or {})
        elif kind == "sampler":
            _validate_sampling(name, body)
            validate_aggregations(schema, body.get("aggs") or {})
        elif kind == "top_hits":
            for s in body.get("sort") or []:
                fld = s if isinstance(s, str) else s.get("field")
                if fld not in ("_score", "doc_id") and (
                    fld not in schema.keyword_field_names
                    and fld not in schema.numeric_field_names
                ):
                    raise AggregationConfigError(
                        f"invalid top_hits sort in aggregation `{name}`: "
                        f"`{fld}` is not sortable"
                    )
        elif kind in _PIPELINE_KINDS:
            pass
        else:
            raise AggregationConfigError(f"unsupported aggregation `{kind}`")


def _metric_exprs(name: str, kind: str, body: dict) -> list:
    """Sub-aggregation metric expressions for a single groupBy pass.
    Multi-valued fields inside sub-aggs are summed per first value only
    when scalar; array fields need explode (not supported in sub-aggs
    yet)."""
    f = body["field"]
    if kind == "stats" or kind == "extended_stats":
        out = [
            F.count(f).alias(f"{name}.count"),
            F.min(f).cast("double").alias(f"{name}.min"),
            F.max(f).cast("double").alias(f"{name}.max"),
            F.sum(f).cast("double").alias(f"{name}.sum"),
            F.avg(f).alias(f"{name}.avg"),
        ]
        if kind == "extended_stats":
            out += [
                F.var_pop(f).alias(f"{name}.variance"),
                F.stddev_pop(f).alias(f"{name}.std_deviation"),
            ]
        return out
    if kind == "value_count":
        return [F.count(f).alias(f"{name}.value")]
    if kind == "cardinality":
        return [F.countDistinct(f).alias(f"{name}.value")]
    if kind == "avg":
        return [F.avg(f).alias(f"{name}.value")]
    if kind == "sum":
        return [F.sum(f).cast("double").alias(f"{name}.value")]
    if kind == "min":
        return [F.min(f).cast("double").alias(f"{name}.value")]
    if kind == "max":
        return [F.max(f).cast("double").alias(f"{name}.value")]
    raise ValueError(f"unsupported sub-aggregation `{kind}`")


def _bucket_agg_with_subs(md, key_col, sub_aggs: dict):
    """groupBy(key) with doc_count + metric sub-aggs in ONE pass."""
    exprs = [F.count("*").alias("doc_count")]
    for name, spec in (sub_aggs or {}).items():
        kind, body = _norm_spec(spec)
        exprs += _metric_exprs(name, kind, body)
    return md.groupBy(key_col.alias("key")).agg(*exprs)


def _row_to_bucket(r, sub_aggs: dict) -> dict:
    d = r.asDict()
    bucket = {"key": d.pop("key"), "doc_count": d.pop("doc_count")}
    for name, spec in (sub_aggs or {}).items():
        kind, _ = _norm_spec(spec)
        sub = {
            k.split(".", 1)[1]: v for k, v in d.items() if k.startswith(name + ".")
        }
        bucket[name] = sub
    return bucket


def _metric_path(bucket: dict, path: str):
    """Resolve `metric` / `metric.sub` / `_count` against a bucket."""
    if path == "_count":
        return bucket["doc_count"]
    parts = path.replace(">", ".").split(".")
    cur = bucket
    for p in parts:
        cur = cur[p]
    if isinstance(cur, dict) and "value" in cur:
        cur = cur["value"]
    return cur


def _apply_pipelines(out: dict, pipelines: list[tuple[str, str, dict]]):
    """Sibling pipeline aggs over an earlier bucket agg's buckets
    (aggs/mod.rs:2491-2736).  buckets_path = "parent>metric[.sub]"."""
    import math

    for name, kind, body in pipelines:
        path = body.get("buckets_path", "")
        if isinstance(path, dict):  # bucket_script: map of var -> path
            first = next(iter(path.values()), "")
            parent, _, metric = first.partition(">")
        else:
            parent, _, metric = path.partition(">")
        buckets = out.get(parent, {}).get("buckets")
        if buckets is None:
            raise ValueError(f"pipeline `{name}` references unknown aggregation `{parent}`")
        gap = (body.get("gap_policy") or "skip").lower()

        def vals():
            res = []
            for b in buckets:
                try:
                    v = _metric_path(b, metric)
                except KeyError:
                    v = None
                if v is None and gap == "insert_zeros":
                    v = 0.0
                res.append(v)
            return res

        if kind == "avg_bucket":
            vs = [v for v in vals() if v is not None]
            out[name] = {"value": (sum(vs) / len(vs)) if vs else None}
        elif kind == "sum_bucket":
            vs = [v for v in vals() if v is not None]
            out[name] = {"value": sum(vs) if vs else None}
        elif kind == "derivative":
            unit = body.get("unit")
            vs = vals()
            prev = None
            for b, v in zip(buckets, vs):
                if prev is not None and v is not None:
                    d = v - prev
                    if unit:
                        d /= float(unit)
                    b[name] = {"value": d}
                if v is not None:
                    prev = v
        elif kind == "moving_avg":
            window = int(body.get("window", 5))
            vs = vals()
            hist = []
            for b, v in zip(buckets, vs):
                if v is not None:
                    hist.append(v)
                tail = hist[-window:]
                if tail:
                    b[name] = {"value": sum(tail) / len(tail)}
            predict = int(body.get("predict", 0) or 0)
            if predict and hist:
                tail = hist[-window:]
                out.setdefault(parent, {})["predictions"] = [
                    sum(tail) / len(tail)
                ] * predict
        elif kind == "bucket_script":
            from searchlite_spark.query.script import compile_script  # noqa: F401
            script = body["script"]
            paths = body.get("buckets_path")
            if not isinstance(paths, dict):
                raise ValueError("bucket_script needs a buckets_path map")
            import re as _re
            for b in buckets:
                env = {}
                ok = True
                for var, pth in paths.items():
                    # paths are parent-relative: "h>m" -> "m"
                    rel = pth.partition(">")[2] or pth
                    try:
                        env[var] = _metric_path(b, rel)
                    except KeyError:
                        ok = False
                        break
                    if env[var] is None:
                        ok = False
                        break
                if not ok:
                    continue
                val = _eval_bucket_script(script, env)
                if val is not None and math.isfinite(val):
                    b[name] = {"value": val}
        elif kind == "bucket_sort":
            sort = body.get("sort") or []
            frm = int(body.get("from", 0) or 0)
            size = body.get("size")

            def sort_key(b):
                ks = []
                for sspec in sort:
                    if isinstance(sspec, str):
                        fldp, order = sspec, "asc"
                    else:
                        fldp, order = sspec["field"], sspec.get("order", "asc")
                    v = (
                        b["doc_count"] if fldp == "_count"
                        else b["key"] if fldp == "_key"
                        else _metric_path(b, fldp)
                    )
                    ks.append((v, order))
                return ks

            if sort:
                import functools

                def cmp(a, bb):
                    for (va, o), (vb, _) in zip(sort_key(a), sort_key(bb)):
                        if va == vb:
                            continue
                        lt = -1 if va < vb else 1
                        return lt if o == "asc" else -lt
                    return 0

                buckets.sort(key=functools.cmp_to_key(cmp))
            end = frm + size if size is not None else None
            out[parent]["buckets"] = buckets[frm:end]
        else:  # pragma: no cover
            raise ValueError(kind)


def _eval_bucket_script(script: str, env: dict) -> float | None:
    """Arithmetic over named metric values (aggs/mod.rs:2909-3116) —
    reuses the script tokenizer/RPN with plain-float evaluation."""
    from searchlite_spark.query.script import _to_rpn, tokenize

    rpn = _to_rpn(tokenize(script))
    stack: list[float] = []
    for t, v in rpn:
        if t == "num":
            stack.append(float(v))
        elif t == "ident":
            if v not in env:
                return None
            stack.append(float(env[v]))
        elif v == "u-":
            stack.append(-stack.pop())
        else:
            b = stack.pop()
            a = stack.pop()
            if v == "+":
                stack.append(a + b)
            elif v == "-":
                stack.append(a - b)
            elif v == "*":
                stack.append(a * b)
            else:
                if b == 0:
                    return None
                stack.append(a / b)
    return stack[0] if len(stack) == 1 else None


def run_aggregations(matches: DataFrame, docs: DataFrame, aggs: dict) -> dict:
    """Collect reference-shaped aggregation responses.  Bucket aggs
    support metric sub-aggs (single-pass groupBy); pipeline aggs
    post-process sibling buckets driver-side (buckets are <= 10k)."""
    out: dict = {}
    pipelines: list[tuple[str, str, dict]] = []
    for name, spec in aggs.items():
        kind, body = _norm_spec(spec)
        if kind in _PIPELINE_KINDS:
            pipelines.append((name, kind, body))
            continue
        sub_aggs = body.get("aggs") or {}
        sub_fields = [
            _norm_spec(s)[1]["field"] for s in sub_aggs.values()
        ]
        if kind == "terms":
            fields = [body["field"]] + sub_fields
            md = _matched_docs(matches, docs, fields)
            key = F.col(body["field"])
            if body.get("missing") is not None:
                key = F.coalesce(key, F.lit(body["missing"]))
            grouped = _bucket_agg_with_subs(
                md.where(key.isNotNull()), key, sub_aggs
            )
            mdc = int(body.get("min_doc_count", 1) or 0)
            if mdc > 0:
                grouped = grouped.where(F.col("doc_count") >= mdc)
            rows = grouped.orderBy(
                F.col("doc_count").desc(), F.col("key").asc()
            ).limit(min(int(body.get("size", 10)), MAX_BUCKETS)).collect()
            out[name] = {"buckets": [_row_to_bucket(r, sub_aggs) for r in rows]}
        elif kind == "rare_terms":
            md = _matched_docs(matches, docs, [body["field"]])
            rows = rare_terms_agg(
                md, body["field"], int(body.get("max_doc_count", 1))
            ).collect()
            out[name] = {
                "buckets": [
                    {"key": r["key"], "doc_count": r["doc_count"]} for r in rows
                ]
            }
        elif kind == "significant_terms":
            rows = significant_terms_agg(
                matches, docs, body["field"],
                min(int(body.get("size", 10)), MAX_BUCKETS),
                background_filter=body.get("background_filter"),
                min_doc_count=int(body.get("min_doc_count", 1) or 0),
            ).collect()
            out[name] = {
                "buckets": [
                    {"key": r["key"], "doc_count": r["fg"], "bg_count": r["bg"],
                     "score": r["score"]}
                    for r in rows
                ]
            }
        elif kind == "histogram":
            fields = [body["field"]] + sub_fields
            md = _matched_docs(matches, docs, fields)
            interval = float(body["interval"])
            offset = float(body.get("offset", 0))
            key = (
                F.floor((F.col(body["field"]) - offset) / interval) * interval
                + offset
            ).cast("double")
            grouped = _bucket_agg_with_subs(
                md.where(F.col(body["field"]).isNotNull()), key, sub_aggs
            )
            eb = body.get("extended_bounds")
            mdc = body.get("min_doc_count")
            mdc = int(mdc) if mdc is not None else (0 if eb else 1)
            if mdc > 0:
                grouped = grouped.where(F.col("doc_count") >= mdc)
            rows = _collect_buckets(grouped.orderBy("key"), name)
            buckets = [_row_to_bucket(r, sub_aggs) for r in rows]
            if eb:
                have = {b["key"] for b in buckets}
                lo = math_floor((float(eb["min"]) - offset) / interval)
                hi = math_floor((float(eb["max"]) - offset) / interval)
                if hi - lo + 1 > MAX_BUCKETS:
                    raise TooManyBucketsError(
                        f"aggregation `{name}`: extended_bounds span "
                        f"{hi - lo + 1} buckets > {MAX_BUCKETS}"
                    )
                for i in range(lo, hi + 1):
                    k = i * interval + offset
                    if k not in have:
                        buckets.append({"key": k, "doc_count": 0})
                buckets.sort(key=lambda b: b["key"])
            out[name] = {"buckets": buckets}
        elif kind == "date_histogram":
            md = _matched_docs(matches, docs, [body["field"]] + sub_fields)
            rows = _collect_buckets(
                date_histogram_agg(
                    md,
                    body["field"],
                    body.get("interval") or body.get("calendar_interval")
                    or body.get("fixed_interval"),
                    _offset_millis(body.get("offset", 0)),
                    body.get("missing"),
                    int(body.get("min_doc_count", 1) or 0),
                ),
                name,
            )
            out[name] = {
                "buckets": [
                    {"key": r["key"], "doc_count": r["doc_count"]} for r in rows
                ]
            }
        elif kind in ("range", "date_range"):
            md = _matched_docs(matches, docs, [body["field"]])
            rows = range_agg(md, body["field"], body["ranges"]).collect()
            out[name] = {
                "buckets": [
                    {"key": r["key"], "doc_count": r["doc_count"]} for r in rows
                ]
            }
        elif kind == "composite":
            md_fields = []
            for srcspec in body["sources"]:
                k2, b2 = _norm_spec(srcspec)
                md_fields.append(b2["field"])
            md = _matched_docs(matches, docs, md_fields)
            norm_sources = []
            for srcspec in body["sources"]:
                k2, b2 = _norm_spec(srcspec)
                norm_sources.append({k2: b2})
            rows = _collect_buckets(
                composite_agg(
                    md,
                    norm_sources,
                    min(int(body.get("size", 10)), MAX_BUCKETS),
                    body.get("after"),
                ),
                name,
            )
            names = [list(s.values())[0]["name"] for s in norm_sources]
            buckets = [
                {"key": {n: r[n] for n in names}, "doc_count": r["doc_count"]}
                for r in rows
            ]
            resp = {"buckets": buckets}
            if buckets:
                resp["after_key"] = buckets[-1]["key"]
            out[name] = resp
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
        elif kind == "percentiles":
            md = _matched_docs(matches, docs, [body["field"]])
            rows = percentiles_agg(
                md, body["field"], body.get("percents"),
                approximate=bool(body.get("approximate")),
                accuracy=int(body.get("accuracy", 10_000)),
            ).collect()
            out[name] = {"values": {str(r["percent"]): r["value"] for r in rows}}
        elif kind == "percentile_ranks":
            md = _matched_docs(matches, docs, [body["field"]])
            f = body["field"]
            vals = _explode_if_array(md, f).where(F.col(f).isNotNull())
            total = vals.count()
            ranks = {}
            for target in body["values"]:
                le = vals.where(F.col(f) <= F.lit(target)).count()
                ranks[str(float(target))] = (
                    100.0 * le / total if total else None
                )
            out[name] = {"values": ranks}
        elif kind == "filter":
            fcols = _filter_fields(body["filter"])
            md = _matched_docs(matches, docs, fcols + sub_fields)
            filtered = md.where(compile_filters(md, [body["filter"]]))
            resp = {"doc_count": filtered.count()}
            if sub_aggs:
                sub_matches = matches.join(
                    filtered.select("doc_id"), "doc_id", "left_semi"
                )
                resp.update(run_aggregations(sub_matches, docs, sub_aggs))
            out[name] = resp
        elif kind == "sampler":
            prob = float(body.get("probability", 1.0))
            seed = int(body.get("seed", 0))
            sampled = sampler_filter(matches.select("doc_id"), prob, seed)
            resp = {"doc_count": sampled.count(), "sampled": True}
            if sub_aggs:
                sub_matches = matches.join(sampled, "doc_id", "left_semi")
                resp.update(run_aggregations(sub_matches, docs, sub_aggs))
            out[name] = resp
        elif kind == "top_hits":
            # request-level top_hits over the whole match set
            size = int(body.get("size", 3))
            sort = body.get("sort") or [{"field": "_score", "order": "desc"}]
            md = matches
            order = []
            for sspec in sort:
                fld = sspec["field"] if isinstance(sspec, dict) else sspec
                o = sspec.get("order", "asc") if isinstance(sspec, dict) else "asc"
                col = F.col("score") if fld == "_score" else F.col(fld)
                if fld != "_score" and fld not in md.columns:
                    md = md.join(docs.select("doc_id", fld), "doc_id", "left")
                order.append(col.desc() if o == "desc" else col.asc())
            order.append(F.col("doc_id").asc())
            rows = md.orderBy(*order).limit(size).collect()
            out[name] = {
                "hits": [{"doc_id": r["doc_id"], "score": r["score"]} for r in rows]
            }
        else:
            raise ValueError(f"unsupported aggregation `{kind}`")
    _apply_pipelines(out, pipelines)
    return out


def math_floor(x: float) -> int:
    import math

    return int(math.floor(x))
