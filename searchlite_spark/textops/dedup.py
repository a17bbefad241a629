"""Deduplication operators for large-scale text pipelines.

All operators are pure DataFrame compositions (JVM-side, shuffle-aware)
— no Python in the hot path except where noted.  Designed for 10^12-doc
scale:

* exact dedup       — hash-groupBy on a content digest; survivor = min
  doc_id per group (one shuffle on the digest).
* MinHash + LSH     — shingle -> k minhash values (xxhash64 with k salts,
  computed via explode + groupBy min) -> band buckets -> self-join on
  (band, bucket-hash) -> exact-Jaccard verification of candidates only.
  The band join is the classic sub-quadratic near-dup path.
* SimHash           — 64-bit sign-aggregated token hashes; near-dups =
  same value, or Hamming <= r via pigeonhole banding (split the 64 bits
  into r+1 bands — any pair within distance r collides on at least one
  intact band) + ``bit_count`` verification of candidates.
* n-gram Jaccard    — exact pairwise within a blocking key (use only as
  verification or on small blocks; quadratic per block).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def _cap_buckets(
    buckets: DataFrame, keys: list[str], cap: int, op: str, warn: bool
) -> DataFrame:
    """Drop bucket groups larger than ``cap`` members (they would launch
    an m² self-join).  When ``warn`` is on, one extra aggregation job
    runs NOW to count the dropped groups and emit a RuntimeWarning —
    truncation is a recall change and must never be silent.  Pass
    ``warn=False`` on web-scale runs where the extra job matters and
    oversized-boilerplate drops are the expected, documented behavior."""
    counts = buckets.groupBy(*keys).agg(F.count("*").alias("_n"))
    if warn:
        over = counts.where(F.col("_n") > cap).agg(
            F.count("*").alias("groups"), F.sum("_n").alias("members")
        ).first()
        if int(over["groups"] or 0) > 0:
            warnings.warn(
                f"{op}: dropped {over['groups']} oversized bucket group(s) "
                f"({over['members']} member rows > max_bucket_size={cap}); "
                "pairs inside them are NOT reported. Run exact_dedup "
                "first, raise max_bucket_size, or pass max_bucket_size="
                "None for exhaustive small-corpus runs.",
                RuntimeWarning,
                stacklevel=3,
            )
    ok = counts.where(F.col("_n") <= cap).select(*keys)
    return buckets.join(ok, keys, "left_semi")


def _tokens(col):
    """Whitespace tokens (documents corpus is pre-normalized); for raw
    web text, swap in the analysis tokenizer upstream."""
    return F.split(F.trim(col), r"\s+")


def bind_once(expr, f):
    """Apply ``f`` to ``expr`` with ``expr`` evaluated exactly ONCE per
    row, by passing it through a single-element higher-order function
    as a lambda variable.  A lambda variable is a materialized value;
    an expression referenced inside a lambda BODY is re-evaluated per
    array element — for a token array built by split() that silently
    turns an O(n) construction into O(n²) string work per row
    (measured 100×+ slowdowns on 100-token docs)."""
    return F.element_at(F.transform(F.array(expr), f), 1)


def shingles(col, n: int = 3):
    """n-token shingles as strings: transform over a token-index
    sequence, with the token array bound once per row (see
    ``bind_once`` — HOF lambdas are interpreted, so the constant
    factor matters and the re-evaluation trap is fatal)."""

    def build(toks):
        k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        return F.when(k <= 0, F.array()).otherwise(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.element_at(toks, (i + j + 1).cast("int"))
                        for j in range(n)
                    ],
                ),
            )
        )

    return bind_once(_tokens(col), build)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Survivors after exact-content dedup: min id per content digest.
    Returns the original rows of the survivors."""
    digest = F.md5(F.col(text_col)).alias("_digest")
    keep = (
        df.select(F.col(id_col), digest)
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig ARRAY<LONG>) — k minhash values per doc.

    sig[i] = min over shingles of xxhash64(shingle, salt_i).  Computed
    as k plain ``min`` aggregates over per-shingle hash columns — the
    per-group state is exactly k longs and Spark's partial (map-side)
    aggregation absorbs any per-doc shingle count, unlike a
    ``collect_list`` of hash arrays which buffers every shingle of a
    group in memory before folding."""
    sh = df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("_sh")
    )
    per_shingle = sh.select(
        id_col,
        *[F.xxhash64(F.col("_sh"), F.lit(i)).alias(f"_h{i}") for i in range(num_hashes)],
    )
    agg = per_shingle.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        id_col,
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = 500,
    warn_on_drop: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via banded LSH with
    exact-Jaccard verification of the candidates.

    max_bucket_size (default 500) caps the (band, bucket) self-join: a
    bucket with m members yields m² candidate pairs, and at
    Common-Crawl scale boilerplate/empty-page clusters form
    million-member buckets (10¹² pairs from ONE key).  Oversized
    buckets are DROPPED — their members are near-certain exact
    duplicates, so run the (cheaper) exact_dedup pass first.  The cap
    is ON by default so raw web-scale input can never silently launch
    a quadratic self-join; pass ``max_bucket_size=None`` only on small
    curated corpora where exhaustive pairs are required.
    warn_on_drop (default True) emits a RuntimeWarning with the dropped
    group count whenever the cap actually fires (one extra aggregation
    job at call time; disable at scale)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
    ).alias("bb")
    buckets = sigs.select(F.col(id_col), band_cols).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    if max_bucket_size is not None:
        buckets = _cap_buckets(
            buckets, ["band", "bucket"], max_bucket_size,
            "minhash_lsh_pairs", warn_on_drop,
        )
    left = buckets.alias("l")
    right = buckets.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_shb"))
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, simhash LONG) — sign-aggregate of per-token 64-bit hashes.

    bit_i(doc) = 1 if sum over tokens of (+1 if bit_i(xxhash64(tok))
    else -1) > 0.  Computed as ``bits`` plain ``sum`` aggregates (one
    int per bit of per-group state, map-side combinable) — no
    collect_list buffering."""
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("_t")
    ).where(F.col("_t") != "")
    h = F.xxhash64("_t")
    per_tok = toks.select(
        id_col,
        *[
            F.when(
                h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias(f"_b{i}")
            for i in range(bits)
        ],
    )
    summed = per_tok.groupBy(id_col).agg(
        *[F.sum(f"_b{i}").alias(f"_b{i}") for i in range(bits)]
    )
    value = F.lit(0).cast("long")
    for i in range(bits):
        bit = -(1 << 63) if i == 63 else (1 << i)  # signed-long bit 63
        value = value.bitwiseOR(
            F.when(F.col(f"_b{i}") > 0, F.lit(bit).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return summed.select(id_col, value.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = 1000,
    warn_on_drop: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, hamming) via banded simhash.

    The 64-bit signature is split into ``max_hamming + 1`` contiguous
    bands; by pigeonhole, any pair within Hamming distance
    ``max_hamming`` agrees exactly on at least one band — so a
    band-equality self-join finds ALL qualifying pairs, then
    ``bit_count(xor)`` verifies the true distance.  Same hot-bucket cap
    rationale as MinHash-LSH: default ON (1000) so web-scale input
    fails safe instead of launching a quadratic self-join; pass
    ``max_bucket_size=None`` for exhaustive small-corpus runs.
    warn_on_drop: as in minhash_lsh_pairs — a RuntimeWarning (one extra
    job) whenever the cap actually drops a bucket group."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sigs = simhash(df, text_col, id_col)
    frames = []
    for bnd in range(n_bands):
        lo = bnd * width
        w = width if bnd < n_bands - 1 else 64 - lo  # last band absorbs the remainder
        mask = F.lit((1 << w) - 1 if w < 64 else -1).cast("long")
        key = F.shiftrightunsigned(F.col("simhash"), lo).bitwiseAND(mask)
        frames.append(
            sigs.select(
                F.col(id_col),
                F.col("simhash"),
                F.lit(bnd).alias("band"),
                key.alias("key"),
            )
        )
    b = frames[0]
    for f in frames[1:]:
        b = b.unionByName(f)
    if max_bucket_size is not None:
        b = _cap_buckets(
            b, ["band", "key"], max_bucket_size,
            "simhash_near_pairs", warn_on_drop,
        )
    left, right = b.alias("l"), b.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("_sa"),
            F.col("r.simhash").alias("_sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard within a blocking key — the
    verification primitive (quadratic per block; block wisely)."""
    sh = df.select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    a = sh.select(
        F.col("_blk"), F.col(id_col).alias("id_a"), F.col("_sh").alias("_sha")
    )
    b = sh.select(
        F.col("_blk"), F.col(id_col).alias("id_b"), F.col("_sh").alias("_shb")
    )
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair list — the step
    that turns pairwise evidence into dedup clusters.  Alternating
    large-star / small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): converges in O(log n) rounds even on
    chain-shaped duplicate graphs, where plain min-label propagation
    needs O(diameter) rounds and would not survive an adversarial
    boilerplate chain at web scale.  Each round is two hash-shuffle
    aggregations plus a checksum job; lineage is cut per round with
    ``localCheckpoint`` so the plan stays flat (at cluster scale point
    ``spark.checkpoint.dir`` at durable storage and swap ``checkpoint``
    in if executor loss matters more than the extra I/O).

    Returns ``(node, component)`` for every node that appears in
    ``pairs``; ``component`` is the smallest node id in the cluster.
    Isolated documents never enter the pair list and are implicitly
    their own component — ``near_dedup_survivors`` accounts for them.
    """
    spark = pairs.sparkSession
    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    if not edges.take(1):
        return spark.createDataFrame([], "node long, component long")

    def _checksum(e: DataFrame):
        row = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = None
    for _ in range(max_iterations):
        # large-star: every neighbor v > u links to min(N(u) ∪ {u})
        nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(F.min("v").alias("_mn"))
        m = F.least(F.col("_mn"), F.col("u"))
        edges = (
            nbrs.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .distinct()
        )
        # small-star: u and its smaller neighbors all link to the min
        mins = edges.groupBy("u").agg(F.min("v").alias("_mn"))
        down = edges.join(mins, "u").select(
            F.col("v").alias("u"), F.col("_mn").alias("v")
        )
        up = mins.select("u", F.col("_mn").alias("v"))
        edges = (
            down.union(up)
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — raise max_iterations (expected O(log n) rounds)"
        )
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return edges.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    ).union(roots)


def duplicate_window_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    hash_keys: bool = False,
) -> DataFrame:
    """(id, n_windows, n_dup_windows, dup_frac_r) — per-document
    duplicated-span signal in the style of ExactSubstr (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): the
    fraction of a document's rolling ``window``-token spans that occur
    verbatim more than once in the corpus (within-document repeats
    count — a span repeated twice in one doc is still duplicated
    text).  Suffix arrays give exact substrings on one machine; the
    distributed re-expression is rolling fixed-width windows, which
    upper-bound every duplicated substring of length >= window.

    100-TB shape: the duplicate-gram dictionary (only grams with
    count > 1 — tiny relative to the corpus) is built with one
    map-side-partial aggregate and localCheckpoint'ed; the per-doc dup
    count is a semi-join of the re-exploded grams against it.  Two
    gram-explode scans total, text never shuffles.

    ``hash_keys=True`` is the web-scale switch: the gram key becomes a
    pair of independent xxhash64 values (16 bytes, vs ~window×word
    bytes of literal string — 3-6x less exchange/aggregate width at
    window=8, more for long words), with identical output up to
    128-bit collisions (a false dup needs BOTH halves to collide:
    P ~ n^2/2^129, ~1e-24 at 10^12 windows).  The literal-key default
    stays exactly replayable by the external SQL oracle; the hashed
    variant is pytest-pinned equal to it."""
    grams = shingles(F.col(text_col), window)
    g = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    if hash_keys:
        g = g.select(
            F.col(id_col),
            F.xxhash64("gram").alias("_h1"),
            F.xxhash64(F.lit("dw2"), F.col("gram")).alias("_h2"),
        )
        keys = ["_h1", "_h2"]
    else:
        keys = ["gram"]
    dupg = (
        g.groupBy(*keys)
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .select(*keys)
        .localCheckpoint()
    )
    n_dup = (
        g.join(dupg, keys, "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_windows"))
    )
    base = df.select(
        F.col(id_col),
        F.greatest(
            F.size(_tokens(F.col(text_col))) - (window - 1), F.lit(0)
        )
        .cast("long")
        .alias("n_windows"),
    )
    return (
        base.join(n_dup, id_col, "left")
        .fillna({"n_dup_windows": 0})
        .select(
            id_col,
            "n_windows",
            "n_dup_windows",
            F.round(
                F.when(
                    F.col("n_windows") > 0,
                    F.col("n_dup_windows") / F.col("n_windows"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("dup_frac_r"),
        )
    )


def drop_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """ExactSubstr-style span REMOVAL (Lee et al. — the transform that
    `duplicate_window_stats` only measures): every rolling
    ``window``-token span occurring more than once in the corpus keeps
    its FIRST occurrence (lexicographically smallest (doc_id, pos))
    and has every other occurrence's tokens deleted; each document is
    rebuilt from its surviving tokens in order.

    Returns one row per input row:
    ``(id, text STRING, n_tokens_before LONG, n_tokens_removed LONG)``
    with the cleaned text space-joined.  Deterministic and partition-
    independent: the kept occurrence depends only on (doc_id, pos)
    order.  Overlapping duplicated spans union their masks (the
    suffix-array cut generalizes to interval union here), so a doc
    duplicated wholesale loses everything but any first-occurrence
    spans it owns.

    100-TB shape mirrors duplicate_window_stats: one (gram) hash
    aggregate keeps count + min-(doc,pos) — bounded per-group state —
    checkpointed at the duplicated subset (tiny vs the corpus); the
    mask join explodes only duplicated occurrences; the rebuild is a
    per-doc sort_array over surviving tokens (state bounded by doc
    length).  Text itself never shuffles — the corpus is tokenized in
    three map-side scans (grams, positions, counts) rather than
    checkpointing a corpus-sized token table.
    """
    W = int(window)
    if W < 2:
        raise ValueError("window must be >= 2")
    toks = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    tdf = df.select(F.col(id_col), toks.alias("_toks"))

    def build(tcol):
        # tcol is a lambda variable (bound once per row — see bind_once)
        k = F.greatest(F.size(tcol) - (W - 1), F.lit(0))
        return F.when(k <= 0, F.array()).otherwise(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.struct(
                    i.cast("long").alias("pos"),
                    F.concat_ws(
                        " ",
                        *[
                            F.element_at(tcol, (i + j + 1).cast("int"))
                            for j in range(W)
                        ],
                    ).alias("gram"),
                ),
            )
        )

    g = tdf.select(
        F.col(id_col), F.explode(bind_once(F.col("_toks"), build)).alias("_g")
    ).select(
        F.col(id_col), F.col("_g.pos").alias("pos"), F.col("_g.gram").alias("gram")
    )
    dup = (
        g.groupBy("gram")
        .agg(
            F.count("*").alias("_c"),
            F.min(F.struct(F.col(id_col).alias("_d"), F.col("pos").alias("_p")))
            .alias("_first"),
        )
        .where(F.col("_c") > 1)
        .select("gram", F.col("_first._d").alias("_fd"), F.col("_first._p").alias("_fp"))
        .localCheckpoint()
    )
    masked = (
        g.join(dup, "gram")
        .where(~((F.col(id_col) == F.col("_fd")) & (F.col("pos") == F.col("_fp"))))
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(W - 1))
            ).alias("_tokidx"),
        )
        .distinct()
    )
    posed = tdf.select(
        F.col(id_col), F.posexplode("_toks").alias("_tokidx", "_tok")
    ).withColumn("_tokidx", F.col("_tokidx").cast("long"))
    kept = (
        posed.join(masked, [id_col, "_tokidx"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_tokidx", "_tok"))
                    ),
                    lambda s: s["_tok"],
                ),
            ).alias("_clean"),
            F.count("*").alias("_n_kept"),
        )
    )
    base = tdf.select(
        F.col(id_col), F.size("_toks").cast("long").alias("n_tokens_before")
    )
    return (
        base.join(kept, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_clean"), F.lit("")).alias("text"),
            "n_tokens_before",
            (
                F.col("n_tokens_before")
                - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).cast("long").alias("n_tokens_removed"),
        )
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """End-to-end MinHash near-dedup: LSH candidate pairs →
    large-star/small-star clustering → one survivor (min id) per
    cluster.  The standard web-corpus dedup pipeline as one call;
    each stage is the scale-shaped primitive documented on its own
    function."""
    pairs = minhash_lsh_pairs(df, text_col=text_col, id_col=id_col, **lsh_kwargs)
    return near_dedup_survivors(df, pairs, id_col=id_col)


def decontaminate(
    df: DataFrame,
    probe_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination: drop every document sharing at least
    one word ``n``-gram with any probe text (the eval-set side).  The
    standard n=13 follows GPT-3's test-set filtering (Brown et al.
    2020, appendix C).

    Scale shape: the probe n-gram set is benchmark-sized (thousands),
    so it is broadcast — the corpus side is one generator explode, a
    broadcast LEFT SEMI join, a distinct on contaminated ids, and a
    broadcast anti-join back.  No all-pairs anything; corpus cost is
    one scan.
    """
    probe_text_col = probe_text_col or text_col
    probe_grams = (
        probe_df.select(
            F.explode(F.array_distinct(shingles(F.col(probe_text_col), n))).alias(
                "_g"
            )
        )
        .where(F.col("_g") != "")
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("_g"),
    )
    hit_ids = (
        doc_grams.join(F.broadcast(probe_grams), "_g", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(hit_ids, id_col, "left_anti")


def near_dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one document per near-duplicate cluster (the smallest id)
    plus every document that is in no cluster.  One anti-join against
    the loser set — the loser table is tiny relative to the corpus at
    any real duplication rate, so AQE turns this into a broadcast join."""
    comp = connected_components(pairs, id_a, id_b)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    line_sep: str = "\n",
) -> DataFrame:
    """Boilerplate-line removal (the C4 / RefinedWeb cleanup step):
    drop every line whose trimmed form appears in >= ``min_docs``
    distinct documents, preserving the order of surviving lines.

    Returns ``(id_col, text_col, lines_removed)`` — a document whose
    every line was boilerplate survives with empty text (filter on
    ``lines_removed``/length downstream if hollow docs should go).

    Scale shape: one explode (map-side), one hash aggregation on the
    trimmed line to find frequent lines, one join back (the frequent
    set is tiny at any real ``min_docs``, so AQE broadcasts it), one
    aggregation to reassemble.  Per-group state is the document's own
    lines — bounded by document size, never by corpus size.  Empty
    lines are never counted as boilerplate and are always kept.
    """
    # F.split takes a Java regex but concat_ws (and the kernel-side ops'
    # str.split) treat the separator literally — quote it so a
    # regex-special separator like "|" or "." splits on the literal
    # character instead of exploding the text per-char.  Mirror Java
    # Pattern.quote: a literal "\E" inside the separator would end the
    # \Q region early, so break out of the quote, emit an escaped \E,
    # and re-enter (\E\\E\Q), exactly like Pattern.quote does.
    quoted_sep = "\\Q" + line_sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), quoted_sep)
        ).alias("_pos", "_line"),
    )
    key = F.trim(F.col("_line"))
    freq = (
        lines.where(key != "")
        .groupBy(key.alias("_key"))
        .agg(F.count_distinct(id_col).alias("_docs"))
        .where(F.col("_docs") >= min_docs)
        .select("_key", F.lit(True).alias("_hit"))
    )
    marked = lines.join(freq, key == F.col("_key"), "left")
    rebuilt = marked.groupBy(id_col).agg(
        F.concat_ws(
            line_sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_hit").isNull(), F.struct("_pos", "_line")
                        )
                    )
                ),
                lambda s: s["_line"],
            ),
        ).alias(text_col),
        F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
        .cast("int")
        .alias("lines_removed"),
    )
    return df.select(id_col).join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce(F.col("lines_removed"), F.lit(0)).alias("lines_removed"),
    )
