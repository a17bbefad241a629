"""The search engine: plan -> DataFrame execution -> ranked hits.

Brute-force ("bm25") execution path — the oracle strategy, equivalent
to the reference's ``execution: "bm25"`` (wand.rs:459-566): score every
posting of every query term, sum per doc, global top-k.  In Spark:

    postings ⨝ broadcast(query-key info)      (pushed-down term IN scan)
             ⨝ docs (doc lengths, pruned columns)
      -> per-posting BM25 contribution (whole-stage-codegen'd column)
      -> groupBy(doc_id): score sum + matched-group set
      -> matcher predicate + filters
      -> ORDER BY score DESC, doc_id ASC LIMIT k

The WAND/BMW paths (see ``wand.py``) share everything but the scoring
scan, which they replace with a block-max-pruned kernel over the
packed ``blocks`` table.

Tie-break parity: score desc, doc_id asc (wand.rs:16-43,905-926).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, functions as F, types as T

from searchlite_spark.index.catalog import Index

_LOG = logging.getLogger(__name__)

# the failure shapes of Observation.get when AQE's empty-relation
# propagation elided the CollectMetrics node: a Py4J error from
# getRow/toPyRow (observed: java.lang.AssertionError inside toPyRow),
# PySpark's no-observe assertion, or KeyError for a metrics row
# without the expected column.  Anything else propagates.
_ObservationUnavailable: tuple = (KeyError,)
try:  # pragma: no cover - import shapes differ across pyspark builds
    from py4j.protocol import Py4JError as _Py4JError

    _ObservationUnavailable += (_Py4JError,)
except ImportError:  # pragma: no cover
    pass
try:  # pragma: no cover
    from pyspark.errors import PySparkAssertionError as _PySparkAssertionError

    _ObservationUnavailable += (_PySparkAssertionError,)
except ImportError:  # pragma: no cover
    pass
from searchlite_spark.query import plan as P
from searchlite_spark.query.bm25 import B_DEFAULT, K1_DEFAULT
from searchlite_spark.query.expand import DictionaryExpander, expand_groups
from searchlite_spark.query.filters import compile_filters
from searchlite_spark.query.matching import (
    matcher_col,
    matcher_score_fields,
    may_match_empty,
)
from searchlite_spark.query.planner import build_query_plan, expand_phrases

DEFAULT_LIMIT = 10


# --------------------------------------------------------------------------
# score expression -> Column over leaf columns


def score_col(expr, leaf_map: Column | None) -> Column:
    """Evaluate the score tree.  ``leaf_map`` is a MAP<int, double> of
    per-leaf sums (None on the pure-sum fast path, where the caller
    already summed)."""
    if expr is None:
        return F.lit(0.0)
    if isinstance(expr, P.ScoreLeaf):
        return F.coalesce(leaf_map.getItem(expr.leaf), F.lit(0.0))
    if isinstance(expr, P.ScoreSum):
        return sum((score_col(c, leaf_map) for c in expr.children), F.lit(0.0))
    if isinstance(expr, P.ScoreDisMax):
        children = [score_col(c, leaf_map) for c in expr.children]
        if len(children) == 1:
            return children[0]
        mx = F.greatest(*children)
        total = sum(children, F.lit(0.0))
        # max + tie * (sum - max)  (planner.rs:131-153)
        return mx + F.lit(expr.tie_breaker) * (total - mx)
    raise ValueError(f"unknown score expr {type(expr)}")


# --------------------------------------------------------------------------


class Searcher:
    def __init__(self, index: Index):
        self.index = index
        self.spark = index.spark
        self.schema = index.schema
        self.stats = index.stats
        # docstore = full stored fields, read lazily with doc_id
        # pushdown only for the ranked top-k window.  docs = the slim
        # fast-field projection (everything but the text blobs), the
        # only part pinned in executor memory — at 100 TB the raw text
        # dwarfs the metadata and must never be cached whole.
        self.docstore = index.docs()
        self.postings = index.postings()
        # tombstones (in-place deletes, maintenance.tombstone_delete):
        # filtering the docstore/postings VIEWS here makes every path —
        # brute scoring, phrases, aggs, sorts, docstore fetch, the
        # kernel's seed job — tombstone-free with one broadcast
        # anti-join; the WAND/BMW kernel masks decoded ids via a
        # bucket-cogrouped tombstone DataFrame (blocks are packed, not
        # row-filterable).  The set never rides a per-query Python
        # closure; the broadcast exchange does stage it on the driver
        # once, but tombstone_delete's MAX_TOMBSTONES = 1M cap bounds
        # that at ~8 MB (beyond the cap the index must compact), so the
        # explicit hint can't hit the broadcast size limit.  The
        # cogroup kernel path is fully executor-side.  BM25 stats stay
        # the snapshot's (reference semantics: tombstones apply at
        # merge).
        self._tombstones: DataFrame | None = None
        if index.has_tombstones():
            tomb = F.broadcast(index.tombstones().select("doc_id").distinct())
            self._tombstones = tomb
            self.docstore = self.docstore.join(tomb, "doc_id", "left_anti")
            self.postings = self.postings.join(tomb, "doc_id", "left_anti")
        text_cols = set(self.schema.text_field_names) & set(self.docstore.columns)
        fast_cols = [c for c in self.docstore.columns if c not in text_cols]
        self.docs = self.docstore.select(*fast_cols).persist()
        self.terms = index.terms().persist()
        self.blocks = index.blocks() if index.has_blocks() else None
        self.expander = DictionaryExpander(self.terms)
        # per-index scoring parameters from the manifest (the
        # reference's IndexOptions bm25_k1/bm25_b, api/types.rs:20-21;
        # the reader inherits them at open, reader.rs:1895-1910).
        # Every scoring path reads these fields — brute column expr,
        # WAND/BMW kernel (passed at wand_topk call), batch execution,
        # and the θ-cache key — so one index can run k1/b different
        # from another with zero layout change.
        _opts = index.options
        self.k1 = float(_opts.get("bm25_k1", K1_DEFAULT))
        self.b = float(_opts.get("bm25_b", B_DEFAULT))
        # index generation for cursor staleness checks (the reference
        # rejects cursors from another index generation,
        # reader.rs:821-869): the manifest's per-build uuid when present
        # (unique even for same-second, same-count rebuilds); older
        # manifests fall back to built_at + doc count
        lineage = (index.manifest or {}).get("lineage", {})
        self.generation = lineage.get("build_id") or (
            f"{lineage.get('built_at')}/{self.stats.get('n_docs')}"
        )
        self.last_execution: str | None = None
        # immutable-snapshot term-stats cache {term: (df, max_tf)} — the
        # reference caches term stats in its readers the same way; a
        # repeated-term query costs zero dictionary jobs
        self._term_stats: dict[str, tuple[int, int]] = {}
        self.last_wand_counters: dict | None = None
        # plan cache {canonical request json: (DataFrame, candidates)} —
        # DataFrames are immutable logical plans over an immutable
        # snapshot, so the ~0.3 s of py4j plan construction per query
        # (875 gateway round-trips measured) is paid once per distinct
        # request.  Results are NOT cached; every action re-executes.
        self._plan_cache: dict[str, tuple[DataFrame, int]] = {}
        # seed-θ cache for the WAND/BMW kernel: θ depends only on the
        # seed term's (immutable) postings + (weight, k, k1, b)
        self._theta_cache: dict[tuple, float] = {}

    # -- public API -----------------------------------------------------

    def search(self, request: dict) -> dict:
        """Full search: returns the reference-shaped response dict
        (hits, total, collapse groups, rescore, highlight, suggest,
        aggregations)."""
        from searchlite_spark.query import postprocess as PP
        from searchlite_spark.query.validate import validate_request

        # contract gate (search-request.schema.json mirror): reject
        # unknown/wrong-typed blocks BEFORE any job is planned
        validate_request(request)
        limit = int(request.get("limit", DEFAULT_LIMIT))
        if limit <= 0:
            raise ValueError("limit must be > 0")
        request = self._resolve_opaque_cursor(request)
        import time as _time

        self._profile_t0 = _time.time()
        self._last_candidates = 0
        self.last_wand_counters = None  # search() is the brute path
        scored = self._matched_scored_cached(request)
        # exact-total fold (reference: single-pass accept-hook counting,
        # reader.rs:3009-3036): observe() rides the match count on the
        # top-k job instead of a dedicated count() pass — one fewer job
        # and one fewer full evaluation of the match set per search.
        # Valid because the first action is always a global sort/top-k
        # or a collapse aggregate, which must consume every row.
        obs = None
        if request.get("track_total_hits", True) is True:
            from pyspark.sql import Observation

            obs = Observation()
            scored = scored.observe(obs, F.count(F.lit(1)).alias("n"))
        scored = scored.persist()
        try:
            return self._finish_search(request, scored, limit, PP, obs)
        finally:
            scored.unpersist()

    def _finish_search(self, request, scored, limit, PP, obs=None):
        sort = request.get("sort")
        # track_total_hits: True (default, reference parity) = exact
        # count (folded into the first job via observe); False = skip
        # the full-match-set aggregation entirely; int N = count capped
        # at N ("at least N" semantics).  At 100 TB an unconditional
        # exact total makes every `limit 10` query pay a full scan —
        # this is the opt-out.
        tth = request.get("track_total_hits", True)
        if tth is True:
            total = None if obs is not None else scored.count()
        elif tth is False:
            total = None
        else:
            total = scored.limit(int(tth)).count()
        resp = {"total_hits_estimate": total}
        # aggregations stream over EVERY matched doc, pre-collapse
        # (reader.rs: collector runs in accept(); collapse at 2829)
        full_match_set = scored

        # reference pipeline order (reader.rs:2786-2860): cursor skip
        # during collection -> sort -> RESCORE -> COLLAPSE -> truncate.
        # Collapse therefore groups the RESCORED hits: a window hit
        # whose combined score beats its group's original best becomes
        # the representative.
        search_after = request.get("search_after")
        if search_after:
            scored = self._apply_search_after(scored, sort, search_after)
        ordered = self._apply_sort(scored, sort, keep_keys=True)
        group_order_exprs = None
        if request.get("rescore"):
            combined = PP.rescore_hits(self, ordered, request["rescore"], limit)
            ordered = combined.orderBy(
                F.desc("_win"),
                F.col("score").cast("float").desc(),
                F.asc("doc_id"),
            )
            # first-occurrence position encoding for collapse group
            # ordering (reference: groups emitted in first-member
            # order — window block ahead, then the main key)
            group_order_exprs = [
                F.when(F.col("_win"), F.lit(0)).otherwise(F.lit(1)),
                -F.col("score").cast("float"),
                F.col("doc_id"),
            ]
            if not request.get("collapse") and not request.get("explain"):
                # explain needs window membership per returned hit (the
                # rescore breakdown attaches only to re-scored hits)
                ordered = ordered.drop("_win")
        inner_df = None
        collapse = request.get("collapse")
        if collapse:
            inner_cfg = collapse.get("inner_hits") or {}
            rep_cols = self._carried_sort_cols(sort)
            reps, inner_df = PP.collapse_hits(
                self,
                ordered,
                collapse["field"],
                rep_cols,
                int(inner_cfg.get("size", 0) or 0),
                int(inner_cfg.get("from", 0) or 0),
                group_order_exprs=group_order_exprs,
            )
            # total_groups follows the same opt-out as total_hits — an
            # unconditional reps.count() was a second full job per
            # collapse query even when the caller never reads it
            if tth is not False:
                resp["total_groups"] = reps.count()
            keep_win = ("_win",) if request.get("explain") else ()
            drop_cols = [
                c
                for c in ("_win", "_gpos")
                if c in reps.columns and c not in keep_win
            ]
            if group_order_exprs is not None:
                ordered = reps.orderBy(
                    F.col("_gpos").asc(), F.col("doc_id").asc()
                ).drop(*drop_cols)
            else:
                ordered = reps.orderBy(*rep_cols).drop(*drop_cols)
        # collect the ranked window first (order is authoritative), then
        # fetch stored fields for just those ids and merge in order —
        # avoids a re-sort after the docs join disturbing rescore's
        # window-block ordering
        top_rows = ordered.limit(limit).collect()
        if obs is not None:
            # the top-k (or collapse) job has run; the observed count is
            # final.  get blocks only until the first action completed.
            # Corner: AQE empty-relation propagation can elide the
            # CollectMetrics node entirely (observed plan optimized to a
            # LocalTableScan) — then get's row conversion fails and the
            # count falls back to a count() of the FULL match set
            # (`full_match_set`, not `scored`, which collapse /
            # search_after may have rebound to a narrower frame).
            try:
                total = int(obs.get["n"])
            except _ObservationUnavailable as exc:
                # only the metrics-retrieval failures reach here: the
                # top-k action itself already succeeded at .collect()
                # above, so a Py4J error on obs.get is the elided
                # CollectMetrics, not a job failure.  Anything else
                # (TypeError, a planner bug) propagates.
                _LOG.warning(
                    "observe() metrics unavailable (%s: %s); falling "
                    "back to a full match-set count job",
                    type(exc).__name__, exc,
                )
                total = full_match_set.count()
            resp["total_hits_estimate"] = total
        ids = [r["doc_id"] for r in top_rows]
        field_rows = {
            r["doc_id"]: r.asDict()
            for r in self.docstore.where(F.col("doc_id").isin(ids)).collect()
        }
        rows = []
        for r in top_rows:
            d = dict(field_rows.get(r["doc_id"], {}))
            d.update(r.asDict())
            rows.append(d)

        # highlight setup: per-field query tokens + phrase buckets
        hl = request.get("highlight")
        hl_field = request.get("highlight_field")
        hl_terms, hl_phrases = None, None
        if hl or hl_field:
            hl_terms, hl_phrases = self._highlight_inputs(request)

        # inner hits for the returned groups only
        inner_map = {}
        if inner_df is not None and rows:
            keys = [r.get("_ckey") for r in rows if r.get("_ckey") is not None]
            irows = (
                inner_df.where(F.col("_ckey").isin(keys))
                .select("doc_id", "score", "_ckey")
                .collect()
            )
            for r in irows:
                inner_map.setdefault(r["_ckey"], []).append(
                    {"doc_id": r["doc_id"], "score": r["score"]}
                )

        hits = []
        for r in rows:
            d = {k: v for k, v in r.items() if not k.startswith("_sk_")}
            ckey = d.pop("_ckey", None)
            win = d.pop("_win", None)
            hit = {
                "doc_id": d.pop("doc_id"),
                "score": d.pop("score", None),
                "fields": d,
            }
            if win is not None:
                hit["_rescore_win"] = bool(win)
            if ckey is not None:
                hit["collapse_key"] = ckey
                if inner_map:
                    hit["inner_hits"] = inner_map.get(ckey, [])
            if hl:
                fields_cfg = hl.get("fields") or {
                    f: {} for f in self.schema.text_field_names
                }
                frags = {}
                for fname, cfg in fields_cfg.items():
                    text = d.get(fname)
                    if not isinstance(text, str):
                        continue
                    out = PP.highlight_fragments(
                        text,
                        hl_terms.get(fname, []),
                        hl_phrases.get(fname, []),
                        cfg.get("pre_tag", hl.get("pre_tag", "<em>")),
                        cfg.get("post_tag", hl.get("post_tag", "</em>")),
                        int(cfg.get("fragment_size", hl.get("fragment_size", 160))),
                        int(cfg.get("number_of_fragments",
                                    hl.get("number_of_fragments", 3))),
                    )
                    if out:
                        frags[fname] = out
                if frags:
                    hit["highlight"] = frags
            if hl_field:
                text = d.get(hl_field)
                if isinstance(text, str):
                    snip = PP.make_snippet(
                        text,
                        hl_terms.get(hl_field, []),
                        hl_phrases.get(hl_field, []),
                    )
                    if snip:
                        hit["snippet"] = snip
            hits.append(hit)
        resp["hits"] = hits

        aggs = request.get("aggs") or request.get("aggregations")
        if aggs:
            from searchlite_spark.query.aggs import (
                run_aggregations,
                validate_aggregations,
            )

            # full config validation BEFORE any job runs
            # (reader.rs:3641-3718 matrix)
            validate_aggregations(self.schema, aggs)
            resp["aggregations"] = run_aggregations(
                full_match_set, self.docs, aggs
            )

        if request.get("profile"):
            import time as _time

            # reference profile counters (reader.rs:115-129):
            # scored_docs / candidates_examined / search_ms, plus the
            # WAND/BMW pruning counters when a kernel execution ran
            prof = {
                "total_matches": total,
                "returned": len(hits),
                "scored_docs": total,
                "candidates_examined": getattr(self, "_last_candidates", 0),
                "search_ms": round(
                    (_time.time() - getattr(self, "_profile_t0", _time.time()))
                    * 1000.0,
                    1,
                ),
            }
            if self.last_wand_counters:
                try:
                    prof["pruning"] = {
                        k: int(v.value) for k, v in self.last_wand_counters.items()
                    }
                except Exception:
                    pass
            resp["profile"] = prof
        if hits:
            # cursor = the last hit's sort-key tuple + doc_id; feeding it
            # back as `search_after` resumes exactly after this page on
            # any sort plan (reader.rs sort-path cursors).  Values come
            # from the COMPUTED _sk_<i> columns carried through the sort
            # (not the docstore row — the sort field may not be stored).
            cursor = []
            last = rows[-1]
            for i, (fld, order) in enumerate(self._sort_specs(sort)):
                if fld == "_score":
                    cursor.append(hits[-1]["score"])
                elif f"_sk_{i}" in last:
                    cursor.append(last[f"_sk_{i}"])
                else:  # fallback (rescore may rebuild the frame)
                    v = last.get(fld)
                    if isinstance(v, list):
                        vv = [x for x in v if x is not None]
                        v = (min(vv) if order == "asc" else max(vv)) if vv else None
                    cursor.append(v)
            cursor.append(hits[-1]["doc_id"])
            resp["next_search_after"] = cursor
            # generation-tagged cursor (reader.rs:821-869 staleness
            # check): feed THIS dict back as `search_after` to get a
            # stale-cursor error after a rebuild instead of silent
            # garbage; the plain list stays accepted unchecked
            resp["cursor"] = {"values": cursor, "generation": self.generation}
            # opaque wire cursor (reader.rs:614-901): 21-byte hex on the
            # pure-relevance fast path, hex-JSON sort state otherwise;
            # validated on the way back in (generation, plan_hash, 50k
            # depth cap).  `returned` accumulates across pages so the
            # depth cap can fire.
            from searchlite_spark.query.cursor import CursorError, encode_cursor

            specs = self._sort_specs(sort)
            try:
                resp["next_cursor"] = encode_cursor(
                    self.generation,
                    getattr(self, "_cursor_returned", 0) + len(hits),
                    cursor[:-1],
                    cursor[-1],
                    specs,
                    score_fast_path=(specs == [("_score", "desc")]),
                )
            except CursorError:
                # a sort value type the wire format can't carry (e.g. a
                # timestamp column): the list/dict cursors above still
                # paginate; only the opaque form is unavailable
                pass

        if request.get("explain") and hits:
            self._attach_explanations(request, hits)

        suggest = request.get("suggest")
        if suggest:
            out = {}
            for name, cfg in suggest.items():
                if cfg.get("type", "completion") != "completion":
                    raise ValueError("only completion suggesters are supported")
                out[name] = {
                    "options": PP.suggest_completion(
                        self,
                        cfg["field"],
                        cfg["prefix"],
                        int(cfg.get("size", 5)),
                        cfg.get("fuzzy"),
                    )
                }
            resp["suggest"] = out
        return resp

    def _function_explanations(self, query, ids) -> dict[int, list[dict]]:
        """doc_id -> [FunctionExplanation] for every function_score
        function in ``query``'s plan that EVALUATED for the doc
        (reader.rs:389-414 describe_function: type + value + field;
        inactive functions — unmatched filter, missing field — are
        omitted, matching tests/function_score.rs:189-226 where the
        non-matching doc has an EMPTY functions list).  One bounded job
        over the returned ids only; {} when the plan has no functions."""
        plan, _ = build_query_plan({"query": query}, self.schema)
        fs_nodes: list[P.SNFunctionScore] = []

        def walk(node):
            if node is None:
                return
            if isinstance(node, P.SNFunctionScore):
                fs_nodes.append(node)
                walk(node.base)
            elif isinstance(node, (P.SNSum, P.SNDisMax)):
                for c in node.children:
                    walk(c)

        walk(plan.score_node)
        if not fs_nodes:
            return {}
        from searchlite_spark.query.scoring import _function_col

        docs = self.docs.where(F.col("doc_id").isin(ids))
        cols, labels = [], []
        for ni, node in enumerate(fs_nodes):
            for fi, spec in enumerate(node.functions):
                cols.append(_function_col(spec, docs).alias(f"_f_{ni}_{fi}"))
                labels.append((f"_f_{ni}_{fi}", spec))
        out: dict[int, list[dict]] = {}
        for r in docs.select("doc_id", *cols).collect():
            fns = []
            for col, spec in labels:
                val = r[col]
                if val is None:
                    continue  # inactive for this doc — omitted
                d = {"type": spec.get("type"), "value": float(val)}
                if spec.get("field"):
                    d["field"] = spec["field"]
                fns.append(d)
            out[r["doc_id"]] = fns
        return out

    @staticmethod
    def _unwrap_score_mutators(query):
        """The query with top-level function_score / script_score
        wrappers peeled off — its score is the reference's
        ``base_score`` (the score-plan combination before function and
        script application, reader.rs:3058-3062)."""
        changed = False
        while (
            isinstance(query, dict)
            and query.get("type") in ("function_score", "script_score")
            and query.get("query") is not None
        ):
            query = query["query"]
            changed = True
        return query, changed

    def _attach_explanations(self, request, hits) -> None:
        """Per-hit HitExplanation in the reference's wire shape
        (reader.rs:90-97): ``base_score`` (before function/script/
        rescore), ``functions`` (only the ones that evaluated, omitted
        when empty — serde skip_serializing_if), optional ``rescore``
        (rescore_score + combined_score + the rescore query's function
        details, reader.rs:3366-3382; attached only to hits the rescore
        window actually re-scored), ``final_score``.  Every job here
        filters to the <=limit returned ids (isin pushdown)."""
        from searchlite_spark.localrel import local_df

        ids = [h["doc_id"] for h in hits]

        base_q, wrapped = self._unwrap_score_mutators(request.get("query"))
        base_map: dict[int, float] = {}
        if wrapped or request.get("rescore"):
            base_req = {"query": base_q}
            if request.get("fuzzy"):
                base_req["fuzzy"] = request["fuzzy"]
            ids_df = local_df(
                self.spark, [(int(i),) for i in ids], "doc_id LONG"
            )
            base_map = {
                r["doc_id"]: float(r["score"])
                for r in self._matched_scored(
                    base_req, doc_subset=ids_df
                ).collect()
            }

        fn_map = self._function_explanations(request.get("query"), ids)

        resc_req = request.get("rescore")
        rs_map: dict[int, float] = {}
        rs_fn_map: dict[int, list[dict]] = {}
        if resc_req:
            ids_df = local_df(
                self.spark, [(int(i),) for i in ids], "doc_id LONG"
            )
            rs_map = {
                r["doc_id"]: float(r["score"])
                for r in self._matched_scored(
                    {"query": resc_req["query"]}, doc_subset=ids_df
                ).collect()
            }
            rs_fn_map = self._function_explanations(resc_req["query"], ids)

        for h in hits:
            did = h["doc_id"]
            final = h.get("score")
            in_window = h.pop("_rescore_win", None)
            expl = {
                "base_score": base_map.get(did, final),
                "final_score": final,
            }
            fns = fn_map.get(did) or []
            if fns:
                expl["functions"] = fns
            # only hits the rescore window re-scored carry the rescore
            # breakdown (reader.rs:3364-3382); _win is threaded through
            # materialization when explain is on
            if resc_req and in_window and did in rs_map:
                resc = {
                    "rescore_score": rs_map[did],
                    "combined_score": final,
                }
                rfns = rs_fn_map.get(did) or []
                if rfns:
                    resc["functions"] = rfns
                expl["rescore"] = resc
            h["explanation"] = expl

    def _highlight_inputs(self, request):
        """Per-field query tokens and phrase buckets for highlighting
        (reader.rs:3415-3485 wiring)."""
        plan, builder = build_query_plan(request, self.schema)
        groups, qualified = expand_groups(
            builder, self.schema, self.expander, request.get("fuzzy")
        )
        phrase_specs = expand_phrases(builder, self.schema)
        terms: dict[str, list[str]] = {}
        for qt in qualified:
            tok = qt.key.split(":", 1)[1]
            lst = terms.setdefault(qt.field, [])
            if tok not in lst:
                lst.append(tok)
        phrases: dict[str, list[list[str]]] = {}
        for spec in phrase_specs:
            for fname, buckets in spec.field_tokens.items():
                seq = [alts[0] for alts in buckets if alts]
                if seq:
                    phrases.setdefault(fname, []).append(seq)
        return terms, phrases

    def search_df(
        self, request: dict, with_total: bool = False
    ) -> DataFrame | tuple[DataFrame, int | None]:
        """Ranked hits as a DataFrame (doc_id, score, <doc fields>)."""
        from searchlite_spark.query.validate import validate_request

        validate_request(request)
        if int(request.get("limit", DEFAULT_LIMIT)) <= 0:
            raise ValueError("limit must be > 0")
        request = self._resolve_opaque_cursor(request)
        scored = self._matched_scored_cached(request)
        limit = int(request.get("limit", DEFAULT_LIMIT))
        total = scored.count() if with_total else None

        sort = request.get("sort")
        if request.get("search_after"):
            scored = self._apply_search_after(
                scored, sort, request["search_after"]
            )
        ordered = self._apply_sort(scored, sort)
        top = ordered.limit(limit)
        out = top.join(self.docstore, "doc_id", "left").orderBy(
            *self._sort_cols(sort)
        )
        if with_total:
            return out, total
        return out

    def match_set(self, request: dict) -> DataFrame:
        """All matching (doc_id, score) — the aggregation input."""
        return self._matched_scored_cached(request)

    def _matched_scored_cached(self, request: dict) -> DataFrame:
        import json as _json

        try:
            # k1/b are public tuning attributes baked into the cached
            # plan's BM25 expressions — key on them too
            key = f"{self.k1}/{self.b}|" + _json.dumps(
                request, sort_keys=True, default=str
            )
        except TypeError:
            return self._matched_scored(request)
        hit = self._plan_cache.get(key)
        if hit is not None:
            df, cand = hit
            self._last_candidates = cand
            return df
        df = self._matched_scored(request)
        if len(self._plan_cache) >= 256:  # bounded; snapshot never changes
            self._plan_cache.pop(next(iter(self._plan_cache)))
        self._plan_cache[key] = (df, getattr(self, "_last_candidates", 0))
        return df

    def topk(self, request: dict, k: int | None = None) -> DataFrame:
        """Top-k (doc_id, score) with execution routing: "wand"/"bmw"
        (default) use the block-max pruned kernel when the query shape
        allows (pure disjunctive BM25 — the reference's default path);
        "bm25" forces the brute-force scorer (wand.rs:398-456
        strategy selection).  ``self.last_execution`` records the path
        taken ("wand"/"bmw"/"brute") for assertions and profiling."""
        if k is None:
            k = int(request.get("limit", DEFAULT_LIMIT))
        execution = (request.get("execution") or "bmw").lower()
        self.last_execution = "brute"
        if execution in ("wand", "bmw") and self.index.has_blocks():
            routed = self._try_wand(request, k, execution)
            if routed is not None:
                self.last_execution = execution
                return routed
        m = self.match_set(request)
        return (
            m.orderBy(F.col("score").cast("float").desc(), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "score")
        )

    def wand_profile(self) -> dict:
        """Pruning counters from the last kernel-routed topk — valid
        after the returned DataFrame has been consumed (accumulators
        update on task completion).  Mirrors the reference's
        scored_docs / candidates_examined surface (wand.rs:45-50)."""
        if not self.last_wand_counters:
            return {}
        return {name: acc.value for name, acc in self.last_wand_counters.items()}

    def _try_wand(self, request: dict, k: int, mode: str) -> DataFrame | None:
        from searchlite_spark.query.wand import wand_topk

        plan, builder = build_query_plan(request, self.schema)
        m = plan.matcher
        if isinstance(m, P.QueryStringMatcher):
            if m.phrase_groups or m.not_term_groups or not m.term_groups:
                return None
            if (m.minimum_should_match or 1) > 1:
                return None
        elif not isinstance(m, P.TermGroupRef):
            # a bare scored term/prefix/wildcard group is an OR-of-one —
            # WAND-eligible; anything else stays on the brute path
            return None
        if plan.root_filter or not P.is_pure_sum(plan.score_expr):
            return None
        if P.needs_score_hook(plan.score_node):
            return None
        groups, qualified = expand_groups(
            builder, self.schema, self.expander, request.get("fuzzy")
        )
        if not qualified:
            return self._empty_hits()
        # summed weight per key (reader.rs:2971-2983)
        weights: dict[str, float] = {}
        fields: dict[str, str] = {}
        for qt in qualified:
            weights[qt.key] = weights.get(qt.key, 0.0) + qt.weight
            fields[qt.key] = qt.field
        stats = self._term_stats_for(sorted(weights))
        key_meta = {
            k: {
                "weight": weights[k],
                "df": stats[k][0],
                "max_tf": stats[k][1],
                "field": fields[k],
            }
            for k in weights
            if stats[k][0] > 0
        }
        if not key_meta:
            return self._empty_hits()
        sc = self.spark.sparkContext
        self.last_wand_counters = {
            "blocks_candidate": sc.accumulator(0),
            "blocks_decoded": sc.accumulator(0),
            "docs_scored": sc.accumulator(0),
        }
        return wand_topk(
            self.spark,
            self.blocks,
            key_meta,
            self.stats["n_docs"],
            self.stats["avgdl"],
            k,
            mode=mode,
            k1=self.k1,
            b=self.b,
            postings=self.postings,
            counters=self.last_wand_counters,
            theta_cache=self._theta_cache,
            exclude=self._tombstones,
        )

    # -- core -----------------------------------------------------------

    def _matched_scored(
        self,
        request: dict,
        doc_subset: DataFrame | None = None,
        keep_dropped: bool = False,
    ) -> DataFrame:
        """doc_subset: restrict evaluation to these doc_ids (rescore
        window).  keep_dropped: emit score=NULL for hits the score hook
        drops instead of filtering them (rescore needs to distinguish
        matched-but-dropped from not-matched)."""
        plan, builder = build_query_plan(request, self.schema)
        groups, qualified = expand_groups(
            builder, self.schema, self.expander, request.get("fuzzy")
        )
        phrase_specs = expand_phrases(builder, self.schema)
        plan.term_groups = groups
        plan.qualified_terms = qualified
        plan.phrase_specs = phrase_specs

        execution = (request.get("execution") or "bm25").lower()
        needs_score = plan.score_expr is not None

        # ---- per-key info table (tiny; broadcast) ----
        key_groups: dict[str, list[int]] = {}
        for g in groups:
            for k in g.keys:
                key_groups.setdefault(k, []).append(g.group_id)
        # duplicate keys sum weights; leaf is consistent per key
        # (reader.rs:2971-2983)
        key_weight: dict[str, tuple[float, int, str]] = {}
        for qt in qualified:
            if qt.key in key_weight:
                w, leaf, fld = key_weight[qt.key]
                key_weight[qt.key] = (w + qt.weight, leaf, fld)
            else:
                key_weight[qt.key] = (qt.weight, qt.leaf, qt.field)
        all_keys = sorted(set(key_groups) | set(key_weight))

        # ---- phrase matches ----
        phrases_df = None
        live_phrases = [p for p in phrase_specs if p.field_tokens]

        # Vacuous-matcher fast path: for a plain scored OR (msm<=1, no
        # phrases/negation/hook, every scanned key belongs to a positive
        # group) the matcher predicate "matched >= 1 group" is true for
        # EVERY row the postings scan produced — so group tracking is
        # dead weight.  Skipping it turns the ObjectHashAggregate
        # (collect_list of group ids shipped through the shuffle per
        # posting) into a whole-stage-codegen'd sum aggregate: smaller
        # shuffle payload and a codegen'd hot loop — the thing you want
        # at 100 TB, measured ~25% faster at sf0.1 too.
        simple_shape = (
            bool(all_keys)
            and not live_phrases
            and not may_match_empty(plan.matcher)
            and needs_score
            and P.is_pure_sum(plan.score_expr)
            and not P.needs_score_hook(plan.score_node)
        )
        vacuous = simple_shape and self._matcher_vacuous(
            plan.matcher, key_groups, all_keys
        )
        conj_need = (
            self._matcher_conjunctive(plan.matcher, key_groups, all_keys)
            if (simple_shape and not vacuous)
            else None
        )
        # Negation fast path (scored OR + pure NOT, e.g. "spark -query"):
        # instead of scanning positive AND negative keys into one
        # ObjectHashAggregate that collects group-id arrays per doc, run
        # the positive keys through the vacuous codegen'd sum aggregate
        # and LEFT ANTI join the negative keys' doc ids (guide §2.7
        # anti-join shape; everything stays whole-stage codegen).  The
        # anti join reuses the aggregate's doc_id partitioning, so only
        # the negative doc ids shuffle.  Exact same matched set: the
        # matcher is (>=1 positive group) AND (no negative group), and
        # each side is evaluated by its own scan.
        neg_keys: list[str] | None = None
        if simple_shape and not vacuous and conj_need is None:
            neg_keys = self._matcher_negation_split(
                plan.matcher, key_groups, all_keys
            )
        if neg_keys is not None:
            pos_keys = [k for k in all_keys if k not in set(neg_keys)]
            key_rows = self._key_info_rows(pos_keys, key_groups, key_weight)
            # profile parity: candidates_examined counts EVERY scanned
            # key's postings, negative ones included
            stats = self._term_stats_for(all_keys)
            self._last_candidates = int(sum(v[0] for v in stats.values()))
            cand = self.postings.where(F.col("term").isin(pos_keys)).select(
                "doc_id", "term", "tf", "dl"
            )
            if doc_subset is not None:
                cand = cand.join(F.broadcast(doc_subset), "doc_id", "left_semi")
            scored = self._score_candidates(
                cand, key_rows, needs_score, plan, group_mode="none"
            )
            neg_docs = self.postings.where(
                F.col("term").isin(sorted(neg_keys))
            ).select("doc_id")
            matched = scored.join(neg_docs, "doc_id", "left_anti")
            if plan.root_filter:
                needed_cols = self._needed_doc_columns(plan)
                if needed_cols:
                    matched = matched.join(
                        self.docs.select("doc_id", *sorted(needed_cols)),
                        "doc_id",
                        "left",
                    )
                matched = matched.where(
                    compile_filters(matched, plan.root_filter)
                )
            return matched.select(
                "doc_id", F.coalesce(F.col("_score"), F.lit(0.0)).alias("score")
            )

        scored = None
        if all_keys:
            key_rows = self._key_info_rows(all_keys, key_groups, key_weight)
            cand = self.postings.where(F.col("term").isin(all_keys)).select(
                "doc_id", "term", "tf", "dl"
            )
            if doc_subset is not None:
                cand = cand.join(F.broadcast(doc_subset), "doc_id", "left_semi")
            group_mode = (
                "none" if vacuous else ("count" if conj_need else "full")
            )
            scored = self._score_candidates(
                cand, key_rows, needs_score, plan, group_mode=group_mode
            )

        if vacuous or conj_need:
            matched = scored
            if conj_need:
                # pure AND of term groups: a doc qualifies iff it
                # matched every group — codegen'd count, no group arrays
                matched = matched.where(
                    F.col("_ng") == F.lit(int(conj_need))
                ).drop("_ng")
            if plan.root_filter:
                needed_cols = self._needed_doc_columns(plan)
                if needed_cols:
                    matched = matched.join(
                        self.docs.select("doc_id", *sorted(needed_cols)),
                        "doc_id",
                        "left",
                    )
                matched = matched.where(
                    compile_filters(matched, plan.root_filter)
                )
            return matched.select(
                "doc_id", F.coalesce(F.col("_score"), F.lit(0.0)).alias("score")
            )

        if live_phrases:
            phrases_df = self._phrase_matches(live_phrases)

        # ---- assemble per-doc row set ----
        full_scan = may_match_empty(plan.matcher)
        if full_scan:
            base = self.docs.select("doc_id")
            if doc_subset is not None:
                base = base.join(F.broadcast(doc_subset), "doc_id", "left_semi")
            if scored is not None:
                base = base.join(scored, "doc_id", "left")
            else:
                base = base.withColumn("_groups", F.array().cast("array<int>"))
                base = base.withColumn("_score", F.lit(None).cast("double"))
                base = base.withColumn(
                    "_leaf_scores", F.lit(None).cast("map<int,double>")
                )
        else:
            if scored is None and phrases_df is None:
                return self._empty_hits()
            if scored is not None:
                base = scored
            else:
                # phrase-only, score-less query: base IS the phrase
                # match set — carry `_phrases` directly instead of
                # re-joining phrases_df below, which would evaluate the
                # whole positions aggregation lineage TWICE (measured
                # 2x wall on the bench phrase query)
                base = phrases_df.withColumn(
                    "_groups", F.array().cast("array<int>")
                ).withColumn("_score", F.lit(None).cast("double")).withColumn(
                    "_leaf_scores", F.lit(None).cast("map<int,double>")
                )
                phrases_df = None  # consumed
        if phrases_df is not None:
            base = base.join(phrases_df, "doc_id", "left")
            base = base.withColumn(
                "_phrases",
                F.coalesce(F.col("_phrases"), F.array().cast("array<int>")),
            )
        elif "_phrases" not in base.columns:
            base = base.withColumn("_phrases", F.array().cast("array<int>"))
        base = base.withColumn(
            "_groups", F.coalesce(F.col("_groups"), F.array().cast("array<int>"))
        )

        # ---- matcher + filters + score hook need doc columns? ----
        needed_cols = self._needed_doc_columns(plan)
        if needed_cols:
            docs_slim = self.docs.select("doc_id", *sorted(needed_cols))
            base = base.join(docs_slim, "doc_id", "left")

        matched = base.where(matcher_col(plan.matcher, base))
        if plan.root_filter:
            matched = matched.where(compile_filters(matched, plan.root_filter))

        # ---- final score ----
        if P.needs_score_hook(plan.score_node):
            # custom-score hook (reader.rs:3038-3100): evaluate the
            # score-node tree per matched doc; NULL = drop hit
            from searchlite_spark.query.scoring import score_node_col

            score = score_node_col(
                plan.score_node,
                matched,
                F.col("_leaf_scores"),
                F.col("_score") if P.is_pure_sum(plan.score_expr) else None,
            )
            out = matched.select("doc_id", score.alias("score"))
            if keep_dropped:
                return out
            return out.where(F.col("score").isNotNull())
        if needs_score:
            if P.is_pure_sum(plan.score_expr):
                score = F.coalesce(F.col("_score"), F.lit(0.0))
            else:
                score = score_col(plan.score_expr, F.col("_leaf_scores"))
        else:
            # match-only / match_all: constant 1.0 (reader.rs:3150-3151)
            score = F.lit(1.0)
        return matched.select(
            "doc_id", score.alias("score")
        )

    def _empty_hits(self) -> DataFrame:
        from searchlite_spark.localrel import local_df

        return local_df(self.spark, [], "doc_id LONG, score DOUBLE")

    def _term_stats_for(self, keys) -> dict[str, tuple[int, int]]:
        """{key: (df, max_tf)} via the reader-level cache; ONE bounded
        dictionary job for the keys not yet seen (pushed-down
        ``term IN (...)`` scan), zero jobs for repeated terms.  Absent
        terms cache as (0, 0)."""
        missing = sorted(k for k in keys if k not in self._term_stats)
        if missing:
            rows = (
                self.terms.where(F.col("term").isin(missing))
                .select("term", "df", "max_tf")
                .collect()
            )
            found = {
                r["term"]: (int(r["df"]), int(r["max_tf"] or 0)) for r in rows
            }
            for k in missing:
                self._term_stats[k] = found.get(k, (0, 0))
        return {k: self._term_stats[k] for k in keys}

    def _key_info_rows(self, all_keys, key_groups, key_weight) -> list[tuple]:
        """Per-key info rows (term, groups, weight, leaf, field, df_key)
        — df from the dictionary.

        Per-term df values are cached on the Searcher (the index is an
        immutable snapshot, so dfs never change under us — the
        reference caches term stats in its readers the same way); a
        repeated-term query costs zero dictionary jobs."""
        stats = self._term_stats_for(all_keys)
        df_map = {k: stats[k][0] for k in all_keys}
        # brute path examines every posting of every query key — the
        # profile counter the reference reports as candidates_examined
        # (reader.rs:115-129)
        self._last_candidates = int(sum(df_map.values()))
        rows = []
        for k in all_keys:
            w_leaf = key_weight.get(k)
            rows.append(
                (
                    k,
                    key_groups.get(k, []),
                    float(w_leaf[0]) if w_leaf else None,
                    int(w_leaf[1]) if w_leaf else None,
                    k.split(":", 1)[0],
                    int(df_map.get(k, 0)),
                )
            )
        return rows

    # literal CASE WHEN key info only while the per-row branch scan is
    # cheaper than a hash-join probe: few keys AND bounded (Σ df × keys)
    # evaluation work — a CASE chain is linear in branches per posting
    # row, so at head-term volume the broadcast join wins back
    _KEY_LITERAL_MAX = 16
    _KEY_LITERAL_WORK_MAX = 20_000_000

    def _attach_key_info(self, cand: DataFrame, rows: list[tuple]) -> DataFrame:
        """``cand`` with (groups, weight, leaf, field, df_key) columns.

        Small key sets (the overwhelmingly common case) inline the info
        as chained ``CASE term WHEN ...`` literal columns: zero extra
        table, zero broadcast — even a LocalRelation broadcast costs
        one N-task materialization job per fresh plan, which at this
        query's scale is a measurable slice of the latency floor.
        Large expansions (many keys, or head-term df volumes where the
        per-row branch scan would out-cost a hash probe) fall back to
        the broadcast join so plan size and per-row work stay bounded."""
        total_df = sum(r[5] for r in rows)
        if (
            len(rows) > self._KEY_LITERAL_MAX
            or total_df * len(rows) > self._KEY_LITERAL_WORK_MAX
        ):
            from searchlite_spark.localrel import local_df

            key_df = local_df(
                self.spark,
                rows,
                "term STRING, groups ARRAY<INT>, weight DOUBLE, leaf INT, field STRING, df_key LONG",
            )
            return cand.join(F.broadcast(key_df), "term")

        term = F.col("term")

        def chain(idx, dtype, mk):
            c = None
            for r in rows:
                v = r[idx]
                lv = mk(v) if v is not None else F.lit(None).cast(dtype)
                c = (
                    F.when(term == F.lit(r[0]), lv)
                    if c is None
                    else c.when(term == F.lit(r[0]), lv)
                )
            return c.otherwise(F.lit(None).cast(dtype))

        def mk_groups(g):
            if not g:
                return F.array().cast("array<int>")
            return F.array(*[F.lit(int(x)) for x in g]).cast("array<int>")

        return (
            cand.withColumn("groups", chain(1, "array<int>", mk_groups))
            .withColumn("weight", chain(2, "double", lambda v: F.lit(float(v))))
            .withColumn(
                "leaf", chain(3, "int", lambda v: F.lit(int(v)).cast("int"))
            )
            .withColumn("field", chain(4, "string", F.lit))
            .withColumn(
                "df_key", chain(5, "long", lambda v: F.lit(int(v)).cast("long"))
            )
        )

    @staticmethod
    def _max_group_id(plan) -> int:
        return max((g.group_id for g in (plan.term_groups or [])), default=0)

    @staticmethod
    def _matcher_conjunctive(m, key_groups, all_keys):
        """Number of groups a doc must match when the matcher is a pure
        AND of term groups (bool must of terms, or query_string whose
        msm equals its group count) — else None.  Requires every key to
        carry exactly ONE group id, so the scoring aggregate can count
        distinct matched groups with a codegen'd count_distinct instead
        of collecting group arrays."""
        if not all_keys or any(
            len(key_groups.get(k, [])) != 1 for k in all_keys
        ):
            return None
        gids = {key_groups[k][0] for k in all_keys}
        if isinstance(m, P.BoolMatcher):
            if (
                m.should
                or m.must_not
                or m.filter
                or not m.must
                or not all(isinstance(c, P.TermGroupRef) for c in m.must)
            ):
                return None
            need = {c.group_id for c in m.must}
            return len(need) if need == gids else None
        if isinstance(m, P.QueryStringMatcher):
            need = set(m.term_groups)
            if (
                m.phrase_groups
                or m.not_term_groups
                or not need
                or need != gids
                or (m.minimum_should_match or 1) != len(need)
            ):
                return None
            return len(need)
        return None

    @staticmethod
    def _matcher_negation_split(m, key_groups, all_keys):
        """Negative-only key list when the matcher is a scored OR with
        pure negation — (>=1 of term_groups) AND (none of
        not_term_groups), msm<=1 — and every key belongs EXCLUSIVELY to
        positive groups or exclusively to negative ones (a key in both,
        e.g. "spark -spark", stays on the general path).  Returns None
        when ineligible."""
        if not isinstance(m, P.QueryStringMatcher):
            return None
        if (
            m.phrase_groups
            or not m.not_term_groups
            or not m.term_groups
            or (m.minimum_should_match or 1) > 1
        ):
            return None
        pos_gids = set(m.term_groups)
        neg_gids = set(m.not_term_groups)
        if pos_gids & neg_gids:
            return None
        neg_keys = []
        for k in all_keys:
            gids = set(key_groups.get(k) or ())
            if not gids or (gids - pos_gids - neg_gids):
                return None
            if gids <= neg_gids:
                neg_keys.append(k)
            elif gids <= pos_gids:
                continue
            else:  # mixed positive+negative key
                return None
        if not neg_keys or len(neg_keys) == len(all_keys):
            return None
        return neg_keys

    @staticmethod
    def _matcher_vacuous(m, key_groups, all_keys) -> bool:
        """True when "row exists in the postings scan" already implies
        the matcher predicate, so per-doc group tracking can be skipped.
        Requires every scanned key to carry >=1 positive group id."""
        if not all_keys or any(not key_groups.get(k) for k in all_keys):
            return False
        gids = {g for gs in key_groups.values() for g in gs}
        if isinstance(m, P.TermGroupRef):
            return gids == {m.group_id}
        if isinstance(m, P.QueryStringMatcher):
            return (
                not m.phrase_groups
                and not m.not_term_groups
                and bool(m.term_groups)
                and (m.minimum_should_match or 1) <= 1
                and gids <= set(m.term_groups)
            )
        return False

    def _score_candidates(
        self,
        cand: DataFrame,
        key_rows: list[tuple],
        needs_score: bool,
        plan,
        group_mode: str = "full",
    ) -> DataFrame:
        """group_mode: "full" = collect matched group-id arrays (general
        matcher evaluation); "count" = count distinct single group ids
        (pure-AND matchers); "none" = no group tracking (vacuous
        matchers).  "count"/"none" keep the aggregate inside whole-stage
        codegen — no ObjectHashAggregate, no arrays in the shuffle."""
        joined = self._attach_key_info(cand, key_rows)
        if needs_score:
            dl_expr = F.col("dl")
            n_docs = self.stats["n_docs"]
            avgdl_map = self.stats["avgdl"]
            # field-dispatched avgdl literal
            avgdl_expr = F.lit(0.0)
            for fname, av in avgdl_map.items():
                avgdl_expr = F.when(F.col("field") == fname, F.lit(av)).otherwise(
                    avgdl_expr
                )
            idf = (
                F.greatest(
                    F.log(
                        (F.lit(float(n_docs)) - F.col("df_key") + 0.5)
                        / (F.col("df_key") + 0.5)
                    ),
                    F.lit(0.0),
                )
                + 1.0
            )
            dl_eff = F.when(dl_expr > 0, dl_expr.cast("double")).otherwise(
                F.greatest(avgdl_expr, F.lit(1.0))
            )
            norm = F.when(avgdl_expr > 0, dl_eff / avgdl_expr).otherwise(F.lit(1.0))
            tf = F.col("tf").cast("double")
            denom = F.greatest(
                tf + F.lit(self.k1) * (1.0 - self.b + self.b * norm), F.lit(1e-6)
            )
            bm25 = idf * (tf * (self.k1 + 1.0)) / denom
            contrib = F.when(
                F.col("weight").isNotNull(), bm25 * F.col("weight")
            ).otherwise(F.lit(0.0))
            joined = joined.withColumn("_contrib", contrib)
        else:
            joined = joined.withColumn("_contrib", F.lit(0.0))

        pure = P.is_pure_sum(plan.score_expr)
        if pure and group_mode == "none":
            # vacuous-matcher path: plain codegen'd sum — no
            # collect_list, no ObjectHashAggregate, minimal shuffle rows
            return joined.groupBy("doc_id").agg(
                F.sum("_contrib").alias("_score")
            )
        if pure and group_mode == "count":
            # conjunctive path: every key carries exactly one group id.
            # Distinct-group counting runs as a bit_count(bit_or(1<<gid))
            # one-hot mask — ONE codegen'd exchange, where count_distinct
            # plans TWO (partial by (doc,gid) + final by doc; measured
            # plan: 2 Exchange -> 1 on the bench bool_must query).
            # Group ids are per-query ordinals, so <64 covers any real
            # bool query; larger falls back to count_distinct.
            gid = F.element_at(F.col("groups"), 1)
            if self._max_group_id(plan) < 64:
                return joined.withColumn(
                    "_gmask", F.expr("shiftleft(1L, element_at(groups, 1))")
                ).groupBy("doc_id").agg(
                    F.sum("_contrib").alias("_score"),
                    F.bit_count(F.bit_or("_gmask")).alias("_ng"),
                )
            return joined.withColumn("_gid", gid).groupBy("doc_id").agg(
                F.sum("_contrib").alias("_score"),
                F.count_distinct(F.col("_gid")).alias("_ng"),
            )
        if pure:
            return joined.groupBy("doc_id").agg(
                F.array_distinct(F.flatten(F.collect_list("groups"))).alias(
                    "_groups"
                ),
                F.sum("_contrib").alias("_score"),
                F.lit(None).cast("map<int,double>").alias("_leaf_scores"),
            )
        per_leaf = joined.groupBy(
            "doc_id", F.coalesce(F.col("leaf"), F.lit(-1)).alias("_leaf")
        ).agg(
            F.sum("_contrib").alias("_s"),
            F.collect_list("groups").alias("_ga"),
        )
        return per_leaf.groupBy("doc_id").agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_leaf"), F.col("_s")))
            ).alias("_leaf_scores"),
            F.array_distinct(F.flatten(F.flatten(F.collect_list("_ga")))).alias(
                "_groups"
            ),
            F.sum("_s").alias("_score"),
        )

    # -- phrases ---------------------------------------------------------

    # prefilter engages only when BOTH the index is big enough for a
    # head term's positions to be a real shuffle cost and the phrase
    # mixes rare + common terms (see _phrase_matches docstring)
    _PHRASE_PREFILTER_MIN_DOCS = 1_000_000
    _PHRASE_PREFILTER_DF_RATIO = 16.0

    def _phrase_prefilter_worthwhile(self, keys) -> bool:
        if self.stats["n_docs"] < self._PHRASE_PREFILTER_MIN_DOCS:
            return False
        dfs = [v[0] for v in self._term_stats_for(sorted(keys)).values() if v[0]]
        if not dfs:
            return False
        return max(dfs) / max(min(dfs), 1) >= self._PHRASE_PREFILTER_DF_RATIO

    def _phrase_matches(self, phrase_specs) -> DataFrame:
        """(doc_id, _phrases ARRAY<INT>) for docs matching >=1 phrase.

        Distributed plan (reference semantics: query/phrase.rs:4-48
        backtracking position intersection):

        1. **One positions aggregation** — per (doc, spec, field),
           collect the (bucket, positions) entries in a single shuffle;
           bucket completeness (doc contains EVERY phrase bucket) is
           checked on the aggregated list — no extra exchange.
        2. **Bucket assembly** — per surviving doc, merge alternative
           tokens per bucket (sorted distinct positions) and pack the
           ordered bucket position arrays.
        3. **Match** — slop=0 (the common case) is pure column algebra:
           fold ``array_intersect(transform(acc, x -> x+1), next)``
           over the buckets, whole-stage-codegen'd — no Python.  slop>0
           runs the reference's backtracker in an Arrow batch over the
           surviving docs only.

        **Conditional head-term prefilter**: on a LARGE index a phrase
        like "the best" would ship the head term's entire positions
        list through the shuffle just to discard docs lacking the rare
        term.  When the index is big enough for that to matter
        (n_docs >= _PHRASE_PREFILTER_MIN_DOCS) and the dictionary dfs
        are lopsided (max_df/min_df >= _PHRASE_PREFILTER_DF_RATIO), a
        positions-free (doc, bucket)-distinct semi-join runs first so
        positions ship only for docs containing the rarest bucket.  At
        small scale the two extra exchanges cost more than they save
        (measured 3.4x on the sf0.1 bench), so the fused single-shuffle
        plan is the default.
        """
        map_rows: list[tuple] = []
        nb_rows: list[tuple] = []
        slops: dict[int, int] = {}
        for spec in phrase_specs:
            slops[spec.phrase_id] = spec.slop
            for fld, buckets in spec.field_tokens.items():
                nb_rows.append((spec.phrase_id, fld, len(buckets)))
                for b_idx, alts in enumerate(buckets):
                    for t in alts:
                        map_rows.append((f"{fld}:{t}", spec.phrase_id, fld, b_idx))
        if not map_rows:
            return None
        from searchlite_spark.localrel import local_df

        spark = self.spark
        keys = sorted({r[0] for r in map_rows})
        base = (
            self.postings.where(F.col("term").isin(keys))
            # enable_positions=false indexes store NULL positions;
            # coalescing to [] makes every downstream stage see empty
            # lists, so phrases match NOTHING — exactly the reference's
            # empty-positions contract (phrase.rs:16-18): the zero-slop
            # adjacency fold yields an empty survivor set and the slop
            # kernel's `any(len(p) == 0)` guard rejects the doc.
            .select(
                "doc_id",
                "term",
                F.coalesce(
                    F.col("positions"), F.array().cast("array<int>")
                ).alias("positions"),
            )
        )
        by_term: dict[str, list[tuple]] = {}
        for t, sid, fld, b in map_rows:
            by_term.setdefault(t, []).append((sid, fld, b))
        est_rows = sum(v[0] for v in self._term_stats_for(keys).values())
        if (
            all(len(v) == 1 for v in by_term.values())
            and len(keys) <= self._KEY_LITERAL_MAX
            and est_rows * len(keys) <= self._KEY_LITERAL_WORK_MAX
        ):
            # 1:1 term -> (spec, field, bucket) — the common phrase
            # shape: inline as literal CASE columns, same rationale and
            # bounds as _attach_key_info (no broadcast table, no N-task
            # broadcast-materialization job per fresh plan).  Repeated
            # tokens ("the the") map one term to several buckets and
            # fall back to the broadcast join, which can duplicate rows.
            term = F.col("term")

            def chain(idx, dtype):
                c = None
                for t in keys:
                    v = by_term[t][0][idx]
                    c = (
                        F.when(term == F.lit(t), F.lit(v))
                        if c is None
                        else c.when(term == F.lit(t), F.lit(v))
                    )
                return c.otherwise(F.lit(None).cast(dtype)).cast(dtype)

            cand = (
                base.withColumn("spec_id", chain(0, "int"))
                .withColumn("field", chain(1, "string"))
                .withColumn("bucket", chain(2, "int"))
            )
        else:
            mapping = local_df(
                spark,
                map_rows,
                "term STRING, spec_id INT, field STRING, bucket INT",
            )
            cand = base.join(F.broadcast(mapping), "term")
        if self._phrase_prefilter_worthwhile(keys):
            nb = local_df(
                spark, nb_rows, "spec_id INT, field STRING, n_buckets INT"
            )
            surviving = (
                cand.groupBy("doc_id", "spec_id", "field")
                .agg(F.countDistinct("bucket").alias("_nb"))
                .join(F.broadcast(nb), ["spec_id", "field"])
                .where(F.col("_nb") == F.col("n_buckets"))
                .select("doc_id", "spec_id", "field")
            )
            cand = cand.join(
                surviving, ["doc_id", "spec_id", "field"], "left_semi"
            )
        if all(s == 0 for s in slops.values()):
            # all-zero-slop (the default phrase shape): fuse the whole
            # evaluation into ONE groupBy(doc_id) aggregation — bucket
            # completeness, per-bucket position merge and the adjacency
            # fold all run as per-row higher-order expressions over the
            # collected entry list.  The general path below pays a
            # second exchange (per-(doc,spec,field) agg, then a
            # groupBy(doc_id) collect_set); this one pays none
            # (measured: 2 Exchange -> 1 on the bench phrase query).
            return self._phrase_matches_fused(cand, nb_rows, est_rows)
        # one positions shuffle; bucket completeness is checked on the
        # aggregated entry list (free), and the per-bucket merge +
        # ordered assembly happen as per-row higher-order expressions
        # (buckets per phrase are tiny)
        nb = local_df(
            spark, nb_rows, "spec_id INT, field STRING, n_buckets INT"
        )
        grouped = (
            cand.groupBy("doc_id", "spec_id", "field")
            .agg(F.collect_list(F.struct("bucket", "positions")).alias("_ents"))
            .join(F.broadcast(nb), ["spec_id", "field"])
            .where(
                F.size(
                    F.array_distinct(
                        F.transform(F.col("_ents"), lambda e: e["bucket"])
                    )
                )
                == F.col("n_buckets")
            )
        )
        bp_expr = F.transform(
            F.sequence(F.lit(0), F.col("n_buckets") - 1),
            lambda b: F.sort_array(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            F.filter(F.col("_ents"), lambda e: e["bucket"] == b),
                            lambda e: e["positions"],
                        )
                    )
                )
            ),
        )
        assembled = grouped.select(
            "doc_id", "spec_id", "field", bp_expr.alias("bp")
        )

        zero_ids = [pid for pid, s in slops.items() if s == 0]
        slop_ids = [pid for pid, s in slops.items() if s > 0]
        parts = []
        if zero_ids:
            # adjacency fold: positions of bucket i+1 must contain a
            # survivor of (bucket_i positions + 1)
            adjacent = F.expr(
                "size(aggregate(slice(bp, 2, size(bp) - 1), bp[0],"
                " (acc, p) -> array_intersect("
                "transform(acc, x -> x + 1), p))) > 0"
            )
            parts.append(
                assembled.where(F.col("spec_id").isin(zero_ids))
                .where(adjacent)
                .select("doc_id", "spec_id")
            )
        if slop_ids:
            slop_items = sorted(slops.items())

            def eval_batch(batches):
                import pandas as pd

                slop_of = dict(slop_items)

                def match_positions(pos_lists, slop):
                    # backtracking over sorted lists (phrase.rs:4-48)
                    if any(len(p) == 0 for p in pos_lists):
                        return False
                    if len(pos_lists) == 1:
                        return True

                    def search(idx, prev, remaining):
                        if idx >= len(pos_lists):
                            return True
                        for pos in pos_lists[idx]:
                            if pos <= prev:
                                continue
                            gap = pos - (prev + 1)
                            if gap > remaining:
                                break
                            if search(idx + 1, pos, remaining - gap):
                                return True
                        return False

                    return any(
                        search(1, start, slop) for start in pos_lists[0]
                    )

                for pdf in batches:
                    out_doc, out_pid = [], []
                    for did, pid, bp in zip(
                        pdf["doc_id"], pdf["spec_id"], pdf["bp"]
                    ):
                        pos_lists = [list(p) for p in bp]
                        if match_positions(pos_lists, slop_of[int(pid)]):
                            out_doc.append(did)
                            out_pid.append(pid)
                    yield pd.DataFrame(
                        {
                            "doc_id": pd.Series(out_doc, dtype="int64"),
                            "spec_id": pd.Series(out_pid, dtype="int32"),
                        }
                    )

            parts.append(
                assembled.where(F.col("spec_id").isin(slop_ids))
                .select("doc_id", "spec_id", "bp")
                .mapInPandas(eval_batch, "doc_id LONG, spec_id INT")
            )
        matched = parts[0]
        for p in parts[1:]:
            matched = matched.unionByName(p)
        return matched.groupBy("doc_id").agg(
            F.collect_set("spec_id").alias("_phrases")
        )

    def _phrase_matches_fused(self, cand, nb_rows, est_rows=0) -> DataFrame:
        """(doc_id, _phrases ARRAY<INT>) for zero-slop phrase sets in a
        SINGLE shuffle: collect every (spec, field, bucket, positions)
        entry per doc, then evaluate each (spec, field)'s completeness
        + adjacency fold as codegen'd array expressions.  Output is
        value-identical to the general path (``_phrases`` is consumed
        by membership only, matching.py:21).

        est_rows (Σ df over the phrase keys, from the cached
        dictionary): the post-shuffle evaluation is CPU-bound array
        expression work, so its parallelism is pinned row-derived —
        byte-based AQE coalescing would run a multi-second position
        merge on one advisory-sized task."""
        rpt = int(
            self.spark.conf.get("spark.searchlite.phrase.rowsPerTask", "16384")
        )
        cap = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        nparts = max(1, min(cap, int(est_rows) // rpt + 1))
        if nparts > 1:
            cand = cand.repartition(nparts, "doc_id")
        grouped = cand.groupBy("doc_id").agg(
            F.collect_list(
                F.struct("spec_id", "field", "bucket", "positions")
            ).alias("_ents")
        )

        def field_match(sid: int, fld: str, nbk: int) -> Column:
            ents = F.filter(
                F.col("_ents"),
                lambda e: (e["spec_id"] == F.lit(sid))
                & (e["field"] == F.lit(fld)),
            )
            complete = (
                F.size(
                    F.array_distinct(F.transform(ents, lambda e: e["bucket"]))
                )
                == F.lit(nbk)
            )
            bp = F.transform(
                F.sequence(F.lit(0), F.lit(nbk - 1)),
                lambda b: F.sort_array(
                    F.array_distinct(
                        F.flatten(
                            F.transform(
                                F.filter(ents, lambda e: e["bucket"] == b),
                                lambda e: e["positions"],
                            )
                        )
                    )
                ),
            )
            first = F.element_at(bp, 1)
            if nbk == 1:
                # single-bucket phrase: any position at all matches
                # (empty-positions contract: positionless -> no match)
                return complete & (F.size(first) > 0)
            surv = F.aggregate(
                F.slice(bp, 2, nbk - 1),
                first,
                lambda acc, p: F.array_intersect(
                    F.transform(acc, lambda x: x + 1), p
                ),
            )
            return complete & (F.size(surv) > 0)

        by_spec: dict[int, list[Column]] = {}
        for sid, fld, nbk in nb_rows:
            by_spec.setdefault(sid, []).append(field_match(sid, fld, nbk))
        arms = []
        for sid, conds in sorted(by_spec.items()):
            cond = conds[0]
            for c in conds[1:]:
                cond = cond | c
            arms.append(F.when(cond, F.lit(sid)))
        phrases = F.array_compact(F.array(*arms)).cast("array<int>")
        return grouped.select(
            "doc_id", phrases.alias("_phrases")
        ).where(F.size("_phrases") > 0)

    # -- sorting ----------------------------------------------------------

    def _sort_specs(self, sort) -> list[tuple[str, str]]:
        """[(field | "_score", order)] without the doc_id tiebreak."""
        if not sort:
            return [("_score", "desc")]
        out = []
        for s in sort:
            if isinstance(s, str):
                out.append((s, "asc"))
            else:
                out.append((s["field"], s.get("order", "asc")))
        return out

    def _sort_value_col(self, fld: str, order: str) -> Column:
        if fld == "_score":
            # rank in f32 space, as the reference does natively: the
            # kernels lexsort f32 scores and the 21-byte wire cursor
            # stores f32 bits, so an f64 page ordering would disagree
            # with the f32 resume boundary whenever two f64-distinct
            # scores collide after rounding (dropped/duplicated rows)
            return F.col("score").cast("float")
        c = F.col(fld)
        try:
            if isinstance(self.docs.schema[fld].dataType, T.ArrayType):
                # drop null elements first: array_min/max over an array
                # containing NULL would poison the key
                nn = F.filter(c, lambda x: x.isNotNull())
                c = F.array_min(nn) if order == "asc" else F.array_max(nn)
        except KeyError:
            pass
        return c

    def _resolve_opaque_cursor(self, request: dict) -> dict:
        """Opaque hex cursors (reader.rs:614-901): decode + validate —
        generation staleness, sort-plan ``plan_hash``, and the
        ``MAX_CURSOR_ADVANCE`` = 50k pagination depth cap — then rewrite
        into the internal ``search_after`` form.  The dict/list
        ``search_after`` forms stay accepted unchanged (the reference
        similarly accepts both `search_after` values and cursors)."""
        self._cursor_returned = 0
        raw = request.get("cursor")
        if raw is None:
            return request
        from searchlite_spark.query.cursor import decode_cursor

        values, doc_id, returned = decode_cursor(
            raw, self.generation, self._sort_specs(request.get("sort"))
        )
        self._cursor_returned = returned
        request = dict(request)
        del request["cursor"]
        request["search_after"] = list(values) + [doc_id]
        return request

    def _apply_search_after(self, scored: DataFrame, sort, values) -> DataFrame:
        """Keyset pagination over an ARBITRARY sort plan (the
        reference's sort-path cursors, reader.rs:614-901): keep rows
        strictly after the cursor in lexicographic
        (sort keys..., doc_id asc) order.  Nulls-last aware: a null
        sort value ranks after every concrete value, so a concrete
        cursor admits later nulls and a null cursor admits only nulls
        with a larger doc_id."""
        if isinstance(values, dict):
            gen = values.get("generation")
            if gen is not None and gen != self.generation:
                raise ValueError(
                    f"stale cursor: generation {gen!r} does not match the "
                    f"current index generation {self.generation!r} "
                    "(the index was rebuilt; restart pagination)"
                )
            if "values" not in values:
                raise ValueError(
                    "search_after dict must carry a 'values' list (pass "
                    "the cursor returned by the previous page verbatim)"
                )
            values = values["values"]
        specs = self._sort_specs(sort)
        values = list(values)
        if len(values) != len(specs) + 1:
            raise ValueError(
                "search_after needs one value per sort key plus doc_id"
            )
        keep = list(scored.columns)
        fields = list(
            dict.fromkeys(
                f for f, _ in specs if f != "_score" and f not in keep
            )
        )
        if fields:
            scored = scored.join(
                self.docs.select("doc_id", *fields), "doc_id", "left"
            )
        pred = F.lit(False)
        eq = F.lit(True)
        for (fld, order), v in zip(specs, values[:-1]):
            c = self._sort_value_col(fld, order)
            if fld == "_score" and v is not None:
                # _score ordering runs in f32 space (_sort_value_col
                # casts); the boundary value must be rounded the same
                # way regardless of which cursor form carried it —
                # F32Score (opaque wire) is already f32-rounded, a
                # plain float from the list/dict cursor is not yet
                import numpy as np

                v = float(np.float32(v))
            if v is None:
                gt = F.lit(False)
                eqc = c.isNull()
            else:
                gt = (c < F.lit(v)) if order == "desc" else (c > F.lit(v))
                gt = gt | c.isNull()  # nulls-last: null is "after" any value
                eqc = c == F.lit(v)
            pred = pred | (eq & gt)
            eq = eq & eqc
        pred = pred | (eq & (F.col("doc_id") > F.lit(int(values[-1]))))
        return scored.where(pred).select(*keep)

    def _sort_cols(self, sort) -> list[Column]:
        """Sort plan (sort.rs:80-298): _score and/or doc fields;
        multi-valued fields sort by min (asc) / max (desc); missing
        last; stable doc_id tiebreak."""
        if not sort:
            # f32 like every other leg of the default relevance sort
            # (_apply_sort's no-sort branch, _apply_search_after, the
            # wire cursor): two f64-distinct scores that collide in f32
            # must compare equal here too, or page-internal order can
            # disagree with cross-page order.
            return [F.col("score").cast("float").desc(), F.col("doc_id").asc()]
        cols: list[Column] = []
        for s in sort:
            if isinstance(s, str):
                fld, order = s, "asc"
            else:
                fld, order = s["field"], s.get("order", "asc")
            c = self._sort_value_col(fld, order)
            cols.append(
                c.desc_nulls_last() if order == "desc" else c.asc_nulls_last()
            )
        cols.append(F.col("doc_id").asc())
        return cols

    def _carried_sort_cols(self, sort) -> list[Column]:
        """Order-by columns valid on frames that CARRY the computed
        ``_sk_<i>`` sort keys (output of ``_apply_sort(keep_keys=True)``
        and everything stacked on it) — used after rescore/collapse
        rebind the frame, where the raw doc fields may be absent."""
        if not sort:
            return [F.col("score").cast("float").desc(), F.col("doc_id").asc()]
        cols: list[Column] = []
        for i, (_fld, order) in enumerate(self._sort_specs(sort)):
            c = F.col(f"_sk_{i}")
            cols.append(
                c.desc_nulls_last() if order == "desc" else c.asc_nulls_last()
            )
        cols.append(F.col("doc_id").asc())
        return cols

    def _apply_sort(
        self, scored: DataFrame, sort, keep_keys: bool = False
    ) -> DataFrame:
        """keep_keys: additionally carry the COMPUTED sort-key values as
        ``_sk_<i>`` columns so the pagination cursor can be built from
        them — never from the docstore row, which may not store the
        sort field at all (store_columns) and would silently yield a
        None cursor value."""
        if not sort:
            return scored.orderBy(
                F.col("score").cast("float").desc(), F.col("doc_id").asc()
            )
        keep = list(scored.columns)
        fields = [
            (s if isinstance(s, str) else s["field"])
            for s in sort
            if (s if isinstance(s, str) else s["field"]) != "_score"
        ]
        fields = [f for f in dict.fromkeys(fields) if f not in keep]
        if fields:
            scored = scored.join(
                self.docs.select("doc_id", *fields), "doc_id", "left"
            )
        if keep_keys:
            for i, (fld, order) in enumerate(self._sort_specs(sort)):
                scored = scored.withColumn(
                    f"_sk_{i}", self._sort_value_col(fld, order)
                )
            keep = keep + [f"_sk_{i}" for i in range(len(self._sort_specs(sort)))]
        return scored.orderBy(*self._sort_cols(sort)).select(*keep)

    # -- helpers -----------------------------------------------------------

    def _needed_doc_columns(self, plan) -> set[str]:
        cols = matcher_score_fields(plan.matcher)
        cols |= matcher_score_fields(
            P.BoolMatcher([], [], [], list(plan.root_filter), None)
        )
        if plan.score_node is not None:
            cols |= P.score_node_fields(plan.score_node)

            def walk_sn(node):
                if isinstance(node, (P.SNConstant, P.SNRankFeature)):
                    cols.update(matcher_score_fields(node.matcher))
                elif isinstance(node, (P.SNFunctionScore, P.SNScriptScore)):
                    cols.update(matcher_score_fields(node.matcher))
                    for f in getattr(node, "functions", []) or []:
                        if f.get("filter"):
                            cols.update(
                                matcher_score_fields(
                                    P.BoolMatcher([], [], [], [f["filter"]], None)
                                )
                            )
                    walk_sn(node.base)
                elif isinstance(node, (P.SNSum, P.SNDisMax)):
                    for c in node.children:
                        walk_sn(c)

            walk_sn(plan.score_node)
        valid = set(self.docs.columns)
        # text columns are NOT fast fields (self.docs deliberately
        # excludes the text blobs — at 100 TB they must never be cached
        # or shuffled for metadata work).  Referencing one in a filter /
        # score hook / sort is a request error, same as the reference's
        # "not a fast field" validation — fail clearly, not with a
        # missing-column AnalysisException deep in the plan.
        text_like = set(self.schema.text_field_names) - valid
        bad = sorted(cols & text_like)
        if bad:
            raise ValueError(
                f"field(s) {bad} are text-indexed, not fast fields; "
                "filters, score functions and sorts require keyword/"
                "numeric (fast) fields"
            )
        return {c for c in cols if c in valid}
