"""Randomized differential testing vs DuckDB: seeded corpora, BM25
top-k compared engine-vs-SQL at 4-decimal score parity — the same
compare the external driver runs, but over corpora with adversarial
shapes (length-1 docs, head terms in ~every doc, absent query terms,
duplicate query terms).  Complements the fixed-corpus oracles and the
brute≡WAND≡BMW property test (reference: tests/pruning.rs:44-104)."""

import random

import duckdb
import pytest

from searchlite_spark.query import Searcher

K = 10

VOCAB_HEAD = ["the", "web", "page", "data"]          # df ~ n_docs
VOCAB_TAIL = [f"w{i:03d}" for i in range(150)]       # rare-ish


def _make_rows(seed: int, n_docs: int = 300):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.choice([1, 2, rng.randint(3, 30)])   # include tiny docs
        toks = []
        for _ in range(n):
            if rng.random() < 0.35:
                toks.append(rng.choice(VOCAB_HEAD))
            else:
                toks.append(rng.choice(VOCAB_TAIL))
        rows.append((i, " ".join(toks)))
    return rows


def _oracle_sql(terms: list[str], exclude: list[str] | None = None) -> str:
    qvals = ",".join(f"('{t}')" for t in terms)
    not_clause = "TRUE"
    if exclude:
        ex = ",".join(f"'{t}'" for t in exclude)
        not_clause = (
            "tok.doc_id NOT IN (SELECT doc_id FROM tok WHERE tok IN"
            f" ({ex}))"
        )
    return f"""
WITH tok AS (
  SELECT d.doc_id, t.tok, count(*)::BIGINT AS tf
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
  WHERE t.tok <> '' GROUP BY d.doc_id, t.tok
),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tok GROUP BY doc_id),
st AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         CAST(CAST((SELECT sum(dl) FROM dl) AS FLOAT)
              / CAST((SELECT count(*) FROM documents) AS FLOAT) AS DOUBLE) AS avgdl
),
q(tok) AS (VALUES {qvals}),
dfq AS (SELECT tok, count(*)::DOUBLE AS df FROM tok
        WHERE tok IN (SELECT tok FROM q) GROUP BY tok),
scored AS (
  SELECT tok.doc_id,
         SUM( (greatest(ln((st.n - dfq.df + 0.5)/(dfq.df + 0.5)), 0.0) + 1.0)
              * (tok.tf * (0.9 + 1.0))
              / greatest(tok.tf + 0.9 * (1.0 - 0.4 + 0.4 * (dl.dl / st.avgdl)), 1e-6)
         ) AS score
  FROM tok JOIN q ON tok.tok = q.tok
  JOIN dfq ON tok.tok = dfq.tok
  JOIN dl ON tok.doc_id = dl.doc_id
  CROSS JOIN st
  WHERE {not_clause}
  GROUP BY tok.doc_id
)
SELECT doc_id, round(score, 4) AS score_r FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {K}
"""


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_bm25_differential_vs_duckdb(spark, tmp_path_factory, seed):
    from pyspark.sql import functions as F

    from searchlite_spark.index import IndexSchema, TextField, build_index

    rows = _make_rows(seed)
    corpus = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    schema = IndexSchema(doc_id_field="doc_id", text_fields=(TextField("text"),))
    out = str(tmp_path_factory.mktemp(f"diff{seed}"))
    idx = build_index(spark, corpus, schema, out, num_partitions=4,
                      id_mode="column", block_size=16)
    s = Searcher(idx)

    con = duckdb.connect()
    import pandas as pd

    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))

    rng = random.Random(seed * 7)
    queries = []
    for _ in range(4):
        n = rng.randint(1, 3)
        terms = rng.sample(VOCAB_HEAD + VOCAB_TAIL[:40], n)
        queries.append((terms, None))
    queries.append((["w000", "zzz_absent"], None))          # absent term
    queries.append((VOCAB_HEAD[:1], [VOCAB_TAIL[0]]))       # negation
    queries.append((["the", "the"], None))                  # duplicate key

    for terms, exclude in queries:
        expect = [(int(r[0]), float(r[1]))
                  for r in con.execute(_oracle_sql(terms, exclude)).fetchall()]
        qstr = " ".join(terms + [f"-{t}" for t in (exclude or [])])
        m = s.match_set({"query": qstr})
        got = [
            (r["doc_id"], r["score_r"])
            for r in m.select(
                "doc_id", F.round("score", 4).alias("score_r")
            ).orderBy(F.desc("score"), F.asc("doc_id")).limit(K).collect()
        ]
        assert got == expect, f"brute mismatch seed={seed} q={qstr!r}"
        if exclude is None and len(set(terms)) == len(terms):
            for ex in ("wand", "bmw"):
                kern = [
                    (r["doc_id"], round(r["score"], 4))
                    for r in s.topk({"query": " ".join(terms), "limit": K,
                                     "execution": ex}).collect()
                ]
                assert kern == expect, f"{ex} mismatch seed={seed} q={terms}"
