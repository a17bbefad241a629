"""Connected-components verification at ANY scale via driver-side
union-find — the oracle fix for the one pipeline family whose DuckDB
oracle (a recursive-CTE transitive closure) is quadratic in component
size and cannot run past sf0.01.

The edge list is tiny relative to the corpus (verified near-dup pairs),
so collecting IT is cheap even when the corpus is not; the corpus-scale
work (pair generation, the O(log n)-round large-star/small-star
closure, the anti-join survivor selection) all stays on Spark and is
exactly what gets checked:

  * dedup_components: Spark's (node, component=min id) labeling must
    equal a union-find over the same pairs;
  * dedup_near_survivors: Spark's survivor set must equal
    all-doc-ids minus every non-minimum member of each component.

Pair generation is selectable because the exact n-gram Jaccard
generator is the quadratic-by-design verification primitive (blocked
all-pairs) and cannot run past sf0.1; at sf1+ the SCALE path is
MinHash+LSH, whose banded buckets stay bounded at any corpus size —
the closure over those pairs is what a 100-TB dedup would actually run.

Usage: python scripts/verify_components.py [sf_dir] [exact|minhash]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from searchlite_spark import get_spark
from searchlite_spark.textops import (
    connected_components,
    near_dedup_survivors,
    ngram_jaccard_pairs,
)


class UnionFind:
    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "verify_components", cores=os.environ.get("SPARK_GRAFT_CPUS", "16")
    )
    mode = sys.argv[2] if len(sys.argv) > 2 else "exact"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    if mode == "minhash":
        from searchlite_spark.textops import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.5, warn_on_drop=False
        ).select("id_a", "id_b")
    else:
        pairs = ngram_jaccard_pairs(docs, "source", threshold=0.015)
    pairs = pairs.persist()
    pair_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    print(f"{sf_dir} [{mode}]: {n_docs} docs, {len(pair_rows)} verified pairs")

    # ---- oracle: union-find over the same pairs -------------------------
    uf = UnionFind()
    for a, b in pair_rows:
        uf.union(int(a), int(b))
    # canonical label = min id of the component (what large-star/
    # small-star converges to)
    label: dict[int, int] = {}
    for a, b in pair_rows:
        for x in (int(a), int(b)):
            r = uf.find(x)
            label[x] = min(label.get(x, r), r)
    # path-compress fully: min over members per root
    root_min: dict[int, int] = {}
    for x in label:
        r = uf.find(x)
        root_min[r] = min(root_min.get(r, x), x)
    want_components = {x: root_min[uf.find(x)] for x in label}

    got_components = {
        int(r["node"]): int(r["component"])
        for r in connected_components(pairs).collect()
    }
    ok_cc = got_components == want_components
    print(
        f"dedup_components: {len(got_components)} labeled nodes — "
        f"{'MATCH' if ok_cc else 'MISMATCH'} vs union-find"
    )

    # ---- survivors: all ids minus non-minimum component members ---------
    losers = {x for x, c in want_components.items() if x != c}
    got_survivors = {
        int(r["doc_id"])
        for r in near_dedup_survivors(docs.select("doc_id", "text"), pairs)
        .select("doc_id")
        .collect()
    }
    all_ids = {int(r["doc_id"]) for r in docs.select("doc_id").collect()}
    want_survivors = all_ids - losers
    ok_sv = got_survivors == want_survivors
    print(
        f"dedup_near_survivors: {len(got_survivors)} survivors "
        f"({len(losers)} losers) — {'MATCH' if ok_sv else 'MISMATCH'} "
        "vs union-find"
    )
    spark.stop()
    return 0 if (ok_cc and ok_sv) else 1


if __name__ == "__main__":
    raise SystemExit(main())
