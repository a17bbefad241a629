"""Index schema: which corpus columns are text/keyword/numeric, and how
text is analyzed.

Mirrors the reference's ``schema.json`` surface
(searchlite-core/src/index/manifest.rs:81-98: ``doc_id_field``,
``text_fields``, ``keyword_fields``, ``numeric_fields``, ``analyzers``)
minus the stored/fast flags — in Spark every corpus column is already
both stored (the docs table is the docstore) and fast (Parquet is
columnar).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from searchlite_spark.analysis.analyzer import Analyzer, build_analyzer


@dataclass(frozen=True)
class TextField:
    name: str
    analyzer: str = "default"
    search_analyzer: str | None = None  # defaults to `analyzer`
    # (min_gram, max_gram) -> auto-generate the index analyzer as the
    # base analyzer + a trailing edge_ngram filter, search analyzer
    # unchanged (reference manifest.rs:193-213)
    search_as_you_type: tuple[int, int] | None = None


@dataclass(frozen=True)
class KeywordField:
    name: str


@dataclass(frozen=True)
class NumericField:
    name: str
    i64: bool = True


@dataclass(frozen=True)
class IndexSchema:
    doc_id_field: str
    text_fields: tuple[TextField, ...] = ()
    keyword_fields: tuple[KeywordField, ...] = ()
    numeric_fields: tuple[NumericField, ...] = ()
    # analyzer name -> definition dict (None => built-in default)
    analyzers: tuple[tuple[str, dict | None], ...] = ()

    def analyzer(self, name: str) -> Analyzer:
        if name == "default":
            for n, d in self.analyzers:
                if n == "default":
                    return build_analyzer(d)
            return Analyzer()
        for n, d in self.analyzers:
            if n == name:
                return build_analyzer(d)
        raise ValueError(f"unknown analyzer `{name}`")

    def index_analyzer_for(self, field_name: str) -> Analyzer:
        tf = self._text(field_name)
        base = self.analyzer(tf.analyzer)
        if tf.search_as_you_type:
            mn, mx = (int(x) for x in tf.search_as_you_type)
            if mn <= 0 or mx <= 0 or mn > mx:
                raise ValueError("search_as_you_type grams must be 0 < min <= max")
            return Analyzer(
                tokenizer=base.tokenizer,
                filters=base.filters + (("edge_ngram", (mn, mx)),),
            )
        return base

    def search_analyzer_for(self, field_name: str) -> Analyzer:
        tf = self._text(field_name)
        return self.analyzer(tf.search_analyzer or tf.analyzer)

    def _text(self, name: str) -> TextField:
        for tf in self.text_fields:
            if tf.name == name:
                return tf
        raise ValueError(f"`{name}` is not a text field")

    @property
    def text_field_names(self) -> list[str]:
        return [t.name for t in self.text_fields]

    @property
    def keyword_field_names(self) -> list[str]:
        return [k.name for k in self.keyword_fields]

    @property
    def numeric_field_names(self) -> list[str]:
        return [n.name for n in self.numeric_fields]

    def field_kind(self, name: str) -> str:
        if name in self.text_field_names:
            return "text"
        if name in self.keyword_field_names:
            return "keyword"
        if name in self.numeric_field_names:
            return "numeric"
        raise ValueError(f"unknown field `{name}`")

    def to_dict(self) -> dict:
        return {
            "doc_id_field": self.doc_id_field,
            "text_fields": [
                {"name": t.name, "analyzer": t.analyzer,
                 "search_analyzer": t.search_analyzer,
                 "search_as_you_type": list(t.search_as_you_type)
                 if t.search_as_you_type else None}
                for t in self.text_fields
            ],
            "keyword_fields": [{"name": k.name} for k in self.keyword_fields],
            "numeric_fields": [
                {"name": n.name, "i64": n.i64} for n in self.numeric_fields
            ],
            "analyzers": [[n, d] for n, d in self.analyzers],
        }

    @staticmethod
    def from_dict(d: dict) -> "IndexSchema":
        return IndexSchema(
            doc_id_field=d["doc_id_field"],
            text_fields=tuple(
                TextField(t["name"], t.get("analyzer", "default"),
                          t.get("search_analyzer"),
                          tuple(t["search_as_you_type"])
                          if t.get("search_as_you_type") else None)
                for t in d.get("text_fields", [])
            ),
            keyword_fields=tuple(
                KeywordField(k["name"]) for k in d.get("keyword_fields", [])
            ),
            numeric_fields=tuple(
                NumericField(n["name"], n.get("i64", True))
                for n in d.get("numeric_fields", [])
            ),
            analyzers=tuple((n, cfg) for n, cfg in d.get("analyzers", [])),
        )
