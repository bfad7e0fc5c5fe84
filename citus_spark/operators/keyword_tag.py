"""Dictionary keyword tagging — annotate every document with the
controlled-vocabulary terms it contains (taxonomy tagging, blocklist
screening, topic routing: the FlashText/Aho-Corasick job of a data
pipeline).

Spark-first mapping: the dictionary is a BROADCAST structure; the
corpus streams past it once. For word-boundary matching over the
token array the whole kernel is JVM-side set algebra —
``array_intersect(tokens, dict)`` per row against a broadcast array
literal — no Python, no shuffle (one narrow map), trivially linear at
100 TB. (A substring-match variant would swap in an Arrow-batched
Aho-Corasick kernel; word-boundary semantics is what taxonomy tagging
wants and what stays in whole-stage codegen.)

Determinism: tags are the sorted intersection — a pure set function
of the row, partition-proof, and re-derivable by any engine
(DuckDB: list_intersect + list_sort), so this is an r8 oracle
candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tag_keywords(
    docs: DataFrame,
    text_col: str,
    keywords: list[str],
    out_col: str = "tags",
) -> DataFrame:
    """→ docs + `out_col` array<string>: the sorted dictionary terms
    present (word-boundary, case-insensitive) in the text."""
    if not keywords:
        raise ValueError("tag_keywords: empty dictionary")
    dict_lit = "array(" + ", ".join(
        "'" + k.lower().replace("'", "''") + "'" for k in sorted(keywords)
    ) + ")"
    toks = (
        f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
    )
    return docs.withColumn(
        out_col,
        F.expr(f"array_sort(array_intersect({toks}, {dict_lit}))"),
    )


def keyword_doc_frequencies(
    docs: DataFrame, text_col: str, keywords: list[str]
) -> DataFrame:
    """Per-keyword document frequency — the dictionary-health report
    (dead terms, over-broad terms). One explode + one hash agg."""
    tagged = tag_keywords(docs, text_col, keywords)
    return (
        tagged.select(F.explode("tags").alias("keyword"))
        .groupBy("keyword")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("keyword")
    )
