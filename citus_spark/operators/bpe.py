"""Byte-pair-encoding tokenizer — train + encode over a corpus.

The tokenization stage of a training-data pipeline (extension surface,
like the rest of the LLM-pipeline operators; the reference has no
tokenizer). Algorithm from the public literature (Sennrich, Haddow,
Birch, "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016 — the word-histogram formulation every practical BPE trainer
uses).

Scale architecture:

- TRAIN: one distributed word-count aggregation reduces the corpus to
  its word-frequency histogram, which is VOCABULARY-sized, not
  corpus-sized — at 100 TB the histogram of a deduplicated web corpus
  is tens of millions of rows, collected with a frequency floor
  (`min_word_count`) that bounds driver memory. The merge loop then
  runs driver-side over the histogram (the standard architecture —
  each merge touches only words containing the pair, tracked by an
  index). Fully deterministic: merge choice breaks count ties on the
  lexicographically smallest pair, so any partitioning trains the
  identical merge table.
- ENCODE: merges broadcast to an Arrow `mapInPandas` kernel; a
  per-batch word→tokens memo makes cost proportional to DISTINCT
  words per batch. No shuffle — encoding is a narrow map.

Training is an iterative algorithm outside the SQL-oracle's reach
(like k-means); the driver-checkable contract is the encode/decode
roundtrip (`bpe_roundtrip` registry entry: reconstructed length is
value-exact against length(text)), plus property tests: determinism
across partitionings, merge applicability, and a known-corpus merge
sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (Sennrich's formulation)


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    min_word_count: int = 1,
) -> list[tuple[str, str]]:
    """Learn `n_merges` merge rules from the corpus. Returns the
    ordered merge list [(left, right), ...]."""
    hist = (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_word_count)
        .collect()
    )
    words: dict[tuple[str, ...], int] = {
        _word_symbols(r.w): int(r.c) for r in hist
    }
    merges: list[tuple[str, str]] = []
    # pair counts + inverted index pair -> words containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for syms, c in words.items():
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(syms)
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic argmax: count desc, then lexicographic pair
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        for syms in list(pair_words.get(best, ())):
            c = words.pop(syms, None)
            if c is None:
                continue
            # un-count the old adjacencies, apply the merge, re-count
            for pa, pb in zip(syms, syms[1:]):
                pair_counts[(pa, pb)] -= c
                if pair_counts[(pa, pb)] <= 0:
                    pair_counts.pop((pa, pb), None)
                ws = pair_words.get((pa, pb))
                if ws is not None:
                    ws.discard(syms)
            new = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            new_t = tuple(new)
            words[new_t] = words.get(new_t, 0) + c
            for pa, pb in zip(new_t, new_t[1:]):
                pair_counts[(pa, pb)] = pair_counts.get((pa, pb), 0) + c
                pair_words.setdefault((pa, pb), set()).add(new_t)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by rank order (the standard greedy
    lowest-rank-first application)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """→ (id_col, out_col array<string>): the document's subword
    tokens (per-word BPE segments concatenated in order). Narrow
    Arrow map; per-batch word memo."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def kernel(it):
        memo: dict[str, list[str]] = {}
        for pdf in it:
            out = []
            for text in pdf[text_col]:
                toks: list[str] = []
                # NULL text → empty token stream (consistent with the
                # train path, where split/explode drop nulls)
                for w in (text or "").split():
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                out.append(toks)
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: out}
            )

    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, {out_col} array<string>"
    )


def decode_tokens(tokens: list[str]) -> str:
    """Inverse of encoding: concatenate subwords, split words at the
    end-of-word marker."""
    return "".join(tokens).replace(END, " ").rstrip()
