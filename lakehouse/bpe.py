"""Distributed BPE tokenizer training and encoding.

Byte-pair-encoding vocabulary learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — the published
algorithm every modern subword tokenizer derives from) re-expressed as
Spark map-reduce. The reference repo has no tokenizer layer; this is
part of the training-data operator suite the engine adds on top of the
reference's ingest surface (SURVEY.md §2, "beyond the reference").

Scale shape (100 TB):

* The corpus collapses to a **word-frequency table** in one
  explode→groupBy shuffle — the classic BPE preprocessing step. The
  word table is Heaps-law bounded but still corpus-scaled, so it STAYS
  distributed for the whole run (cached + ``localCheckpoint`` per merge
  round to truncate the iterative plan lineage, same pattern as
  ``dedup_clusters``).
* Each merge round is ONE job over the word table: explode adjacent
  symbol pairs weighted by word frequency (narrow string rows,
  map-side partial aggregation), reduce by pair, and send exactly ONE
  row — the argmax pair — to the driver. Driver traffic is
  O(num_merges), independent of corpus size.
* Applying the chosen merge is a pure-Catalyst ``aggregate`` over each
  word's symbol array (greedy left-to-right, identical to the published
  reference implementation's scan) — zero Python in the loop.
* Encoding with a learned vocabulary is the one Python boundary
  (ranked-merge BPE is inherently iterative per word): an Arrow-batched
  pandas UDF with a per-executor LRU cache over words, so the Zipf head
  is encoded once per executor, not once per occurrence.

Determinism: pair ties break by (count DESC, left ASC, right ASC) in
both the Spark trainer and the pure-Python reference used by the gates,
so the learned merge sequence is reproducible bit-for-bit.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

END_OF_WORD = "</w>"

_ADJ_PAIRS = (
    "transform(slice(__syms, 1, size(__syms) - 1), "
    "(x, i) -> struct(x AS a, element_at(__syms, i + 2) AS b))"
)

MERGES_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("pair_freq", T.LongType(), False),
    ]
)


def _merge_adjacent(a: str, b: str):
    """Pure-Catalyst greedy left-to-right merge of adjacent (a, b) into
    a+b inside the ``__syms`` array: a single ``aggregate`` scan whose
    accumulator's last element decides the merge — equivalent to the
    published reference scan (a freshly merged token can never re-merge
    as the LEFT side of the same pair because a+b != a)."""
    ab = F.lit(a + b)
    return F.aggregate(
        "__syms",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the one corpus-sized shuffle of a BPE run."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_freq: int = 2,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges over ``df[text_col]``.

    Returns a DataFrame ``(rank, left, right, pair_freq)`` — the merge
    table in training order, the complete artifact needed to encode.
    Stops early when the best remaining pair's frequency drops below
    ``min_freq`` (merging hapax pairs only memorizes the corpus).
    """
    spark = df.sparkSession
    words = word_freqs(df, text_col).withColumn(
        "__syms",
        F.concat(F.split("w", ""), F.array(F.lit(END_OF_WORD))),
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(int(num_merges)):
            best = (
                words.select("freq", F.explode(F.expr(_ADJ_PAIRS)).alias("p"))
                .groupBy("p")
                .agg(F.sum("freq").alias("c"))
                .orderBy(F.desc("c"), F.col("p.a"), F.col("p.b"))
                .limit(1)
                .collect()
            )
            if not best or int(best[0]["c"]) < int(min_freq):
                break
            a, b, c = best[0]["p"]["a"], best[0]["p"]["b"], int(best[0]["c"])
            merges.append((rank, a, b, c))
            prev = words
            words = words.withColumn(
                "__syms", _merge_adjacent(a, b)
            ).localCheckpoint(eager=True)
            prev.unpersist()
    finally:
        words.unpersist()
    return spark.createDataFrame(
        [tuple(m) for m in merges], MERGES_SCHEMA
    )


def py_bpe_train(
    word_freq: dict[str, int], num_merges: int, min_freq: int = 2
) -> list[tuple[int, str, str, int]]:
    """Pure-Python reference trainer (the published algorithm verbatim,
    same tie-break) — used by the self-verifying gates to check the
    distributed trainer merge-for-merge. Driver-side, bounded corpora
    only."""
    words = {w: list(w) + [END_OF_WORD] for w in word_freq}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(num_merges)):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < int(min_freq):
            break
        merges.append((rank, a, b, c))
        for w, syms in words.items():
            words[w] = _py_merge(syms, a, b)
    return merges


def _py_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def make_bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-batched encoder for a learned merge table.

    ``merges`` is the ordered (left, right) list from :func:`bpe_train`
    (driver-collecting the merge table is metadata-bounded: its size is
    the vocabulary budget, e.g. 32k rows, independent of corpus size).
    Encoding applies merges by RANK per word — the published inference
    rule — with an LRU cache so each executor pays the per-word loop
    once per distinct word, not once per occurrence (Zipf head
    amortization)."""
    ranks = {tuple(m): r for r, m in enumerate(merges)}
    # plain dict cache (lru_cache wrappers don't survive cloudpickle);
    # ships empty, fills per executor, size-capped
    cache: dict[str, tuple[str, ...]] = {}

    def encode_word(w: str) -> tuple[str, ...]:
        got = cache.get(w)
        if got is not None:
            return got
        syms = list(w) + [END_OF_WORD]
        while len(syms) > 1:
            pairs = [
                (ranks[p], p)
                for p in zip(syms, syms[1:])
                if p in ranks
            ]
            if not pairs:
                break
            _, (a, b) = min(pairs)
            syms = _py_merge(syms, a, b)
        out = tuple(syms)
        if len(cache) < 65536:
            cache[w] = out
        return out

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in t.lower().split():
                toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    return encode


def bpe_encode(
    df: DataFrame,
    merges_df: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Attach BPE tokens for every row using a learned merge table."""
    rows = merges_df.orderBy("rank").collect()
    enc = make_bpe_encode_udf([(r["left"], r["right"]) for r in rows])
    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_coverage(
    df: DataFrame,
    merges_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document tokenizer-fit statistics for a learned vocabulary —
    the coverage audit run before committing a tokenizer to a training
    corpus: ``fertility`` (tokens per word; rises on out-of-domain
    text) and ``char_fallback_ratio`` (fraction of emitted tokens that
    are single raw characters — the BPE equivalent of OOV fallback).

    Scale shape: the one Arrow encode pass :func:`bpe_encode` already
    costs (merge table is vocabulary-bounded on the driver), then
    pure-Catalyst array reductions — no extra shuffle, no join.
    """
    enc = bpe_encode(df, merges_df, text_col, out_col="__toks")
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    # roundtrip invariant, checkable row-by-row: the token stream
    # re-concatenates to the lowercased words each tailed by </w>
    expected = F.concat(
        F.concat_ws(END_OF_WORD, words),
        F.when(F.size(words) > 0, F.lit(END_OF_WORD)).otherwise(F.lit("")),
    )
    return enc.select(
        id_col,
        F.size(words).alias("n_words"),
        F.size("__toks").alias("n_tokens"),
        F.round(
            F.when(
                F.size(words) > 0, F.size("__toks") / F.size(words)
            ),
            4,
        ).alias("fertility"),
        F.round(
            F.when(
                F.size("__toks") > 0,
                F.size(
                    F.filter("__toks", lambda t: F.length(t) == 1)
                )
                / F.size("__toks"),
            ),
            4,
        ).alias("char_fallback_ratio"),
        (F.concat_ws("", "__toks") == expected).alias("roundtrip_ok"),
    )
