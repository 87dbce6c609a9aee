"""Text-analysis operators for training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` only —
no Python UDFs in any hot path — so the expressions stay inside
whole-stage codegen and are portable to a SQL oracle (DuckDB) for the
driver's correctness gate. The reference repo has no text ops; these are
the training-pipeline extensions the target engine adds on top of the
reference's ingest surface (SURVEY.md §2, "beyond the reference").

Scale notes (100 TB): every operator is a narrow per-row projection or
an explode→groupBy whose shuffle key is (doc_id) — partial aggregation
applies, no skew (doc_id is unique), and all string work is codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Tiny per-language stopword profiles for the heuristic language
# identifier. Deterministic and mirrored verbatim in the SQL oracle.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "fast", "row"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "que", "de", "los"),
    "fr": ("le", "la", "les", "des", "une"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS: tuple[str, ...] = ("a", "the", "value", "key", "row")

# BPE-ish tokenizer: runs of lowercase letters, runs of digits, or a
# single non-alphanumeric non-space symbol. Same regex in the oracle.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens (the corpus is single-space separated)."""
    return F.split(text, " ")


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_regex(text: Column) -> Column:
    return F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_REGEX}', 0)"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring: lengths, token stats, stopword and
    distinct-token ratios, plus a blended quality score. All ratios are
    rounded to 4 decimals so a double-precision SQL oracle hashes
    identically."""
    from .stablemath import stable_round

    t = F.col(text_col)
    toks = ws_tokens(t)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    n_distinct = F.size(F.array_distinct(toks))
    avg_len = (F.length(t) - (n_tok - 1)) / n_tok  # chars excluding separators
    stop_ratio = n_stop / n_tok
    distinct_ratio = n_distinct / n_tok
    # integer-points score (0..1000-ish): floor'd rationals are exactly
    # reproducible across engines, unlike a 3-term float blend whose
    # last-ulp can flip a round(., 4)
    score_pts = (
        F.least(n_tok, F.lit(64)) * 5
        + F.floor(n_distinct * 400.0 / n_tok)
        - F.floor(n_stop * 100.0 / n_tok)
    ).cast("long")
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        stable_round(avg_len, 4).alias("avg_token_len"),
        stable_round(stop_ratio, 4).alias("stop_ratio"),
        stable_round(distinct_ratio, 4).alias("distinct_ratio"),
        score_pts.alias("quality_pts"),
    )


def quality_oracle_sql(table: str = "documents") -> str:
    from .stablemath import stable_round_sql as _r

    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    SELECT doc_id,
           length(text) AS n_chars_m,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           {_r("(length(text) - (len(string_split(text,' ')) - 1)) * 1.0 / len(string_split(text,' '))")} AS avg_token_len,
           {_r("len(list_filter(string_split(text,' '), w -> list_contains([" + stop + "], w))) * 1.0 / len(string_split(text,' '))")} AS stop_ratio,
           {_r("len(list_distinct(string_split(text,' '))) * 1.0 / len(string_split(text,' '))")} AS distinct_ratio,
           (least(len(string_split(text,' ')), 64) * 5
            + CAST(floor(len(list_distinct(string_split(text,' '))) * 400.0
                         / len(string_split(text,' '))) AS BIGINT)
            - CAST(floor(len(list_filter(string_split(text,' '),
                                         w -> list_contains([{stop}], w)))
                         * 100.0
                         / len(string_split(text,' '))) AS BIGINT))
               AS quality_pts
    FROM {table}
    """


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score = |profile ∩ tokens| per language,
    predict the arg-max with alphabetical tie-break. On the synthetic
    corpus every language shares one vocabulary, so the interesting
    property is determinism, which the oracle cross-checks."""
    toks = F.array_distinct(ws_tokens(F.col(text_col)))
    scores = [
        F.struct(
            F.size(
                F.array_intersect(
                    toks, F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
                )
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(LANG_PROFILES)
    ]
    # arg-max with alphabetical tie-break: sort desc by score, asc by
    # lang; array_sort on struct sorts ascending field-by-field, so
    # negate the score.
    neg = [
        F.struct(
            (-s.getField("score")).alias("nscore"), s.getField("lang").alias("lang")
        )
        for s in scores
    ]
    best = F.array_sort(F.array(*neg)).getItem(0)
    return df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best.getField("lang").alias("pred_lang"),
        (-best.getField("nscore")).alias("pred_score"),
    )


def lang_id_oracle_sql(table: str = "documents") -> str:
    # DuckDB struct literal: {'nscore': ..., 'lang': ...}; list_sort sorts
    # structs field-by-field ascending, same as Spark's array_sort.
    items = []
    for lang in sorted(LANG_PROFILES):
        words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        items.append(
            "{'nscore': -len(list_intersect(list_distinct(string_split(text,' ')),"
            f" [{words}])), 'lang': '{lang}'}}"
        )
    arr = "[" + ", ".join(items) + "]"
    return f"""
    SELECT doc_id,
           lang AS labeled_lang,
           list_sort({arr})[1].lang AS pred_lang,
           -list_sort({arr})[1].nscore AS pred_score
    FROM {table}
    """


def doc_fingerprint(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Rolling-window document fingerprint: the minimum md5 over all
    character k-grams (a 1-min MinHash / winnowing-lite). Identical
    fingerprint ⇒ near-certain shared k-gram; used for fast prefilter
    dedup at scale. md5 is bit-identical across Spark and DuckDB."""
    t = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.length(t) - k),
        lambda i: t.substr(i + 1, F.lit(k)),
    )
    fp = F.array_min(F.transform(grams, F.md5))
    return df.select("doc_id", fp.alias("fingerprint"))


def doc_fingerprint_oracle_sql(table: str = "documents", k: int = 8) -> str:
    return f"""
    SELECT doc_id,
           list_min([md5(text[i+1 : i+{k}])
                     for i in range(0, length(text) - {k} + 1)]) AS fingerprint
    FROM {table}
    """


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways (whitespace + BPE-ish regex)."""
    return df.select(
        "doc_id",
        token_count_ws(F.col(text_col)).alias("n_ws_tokens"),
        token_count_regex(F.col(text_col)).alias("n_regex_tokens"),
    )


def token_stats_oracle_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_regex_tokens
    FROM {table}
    """


# ---------------------------------------------------------------------------
# PII scrubbing / text normalization

# Patterns restricted to syntax that Java regex (Spark) and RE2 (DuckDB)
# interpret identically: no lookaround, no backreferences, greedy
# quantifiers whose leftmost match coincides in both engines. Applied in
# THIS order — URLs first so an address embedded in a URL path is
# redacted as part of the URL, not double-counted as an email.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("urls", r"https?://[^ ]+", "<URL>"),
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ips", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phones", r"\+[0-9][0-9 -]{6,}[0-9]", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII (URLs, emails, IPv4s, +intl phones) with typed
    placeholder tokens and count each kind.

    Counts are taken stepwise on the text AFTER the previous pattern's
    redaction, so an email inside a URL counts once (as the URL) — the
    count always equals the number of placeholders inserted at that
    step. Pure ``regexp_replace``/``regexp_count`` projections: fully
    codegen'd, no shuffle, embarrassingly parallel at any scale.
    """
    t = F.col(text_col)
    out_cols = []
    for name, pat, token in PII_PATTERNS:
        out_cols.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, token)
    return df.select(
        "doc_id",
        t.alias("clean_text"),
        *out_cols,
    )


def pii_scrub_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`pii_scrub` — same patterns, same stepwise
    count-then-redact order via a chained CTE that carries every count
    forward. DuckDB single-quoted literals keep backslashes literal, so
    the patterns embed verbatim (only quotes would need escaping)."""
    sql_src = table
    prev_text = "text"
    ctes = []
    carried: list[str] = []
    for i, (name, pat, token) in enumerate(PII_PATTERNS):
        lit = pat.replace("'", "''")
        cols = ", ".join(["doc_id", *carried]) if carried else "doc_id"
        ctes.append(
            f"s{i} AS (SELECT {cols}, "
            f"len(regexp_extract_all({prev_text}, '{lit}')) AS n_{name}, "
            f"regexp_replace({prev_text}, '{lit}', '{token}', 'g') AS t{i} "
            f"FROM {sql_src})"
        )
        sql_src = f"s{i}"
        prev_text = f"t{i}"
        carried.append(f"n_{name}")
    last = len(PII_PATTERNS) - 1
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT doc_id, t{last} AS clean_text, {', '.join(carried)} "
        + f"FROM s{last}"
    )


# ---------------------------------------------------------------------------
# within-document repetition (Gopher-style quality signals)


def repetition_stats(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style within-document repetition signals over word
    ``n``-grams: gram counts, the most-frequent-gram share, and the
    duplicate-gram fraction (high values mark boilerplate / spam).

    Scale shape: ZERO shuffle — every statistic is computed inside the
    row with JVM higher-order functions (array_sort + an aggregate()
    run-length scan yields the top-gram count), so at 10^12 docs this
    is a pure map over the scan, unlike the explode→groupBy
    formulation which shuffles one row per gram.
    """
    toks = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    srt = F.array_sort(grams)
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(srt, zero, step, lambda acc: acc["best"])
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    safe = F.when(n_grams > 0, n_grams.cast("double"))
    from .stablemath import stable_round

    return df.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        top.alias("top_gram_count"),
        stable_round(
            F.coalesce(top / safe, F.lit(0.0)), 4
        ).alias("top_gram_frac"),
        stable_round(
            F.coalesce((n_grams - n_distinct) / safe, F.lit(0.0)), 4
        ).alias("dup_gram_frac"),
    )


def repetition_oracle_sql(table: str = "documents", n: int = 2) -> str:
    from .stablemath import stable_round_sql as _r

    grams = (
        f"[array_to_string(string_split(text, ' ')[i+1 : i+{n}], ' ')"
        f" for i in range(0, len(string_split(text, ' ')) - {n} + 1)]"
    )
    return f"""
    WITH g AS (SELECT doc_id, {grams} AS grams FROM {table})
    SELECT doc_id,
           len(grams) AS n_grams,
           len(list_distinct(grams)) AS n_distinct_grams,
           coalesce(list_max(list_transform(list_distinct(grams),
                        x -> len(list_filter(grams, y -> y = x)))), 0)
               AS top_gram_count,
           {_r("coalesce(list_max(list_transform(list_distinct(grams), x -> len(list_filter(grams, y -> y = x)))) * 1.0 / nullif(len(grams), 0), 0.0)")} AS top_gram_frac,
           {_r("coalesce((len(grams) - len(list_distinct(grams))) * 1.0 / nullif(len(grams), 0), 0.0)")} AS dup_gram_frac
    FROM g
    """


# ---------------------------------------------------------------------------
# corpus-relative unigram log-probability (perplexity-style quality score)


def unigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mean token log-probability under the CORPUS unigram
    distribution — the cheap stand-in for perplexity filtering: spammy
    or out-of-domain documents score low because their tokens are rare
    corpus-wide.

    Scale shape: two passes. Pass 1 builds the token count table (one
    shuffle keyed on token — vocabulary-sized output, small next to the
    corpus but NOT bounded: vocabulary grows with corpus size (Heaps'
    law — URLs/typos at 100 TB mean billions of distinct tokens), so the
    vocab side carries no broadcast hint; AQE picks broadcast when the
    measured size allows and a shuffle join when it doesn't. The one-row
    grand total IS bounded by construction and broadcasts explicitly.
    """
    tok = df.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    scored = tok.join(cnt, "w").crossJoin(F.broadcast(tot))
    from .stablemath import stable_round

    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        stable_round(F.avg(F.log(F.col("c") / F.col("n"))), 4).alias(
            "unigram_logprob"
        ),
    )


def unigram_logprob_oracle_sql(table: str = "documents") -> str:
    from .stablemath import stable_round_sql as _r

    return f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM {table}),
         cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
         tot AS (SELECT sum(c) AS n FROM cnt)
    SELECT doc_id,
           count(*) AS n_tokens,
           {_r("avg(ln(c * 1.0 / n))")} AS unigram_logprob
    FROM tok JOIN cnt USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """


def bigram_logprob(
    df: DataFrame, text_col: str = "text", k: float = 0.5
) -> DataFrame:
    """Per-document mean bigram log-probability under the CORPUS bigram
    model with add-k smoothing — one step up from
    :func:`unigram_logprob` toward the perplexity filtering of
    CCNet-style LLM data pipelines (Wenzek et al. 2020): incoherent
    word salads score low even when every individual token is common.

    ``log P(w | w_prev) = ln((c(w_prev, w) + k) / (c(w_prev) + k·V))``

    Scale shape: the pair stream comes from one window keyed on doc_id
    (unique key — one skew-free shuffle); bigram and unigram count
    tables are vocabulary-scaled, so neither carries a broadcast hint
    (Heaps' law — AQE decides); the one-row vocabulary size IS bounded
    by construction and broadcasts explicitly. Documents with fewer
    than two tokens have no bigrams and drop out (same in the oracle).
    """
    from pyspark.sql import Window

    tok = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = tok.withColumn("w_prev", F.lag("w").over(w)).where(
        F.col("w_prev").isNotNull()
    )
    big = pairs.groupBy("w_prev", "w").agg(F.count(F.lit(1)).alias("cb"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        pairs.join(big, ["w_prev", "w"])
        .join(
            uni.select(
                F.col("w").alias("w_prev"), F.col("cu").alias("cprev")
            ),
            "w_prev",
        )
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.col("cb") + F.lit(float(k)))
        / (F.col("cprev") + F.lit(float(k)) * F.col("v"))
    )
    from .stablemath import stable_round

    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        stable_round(F.avg(logp), 4).alias("bigram_logprob"),
    )


def bigram_logprob_oracle_sql(table: str = "documents", k: float = 0.5) -> str:
    from .stablemath import stable_round_sql as _r

    return f"""
    WITH tok AS (SELECT doc_id,
                        unnest(ws) AS w,
                        generate_subscripts(ws, 1) AS ord
                 FROM (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM {table})),
         pairs AS (SELECT * FROM (
                     SELECT doc_id,
                            lag(w) OVER (PARTITION BY doc_id
                                         ORDER BY ord) AS w_prev,
                            w
                     FROM tok)
                   WHERE w_prev IS NOT NULL),
         big AS (SELECT w_prev, w, count(*) AS cb FROM pairs GROUP BY 1, 2),
         uni AS (SELECT w, count(*) AS cu FROM tok GROUP BY 1),
         voc AS (SELECT count(*) AS v FROM uni)
    SELECT doc_id,
           count(*) AS n_bigrams,
           {_r(f"avg(ln((cb + {k}) / (cu_prev + {k} * v)))")}
             AS bigram_logprob
    FROM pairs
    JOIN big USING (w_prev, w)
    JOIN (SELECT w AS w_prev, cu AS cu_prev FROM uni) USING (w_prev)
    CROSS JOIN voc
    GROUP BY doc_id
    """


# --- normalization (the C4/Gopher pre-dedup cleanup) --------------------------

# one literal char class shared verbatim by both engines (an explicit
# ASCII set, NOT \p{Punct}/[[:punct:]], whose unicode memberships differ
# between the JVM and DuckDB regex engines)
_PUNCT_CLASS = r"""[!"#$%&'()*+,\-./:;<=>?@\[\]^_`{|}~]"""


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    lowercase: bool = True,
    strip_punct: bool = True,
) -> DataFrame:
    """Canonicalize text before dedup/quality scoring — the standard
    C4-style cleanup: lowercase, strip ASCII punctuation (to spaces, so
    token boundaries survive ``don't`` → ``don t``), collapse runs of
    whitespace, trim. Output: ``(doc_id, norm_text, n_tokens)`` with
    ``n_tokens`` counted on the normalized form, so exact dedup over
    ``norm_text`` catches case/punctuation near-dups for free.

    Scale shape: pure ``lower``/``regexp_replace``/``trim`` projections
    — fully codegen'd, zero shuffle. Unicode NFC folding is
    deliberately out of scope: Spark SQL has no built-in normalizer and
    a per-row Python pass is the forbidden slow path; corpora needing
    NFC should fold at ingest (Arrow batch) instead.
    """
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    if strip_punct:
        t = F.regexp_replace(t, _PUNCT_CLASS, " ")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return df.select(
        "doc_id",
        t.alias("norm_text"),
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, " ")))
        .cast("long")
        .alias("n_tokens"),
    )


def normalize_text_oracle_sql(
    table: str = "documents",
    lowercase: bool = True,
    strip_punct: bool = True,
) -> str:
    """DuckDB twin: identical literal patterns, global-flag replaces."""
    expr = "text"
    if lowercase:
        expr = f"lower({expr})"
    if strip_punct:
        lit = _PUNCT_CLASS.replace("'", "''")
        expr = f"regexp_replace({expr}, '{lit}', ' ', 'g')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    return f"""
    WITH n AS (SELECT doc_id, {expr} AS norm_text FROM {table})
    SELECT doc_id, norm_text,
           CAST(CASE WHEN length(norm_text) = 0 THEN 0
                     ELSE len(string_split(norm_text, ' ')) END AS BIGINT)
               AS n_tokens
    FROM n
    """


# --- BM25 retrieval scoring ---------------------------------------------------


def _bm25_query_terms(queries) -> list:
    """(query, term) pairs — lowercased, non-alnum split, deduped per
    query (classic BM25 scores unique query terms)."""
    import re

    pairs = []
    for q in queries:
        seen = set()
        for w in re.split(r"[^a-z0-9]+", q.lower()):
            if w and w not in seen:
                seen.add(w)
                pairs.append((q, w))
    if not pairs:
        raise ValueError("bm25_topk: no non-empty query terms")
    return pairs


def bm25_topk(
    df: DataFrame,
    queries,
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_partitions: int = 64,
) -> DataFrame:
    """Top-``k`` documents per query under BM25 (Robertson-Spärck Jones
    idf, the Okapi tf saturation) — the retrieval primitive data
    curation uses for targeted corpus slices ("find training docs about
    X"). Reference analogue: the reference's analyst queries filter the
    clickstream by literal predicates (`etl/handlers/click_handler.py`
    derives the columns they hit); BM25 is the ranked-text version.

    Scale shape (corpus-scaled parts first): ONE tokenize pass over the
    corpus with the bounded query-term ``isin`` filter applied BEFORE
    any aggregation (document length rides along as a column, so no
    second corpus join), then tf = one shuffle on (doc, term). The
    (N, avgdl) corpus stats are a separate one-row aggregate (second
    text pass — cheaper than carrying unfiltered tokens). Query terms
    and per-term document frequencies are bounded by the query list, so
    both broadcast explicitly. Top-k is TWO-LEVEL: a salted local
    row_number (``salt_partitions`` ways) prunes to salt×k rows per
    query, then the global window ranks only those — a stop-word query
    term can never funnel the whole corpus into one task. ASCII-lowering
    assumed (the documents corpus is ASCII; DuckDB twin lowers
    identically).

    Output: (query, rank, doc_id, bm25) with bm25 rounded to 4 decimals
    BEFORE ranking (ties broken by doc_id) so float association order
    can't flip ranks between engines.
    """
    spark = df.sparkSession
    pairs = _bm25_query_terms(queries)
    terms = sorted({w for _q, w in pairs})
    qdf = spark.createDataFrame(pairs, ["query", "w"])

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    stats = df.select(toks.alias("ts")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("ts")).alias("avgdl"),
    )
    base = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("ts"))
        .select("doc_id", F.size("ts").alias("dl"), F.explode("ts").alias("w"))
        .filter(F.col("w").isin(terms))
    )
    from .stablemath import stable_round

    tf = base.groupBy("doc_id", "dl", "w").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df_t"))

    # qdf / dfreq are bounded by the query list; stats is one row
    scored = (
        tf.join(F.broadcast(qdf), "w")
        .join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(stats))
        .groupBy("query", "doc_id")
        .agg(
            stable_round(
                F.sum(
                    F.log(
                        1.0
                        + (F.col("n_docs") - F.col("df_t") + 0.5)
                        / (F.col("df_t") + 0.5)
                    )
                    * F.col("tf")
                    * (k1 + 1.0)
                    / (
                        F.col("tf")
                        + k1
                        * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                    )
                ),
                4,
            ).alias("bm25")
        )
    )
    local_w = Window.partitionBy(
        "query", F.crc32(F.col("doc_id").cast("string")) % salt_partitions
    ).orderBy(F.desc("bm25"), F.asc("doc_id"))
    pruned = (
        scored.withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= k)
        .drop("_lr")
    )
    global_w = Window.partitionBy("query").orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(global_w))
        .filter(F.col("rank") <= k)
        .select("query", "rank", "doc_id", "bm25")
    )


def bm25_topk_oracle_sql(
    queries,
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB twin: identical tokenization/idf/tf arithmetic, plain
    single-level row_number (the two-level prune is plan shape only)."""
    from .stablemath import stable_round_sql as _r

    pairs = _bm25_query_terms(queries)
    vals = ", ".join(
        "('{}', '{}')".format(q.replace("'", "''"), w.replace("'", "''"))
        for q, w in pairs
    )
    return f"""
    WITH q(query, w) AS (VALUES {vals}),
         base AS (SELECT doc_id,
                         list_filter(string_split_regex(lower(text),
                                     '[^a-z0-9]+'), x -> x <> '') AS ts
                  FROM {table}),
         stats AS (SELECT count(*) AS n_docs, avg(len(ts)) AS avgdl
                   FROM base),
         tok AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS w FROM base),
         tf AS (SELECT doc_id, dl, w, count(*) AS tf FROM tok
                WHERE w IN (SELECT DISTINCT w FROM q)
                GROUP BY doc_id, dl, w),
         dfq AS (SELECT w, count(*) AS df_t FROM tf GROUP BY w),
         sc AS (SELECT q.query, tf.doc_id,
                       {_r(f"sum(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5)) * tf * ({k1} + 1.0) / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl)))")} AS bm25
                FROM tf JOIN q USING (w) JOIN dfq USING (w)
                CROSS JOIN stats
                GROUP BY q.query, tf.doc_id),
         rk AS (SELECT query, doc_id, bm25,
                       row_number() OVER (PARTITION BY query
                           ORDER BY bm25 DESC, doc_id) AS rank
                FROM sc)
    SELECT query, rank, doc_id, bm25 FROM rk WHERE rank <= {k}
    """


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, §A1.1) — the named
    heuristic ruleset production pretraining pipelines apply before
    model-based filtering. The subset computable without line
    structure: word-count bounds, mean-word-length bounds (evaluated
    as INTEGER cross-multiplications, so the oracle hashes exactly),
    symbol-to-word ratio (#/ellipsis), alphabetic-word fraction, and
    minimum stop-word count. The paper's line-shape rules (bullet /
    ellipsis line fractions) need line structure this corpus lacks —
    their repetition-family cousins live in ``repetition_signals`` and
    ``dedup_windows``. One codegen'd projection per doc: zero shuffle,
    trivially 100 TB-parallel."""
    t = F.col(text_col)
    toks = ws_tokens(t)
    n_tok = F.size(toks)
    chars_ns = F.length(t) - (n_tok - 1)  # chars excluding separators
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_uell = F.length(t) - F.length(F.regexp_replace(t, "…", ""))
    n_dell = (
        F.length(t) - F.length(F.replace(t, F.lit("...")))
    ) / F.lit(3)
    n_sym = (n_hash + n_uell + n_dell).cast("double")
    ok_wc = (n_tok >= min_words) & (n_tok <= max_words)
    ok_mwl = (chars_ns >= min_mean_word_len * n_tok) & (
        chars_ns <= max_mean_word_len * n_tok
    )
    ok_sym = n_sym <= F.lit(float(max_symbol_ratio)) * n_tok
    ok_alpha = n_alpha >= F.lit(float(min_alpha_word_ratio)) * n_tok
    ok_stop = n_stop >= min_stopwords
    return df.select(
        "doc_id",
        n_tok.alias("n_words"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_sym & ok_alpha & ok_stop).alias("keep"),
    )


def gopher_rules_oracle_sql(
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
    table: str = "documents",
) -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH b AS (
        SELECT doc_id, text,
               string_split(text, ' ') AS ts,
               len(string_split(text, ' ')) AS n_tok,
               length(text) - (len(string_split(text, ' ')) - 1) AS chars_ns
        FROM {table}
    ),
    m AS (
        SELECT doc_id, n_tok, chars_ns,
               len(list_filter(ts, w -> list_contains([{stop}], w))) AS n_stop,
               len(list_filter(ts, w -> regexp_matches(w, '[A-Za-z]')))
                   AS n_alpha,
               (length(text) - length(replace(text, '#', '')))
               + (length(text) - length(replace(text, '…', '')))
               + (length(text) - length(replace(text, '...', ''))) / 3.0
                   AS n_sym
        FROM b
    )
    SELECT doc_id,
           n_tok AS n_words,
           (n_tok >= {min_words} AND n_tok <= {max_words}) AS ok_word_count,
           (chars_ns >= {min_mean_word_len} * n_tok
            AND chars_ns <= {max_mean_word_len} * n_tok)
               AS ok_mean_word_len,
           (n_sym <= {max_symbol_ratio!r} * n_tok) AS ok_symbol_ratio,
           (n_alpha >= {min_alpha_word_ratio!r} * n_tok) AS ok_alpha_words,
           (n_stop >= {min_stopwords}) AS ok_stopwords,
           ((n_tok >= {min_words} AND n_tok <= {max_words})
            AND (chars_ns >= {min_mean_word_len} * n_tok
                 AND chars_ns <= {max_mean_word_len} * n_tok)
            AND (n_sym <= {max_symbol_ratio!r} * n_tok)
            AND (n_alpha >= {min_alpha_word_ratio!r} * n_tok)
            AND (n_stop >= {min_stopwords})) AS keep
    FROM m
    """
