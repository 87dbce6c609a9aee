"""Deduplication operators for training-data pipelines.

Five families, all expressed in JVM-side DataFrame ops (portable to the
DuckDB oracle, zero Python in the hot path):

- exact            hash-groupBy on the content column
- n-gram Jaccard   shingle explode → self-join on shingle → Jaccard
- MinHash + LSH    md5-based minhash signatures → banded buckets →
                   candidate join → exact-Jaccard verify
- SimHash          64-bit sign-aggregated token-hash → pigeonhole
                   chunk-join → Hamming filter
- embedding cosine near-dup pairs over an embedding column (delegated
                   to lakehouse.similarity)

Scale notes (100 TB): exact dedup is one shuffle on the content hash
(group on md5(text), not text, to keep shuffle rows narrow). The
shingle self-join prunes by frequency (`max_shingle_freq`) so stop-
shingles can't produce quadratic candidate blowup. MinHash bands and
SimHash chunks both turn O(n²) pair search into equi-joins on bucket
keys — the only join shapes that survive a 10^12-row corpus.

md5 is used as the portable hash everywhere: Spark's ``md5`` and
DuckDB's ``md5`` return identical lowercase hex, so signatures — and
therefore buckets, candidates, and survivors — match the oracle
bit-for-bit. (xxhash64 exists only on the Spark side.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stablemath import stable_round

# ---------------------------------------------------------------------------
# exact


def dedup_exact(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Group identical content; keep the smallest doc_id as canonical."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def dedup_exact_oracle_sql(table: str = "documents") -> str:
    return f"""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS dup_count
    FROM {table}
    GROUP BY md5(text)
    """


# ---------------------------------------------------------------------------
# word-shingles (shared by Jaccard + MinHash)


def _shingles(df: DataFrame, content_col: str, k: int) -> DataFrame:
    """(doc_id, shingle) with distinct word k-grams per doc. Documents
    shorter than ``k`` tokens yield NO shingles (filtered before the
    gram expression — sequence(0, negative) would throw), exactly like
    the oracle's empty range comprehension; they can never pair."""
    toks = F.split(F.col(content_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return df.filter(F.size(toks) >= k).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def _shingles_sql(table: str, k: int) -> str:
    return f"""
    SELECT doc_id,
           unnest(list_distinct(
               [array_to_string(string_split(text, ' ')[i+1 : i+{k}], ' ')
                for i in range(0, len(string_split(text, ' ')) - {k} + 1)]
           )) AS shingle
    FROM {table}
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """All doc pairs with word-k-gram Jaccard ≥ threshold.

    Candidate generation is an equi-join on shared shingles; shingles
    occurring in more than ``max_shingle_freq`` docs are dropped from
    candidate generation (they'd be quadratic) — at the default 1000
    this only suppresses stop-shingles, and any pair sharing ONLY
    stop-shingles has Jaccard ≈ 0 anyway.
    """
    sh = _shingles(df, content_col, k).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") <= max_shingle_freq)
        .select("shingle")
    )
    shr = sh.join(rare, "shingle")
    inter = (
        shr.alias("a")
        .join(shr.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .select(
            "doc_a",
            "doc_b",
            stable_round(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_oracle_sql(
    table: str = "documents",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
) -> str:
    from .stablemath import stable_round_sql

    _jac = stable_round_sql(
        "inter * 1.0 / (sa.n_sh + sb.n_sh - inter)", 4
    )
    return f"""
    WITH sh AS ({_shingles_sql(table, k)}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    rare AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING count(*) <= {max_shingle_freq}),
    shr AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM shr a JOIN shr b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {_jac} AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE {_jac} >= {threshold}
    """


# ---------------------------------------------------------------------------
# MinHash + LSH


_MINHASH_PRIME = 4294967311  # smallest prime > 2^32


def _minhash_coeffs(num_hashes: int, seed: int = 2024):
    """Deterministic affine-family coefficients (a, b), embedded as
    literals in BOTH the Spark plan and the oracle SQL. a < 2^31 and
    x < 2^32 keep a*x + b < 2^63 — no BIGINT overflow in either
    engine."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, 1 << 31), rnd.randrange(0, _MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    content_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(doc_id, sig: array<bigint>) — sig[i] = min over shingles of
    (a_i * x + b_i) mod p, where x is the first 32 bits of md5(shingle)
    and p = 4294967311 (the classic MinHash affine family).

    Cost shape: ONE md5 per shingle row (the r1 implementation paid
    ``num_hashes`` md5s per shingle — 16x the hash work); the family
    members are four integer ops each, all inside whole-stage codegen.
    Portability: hex-slice parsing is ``conv(s,16,10)`` in Spark and
    ``'0x'||s :: BIGINT`` in DuckDB — probed identical; modulo of
    non-negative BIGINTs agrees in both engines."""
    sh = _shingles(df, content_col, k)
    x = F.expr(
        "CAST(conv(substring(md5(shingle), 1, 8), 16, 10) AS BIGINT)"
    ).alias("x")
    hashed = sh.select("doc_id", x).select(
        "doc_id",
        *[
            ((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(_MINHASH_PRIME)).alias(
                f"h{i}"
            )
            for i, (a, b) in enumerate(_minhash_coeffs(num_hashes))
        ],
    )
    return hashed.groupBy("doc_id").agg(
        F.array(
            *[F.min(f"h{i}") for i in range(num_hashes)]
        ).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.2,
) -> DataFrame:
    """LSH-banded candidate pairs, verified with exact shingle Jaccard.

    Pipeline: minhash sigs → band keys (md5 of r concatenated minhashes)
    → group docs per (band, key) bucket → pair within bucket → dedup
    pairs → verify true Jaccard ≥ threshold. Every stage is an equi-
    shuffle on a hash key: no cross joins anywhere.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, content_col, k, num_hashes)
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col("sig")[b * r + j].cast("string")
                                    for j in range(r)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey")
    cand = (
        band_rows.alias("a")
        .join(band_rows.alias("b"), ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with exact Jaccard (reuses the shingle machinery):
    # count shared shingles per candidate pair via two equi-joins
    sh = _shingles(df, content_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_sh", "n_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            stable_round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_oracle_sql(
    table: str = "documents",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.2,
) -> str:
    assert num_hashes % bands == 0
    r = num_hashes // bands
    p = _MINHASH_PRIME
    sig_cols = ", ".join(
        f"min(({a} * x + {b}) % {p}) AS h{i}"
        for i, (a, b) in enumerate(_minhash_coeffs(num_hashes))
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5({' || chr(124) || '.join(f'CAST(h{b * r + j} AS VARCHAR)' for j in range(r))}) AS bkey "
        "FROM sigs"
        for b in range(bands)
    )
    from .stablemath import stable_round_sql

    _jac = stable_round_sql(
        "inter * 1.0 / (sa.n_sh + sb.n_sh - inter)", 4
    )
    return f"""
    WITH sh AS ({_shingles_sql(table, k)}),
    shx AS (
        SELECT doc_id,
               CAST('0x' || substring(md5(shingle), 1, 8) AS BIGINT) AS x
        FROM sh
    ),
    sigs AS (SELECT doc_id, {sig_cols} FROM shx GROUP BY doc_id),
    band_rows AS ({band_selects}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM band_rows a JOIN band_rows b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT doc_a, doc_b, count(*) AS inter
        FROM cand
        JOIN sh a ON a.doc_id = doc_a
        JOIN sh b ON b.doc_id = doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           {_jac} AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE {_jac} >= {threshold}
    """


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected-component duplicate-cluster assignment: one row per
    document with ``cluster_id`` = the MINIMUM id reachable through the
    near-dup pair graph (singletons label themselves). The standard
    final step of web-scale dedup pipelines — pairwise victims
    under-count transitive families; downstream policy ("keep one per
    cluster", "weight by cluster size") needs the component id.

    Scale shape: min-label propagation. Labels start as each node's own
    id; every round equi-joins the label frame to the symmetrized edge
    list (one shuffle keyed on node id, sized |V|+|E| — never the
    corpus, never a cross join) and lowers each node's label to the min
    over itself and its neighbours' labels. Labels only decrease, and
    the component minimum spreads one hop per round, so the loop
    converges in O(component diameter) rounds — near-dup components are
    band-connected and dense, diameter 2-4 in practice. The fixpoint
    test is a changed-label count (one metadata-sized action per
    round); ``max_iters`` bounds pathological chain graphs. For graphs
    with adversarial diameter, pre-contract with alternating
    star-contraction rounds (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) before propagating.
    """
    edges = (
        pairs.select(F.col(a_col).alias("v"), F.col(b_col).alias("u"))
        .unionByName(
            pairs.select(F.col(b_col).alias("v"), F.col(a_col).alias("u"))
        )
        .distinct()
        .persist()
    )
    # localCheckpoint per round TRUNCATES the plan lineage — iterative
    # DataFrame loops otherwise stack one join-tree per round and
    # re-analysis blows up long before the data does. (On a real
    # cluster with executor loss concerns, set a reliable checkpoint
    # dir and use .checkpoint() — same shape, durable storage.)
    labels = (
        df.select(F.col(id_col).alias("u"))
        .distinct()
        .withColumn("lbl", F.col("u"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iters):
            neigh = (
                edges.join(labels.select(F.col("u").alias("v"), "lbl"), "v")
                .groupBy("u")
                .agg(F.min("lbl").alias("nlbl"))
            )
            new_labels = (
                labels.withColumnRenamed("lbl", "old")
                .join(neigh, "u", "left")
                .select(
                    "u",
                    F.least(
                        F.col("old"), F.coalesce("nlbl", F.col("old"))
                    ).alias("lbl"),
                    "old",
                )
                .localCheckpoint()
            )
            changed = new_labels.filter(F.col("lbl") != F.col("old")).count()
            labels = new_labels.select("u", "lbl")
            if changed == 0:
                break
        return labels.select(
            F.col("u").alias(id_col), F.col("lbl").alias("cluster_id")
        )
    finally:
        edges.unpersist()


def dedup_clusters_oracle_sql(
    table: str = "documents",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.2,
) -> str:
    """DuckDB twin: transitive closure of the (same-parameter)
    MinHash-LSH pair graph via a recursive CTE; cluster_id = min
    reachable id. Near-dup components are tiny, so the closure is
    cheap at oracle scale."""
    pair_sql = minhash_lsh_oracle_sql(
        table, k=k, num_hashes=num_hashes, bands=bands, threshold=threshold
    )
    return f"""
    WITH RECURSIVE p AS ({pair_sql}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM p
        UNION
        SELECT doc_b, doc_a FROM p
    ),
    walk(u, lbl) AS (
        SELECT doc_id, doc_id FROM {table}
        UNION
        SELECT e.u, w.lbl FROM edges e JOIN walk w ON e.v = w.u
    )
    SELECT u AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY u
    """


# ---------------------------------------------------------------------------
# SimHash


def _hex_nibble(ch):
    """Map a lowercase hex char column to its int value (JVM-side)."""
    return F.instr(F.lit("0123456789abcdef"), ch) - 1


def simhash64(df: DataFrame, content_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc, computed entirely with built-in functions.

    Per doc: for each distinct whitespace token take the first 16 hex
    chars of md5(token) as a 64-bit pattern; simhash bit b is set iff
    the sum over tokens of ±1 (bit b set → +1) is positive. Unrolled as
    16 nibble-columns × explode over tokens → one groupBy(doc_id) with
    partial aggregation; no Python anywhere.
    """
    toks = df.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.col(content_col), " "))
        ).alias("tok"),
    ).select("doc_id", F.md5(F.col("tok")).alias("h"))
    # nibble value of hex char j (0-based) of the md5
    nib = [
        _hex_nibble(F.substring(F.col("h"), j + 1, 1)) for j in range(16)
    ]
    # bit b (0 = MSB of the 64-bit pattern) lives in nibble b//4,
    # position 3 - b%4 from its LSB
    bit_exprs = []
    for b in range(64):
        n = nib[b // 4]
        shift = 3 - (b % 4)
        bit = F.shiftright(n, shift) % 2
        bit_exprs.append((bit * 2 - 1).alias(f"c{b}"))
    contrib = toks.select("doc_id", *bit_exprs)
    agg = contrib.groupBy("doc_id").agg(
        *[F.sum(f"c{b}").alias(f"s{b}") for b in range(64)]
    )
    # assemble the signed 64-bit value: sum of bit<<(63-b); the MSB term
    # wraps to Long.MIN_VALUE, matching the oracle's BIGINT shift
    val = F.lit(0).cast("long")
    for b in range(64):
        bitset = (F.col(f"s{b}") > 0).cast("long")
        val = val + F.shiftleft(bitset, 63 - b)
    return agg.select("doc_id", val.alias("simhash"))


def simhash_oracle_sql(table: str = "documents") -> str:
    nib = [
        f"(strpos('0123456789abcdef', h[{j + 1}:{j + 1}]) - 1)"
        for j in range(16)
    ]
    terms = []
    for b in range(64):
        n = nib[b // 4]
        shift = 3 - (b % 4)
        bit = f"(({n} >> {shift}) & 1)"
        terms.append(f"sum({bit} * 2 - 1) AS s{b}")
    # DuckDB raises on BIGINT shift overflow, so the sign bit (b=0,
    # shift 63) contributes Long.MIN_VALUE directly — same two's
    # complement value Spark's shiftleft wraps to.
    val_terms = " + ".join(
        (
            f"(CASE WHEN s{b} > 0 THEN (-9223372036854775807 - 1) "
            "ELSE 0::BIGINT END)"
            if b == 0
            else f"(CASE WHEN s{b} > 0 THEN 1::BIGINT ELSE 0::BIGINT END "
            f"<< {63 - b})"
        )
        for b in range(64)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, md5(unnest(list_distinct(string_split(text, ' ')))) AS h
        FROM {table}
    ),
    agg AS (SELECT doc_id, {', '.join(terms)} FROM toks GROUP BY doc_id)
    SELECT doc_id, ({val_terms}) AS simhash FROM agg
    """


def hamming_pairs64(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    *,
    max_hamming: int = 3,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
) -> DataFrame:
    """Pairs of ids whose 64-bit ``hash_col`` values differ in ≤
    ``max_hamming`` bits — shared pigeonhole engine behind SimHash text
    near-dup AND audio fingerprint near-dup.

    Candidate generation: split the hash into 4 16-bit chunks; distance
    ≤ 3 ⇒ at least one chunk matches exactly, so candidates come from 4
    equi-joins on (chunk_idx, chunk_value) — never a cross join.
    Verification is xor + bit_count. Requires max_hamming ≤ 3 for the
    4-chunk pigeonhole to be complete."""
    if max_hamming > 3:
        raise ValueError("4-chunk pigeonhole is complete only for ≤ 3")
    chunks = df.select(
        F.col(id_col).alias("__id"),
        F.col(hash_col).alias("__h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftrightunsigned(F.col(hash_col), 16 * c)
                        .bitwiseAND(F.lit(65535))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("__id", "__h", "ch.ci", "ch.cv")
    a = chunks.select(
        F.col("__id").alias(out_a), F.col("__h").alias("__ha"), "ci", "cv"
    )
    b = chunks.select(
        F.col("__id").alias(out_b), F.col("__h").alias("__hb"), "ci", "cv"
    )
    cand = (
        a.join(b, ["ci", "cv"])
        .filter(F.col(out_a) < F.col(out_b))
        .select(out_a, out_b, "__ha", "__hb")
        .distinct()
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return cand.select(out_a, out_b, ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def simhash_pairs(
    df: DataFrame, content_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming (the
    shared pigeonhole engine, see :func:`hamming_pairs64`)."""
    sims = simhash64(df, content_col)
    return hamming_pairs64(
        sims, "doc_id", "simhash", max_hamming=max_hamming
    )


def simhash_pairs_oracle_sql(
    table: str = "documents", max_hamming: int = 3
) -> str:
    sims = simhash_oracle_sql(table)
    return f"""
    WITH sims AS ({sims}),
    chunks AS (
        SELECT doc_id, simhash, ci,
               (simhash >> (16 * ci)) & 65535 AS cv
        FROM sims, (SELECT unnest([0, 1, 2, 3]) AS ci)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sim_a, b.simhash AS sim_b
        FROM chunks a JOIN chunks b
          ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# one-call corpus curation


def curate_documents(
    df: DataFrame,
    *,
    content_col: str = "text",
    min_tokens: int = 5,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """One-call training-corpus curation — the flow a 100 TB pretraining
    pipeline runs end-to-end, composed from the oracle-gated stages:

    1. exact dedup: keep the MIN doc_id per identical text (md5 group);
    2. near-dedup: MinHash-LSH candidate pairs verified at true shingle
       Jaccard ≥ ``threshold``; drop each pair's GREATER id (so a
       near-dup cluster's minimum id always survives);
    3. quality floor: at least ``min_tokens`` whitespace tokens.

    Every stage is an equi-shuffle (md5 group, banded LSH buckets,
    broadcast victim anti-join) — no cross joins; returns the surviving
    rows with their original columns.
    """
    t = F.col(content_col)
    keep_ids = (
        df.groupBy(F.md5(t).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    uniq = df.join(keep_ids, "doc_id", "left_semi")
    pairs = minhash_lsh_pairs(
        uniq,
        content_col=content_col,
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
    )
    victims = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # no broadcast hint: web-scale dedup can victimize 30-50% of the
    # corpus, so the victim set is NOT presumed driver-sized — AQE
    # broadcasts while small and shuffles the anti-join when not
    kept = uniq.join(victims, "doc_id", "left_anti")
    from .textops import token_count_ws

    return kept.filter(token_count_ws(t) >= min_tokens)


def curate_documents_oracle_sql(
    table: str = "documents",
    *,
    min_tokens: int = 5,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin of :func:`curate_documents` (nested-CTE composition
    of the per-stage oracles)."""
    pair_sql = minhash_lsh_oracle_sql(
        "uniq", k=k, num_hashes=num_hashes, bands=bands, threshold=threshold
    )
    return f"""
    WITH uniq AS (
        SELECT d.* FROM {table} d
        JOIN (SELECT min(doc_id) AS doc_id FROM {table}
              GROUP BY md5(text)) km USING (doc_id)
    ),
    pairs AS ({pair_sql}),
    victims AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
    SELECT u.* FROM uniq u
    WHERE u.doc_id NOT IN (SELECT doc_id FROM victims)
      AND len(string_split(u.text, ' ')) >= {min_tokens}
    """


# ---------------------------------------------------------------------------
# benchmark decontamination


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    content_col: str = "text",
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word-``k``-gram with an eval/benchmark set.

    The standard pre-training hygiene step: a training document that
    contains a verbatim n-gram from an evaluation benchmark leaks the
    benchmark into the training set (the reference has no analog; this
    extends the LLM-data-pipeline surface per the build brief).

    Scale shape: the eval side is tiny (benchmarks are ~10^5 grams), so
    its distinct gram set is BROADCAST and the 10^12-row training side
    streams map-side through the hash join — the training corpus is
    never shuffled; the only shuffle is the per-doc hit count keyed on
    unique doc_id (skew-free by construction).

    Returns every input doc: (doc_id, n_eval_grams_hit, contaminated).
    """
    train_sh = _shingles(df, content_col, k)
    eval_sh = _shingles(eval_df, content_col, k).select("shingle").distinct()
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_eval_grams_hit"))
    )
    n_hit = F.coalesce(F.col("n_eval_grams_hit"), F.lit(0))
    return (
        df.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_hit.alias("n_eval_grams_hit"),
            (n_hit >= min_hits).cast("int").alias("contaminated"),
        )
    )


def decontaminate_oracle_sql(
    table: str = "documents",
    eval_pred: str = "doc_id % 29 = 0",
    k: int = 8,
    min_hits: int = 1,
) -> str:
    train = f"(SELECT * FROM {table} WHERE NOT ({eval_pred}))"
    ev = f"(SELECT * FROM {table} WHERE {eval_pred})"
    return f"""
    WITH train_sh AS ({_shingles_sql(train, k)}),
         eval_sh AS (SELECT DISTINCT shingle
                     FROM ({_shingles_sql(ev, k)})),
         hits AS (SELECT t.doc_id, count(*) AS n
                  FROM train_sh t JOIN eval_sh e USING (shingle)
                  GROUP BY t.doc_id)
    SELECT d.doc_id,
           coalesce(h.n, 0) AS n_eval_grams_hit,
           CAST(coalesce(h.n, 0) >= {min_hits} AS INT) AS contaminated
    FROM {table} d LEFT JOIN hits h USING (doc_id)
    WHERE NOT ({eval_pred})
    """


def split_leakage_pairs(
    df: DataFrame,
    splits=None,
    content_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.2,
) -> DataFrame:
    """Eval-set hygiene audit: near-duplicate pairs that STRADDLE a
    train/val/test boundary — each one is a leak that inflates eval
    scores (the cross-split face of decontamination; cf. the dedup
    motivation in Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better").

    Composition of two existing exact-twin operators: deterministic
    ``split_assign`` labels (a pure per-row hash — no shuffle) joined
    onto verified MinHash-LSH near-dup pairs on each side. The split
    frames are corpus-scaled projections, so neither join carries a
    broadcast hint (AQE decides). Output: one row per leaking pair with
    both split labels and the exact Jaccard.
    """
    from .sampling import split_assign

    sp = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    assigned = split_assign(df, sp, id_col=id_col, seed=seed).select(
        id_col, "split"
    )
    pairs = minhash_lsh_pairs(
        df, content_col, k=k, num_hashes=num_hashes, bands=bands,
        threshold=threshold,
    )
    sa = assigned.select(
        F.col(id_col).alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = assigned.select(
        F.col(id_col).alias("doc_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "jaccard", "split_a", "split_b")
    )


def split_leakage_oracle_sql(
    splits=None,
    table: str = "documents",
    seed: int = 42,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.2,
) -> str:
    from .sampling import split_assign_oracle_sql

    sp = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    pair_sql = minhash_lsh_oracle_sql(
        table, k=k, num_hashes=num_hashes, bands=bands, threshold=threshold
    )
    assign_sql = split_assign_oracle_sql(sp, seed=seed, table=table)
    return f"""
    WITH pairs AS ({pair_sql}),
    assigned AS (SELECT doc_id, split FROM ({assign_sql}))
    SELECT doc_a, doc_b, jaccard,
           a.split AS split_a, b.split AS split_b
    FROM pairs
    JOIN assigned a ON pairs.doc_a = a.doc_id
    JOIN assigned b ON pairs.doc_b = b.doc_id
    WHERE a.split <> b.split
    """


# ---------------------------------------------------------------------------
# duplicated-window removal (exact-substring / boilerplate dedup)


def dedup_windows(
    df: DataFrame,
    content_col: str = "text",
    *,
    window: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Remove corpus-duplicated token windows from every document.

    The tractable restatement of exact-substring deduplication (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better") for a distributed engine: instead of a corpus-global
    suffix array, each document is cut into NON-overlapping windows of
    ``window`` tokens, and a window whose text occurs in >= ``min_docs``
    DISTINCT documents is dropped from all of them (boilerplate
    headers, license blocks, navigation chrome — the spans that recur
    verbatim across pages). Survivors are re-assembled in original
    order. Documents whose every window is boilerplate drop out
    entirely (exactly what a pretraining curation pass wants).

    Returns (doc_id, text_dedup, kept_windows, total_windows).

    Scale (100 TB): three shuffles, none avoidable for this semantics —
    (1) count pass grouped on md5(window) with the doc id for the
    distinct count (narrow rows: 32-hex + id); (2) the verdict join of
    exploded windows against the count table on the hash (AQE
    broadcasts the count side only when it proves small — boilerplate
    tables usually are after the >=min_docs filter is pushed ABOVE the
    join... it is not pushed here because kept windows need the
    *complement*; the count side stays full-width: one narrow equi-
    join); (3) reassembly groupBy(doc_id). No O(n^2) pair shape
    anywhere; window hashing bounds state by corpus tokens / window.

    md5 keys both sides so buckets match the DuckDB oracle bit-for-bit
    (same convention as every other dedup family in this module).
    """
    toks = F.split(F.col(content_col), " ")
    nwin = F.ceil(F.size(toks) / F.lit(window)).cast("long")
    wins = F.transform(
        F.sequence(F.lit(0), (nwin - 1).cast("int")),
        lambda i: F.struct(
            i.cast("long").alias("w"),
            F.concat_ws(" ", F.slice(toks, i * window + 1, window)).alias(
                "wtext"
            ),
        ),
    )
    exploded = (
        df.filter(F.length(F.col(content_col)) > 0)
        .select(
            "doc_id",
            nwin.alias("total_windows"),
            F.explode(wins).alias("win"),
        )
        .select(
            "doc_id",
            "total_windows",
            F.col("win.w").alias("w"),
            F.col("win.wtext").alias("wtext"),
        )
        .withColumn("h", F.md5(F.col("wtext")))
    )
    counts = exploded.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    kept = exploded.join(counts, "h").filter(F.col("n_docs") < min_docs)
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("w", "wtext"))
                    ),
                    lambda s: s["wtext"],
                ),
                " ",
            ).alias("text_dedup"),
            F.count(F.lit(1)).alias("kept_windows"),
            F.max("total_windows").alias("total_windows"),
        )
    )


def dedup_windows_oracle_sql(
    table: str = "documents",
    *,
    window: int = 3,
    min_docs: int = 2,
) -> str:
    return f"""
    WITH wins AS (
        SELECT doc_id,
               CAST(w AS BIGINT) AS w,
               array_to_string(
                   string_split(text, ' ')[w * {window} + 1 :
                                           w * {window} + {window}],
                   ' ') AS wtext
        FROM {table},
             UNNEST(range(CAST(ceil(
                 len(string_split(text, ' ')) / {window}.0) AS BIGINT)))
             AS r(w)
        WHERE length(text) > 0
    ),
    tot AS (
        SELECT doc_id, count(*) AS total_windows FROM wins GROUP BY doc_id
    ),
    cnt AS (
        SELECT md5(wtext) AS h, count(DISTINCT doc_id) AS n_docs
        FROM wins GROUP BY md5(wtext)
    ),
    kept AS (
        SELECT w.doc_id, w.w, w.wtext
        FROM wins w JOIN cnt c ON md5(w.wtext) = c.h
        WHERE c.n_docs < {min_docs}
    )
    SELECT k.doc_id,
           string_agg(k.wtext, ' ' ORDER BY k.w) AS text_dedup,
           count(*) AS kept_windows,
           any_value(t.total_windows) AS total_windows
    FROM kept k JOIN tot t ON k.doc_id = t.doc_id
    GROUP BY k.doc_id
    """
