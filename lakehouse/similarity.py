"""Similarity search over an embedding column (array<float>).

Two paths, mirroring what a 100 TB training-data pipeline needs:

- **brute-force cosine top-k** — the exact baseline: broadcast the
  (small) query set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (JVM-side, codegen'd — no Python), rank per query.
- **sign-LSH bucketed ANN** — the scale path: bucket = sign bits of the
  first ``n_bits`` dimensions (axis-aligned random-hyperplane LSH with
  a deterministic, SQL-portable choice of hyperplanes). Candidates only
  compare within their bucket, turning the n×m cross product into an
  equi-join on bucket id. Recall < 1 by construction; the oracle runs
  the identical bucketed algorithm so correctness-of-implementation is
  still exactly checkable.

All cosine math is done in double precision (embeddings cast up from
float32) and rounded to 4 decimals before ranking, with doc-id
tie-breaks, so Spark and the DuckDB oracle produce identical rankings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cos(a, b):
    """Cosine similarity of two array<double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return dot / (na * nb)


def _dbl(col):
    return F.col(col).cast("array<double>")


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    The query side is a handful of rows → broadcast join; the corpus
    side streams map-side with zero shuffle until the final per-query
    top-k (a groupBy on query_id over ≤ |queries|·|corpus| narrow rows
    — at scale, replace the rank with a per-partition partial top-k and
    a tree-reduce merge; semantics identical).
    """
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), _dbl(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), _dbl(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_oracle_sql(
    query_ids: list[int], k: int = 5, table: str = "embeddings"
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM {table} WHERE vec_id IN ({ids})),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM {table}),
    scored AS (
        SELECT query_id, neighbor_id,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(cv, cv))), 4) AS cosine
        FROM q, c WHERE query_id <> neighbor_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


LSH_SEED = 42
LSH_DIM = 64  # embeddings table dimension (TESTDATA.md)


def lsh_hyperplanes(
    dim: int = LSH_DIM, n_bits: int = 16, seed: int = LSH_SEED
) -> list[list[float]]:
    """Deterministic random-hyperplane matrix for sign-LSH.

    Gaussian rows (the standard SimHash/random-projection family),
    rounded to 6 decimals so the same matrix embeds EXACTLY into both
    the Spark plan and the DuckDB oracle as double literals — both
    engines then evaluate the identical left-to-right double dot
    product, so bucket ids agree bit-for-bit. Round 1 used the sign
    bits of the first 4 raw dims (16 buckets — a real scale ceiling,
    VERDICT.md next-round #6); proper seeded hyperplanes decorrelate
    the bits from any one axis and scale to arbitrary n_bits.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_bits, dim))
    return [[float(round(v, 6)) for v in row] for row in h]


def _proj(vec, row: list[float]):
    """JVM-side dot(vec, row) — left-to-right fold, matching the
    oracle's literal a1*v[1] + a2*v[2] + ... evaluation order."""
    arr = F.array(*[F.lit(v) for v in row])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _bucket(vec, hp: list[list[float]]):
    """Sign-LSH bucket id: bit i set iff dot(vec, hp[i]) >= 0."""
    out = F.lit(0).cast("long")
    for i, row in enumerate(hp):
        out = out + (_proj(vec, row) >= 0).cast("long") * F.lit(1 << i)
    return out


def _bucket_sql(hp: list[list[float]], vec_sql: str = "embedding") -> str:
    """The same bucket id as a SQL expression (DuckDB oracle twin)."""
    bits = []
    for i, row in enumerate(hp):
        dot = " + ".join(
            f"({v!r} * {vec_sql}[{j + 1}])" for j, v in enumerate(row)
        )
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(bits)


def _probe_masks(n_bits: int, multiprobe: int) -> list[int]:
    """Bucket-id XOR masks to probe: Hamming distance ≤ multiprobe.

    multiprobe=1 (the default) probes the query's own bucket plus every
    1-bit-flip neighbor — n_bits+1 buckets. Fan-out rides only on the
    tiny broadcast query side; corpus rows are never duplicated.
    """
    masks = [0]
    if multiprobe >= 1:
        masks += [1 << i for i in range(n_bits)]
    if multiprobe >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_bits)
            for j in range(i + 1, n_bits)
        ]
    return masks


def ann_lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 16,
    multiprobe: int = 1,
    dim: int = LSH_DIM,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket plus its Hamming-≤``multiprobe`` neighbor buckets.

    10^12-row shape: corpus rows are bucketed once (one JVM-side
    projection pass, no shuffle), the query side (|queries| ×
    |probe masks| rows) is broadcast, and the candidate search is one
    equi-join on bucket id. With n_bits=16 there are 65,536 buckets —
    each candidate set is ~corpus/2^16 per probe — and multiprobe
    recovers the recall a single bucket loses. Buckets are disjoint, so
    probing needs no dedup.
    """
    hp = lsh_hyperplanes(dim, n_bits, seed)
    with_b = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _dbl(vec_col).alias("cv"),
        _bucket(_dbl(vec_col), hp).alias("bucket"),
    )
    masks = _probe_masks(n_bits, multiprobe)
    q = (
        with_b.filter(F.col("neighbor_id").isin(query_ids))
        .select(
            F.col("neighbor_id").alias("query_id"),
            F.col("cv").alias("qv"),
            F.col("bucket").alias("qbucket"),
        )
        .withColumn(
            "mask", F.explode(F.array(*[F.lit(m) for m in masks]))
        )
        .withColumn("bucket", F.col("mask").bitwiseXOR(F.col("qbucket")))
        .drop("mask", "qbucket")
    )
    scored = (
        F.broadcast(q)
        .join(with_b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_lsh_oracle_sql(
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 16,
    multiprobe: int = 1,
    dim: int = LSH_DIM,
    seed: int = LSH_SEED,
    table: str = "embeddings",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    bucket = _bucket_sql(lsh_hyperplanes(dim, n_bits, seed))
    masks = ", ".join(
        f"({m})" for m in _probe_masks(n_bits, multiprobe)
    )
    return f"""
    WITH wb AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
               ({bucket}) AS bucket
        FROM {table}
    ),
    q AS (SELECT neighbor_id AS query_id, cv AS qv,
                 xor(bucket, probes.mask) AS bucket
          FROM wb CROSS JOIN (VALUES {masks}) probes(mask)
          WHERE neighbor_id IN ({ids})),
    scored AS (
        SELECT query_id, wb.neighbor_id,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(cv, cv))), 4) AS cosine
        FROM q JOIN wb USING (bucket)
        WHERE query_id <> wb.neighbor_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 16,
    n_bands: int = 4,
    dim: int = LSH_DIM,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Banded sign-LSH (the MinHash-LSH band trick applied to hyperplane
    bits): the ``n_bits`` bucket id is split into ``n_bands`` bands and
    a pair becomes a candidate when ANY band agrees — per-band
    equi-joins only, unioned then de-duplicated. For near-dups at
    cos ≥ 0.95, a single 16-bit bucket match has ~0.2 recall (each bit
    flips with p ≈ angle/π); 4 bands of 4 bits push detection to ~0.99
    while keeping every join an equi-join.
    """
    hp = lsh_hyperplanes(dim, n_bits, seed)
    if n_bits % n_bands:
        raise ValueError("n_bits must divide evenly into n_bands")
    rbits = n_bits // n_bands
    with_b = emb.select(
        F.col(id_col).alias("vid"),
        _dbl(vec_col).alias("v"),
        _bucket(_dbl(vec_col), hp).alias("bucket"),
    )
    banded = (
        with_b.select(
            "vid",
            "v",
            "bucket",
            F.explode(
                F.array(*[F.lit(band) for band in range(n_bands)])
            ).alias("band"),
        )
        .withColumn(
            "bb",
            F.expr(f"shiftright(bucket, band * {rbits}) & {(1 << rbits) - 1}"),
        )
        .drop("bucket")
    )
    a = banded.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"), "band", "bb"
    )
    b = banded.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"), "band", "bb"
    )
    return (
        a.join(b, ["band", "bb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_cos(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()  # a pair may agree on several bands
    )


def embedding_near_dup_oracle_sql(
    threshold: float = 0.95,
    n_bits: int = 16,
    n_bands: int = 4,
    dim: int = LSH_DIM,
    seed: int = LSH_SEED,
    table: str = "embeddings",
) -> str:
    bucket = _bucket_sql(lsh_hyperplanes(dim, n_bits, seed))
    if n_bits % n_bands:
        raise ValueError("n_bits must divide evenly into n_bands")
    rbits = n_bits // n_bands
    bands = ", ".join(f"({band})" for band in range(n_bands))
    return f"""
    WITH wb AS (
        SELECT vec_id AS vid, embedding::DOUBLE[] AS v, ({bucket}) AS bucket
        FROM {table}
    ),
    banded AS (
        SELECT vid, v, bands.band AS band,
               (bucket >> (bands.band * {rbits})) & {(1 << rbits) - 1} AS bb
        FROM wb CROSS JOIN (VALUES {bands}) bands(band)
    )
    SELECT DISTINCT a.vid AS id_a, b.vid AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bb = b.bb AND a.vid < b.vid
    WHERE round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 4) >= {threshold}
    """
