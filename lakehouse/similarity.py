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


def _bucket(vec, n_bits: int):
    """Sign-LSH bucket id: bit i set iff vec[i] >= 0 (first n_bits dims)."""
    bits = [
        (F.element_at(vec, i + 1) >= 0).cast("long") * (1 << i)
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. One equi-join on bucket id instead of a cross product —
    the join key is uniform (sign bits of float dims), so the shuffle
    is balanced; bucket fan-out is corpus/2^n_bits."""
    with_b = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _dbl(vec_col).alias("cv"),
        _bucket(_dbl(vec_col), n_bits).alias("bucket"),
    )
    q = with_b.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"),
        F.col("cv").alias("qv"),
        "bucket",
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
    query_ids: list[int], k: int = 5, n_bits: int = 4, table: str = "embeddings"
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    bucket = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"""
    WITH wb AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
               ({bucket}) AS bucket
        FROM {table}
    ),
    q AS (SELECT neighbor_id AS query_id, cv AS qv, bucket
          FROM wb WHERE neighbor_id IN ({ids})),
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
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, bucketed by
    sign-LSH so the pair search is an equi-join (near-identical vectors
    agree on sign bits with overwhelming probability)."""
    with_b = emb.select(
        F.col(id_col).alias("vid"),
        _dbl(vec_col).alias("v"),
        _bucket(_dbl(vec_col), n_bits).alias("bucket"),
    )
    a = with_b.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"), "bucket"
    )
    b = with_b.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(_cos(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_oracle_sql(
    threshold: float = 0.95, n_bits: int = 4, table: str = "embeddings"
) -> str:
    bucket = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"""
    WITH wb AS (
        SELECT vec_id AS vid, embedding::DOUBLE[] AS v, ({bucket}) AS bucket
        FROM {table}
    )
    SELECT a.vid AS id_a, b.vid AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
    FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vid < b.vid
    WHERE round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 4) >= {threshold}
    """
