"""Training-data ops: Spark result == DuckDB oracle on the same parquet.

This mirrors the driver's correctness gate (tools/check_entry.py) for
the dedup / text-analysis / similarity modules at the smallest scale
factor, so a parity regression fails fast in pytest rather than at
driver verify time.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(
            ("%r" % (r[i],)) if isinstance(r[i], float) else str(r[i])
            for i in order
        )
        for r in rows
    )


def assert_matches_oracle(spark_df, oracle_con, sql):
    rows = [tuple(r) for r in spark_df.collect()]
    res = oracle_con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(spark_df.columns) == sorted(ocols)
    assert len(rows) == len(orows)
    assert _norm(rows, spark_df.columns) == _norm(orows, ocols)


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_dedup_exact(spark, oracle):
    from lakehouse.dedup import dedup_exact, dedup_exact_oracle_sql

    assert_matches_oracle(
        dedup_exact(_docs(spark)), oracle, dedup_exact_oracle_sql()
    )


def test_ngram_jaccard(spark, oracle):
    from lakehouse.dedup import ngram_jaccard_oracle_sql, ngram_jaccard_pairs

    df = ngram_jaccard_pairs(_docs(spark), k=3, threshold=0.1)
    assert_matches_oracle(
        df, oracle, ngram_jaccard_oracle_sql(k=3, threshold=0.1)
    )


def test_minhash_lsh(spark, oracle):
    from lakehouse.dedup import minhash_lsh_oracle_sql, minhash_lsh_pairs

    df = minhash_lsh_pairs(
        _docs(spark), k=3, num_hashes=16, bands=8, threshold=0.05
    )
    assert_matches_oracle(
        df,
        oracle,
        minhash_lsh_oracle_sql(k=3, num_hashes=16, bands=8, threshold=0.05),
    )


def test_dedup_clusters_matches_oracle(spark, oracle):
    from lakehouse.dedup import (
        dedup_clusters,
        dedup_clusters_oracle_sql,
        minhash_lsh_pairs,
    )

    docs = _docs(spark)
    pairs = minhash_lsh_pairs(
        docs, k=3, num_hashes=16, bands=8, threshold=0.1
    )
    assert_matches_oracle(
        dedup_clusters(docs, pairs),
        oracle,
        dedup_clusters_oracle_sql(k=3, num_hashes=16, bands=8, threshold=0.1),
    )


def test_dedup_clusters_transitive_chain(spark):
    """Pairwise victims under-count transitive families; the component
    id must be the min over the WHOLE chain, and singletons label
    themselves."""
    from lakehouse.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (5, 6)], "doc_a bigint, doc_b bigint"
    )
    out = {r.doc_id: r.cluster_id for r in dedup_clusters(docs, pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_dedup_clusters_long_chain_converges(spark):
    """A pure chain is the diameter worst case: the min label must walk
    the full length within max_iters."""
    from lakehouse.dedup import dedup_clusters

    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a bigint, doc_b bigint"
    )
    out = dedup_clusters(docs, pairs).collect()
    assert {r.cluster_id for r in out} == {0}
    assert len(out) == n


def test_simhash_and_pairs(spark, oracle):
    from lakehouse.dedup import (
        simhash64,
        simhash_oracle_sql,
        simhash_pairs,
        simhash_pairs_oracle_sql,
    )

    assert_matches_oracle(simhash64(_docs(spark)), oracle, simhash_oracle_sql())
    assert_matches_oracle(
        simhash_pairs(_docs(spark), max_hamming=2),
        oracle,
        simhash_pairs_oracle_sql(max_hamming=2),
    )


def test_text_quality_langid_tokens_fingerprint(spark, oracle):
    from lakehouse.textops import (
        doc_fingerprint,
        doc_fingerprint_oracle_sql,
        lang_id,
        lang_id_oracle_sql,
        quality_features,
        quality_oracle_sql,
        token_stats,
        token_stats_oracle_sql,
    )

    d = _docs(spark)
    assert_matches_oracle(quality_features(d), oracle, quality_oracle_sql())
    assert_matches_oracle(lang_id(d), oracle, lang_id_oracle_sql())
    assert_matches_oracle(token_stats(d), oracle, token_stats_oracle_sql())
    assert_matches_oracle(
        doc_fingerprint(d, k=8), oracle, doc_fingerprint_oracle_sql(k=8)
    )


def test_cosine_topk_and_ann(spark, oracle):
    from lakehouse.similarity import (
        ann_lsh_oracle_sql,
        ann_lsh_topk,
        cosine_topk,
        cosine_topk_oracle_sql,
    )

    ids = list(range(5))
    assert_matches_oracle(
        cosine_topk(_embs(spark), ids, k=3),
        oracle,
        cosine_topk_oracle_sql(ids, k=3),
    )
    # higher-bits gate (VERDICT next-round #6): 16 seeded hyperplanes +
    # multiprobe, Spark and DuckDB computing identical bucket ids
    assert_matches_oracle(
        ann_lsh_topk(_embs(spark), ids, k=3, n_bits=16, multiprobe=1),
        oracle,
        ann_lsh_oracle_sql(ids, k=3, n_bits=16, multiprobe=1),
    )


def test_quantize_embeddings_matches_oracle(spark, oracle):
    from lakehouse.similarity import (
        quantize_embeddings,
        quantize_embeddings_oracle_sql,
    )

    assert_matches_oracle(
        quantize_embeddings(_embs(spark)).select("vec_id", "scale", "qnorm2"),
        oracle,
        quantize_embeddings_oracle_sql(),
    )


def test_cosine_topk_int8_matches_oracle_and_recall(spark, oracle):
    """int8 top-k is bit-exact vs the DuckDB twin (scales cancel —
    pure integer arithmetic) AND a faithful stand-in for the float
    ranking: recall@5 vs exact cosine_topk >= 0.9."""
    from lakehouse.similarity import (
        cosine_topk,
        cosine_topk_int8,
        cosine_topk_int8_oracle_sql,
    )

    emb = _embs(spark)
    qids = list(range(8))
    assert_matches_oracle(
        cosine_topk_int8(emb, qids, k=5),
        oracle,
        cosine_topk_int8_oracle_sql(qids, k=5),
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, qids, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_int8(emb, qids, k=5).collect()
    }
    assert len(got & exact) / len(exact) >= 0.9


def test_quantize_embeddings_edge_cases(spark):
    """Zero vectors quantize to zeros with scale 0 (and never reach the
    scored set); components are bounded to [-127, 127]."""
    from pyspark.sql import functions as F

    from lakehouse.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, -1.0]), (2, [0.5, 0.25])],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert list(rows[0].q8) == [0, 0] and rows[0].scale == 0.0
    assert rows[0].qnorm2 == 0
    assert list(rows[1].q8) == [127, -127]
    assert list(rows[2].q8) == [127, 64]  # 0.25/ (0.5/127) = 63.5 -> 64
    assert all(
        -127 <= v <= 127 for r in rows.values() for v in r.q8
    )


def test_embedding_near_dup(spark, oracle):
    from lakehouse.similarity import (
        embedding_near_dup_oracle_sql,
        embedding_near_dup_pairs,
    )

    assert_matches_oracle(
        embedding_near_dup_pairs(_embs(spark), threshold=0.4, n_bits=4),
        oracle,
        embedding_near_dup_oracle_sql(threshold=0.4, n_bits=4),
    )


def test_ann_recall_vs_exact(spark):
    """Sign-LSH ANN is approximate: its hits must never beat the exact
    top-1, and recall@5 must clear a floor when bucket count is matched
    to corpus size (500 vectors → 6 bits = 64 buckets; the synthetic
    embeddings are near-uniform in 64-dim, which caps attainable
    recall — 0.4 is the conservative floor of the measured 0.58)."""
    from lakehouse.similarity import ann_lsh_topk, cosine_topk

    ids = list(range(10))
    exact_top1 = {
        (r.query_id, r.rank): r.cosine
        for r in cosine_topk(_embs(spark), ids, k=1).collect()
    }
    approx_top1 = {
        (r.query_id, r.rank): r.cosine
        for r in ann_lsh_topk(
            _embs(spark), ids, k=1, n_bits=16, multiprobe=1
        ).collect()
    }
    for key, cos in approx_top1.items():
        assert float(cos) <= float(exact_top1[key]) + 1e-9

    exact5 = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(_embs(spark), ids, k=5).collect()
    }

    def recall(multiprobe):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ann_lsh_topk(
                _embs(spark), ids, k=5, n_bits=6, multiprobe=multiprobe
            ).collect()
        }
        return len(approx & exact5) / len(exact5)

    r1, r2 = recall(1), recall(2)
    assert r2 >= 0.4
    # multiprobe widens the candidate set monotonically
    assert r2 >= r1


def test_ann_ivf_matches_oracle(spark, oracle):
    from lakehouse.similarity import ann_ivf_oracle_sql, ann_ivf_topk

    ids = list(range(8))
    assert_matches_oracle(
        ann_ivf_topk(_embs(spark), ids, k=3, n_centroids=8, nprobe=3),
        oracle,
        ann_ivf_oracle_sql(ids, k=3, n_centroids=8, nprobe=3),
    )


def test_ann_ivf_recall_and_training(spark):
    """IVF hits never beat the exact top-1; probing every list IS the
    exact search; sample-trained centroids are valid drop-ins (same
    plan, data-adapted lists)."""
    from lakehouse.similarity import (
        ann_ivf_topk,
        cosine_topk,
        train_ivf_centroids,
    )

    ids = list(range(10))
    emb = _embs(spark)
    exact5 = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, ids, k=5).collect()
    }
    exact_top1 = {
        (r.query_id, r.rank): r.cosine
        for r in cosine_topk(emb, ids, k=1).collect()
    }

    def recall(**kw):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ann_ivf_topk(emb, ids, k=5, **kw).collect()
        }
        return len(approx & exact5) / len(exact5)

    for (key, cos) in (
        (key, r.cosine)
        for r in ann_ivf_topk(emb, ids, k=1, n_centroids=8, nprobe=2).collect()
        for key in [(r.query_id, r.rank)]
    ):
        assert float(cos) <= float(exact_top1[key]) + 1e-9

    # nprobe == n_centroids probes everything -> recall 1.0 exactly
    assert recall(n_centroids=8, nprobe=8) == 1.0
    # partial probing keeps a usable floor and grows monotonically
    r2, r4 = recall(n_centroids=8, nprobe=2), recall(n_centroids=8, nprobe=4)
    assert r4 >= r2 >= 0.25
    # sample-trained spherical-k-means centroids slot into the same plan
    trained = train_ivf_centroids(emb, n_centroids=8, iters=3, sample=500)
    rt = recall(n_centroids=8, nprobe=2, centroids=trained)
    assert 0.25 <= rt <= 1.0


def test_profile_columns_matches_manual(spark):
    """profile_columns: one aggregation job, long-format rows equal to
    per-column manual aggregates (exact distinct, SQL null semantics,
    exact interpolated median)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from lakehouse.profile import profile_columns

    pdf = pd.DataFrame(
        {
            "a": [1, 2, 2, None, 5],
            "s": ["x", None, "y", "x", None],
        }
    )
    df = spark.createDataFrame(pdf.astype({"a": "Int64"}))
    got = {r.column: r for r in profile_columns(df).collect()}
    assert got["a"].n == 5 and got["a"].nulls == 1
    assert got["a"].n_distinct == 3
    assert got["a"].min_s == "1" and got["a"].max_s == "5"
    assert abs(got["a"].mean - 2.5) < 1e-12
    assert abs(got["a"].median - 2.0) < 1e-12
    assert got["s"].nulls == 2 and got["s"].n_distinct == 2
    assert got["s"].mean is None and got["s"].median is None


def test_cosine_topk_arrow_parity(spark):
    """The Arrow/numpy partial-top-k path must return the same
    neighbors in the same order as the Catalyst expression path, with
    cosines equal to 1e-4 (independent roundings of the same value)."""
    import os

    from lakehouse.similarity import cosine_topk, cosine_topk_arrow

    emb = spark.read.parquet(
        os.path.join("/root/testdata/sf0.001", "embeddings.parquet")
    ).repartition(6)
    qids = [0, 7, 23]
    a = cosine_topk(emb, qids, k=5).collect()
    b = cosine_topk_arrow(emb, qids, k=5).collect()
    assert len(a) == len(b)
    ka = {(r.query_id, r.rank): r for r in a}
    kb = {(r.query_id, r.rank): r for r in b}
    assert ka.keys() == kb.keys()
    for key in ka:
        assert ka[key].neighbor_id == kb[key].neighbor_id, (key, ka[key], kb[key])
        assert abs(float(ka[key].cosine) - float(kb[key].cosine)) <= 1e-4


def test_curate_documents_planted_flow(spark):
    """Planted exact copy, planted near-dup, planted low-quality doc —
    curation must drop exactly those three and keep everything else;
    the cluster minimum id always survives."""
    import pandas as pd

    from lakehouse.dedup import curate_documents

    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50).cache()
    rows = base.orderBy("doc_id").collect()
    donor = max(rows, key=lambda r: len(r.text.split()))
    toks = donor.text.split()
    near = " ".join(toks[:-1] + ["zz_tail"])
    extra = pd.DataFrame(
        {
            "doc_id": [90001, 90002, 90003],
            "text": [donor.text, near, "too short"],
            "lang": ["en"] * 3,
            "source": ["synthetic"] * 3,
            "n_chars": [len(donor.text), len(near), 9],
        }
    )
    df = base.unionByName(spark.createDataFrame(extra, schema=base.schema))
    before = {r.doc_id for r in curate_documents(base).select("doc_id").collect()}
    after = {r.doc_id for r in curate_documents(df).select("doc_id").collect()}
    # the exact copy (90001) and near dup (90002) lose to the donor's
    # smaller id; the 2-token doc (90003) fails the quality floor
    assert donor.doc_id in after
    assert not {90001, 90002, 90003} & after
    assert after == before


def test_semantic_dedup_matches_oracle(spark, oracle):
    from lakehouse.similarity import (
        semantic_dedup,
        semantic_dedup_oracle_sql,
    )

    assert_matches_oracle(
        semantic_dedup(_embs(spark), threshold=0.45, n_centroids=8),
        oracle,
        semantic_dedup_oracle_sql(threshold=0.45, n_centroids=8),
    )


def test_semantic_dedup_planted_duplicates(spark):
    """Planted exact duplicates land in the same cluster and only the
    minimum id survives; unrelated vectors are untouched."""
    from pyspark.sql import Row

    from lakehouse.similarity import semantic_dedup

    base = _embs(spark).limit(20)
    dups = base.filter("vec_id < 3").selectExpr(
        "vec_id + 100000 AS vec_id", "embedding", "label"
    )
    kept = semantic_dedup(
        base.unionByName(dups), threshold=0.999, n_centroids=4
    )
    ids = {r.vec_id for r in kept.collect()}
    # every planted copy (vec_id >= 100000) has an identical original
    # with a smaller id in the same cluster -> dropped
    assert not any(i >= 100000 for i in ids)
    assert {0, 1, 2}.issubset(ids)


def test_pii_scrub_planted(spark):
    from lakehouse.textops import pii_scrub

    df = spark.createDataFrame(
        [
            (
                1,
                "mail me@a.io or see https://x.io/p?q=me@b.io "
                "from 192.168.0.1 call +44 20 7946-0958 end",
            ),
            (2, "no pii here just words"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    r = rows[1]
    # the URL (with its embedded email) is redacted FIRST, so only the
    # standalone address counts as an email
    assert r.n_urls == 1 and r.n_emails == 1
    assert r.n_ips == 1 and r.n_phones == 1
    assert r.clean_text == (
        "mail <EMAIL> or see <URL> from <IP> call <PHONE> end"
    )
    r2 = rows[2]
    assert (r2.n_urls, r2.n_emails, r2.n_ips, r2.n_phones) == (0, 0, 0, 0)
    assert r2.clean_text == "no pii here just words"


def test_pii_scrub_matches_oracle(spark, oracle):
    from __spark_entry__ import _PII_ENRICH
    from lakehouse.textops import pii_scrub, pii_scrub_oracle_sql

    df = _docs(spark).selectExpr(
        "doc_id", _PII_ENRICH.format(s="STRING") + " AS text"
    )
    assert_matches_oracle(
        pii_scrub(df),
        oracle,
        pii_scrub_oracle_sql(
            table="(SELECT doc_id, "
            + _PII_ENRICH.format(s="VARCHAR")
            + " AS text FROM documents)"
        ),
    )


def test_pack_sequences_matches_oracle(spark, oracle):
    from lakehouse.packing import pack_sequences, pack_sequences_oracle_sql

    # bucket_width 16 exercises the two-pass scan over many buckets;
    # the oracle is the textbook single-window formulation
    assert_matches_oracle(
        pack_sequences(_docs(spark), capacity=100, bucket_width=16),
        oracle,
        pack_sequences_oracle_sql(capacity=100),
    )


def test_pack_sequences_invariants(spark):
    from pyspark.sql import functions as F

    from lakehouse.packing import pack_sequences
    from lakehouse.textops import token_count_ws

    cap = 128
    docs = _docs(spark)
    packed = pack_sequences(docs, capacity=cap, bucket_width=32).cache()
    total_tok = docs.select(
        F.sum(token_count_ws(F.col("text")))
    ).collect()[0][0]
    # token conservation: every token lands in exactly one slice
    assert packed.agg(F.sum("n_tok")).collect()[0][0] == total_tok
    # every sequence except the last is exactly full
    per_seq = packed.groupBy("seq_id").agg(F.sum("n_tok").alias("n"))
    last = per_seq.agg(F.max("seq_id")).collect()[0][0]
    bad = per_seq.filter(
        (F.col("seq_id") < last) & (F.col("n") != cap)
    ).count()
    assert bad == 0
    assert last == (total_tok - 1) // cap
    # per-doc slices are contiguous and ordered: doc_off resumes where
    # the previous slice ended
    w_bad = (
        packed.withColumn(
            "expect_off",
            F.expr(
                "sum(n_tok) OVER (PARTITION BY doc_id ORDER BY seq_id "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok"
            ),
        )
        .filter(F.col("doc_off") != F.col("expect_off"))
        .count()
    )
    assert w_bad == 0
    packed.unpersist()


def test_chunk_documents_matches_oracle(spark, oracle):
    from lakehouse.packing import chunk_documents, chunk_documents_oracle_sql

    assert_matches_oracle(
        chunk_documents(_docs(spark), chunk_tokens=8, overlap=3),
        oracle,
        chunk_documents_oracle_sql(chunk_tokens=8, overlap=3),
    )


def test_chunk_documents_hand_cases(spark):
    """Window arithmetic edge cases: doc shorter than one window (one
    partial chunk), exact multiple, overlap continuity, empty text
    (no chunks)."""
    from lakehouse.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),  # 7 toks, c=4 o=1 step=3 -> chunks @0,@3: 'a b c d','d e f g'
            (2, "x y"),            # shorter than window -> one partial
            (3, ""),               # empty -> none
            (4, "p q r s"),        # exactly one window
        ],
        "doc_id bigint, text string",
    )
    out = sorted(
        (r.doc_id, r.chunk_id, r.start_tok, r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    )
    assert out == [
        (1, 0, 0, 4, "a b c d"),
        (1, 1, 3, 4, "d e f g"),
        (2, 0, 0, 2, "x y"),
        (4, 0, 0, 4, "p q r s"),
    ]
    # overlap continuity: chunk i's tail tokens == chunk i+1's head
    assert out[0][4].split()[-1:] == out[1][4].split()[:1]


def test_chunk_documents_is_shuffle_free(spark):
    """The chunk fan-out must stay inside the row's task: no exchange
    anywhere in the plan (a per-doc window op that shuffles would move
    the whole corpus at 100 TB)."""
    from lakehouse.packing import chunk_documents

    plan = (
        chunk_documents(_docs(spark), chunk_tokens=8, overlap=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_bucket_batches_matches_oracle(spark, oracle):
    from pyspark.sql import functions as F

    from lakehouse.packing import bucket_batches, bucket_batches_oracle_sql
    from lakehouse.textops import token_count_ws

    # sub_width 16 exercises the two-pass row numbering over many
    # sub-buckets; the oracle is the single-window formulation
    assert_matches_oracle(
        bucket_batches(
            _docs(spark),
            token_count_ws(F.col("text")),
            batch_size=8,
            bucket_len=32,
            sub_width=16,
        ),
        oracle,
        bucket_batches_oracle_sql(batch_size=8, bucket_len=32),
    )


def test_bucket_batches_invariants(spark):
    from pyspark.sql import functions as F

    from lakehouse.packing import bucket_batches
    from lakehouse.textops import token_count_ws

    docs = _docs(spark)
    n_docs = docs.count()
    out = bucket_batches(
        docs, token_count_ws(F.col("text")), batch_size=8,
        bucket_len=32, sub_width=16,
    ).cache()
    # row conservation: every doc lands in exactly one batch
    assert out.agg(F.sum("n_rows")).collect()[0][0] == n_docs
    # batches never exceed batch_size; per bucket at most one partial
    assert out.filter(F.col("n_rows") > 8).count() == 0
    partials = (
        out.filter(F.col("n_rows") < 8)
        .groupBy("bucket")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert partials == 0
    # max_len consistent with the bucket's integer range
    bad_range = out.filter(
        (F.col("max_len") < F.col("bucket") * 32)
        | (F.col("max_len") >= (F.col("bucket") + 1) * 32)
    ).count()
    assert bad_range == 0
    # padding identity holds row-for-row
    assert (
        out.filter(
            F.col("pad_len")
            != F.col("n_rows") * F.col("max_len") - F.col("sum_len")
        ).count()
        == 0
    )
    # bucketing strictly reduces (or at worst matches) padding vs the
    # single-bucket baseline on the same batch size
    flat_pad = (
        bucket_batches(
            docs, token_count_ws(F.col("text")), batch_size=8,
            bucket_len=1 << 40, sub_width=16,
        )
        .agg(F.sum("pad_len"))
        .collect()[0][0]
    )
    assert out.agg(F.sum("pad_len")).collect()[0][0] <= flat_pad
    out.unpersist()


def test_bucket_batches_rejects_noncastable_ids(spark):
    """A non-numeric id_col must fail LOUDLY at execution (raise_error
    poison on the unmatched offsets join), never silently drop rows —
    identical in ANSI and non-ANSI sessions (ADVICE r2)."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from lakehouse.packing import bucket_batches

    df = spark.createDataFrame(
        [("clip-001", "a b c"), ("clip-002", "d e")], "cid string, text string"
    )
    out = bucket_batches(
        df, F.size(F.split("text", " ")).cast("long"), id_col="cid",
        batch_size=2, bucket_len=4,
    )
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "bucket_batches: id_col must be numeric" in str(ei.value)


def test_sampling_deterministic_and_oracle(spark, oracle):
    from lakehouse.sampling import (
        hash_sample,
        hash_sample_oracle_sql,
        stratified_fractions,
        stratified_fractions_oracle_sql,
        stratified_sample,
        stratified_sample_oracle_sql,
    )

    docs = _docs(spark)
    assert_matches_oracle(
        hash_sample(docs, 0.3, seed=11),
        oracle,
        hash_sample_oracle_sql(0.3, seed=11),
    )
    assert_matches_oracle(
        stratified_sample(docs, ["lang"], 7, seed=11),
        oracle,
        stratified_sample_oracle_sql(["lang"], 7, seed=11),
    )
    fr = {"src0": 1.0, "src3": 0.5}
    assert_matches_oracle(
        stratified_fractions(docs, "source", fr, seed=11),
        oracle,
        stratified_fractions_oracle_sql("source", fr, seed=11),
    )
    # reproducibility across repartitioning (df.sample would differ)
    a = {r.doc_id for r in hash_sample(docs, 0.3, seed=11).collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(7), 0.3, seed=11).collect()
    }
    assert a == b
    # exactly-n semantics: every stratum capped at n, uniform w/o
    # replacement means small strata keep everything
    per = (
        stratified_sample(docs, ["lang"], 7, seed=11)
        .groupBy("lang")
        .count()
        .collect()
    )
    full = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    for r in per:
        assert r["count"] == min(7, full[r.lang])


def test_normalize_text_matches_oracle(spark, oracle):
    from lakehouse.textops import normalize_text, normalize_text_oracle_sql

    assert_matches_oracle(
        normalize_text(_docs(spark)),
        oracle,
        normalize_text_oracle_sql(),
    )


def test_normalize_text_hand_cases(spark):
    """Case folding, punctuation->space (token boundaries survive),
    whitespace collapse, empty results counted as 0 tokens; exact dedup
    over norm_text catches case/punct near-dups."""
    from lakehouse.textops import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!  don't STOP..."),
            (2, "hello world don t stop"),
            (3, "..."),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: (r.norm_text, r.n_tokens)
           for r in normalize_text(docs).collect()}
    assert out[1] == ("hello world don t stop", 5)
    assert out[1] == out[2]  # near-dup now exact
    assert out[3] == ("", 0)


def test_repetition_stats_hand_computed(spark):
    from lakehouse.textops import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x"), (3, "p q r s")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict() for r in repetition_stats(df, n=2).collect()
    }
    # doc 1 bigrams: [a b, b a, a b, b a, a b] -> top "a b" x3
    assert got[1]["n_grams"] == 5
    assert got[1]["n_distinct_grams"] == 2
    assert got[1]["top_gram_count"] == 3
    assert float(got[1]["top_gram_frac"]) == 0.6
    assert float(got[1]["dup_gram_frac"]) == 0.6
    # doc 2 too short for a bigram: all-zero signals, still present
    assert got[2] == {
        "doc_id": 2,
        "n_grams": 0,
        "n_distinct_grams": 0,
        "top_gram_count": 0,
        "top_gram_frac": 0.0,
        "dup_gram_frac": 0.0,
    }
    # doc 3 all-distinct: no repetition
    assert got[3]["top_gram_count"] == 1
    assert got[3]["dup_gram_frac"] == 0.0


def test_repetition_stats_zero_shuffle_plan(spark):
    """The repetition signals must stay a pure map over the scan — no
    Exchange may appear for a 10^12-doc corpus."""
    from lakehouse.textops import repetition_stats

    df = repetition_stats(_docs(spark), n=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan  # JVM higher-order funcs only


def test_repetition_stats_matches_oracle(spark, oracle):
    from lakehouse.textops import repetition_oracle_sql, repetition_stats

    assert_matches_oracle(
        repetition_stats(_docs(spark), n=2), oracle, repetition_oracle_sql()
    )


def test_decontaminate_planted(spark):
    from lakehouse.dedup import decontaminate

    bench = "alpha beta gamma delta epsilon zeta eta theta"
    ev = spark.createDataFrame(
        [(100, f"intro {bench} outro")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # contains the benchmark 8-gram verbatim -> contaminated
            (1, f"noise words here {bench} trailing tail"),
            # shares only shorter overlaps -> clean at k=8
            (2, "alpha beta gamma delta nothing else in common here"),
            # fewer than 8 tokens: no shingles at all -> clean
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_eval_grams_hit"], r["contaminated"])
        for r in decontaminate(train, ev, k=8).collect()
    }
    assert got[1][0] >= 1 and got[1][1] == 1
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)


def test_decontaminate_matches_oracle(spark, oracle):
    from lakehouse.dedup import decontaminate, decontaminate_oracle_sql

    pred = "doc_id % 29 = 0"
    docs = _docs(spark)
    got = decontaminate(
        docs.filter(f"NOT ({pred})"), docs.filter(pred), k=8
    )
    assert_matches_oracle(
        got, oracle, decontaminate_oracle_sql(eval_pred=pred, k=8)
    )


def test_decontaminate_broadcasts_eval_side(spark):
    """The training corpus must never shuffle for the gram probe: the
    eval gram set is broadcast (10^12-row scale shape)."""
    from lakehouse.dedup import decontaminate

    docs = _docs(spark)
    df = decontaminate(
        docs.filter("doc_id % 29 != 0"), docs.filter("doc_id % 29 = 0"), k=8
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_unigram_logprob_matches_oracle(spark, oracle):
    from lakehouse.textops import unigram_logprob, unigram_logprob_oracle_sql

    assert_matches_oracle(
        unigram_logprob(_docs(spark)), oracle, unigram_logprob_oracle_sql()
    )


def test_unigram_logprob_ranks_rare_tokens_lower(spark):
    from lakehouse.textops import unigram_logprob

    df = spark.createDataFrame(
        [(1, "the the the the"), (2, "the the zzzquux the")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.unigram_logprob for r in unigram_logprob(df).collect()}
    assert got[2] < got[1]  # the rare token drags the mean down


def test_unigram_logprob_broadcasts_vocab(spark):
    """At small-vocab scale AQE must still choose a broadcast for the
    vocab probe — with NO forced hint (the vocab grows with the corpus,
    so the operator leaves the choice to AQE; plan-hygiene gate in
    test_plans.py)."""
    from lakehouse.textops import unigram_logprob

    df = unigram_logprob(_docs(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in opt, "no forced broadcast hints allowed"


def test_wer_matches_oracle(spark, oracle):
    from pyspark.sql import functions as F

    from lakehouse.transcripts import (
        corrupt_transcript,
        wer_oracle_sql,
        wer_pairs,
    )

    pairs = _docs(spark).select(
        "doc_id",
        F.col("text").alias("ref"),
        corrupt_transcript(F.col("text"), 5, reverse_every=3).alias("hyp"),
    )
    assert_matches_oracle(
        wer_pairs(pairs),
        oracle,
        wer_oracle_sql(drop_every=5, reverse_every=3),
    )


def test_cer_matches_oracle(spark, oracle):
    from pyspark.sql import functions as F

    from lakehouse.transcripts import (
        cer_oracle_sql,
        cer_pairs,
        corrupt_transcript,
    )

    pairs = _docs(spark).select(
        "doc_id",
        F.col("text").alias("ref"),
        corrupt_transcript(F.col("text"), 4, reverse_every=2).alias("hyp"),
    )
    assert_matches_oracle(
        cer_pairs(pairs), oracle, cer_oracle_sql(drop_every=4, reverse_every=2)
    )


def test_wer_dp_against_planted_truths(spark):
    """The numpy DP vs hand-computed distances, including the pure-
    deletion law dist == n_ref - n_hyp for subsequence hypotheses."""
    import numpy as np

    from lakehouse.transcripts import _word_edit_distance, wer_pairs

    def d(a, b):
        words = sorted(set(a.split() + b.split()))
        enc = {w: i for i, w in enumerate(words)}
        return _word_edit_distance(
            np.array([enc[w] for w in a.split()], dtype=np.int64),
            np.array([enc[w] for w in b.split()], dtype=np.int64),
        )

    assert d("a b c", "a b c") == 0
    assert d("a b c", "a x c") == 1          # substitution
    assert d("a b c", "a c") == 1            # deletion
    assert d("a b c", "a b x c") == 1        # insertion
    assert d("a b c d e", "e d c b a") == 4
    assert d("x", "a b c") == 3
    # empty-vs-k
    assert _word_edit_distance(
        np.array([], dtype=np.int64), np.array([0, 1], dtype=np.int64)
    ) == 2
    # brute-force cross-check on random small word arrays
    rng = np.random.default_rng(7)
    import itertools

    def brute(r, h):
        # classic O(n*m) python DP as the independent reference
        n, m = len(r), len(h)
        prev = list(range(m + 1))
        for i in range(1, n + 1):
            cur = [i] + [0] * m
            for j in range(1, m + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (r[i - 1] != h[j - 1]),
                )
            prev = cur
        return prev[m]

    for _ in range(50):
        r = rng.integers(0, 4, size=rng.integers(0, 9))
        h = rng.integers(0, 4, size=rng.integers(0, 9))
        assert _word_edit_distance(
            r.astype(np.int64), h.astype(np.int64)
        ) == brute(list(r), list(h))

    # distributed path: pure-deletion corruption obeys dist == n_ref-n_hyp
    from pyspark.sql import functions as F

    from lakehouse.transcripts import corrupt_transcript

    pairs = _docs(spark).select(
        "doc_id",
        F.col("text").alias("ref"),
        corrupt_transcript(F.col("text"), 5).alias("hyp"),
    )
    bad = (
        wer_pairs(pairs)
        .filter(F.col("dist") != F.col("n_ref") - F.col("n_hyp"))
        .count()
    )
    assert bad == 0


def test_align_uniform_partitions_duration(spark, oracle):
    from pyspark.sql import functions as F

    from lakehouse.transcripts import align_uniform, align_uniform_oracle_sql

    docs = _docs(spark).select(
        F.col("doc_id").alias("clip_id"),
        "text",
        (F.length("text") * 50).alias("dur_ms"),
    )
    out = align_uniform(docs, transcript_col="text")
    assert_matches_oracle(out, oracle, align_uniform_oracle_sql())
    # windows partition [0, dur) exactly: per clip, sum of window
    # lengths == dur, min start == 0, max end == dur, and windows chain
    chk = (
        out.groupBy("clip_id")
        .agg(
            F.sum(F.col("t_end_ms") - F.col("t_start_ms")).alias("tot"),
            F.min("t_start_ms").alias("lo"),
            F.max("t_end_ms").alias("hi"),
        )
        .join(
            docs.select("clip_id", F.col("dur_ms").cast("long").alias("d")),
            "clip_id",
        )
        .filter("tot != d OR lo != 0 OR hi != d")
        .count()
    )
    assert chk == 0
    # plan: narrow fan-out only, no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_assign_disjoint_exhaustive_stable(spark, oracle):
    from lakehouse.sampling import split_assign, split_assign_oracle_sql

    docs = _docs(spark)
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(docs, splits, seed=11)
    assert_matches_oracle(
        out, oracle, split_assign_oracle_sql(splits, seed=11)
    )
    n = docs.count()
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == n  # exhaustive (one label per row)
    assert set(counts) <= set(splits)
    # proportions roughly honored (Bernoulli tolerance at corpus size)
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)
    # a row's split is f(seed, id) only: invariant under repartitioning
    # AND under corpus growth (drop half the corpus, labels unchanged)
    a = {r.doc_id: r.split for r in out.collect()}
    b = {
        r.doc_id: r.split
        for r in split_assign(docs.repartition(7), splits, seed=11).collect()
    }
    assert a == b
    half = docs.filter("doc_id % 2 = 0")
    c = {r.doc_id: r.split for r in split_assign(half, splits, seed=11).collect()}
    assert all(a[k] == v for k, v in c.items())
    # degenerate fractions rejected loudly
    import pytest

    with pytest.raises(ValueError):
        split_assign(docs, {"train": 0.5, "val": 0.2}, seed=11)


def test_bpe_train_matches_python_reference(spark):
    """Distributed BPE trainer learns the EXACT merge sequence (rank,
    left, right, freq) of the published reference algorithm run in pure
    Python on the same word frequencies — including tie-breaks."""
    from collections import Counter

    from lakehouse.bpe import bpe_train, py_bpe_train

    corpus = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new new new"),
        (3, "wide wider widest wide"),
        (4, "low new wide lower newer"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    wf = Counter(w for _, t in corpus for w in t.lower().split())
    want = py_bpe_train(dict(wf), num_merges=14, min_freq=2)

    got = [
        (r["rank"], r["left"], r["right"], r["pair_freq"])
        for r in bpe_train(df, num_merges=14, min_freq=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == want and len(got) > 6


def test_bpe_encode_roundtrip_and_training_parity(spark):
    """Rank-greedy encoding of every training word reproduces the final
    symbol table the trainer converged to, and detokenization (strip
    the end-of-word marker) reconstructs the normalized text."""
    from collections import Counter

    from lakehouse.bpe import (
        END_OF_WORD,
        _py_merge,
        bpe_encode,
        bpe_train,
        py_bpe_train,
    )

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat on the mats"),
        (3, "a cat and a mat and a hat"),
        (4, "the hat on the cat"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges_df = bpe_train(df, num_merges=10, min_freq=2)
    out = bpe_encode(df, merges_df).collect()
    texts = dict(corpus)
    for r in out:
        detok = "".join(r.bpe_tokens).replace(END_OF_WORD, " ").strip()
        assert detok == " ".join(texts[r.doc_id].lower().split())

    # final symbol table parity: re-run the reference trainer, apply its
    # merge sequence to each distinct word, compare with the encoder
    wf = Counter(w for _, t in corpus for w in t.lower().split())
    merges = py_bpe_train(dict(wf), num_merges=10, min_freq=2)
    final = {}
    for w in wf:
        syms = list(w) + [END_OF_WORD]
        for _, a, b, _c in merges:
            syms = _py_merge(syms, a, b)
        final[w] = syms
    enc_rows = bpe_encode(
        spark.createDataFrame([(w, w) for w in wf], "w string, text string"),
        merges_df,
    ).collect()
    for r in enc_rows:
        assert list(r.bpe_tokens) == final[r.w], r.w


def test_bigram_logprob_matches_oracle(spark, oracle):
    from lakehouse.textops import bigram_logprob, bigram_logprob_oracle_sql

    assert_matches_oracle(
        bigram_logprob(_docs(spark)), oracle, bigram_logprob_oracle_sql()
    )


def test_bigram_logprob_ranks_word_salad_lower(spark):
    """A scrambled document scores below the coherent one even when both
    use the SAME tokens (the unigram model cannot see this)."""
    from lakehouse.textops import bigram_logprob, unigram_logprob

    df = spark.createDataFrame(
        [
            (1, "the fast row has the fast row and the fast row"),
            (2, "row the and fast has row the fast row fast the"),
        ],
        "doc_id long, text string",
    )
    bi = {r.doc_id: r.bigram_logprob for r in bigram_logprob(df).collect()}
    un = {r.doc_id: r.unigram_logprob for r in unigram_logprob(df).collect()}
    assert bi[2] < bi[1]
    assert abs(un[1] - un[2]) < 1e-9  # same bag of words


def test_bigram_logprob_no_forced_broadcast_on_counts(spark):
    """The vocabulary-scaled bigram/unigram count joins carry no hint
    (plan-hygiene rule); only the one-row vocab total broadcasts."""
    from lakehouse.textops import bigram_logprob

    df = bigram_logprob(_docs(spark))
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("ResolvedHint") <= 1, opt


def test_pq_topk_matches_oracle(spark, oracle):
    from lakehouse.similarity import pq_topk, pq_topk_oracle_sql

    ids = list(range(8))
    assert_matches_oracle(
        pq_topk(_embs(spark), ids, k=3),
        oracle,
        pq_topk_oracle_sql(ids, k=3),
    )


def test_ann_ivfpq_matches_oracle(spark, oracle):
    from lakehouse.similarity import ann_ivfpq_oracle_sql, ann_ivfpq_topk

    ids = list(range(8))
    assert_matches_oracle(
        ann_ivfpq_topk(_embs(spark), ids, k=3, n_coarse=8, nprobe=3),
        oracle,
        ann_ivfpq_oracle_sql(ids, k=3, n_coarse=8, nprobe=3),
    )


def test_pq_recall_training_and_structure(spark):
    """PQ/ADC invariants: codes live in [0, n_cent); encoding is
    partitioning-invariant; both seeded and sample-trained codebooks
    beat chance recall by a wide margin against an exact-dot baseline;
    IVFPQ probing EVERY coarse list degenerates to plain PQ exactly."""
    import numpy as np

    from lakehouse.similarity import (
        PQ_NCENT,
        ann_ivfpq_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    emb = _embs(spark)
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    pos = {v: i for i, v in enumerate(ids)}
    Q = list(range(10))
    exact = {}
    for q in Q:
        d = X @ X[pos[q]]
        order = sorted(
            range(len(ids)), key=lambda i: (-round(d[i], 6), ids[i])
        )
        exact[q] = {ids[i] for i in order if ids[i] != q}
        exact[q] = set(list(sorted(
            (i for i in exact[q]),
            key=lambda nid: (-round(float(X[pos[nid]] @ X[pos[q]]), 6), nid),
        ))[:5])

    def recall(**kw):
        got = {}
        for r in pq_topk(emb, Q, k=5, **kw).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(got[q] & exact[q]) for q in Q) / (5 * len(Q))

    # chance recall@5 over 500 vectors is ~0.01; seeded codebooks
    # measured 0.16, trained 0.20 — floor at 6x chance with margin
    assert recall() >= 0.06
    trained = train_pq_codebooks(emb, iters=4, sample=400)
    assert recall(codebooks=trained) >= 0.06

    codes = pq_encode(emb).collect()
    flat = [c for r in codes for c in r.pq_code]
    assert min(flat) >= 0 and max(flat) < PQ_NCENT
    again = {
        r.vec_id: list(r.pq_code)
        for r in pq_encode(emb.repartition(7, "vec_id")).collect()
    }
    assert {r.vec_id: list(r.pq_code) for r in codes} == again

    # probing all coarse lists IS plain PQ (same scored set, same ranks)
    full = {
        tuple(r)
        for r in ann_ivfpq_topk(emb, Q, k=5, n_coarse=8, nprobe=8).collect()
    }
    plain = {tuple(r) for r in pq_topk(emb, Q, k=5).collect()}
    assert full == plain


def test_pq_encode_arrow_parity(spark):
    """The Arrow/BLAS encode twin produces the same codes as the
    Catalyst encode for seeded AND sample-trained codebooks (the
    cosine_topk_arrow parity discipline)."""
    from lakehouse.similarity import (
        pq_encode,
        pq_encode_arrow,
        train_pq_codebooks,
    )

    emb = _embs(spark)
    for cb in (None, train_pq_codebooks(emb, iters=3, sample=300)):
        a = {r.vec_id: list(r.pq_code) for r in pq_encode(emb, cb).collect()}
        b = {
            r.vec_id: list(r.pq_code)
            for r in pq_encode_arrow(emb, cb).collect()
        }
        assert a == b and len(a) == 500


def test_split_leakage_audit(spark, oracle):
    """Cross-split near-dup audit matches its SQL twin and catches the
    planted near-duplicate pairs that straddle the split boundary."""
    from lakehouse.dedup import split_leakage_oracle_sql, split_leakage_pairs

    out = split_leakage_pairs(_docs(spark), seed=7, threshold=0.05)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.split_a != r.split_b and r.jaccard >= 0.05 for r in rows)
    assert_matches_oracle(
        out, oracle, split_leakage_oracle_sql(seed=7, threshold=0.05)
    )


def _gapped_clip(spark, cid, seg_ms, gap_ms=200, sr=16000):
    """One WAV of len(seg_ms) tones separated by silences (planted
    word boundaries at exact frame multiples)."""
    import numpy as np

    from lakehouse.synth import wrap_wav

    parts = []
    for i, ms in enumerate(seg_ms):
        t = np.arange(int(sr * ms / 1000)) / sr
        parts.append(
            (0.6 * np.sin(2 * np.pi * (300 + 100 * i) * t)).astype(
                np.float32
            )
        )
        if i < len(seg_ms) - 1:
            parts.append(np.zeros(int(sr * gap_ms / 1000), np.float32))
    x = np.concatenate(parts)
    return {
        "clip_id": cid,
        "bytes": wrap_wav(x, sr, "pcm16"),
        "transcript": " ".join(f"w{i}" for i in range(len(seg_ms))),
    }


def test_align_energy_exact_on_planted_gaps(spark):
    """One voiced span per word: every word window IS its planted
    span (silence never inside a word window)."""
    from lakehouse.transcripts import align_energy

    seg_ms = [300, 400, 300]
    gap = 200
    df = spark.createDataFrame([_gapped_clip(spark, "c0", seg_ms, gap)])
    rows = align_energy(df).orderBy("pos").collect()
    assert [r["word"] for r in rows] == ["w0", "w1", "w2"]
    assert all(r["n_spans"] == 3 for r in rows)
    # planted boundaries (frame-quantized to 20 ms => exact)
    starts = [0, seg_ms[0] + gap, seg_ms[0] + gap + seg_ms[1] + gap]
    for r, s, d in zip(rows, starts, seg_ms):
        assert r["span_idx"] == r["pos"]
        assert r["t_start_ms"] == s, (r, s)
        assert r["t_end_ms"] == s + d, (r, d)


def test_align_energy_many_words_stay_inside_spans(spark):
    from pyspark.sql import functions as F

    from lakehouse.transcripts import align_energy

    rec = _gapped_clip(spark, "c1", [600, 400])
    rec["transcript"] = "a b c d e"  # 5 words over 2 spans
    df = spark.createDataFrame([rec])
    rows = align_energy(df).orderBy("pos").collect()
    assert len(rows) == 5
    # proportional allocation: 3 words in the 600 ms span, 2 in 400 ms
    assert [r["span_idx"] for r in rows] == [0, 0, 0, 1, 1]
    # monotonic, non-empty, and confined to the voiced spans
    spans = {0: (0, 600), 1: (800, 1200)}
    prev_end = 0
    for r in rows:
        a, b = spans[r["span_idx"]]
        assert a <= r["t_start_ms"] < r["t_end_ms"] <= b
        assert r["t_start_ms"] >= prev_end - 1
        prev_end = r["t_end_ms"]
    # window union covers each span exactly
    assert rows[0]["t_start_ms"] == 0 and rows[2]["t_end_ms"] == 600
    assert rows[3]["t_start_ms"] == 800 and rows[4]["t_end_ms"] == 1200


def test_align_energy_silent_clip_falls_back_to_uniform(spark):
    import numpy as np

    from lakehouse.synth import wrap_wav
    from lakehouse.transcripts import align_energy

    x = np.zeros(16000, np.float32)  # 1 s of silence
    df = spark.createDataFrame(
        [{"clip_id": "s", "bytes": wrap_wav(x, 16000, "pcm16"),
          "transcript": "a b"}]
    )
    rows = align_energy(df).orderBy("pos").collect()
    assert [(r["t_start_ms"], r["t_end_ms"], r["span_idx"])
            for r in rows] == [(0, 500, -1), (500, 1000, -1)]


def test_word_crop_energy_recovers_planted_segments(spark):
    """Energy-aligned word crops: each word's PCM equals its planted
    tone segment bit-for-bit (silence excluded from every crop)."""
    import numpy as np

    from lakehouse.audio import decode_wav, word_crop_examples

    seg_ms, gap, sr = [300, 400, 300], 200, 16000
    rec = _gapped_clip(spark, "c0", seg_ms, gap, sr)
    df = spark.createDataFrame([rec])
    rows = word_crop_examples(df, alignment="energy").orderBy(
        "pos").collect()
    assert len(rows) == 3
    _, full = decode_wav(rec["bytes"])
    starts = [0, seg_ms[0] + gap, seg_ms[0] + gap + seg_ms[1] + gap]
    for r, s, d in zip(rows, starts, seg_ms):
        csr, y = decode_wav(r["bytes"])
        assert csr == sr and r["dur_ms"] == d
        planted = full[int(sr * s / 1000): int(sr * (s + d) / 1000)]
        assert np.array_equal(y, planted), r["word"]
        # no silence inside the crop (planted tones are loud throughout)
        assert float(np.mean(np.abs(y) < 0.01)) < 0.1


def test_bm25_topk_matches_oracle(spark, oracle):
    from lakehouse.textops import bm25_topk, bm25_topk_oracle_sql

    qs = ["fast merge join", "spark window agg", "slow scan table"]
    assert_matches_oracle(
        bm25_topk(_docs(spark), qs, k=10),
        oracle,
        bm25_topk_oracle_sql(qs, k=10),
    )


def test_bm25_topk_invariants_and_two_level_prune(spark):
    """Ranks are contiguous 1..k with scores non-increasing; the salted
    two-level top-k returns EXACTLY what a single global ranking would
    (set salt_partitions=1 to degenerate); repartitioning the corpus
    changes nothing; a query matching nothing returns no rows."""
    from lakehouse.textops import bm25_topk

    docs = _docs(spark)
    qs = ["fast merge join", "zzznomatch"]
    got = bm25_topk(docs, qs, k=7, salt_partitions=64).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query, []).append(r)
    assert "zzznomatch" not in by_q  # unmatched query yields nothing
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.bm25 for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert len(rows) <= 7

    flat = bm25_topk(docs, qs, k=7, salt_partitions=1).collect()
    key = lambda rs: sorted((r.query, r["rank"], r.doc_id, r.bm25) for r in rs)
    assert key(flat) == key(got)

    rep = bm25_topk(
        docs.repartition(13, "doc_id"), qs, k=7, salt_partitions=64
    ).collect()
    assert key(rep) == key(got)


def test_bm25_ranks_exact_phrase_doc_first(spark):
    """A document that is exactly the query outranks one diluted with
    off-query tokens (tf saturation + length normalization)."""
    from lakehouse.textops import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha beta filler filler filler filler filler filler"),
            (3, "filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(df, ["alpha beta"], k=3).collect()
    assert [r.doc_id for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]


def test_bpe_coverage_roundtrip_and_oov_signal(spark):
    """Coverage audit: roundtrip invariant exact on every row; unseen
    word-salad text scores strictly worse on fertility AND
    char-fallback; empty text yields null rates and stays
    roundtrip-true (empty == empty)."""
    from lakehouse.bpe import bpe_coverage, bpe_train

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
        + [(100, "")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=30)
    rows = {r.doc_id: r for r in bpe_coverage(docs, merges).collect()}
    assert all(r.roundtrip_ok for r in rows.values())
    empty = rows[100]
    assert empty.n_words == 0 and empty.fertility is None
    seen = rows[0]
    alien = bpe_coverage(
        spark.createDataFrame(
            [(1, "zzqxv wqkjz xqzzv")], "doc_id long, text string"
        ),
        merges,
    ).collect()[0]
    assert alien.roundtrip_ok
    assert alien.fertility > seen.fertility
    assert alien.char_fallback_ratio > seen.char_fallback_ratio


def test_dedup_windows_matches_oracle(spark, oracle):
    from lakehouse.dedup import dedup_windows, dedup_windows_oracle_sql

    out = dedup_windows(_docs(spark), window=3, min_docs=2)
    assert_matches_oracle(
        out, oracle, dedup_windows_oracle_sql(window=3, min_docs=2)
    )


def test_dedup_windows_drops_pure_boilerplate_docs(spark):
    # two docs that are the SAME single window vanish entirely; the
    # unique doc survives verbatim (its one window occurs in 1 doc)
    from lakehouse.dedup import dedup_windows

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in dedup_windows(df, window=3).collect()}
    assert set(rows) == {3}
    assert rows[3]["text_dedup"] == "x y z"
    assert rows[3]["kept_windows"] == 1 and rows[3]["total_windows"] == 1


def test_dedup_windows_partial_removal_preserves_order(spark):
    # shared boilerplate window dropped from both docs; the distinct
    # tails survive in original positions
    from lakehouse.dedup import dedup_windows

    df = spark.createDataFrame(
        [(1, "same same same u1 u2"), (2, "same same same v1 v2")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in dedup_windows(df, window=3).collect()}
    assert rows[1]["text_dedup"] == "u1 u2"
    assert rows[2]["text_dedup"] == "v1 v2"
    assert rows[1]["kept_windows"] == 1 and rows[1]["total_windows"] == 2


def test_cluster_balanced_sample_matches_oracle(spark, oracle):
    from lakehouse.similarity import (
        cluster_balanced_sample,
        cluster_balanced_sample_oracle_sql,
    )

    assert_matches_oracle(
        cluster_balanced_sample(_embs(spark), 7, n_centroids=8),
        oracle,
        cluster_balanced_sample_oracle_sql(7, n_centroids=8),
    )


def test_cluster_balanced_sample_invariants(spark):
    from lakehouse.similarity import cluster_balanced_sample

    emb = _embs(spark)
    out = cluster_balanced_sample(emb, 5, n_centroids=8)
    rows = out.collect()
    # per-cluster cap respected; ranks dense from 1
    from collections import defaultdict

    by_c = defaultdict(list)
    for r in rows:
        by_c[r["cluster"]].append(r["rank"])
    for c, ranks in by_c.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    # partitioning invariance (two-level prune must not change the set)
    again = cluster_balanced_sample(emb.repartition(13), 5, n_centroids=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    # growth stability: selection over a subset only shrinks/keeps ids
    # (a kept id is displaced only by ids hashing ahead — removing rows
    # can never ADD a previously-unselected id above a kept one)
    sub = cluster_balanced_sample(
        emb.filter("vec_id % 3 != 0"), 5, n_centroids=8
    ).collect()
    full_ids = {(r["cluster"], r["vec_id"]) for r in rows}
    sub_sel = {
        (r["cluster"], r["vec_id"])
        for r in sub
        if (r["cluster"], r["vec_id"]) in full_ids
    }
    # every full-selection survivor present in the subset stays selected
    surviving = {
        (c, i) for (c, i) in full_ids if i % 3 != 0
    }
    assert surviving <= {(r["cluster"], r["vec_id"]) for r in sub}


def test_gopher_rules_matches_oracle(spark, oracle):
    from lakehouse.textops import gopher_rules, gopher_rules_oracle_sql

    assert_matches_oracle(
        gopher_rules(_docs(spark), min_words=30),
        oracle,
        gopher_rules_oracle_sql(min_words=30),
    )


def test_gopher_rules_planted_defects(spark):
    from pyspark.sql import Row

    from lakehouse.textops import gopher_rules

    rows = [
        Row(doc_id=1, text="the a of " + "word " * 40 + "end"),  # keep
        Row(doc_id=2, text="tiny doc"),  # word count
        Row(doc_id=3, text="the of " + "#### " * 40 + "x"),  # symbols
        Row(doc_id=4, text="the of " + "12345 " * 40 + "x"),  # non-alpha
        Row(doc_id=5, text="zz " * 45),  # no stopwords + short words
    ]
    out = {r.doc_id: r for r in gopher_rules(
        spark.createDataFrame(rows), min_words=10
    ).collect()}
    assert out[1].keep
    assert not out[2].ok_word_count
    assert not out[3].ok_symbol_ratio and not out[3].ok_alpha_words
    assert not out[4].ok_alpha_words
    assert not out[5].ok_stopwords and not out[5].ok_mean_word_len
    assert not any(out[i].keep for i in (2, 3, 4, 5))
