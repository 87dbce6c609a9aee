"""Physical-plan gates: the properties the 100 TB scale story depends on.

Correctness tests elsewhere prove WHAT the operators return; these prove
the plans are the ones a 1000-executor cluster needs (SURVEY.md §4):

- narrow scans must never read the audio ``bytes`` column (column
  pruning reaching the Parquet reader's ReadSchema);
- residual scan filters must reach the Parquet reader as PushedFilters
  (row-group skipping on top of the engine's own file-level pruning,
  the pattern the reference enables via ``filterPushdown=true`` at
  /root/reference/etl/glue_stream.py:301);
- the Z-order key projection must stay inside whole-stage codegen —
  no Python/Arrow eval node anywhere in the hot rewrite path.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from lakehouse import Table
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df

DATE_SPEC = [
    {"name": "event_date", "transform": "identity", "source": "event_date"}
]


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def small_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("plans") / "clips")
    t = Table.create(spark, root, CLIPS_SCHEMA, partition_spec=DATE_SPEC)
    t.append(
        synth_clips_df(spark, 96, seed=11, n_days=4), target_file_count=8
    )
    return t


def test_narrow_scan_never_reads_audio_bytes(small_table):
    df = small_table.scan(columns=["clip_id", "dur_ms"])
    plan = plan_str(df)
    import re

    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    # match the field token exactly ([<,]bytes:) so a future column whose
    # name merely contains "bytes" can't trip this (ADVICE r1)
    assert read_schema and all(
        not re.search(r"[<,]bytes:", ln) for ln in read_schema
    ), (
        "projection must prune the binary payload out of the Parquet scan:\n"
        + plan
    )


def test_catalyst_prunes_columns_through_scan(small_table):
    # same guarantee when the user projects AFTER scan(): Catalyst must
    # push the pruning down to the file source
    import re

    df = small_table.scan().select("clip_id", "sr_hz")
    read_schema = [
        ln for ln in plan_str(df).splitlines() if "ReadSchema" in ln
    ]
    assert read_schema and all(
        not re.search(r"[<,]bytes:", ln) for ln in read_schema
    )


def test_residual_filter_pushed_to_parquet_reader(small_table):
    df = small_table.scan(filter=[("dur_ms", ">", 1000)])
    plan = plan_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("dur_ms" in ln for ln in pushed), (
        "residual predicate must reach the Parquet reader "
        "(row-group skipping):\n" + plan
    )


def test_zorder_key_projection_stays_jvm_side(spark, small_table):
    from pyspark.sql import types as T

    from lakehouse.curves import bits_per_dim
    from lakehouse.zexpr import zorder_key_expr

    cols = ["clip_id", "dur_ms"]
    col_types = {f.name: f.dataType for f in CLIPS_SCHEMA.fields}
    bounds = {"clip_id": ("clip-0", "clip-~"), "dur_ms": (200, 3000)}
    df = small_table.scan().withColumn(
        "zkey", zorder_key_expr(cols, col_types, bounds, bits_per_dim(2))
    )
    plan = plan_str(df)
    for python_node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert python_node not in plan, (
            f"Z-order key must not leave the JVM ({python_node} found):\n"
            + plan
        )
    # formatted mode marks codegen stages with a "*" prefix
    assert "* Project" in plan, "zkey Project must be whole-stage codegen"


def test_hilbert_key_projection_stays_jvm_side(spark, small_table):
    """Since round 2 the Hilbert key is staged Catalyst bit-ops
    (zexpr.with_hilbert_key) — the rewrite plan must contain no Python
    eval node (VERDICT.md next-round #9)."""
    from lakehouse.curves import bits_per_dim
    from lakehouse.schema import CLIPS_SCHEMA
    from lakehouse.zexpr import with_hilbert_key

    cols = ["clip_id", "dur_ms"]
    col_types = {f.name: f.dataType for f in CLIPS_SCHEMA.fields}
    bounds = {"clip_id": ("clip-0", "clip-~"), "dur_ms": (200, 3000)}
    df = with_hilbert_key(
        small_table.scan(), cols, col_types, bounds, bits_per_dim(2), "zkey"
    )
    plan = plan_str(df)
    for python_node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert python_node not in plan, (
            f"Hilbert key must not leave the JVM ({python_node} found):\n"
            + plan
        )


def test_merge_shuffle_single_exchange_per_side(spark, small_table):
    """The MERGE shuffle path must cost exactly ONE exchange per join
    side. Round 1 pre-repartitioned both sides on xxhash64(key); Spark
    re-shuffled on the raw key anyway (ENSURE_REQUIREMENTS), so the wide
    side paid two exchanges for zero skew protection (VERDICT.md §wrong
    1, confirmed by explain probe)."""
    from pyspark.sql import functions as F

    from lakehouse.ops.merge import anti_join_kept

    import re

    t = small_table.scan()
    keys = (
        small_table.scan(columns=["clip_id"])
        .filter(F.col("clip_id") < "clip-000000000040")
        .select(F.col("clip_id").alias("__k"))
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        kept = anti_join_kept(t, keys, "clip_id", strategy="shuffle")
        plan = plan_str(kept)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastNestedLoopJoin" not in plan
    # formatted mode prints each node once in the tree and once in the
    # details section — count unique node ids of Exchange details
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 2, (
        f"shuffle MERGE must shuffle each side exactly once, "
        f"saw {n_exchanges} exchanges:\n" + plan
    )


def test_merge_broadcast_never_shuffles_target(spark, small_table):
    """Broadcast path: the wide target side streams scan → anti-filter
    with ZERO exchanges on it (the everyday 10^12-row MERGE shape)."""
    from pyspark.sql import functions as F

    from lakehouse.ops.merge import anti_join_kept

    t = small_table.scan()
    keys = (
        small_table.scan(columns=["clip_id"])
        .filter(F.col("clip_id") < "clip-000000000010")
        .select(F.col("clip_id").alias("__k"))
    )
    kept = anti_join_kept(t, keys, "clip_id", strategy="broadcast")
    plan = plan_str(kept)
    assert "BroadcastHashJoin" in plan
    # the only exchange allowed is the broadcast of the key set
    for ln in plan.splitlines():
        body = ln.lstrip("*+- (0123456789)")
        if body.startswith("Exchange"):
            assert "broadcast" in ln.lower(), (
                "target side of a broadcast MERGE must not shuffle:\n" + plan
            )


def test_mor_scan_plan_shape(spark, tmp_path):
    """A merge-on-read scan must apply equality deletes as a broadcast
    left-anti hash join: the wide data side never shuffles for the
    delete application, and no nested-loop join appears (the seq-rule
    residual constant-folds per seq group)."""
    import re

    from lakehouse import Table
    from lakehouse.schema import CLIPS_SCHEMA
    from lakehouse.synth import synth_clips_pdf

    t = Table.create(
        spark, str(tmp_path / "mor"), CLIPS_SCHEMA, partition_spec=DATE_SPEC
    )
    t.append(
        spark.createDataFrame(
            synth_clips_pdf(range(40), seed=1, n_days=2),
            schema=CLIPS_SCHEMA,
        )
    )
    t.delete("sr_hz = 8000", mode="mor", key="clip_id")
    plan = plan_str(t.scan())
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"BroadcastHashJoin LeftAnti", plan), plan
    # the only exchange is the broadcast of the delete-key set
    for ln in plan.splitlines():
        body = ln.lstrip("*+- (0123456789)")
        if body.startswith("Exchange"):
            assert "broadcast" in ln.lower(), (
                "MoR delete application must not shuffle the data side:\n"
                + plan
            )


def test_entry_smoke_matches_driver_contract(spark):
    # the driver's smoke check: entry() runs on sf0.001 and yields a
    # stable-schema DataFrame with the flagship query's key columns
    import __spark_entry__ as e

    df = e.entry(spark)
    assert set(df.columns) == {"event_type", "n", "total_value"}
    assert df.count() > 0


def test_spectral_embedding_single_arrow_exchange(spark):
    """with_spectral_embedding must evaluate the FFT UDF ONCE: the
    band transforms and normalization are JVM-side expressions over the
    struct result, so the plan carries exactly one ArrowEvalPython node
    (a second one would mean a duplicated decode+FFT pass per clip)."""
    from lakehouse.audio import with_spectral_embedding
    from lakehouse.synth import synth_clips_df

    df = with_spectral_embedding(synth_clips_df(spark, 8, seed=3)).select(
        "clip_id", "embedding"
    )
    # simple mode prints each node once (formatted repeats it in the
    # per-node detail section)
    plan = plan_str(df, mode="simple")
    assert plan.count("ArrowEvalPython") == 1, plan


def test_analyze_plan_is_distributed_topk(spark, small_table):
    """ANALYZE's per-column job must compile to TakeOrderedAndProject
    (distributed top-k, O(k) per partition then O(k) on the driver) —
    never a global Sort (full shuffle of all hashes)."""
    from pyspark.sql import functions as F

    df = (
        small_table.scan(columns=["clip_id"])
        .filter(F.col("clip_id").isNotNull())
        .select(F.xxhash64(F.col("clip_id")).alias("__h"))
        .distinct()
        .orderBy("__h")
        .limit(64)
    )
    plan = plan_str(df)
    assert "TakeOrderedAndProject" in plan, plan
    # the distinct must partial-aggregate (map-side) before its shuffle
    assert plan.count("HashAggregate") >= 2, plan


def test_cer_plan_is_shuffle_free(spark):
    """CER must stay a pure map: levenshtein is a JVM built-in inside
    one codegen'd projection — no Exchange, no Python eval node."""
    from pyspark.sql import functions as F

    from lakehouse.synth import synth_clips_df
    from lakehouse.transcripts import cer_pairs, corrupt_transcript

    df = synth_clips_df(spark, 8, seed=3, n_days=1).select(
        F.col("clip_id").alias("doc_id"),
        F.col("transcript").alias("ref"),
        corrupt_transcript(F.col("transcript"), 5).alias("hyp"),
    )
    plan = plan_str(cer_pairs(df), mode="simple")
    assert "Exchange" not in plan, plan
    for node in ("ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan, plan


def test_wer_plan_is_single_arrow_map(spark):
    from pyspark.sql import functions as F

    from lakehouse.synth import synth_clips_df
    from lakehouse.transcripts import corrupt_transcript, wer_pairs

    df = synth_clips_df(spark, 8, seed=3, n_days=1).select(
        F.col("clip_id").alias("doc_id"),
        F.col("transcript").alias("ref"),
        corrupt_transcript(F.col("transcript"), 5).alias("hyp"),
    )
    plan = plan_str(wer_pairs(df), mode="simple")
    assert "Exchange" not in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_sorted_append_write_plan_uses_range_partitioning(spark, tmp_path):
    """The sorted write path must range-partition (disjoint per-file
    key ranges), not hash-repartition."""
    from lakehouse import Table
    from lakehouse.schema import CLIPS_SCHEMA
    from lakehouse.synth import synth_clips_df

    t = Table.create(spark, str(tmp_path / "so"), CLIPS_SCHEMA)
    t.set_sort_order(["clip_id"])
    t.append(synth_clips_df(spark, 32, seed=5, n_days=1),
             target_file_count=4)
    # provenance proves the write took the sorted path; disjointness is
    # gated in test_sortorder.py — here we check the tag end-to-end
    assert all(e.sort_order == "sorted(clip_id)" for e in t.live_files())


def test_no_broadcast_hints_on_corpus_scaled_frames():
    """Plan-hygiene rule (BASELINE.md): F.broadcast is allowed ONLY on
    frames bounded by construction (query sets, quantile cuts, file
    maps, bounded key/delete sets, one-row totals) — never on frames
    whose size scales with the corpus (vocabularies, victim sets, full
    key scans). This snapshot gate enumerates every F.broadcast call
    site in the package; a new site must be audited for boundedness and
    added here with its justification."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parent.parent / "lakehouse"
    allowed = {
        # file: {arg snippet: why it is bounded}
        "dedup.py": {"eval_sh"},          # eval set, bounded input
        "rollup.py": {"keys"},            # CDC-delta group keys of one refresh
        "similarity.py": {"q", "probes"}, # bounded query/probe sets
        "streaming.py": {"existing",      # probe-capped key lookup (<= max_probe_keys)
                         "dim"},          # enrich_with_table_batch: hint
                                          # applied ONLY on explicit user
                                          # opt-in (broadcast_dim=True,
                                          # default False — AQE decides)
        "textops.py": {"tot", "vocab",    # one-row aggregates (grand
                                          # total; vocabulary SIZE —
                                          # uni.agg(count), not the
                                          # vocabulary itself)
                       "qdf", "dfreq",    # BM25: (query,term) pairs and
                                          # per-QUERY-term doc freqs —
                                          # both bounded by the query
                                          # list argument
                       "stats"},          # BM25 one-row (N, avgdl)
        "abtest.py": {"ctrl"},            # one-row control-arm aggregate
        "ops/cluster.py": {"cuts_df"},    # quantile cut points (n_buckets rows)
        "ops/compact.py": {"map_df"},     # file->bin map (metadata-bounded)
        "ops/merge.py": {"keys"},         # bounded-set MERGE strategy keys
        "ops/mor.py": {"keys_df", "ddf"}, # bounded equality-delete key sets
        "meta/scan.py": {"ddf", "fdf"},   # ddf: pending MoR delete keys/
                                          # positions (maintenance folds them
                                          # in before they can grow corpus-
                                          # scaled); fdf: adopted-file fill
                                          # constants, a driver-local dict
                                          # already materialized (one row per
                                          # fill-flagged FILE, aged out by the
                                          # first rewrite)
    }
    pat = re.compile(r"F\.broadcast\(\s*([A-Za-z_][\w.]*)")
    seen: dict[str, set[str]] = {}
    for py in pkg.rglob("*.py"):
        rel = str(py.relative_to(pkg))
        for m in pat.finditer(py.read_text()):
            arg = m.group(1).split(".")[0]
            seen.setdefault(rel, set()).add(arg)
    for rel, args in seen.items():
        extra = args - allowed.get(rel, set())
        assert not extra, (
            f"unaudited F.broadcast site(s) in lakehouse/{rel}: {extra} — "
            "broadcast is only for frames bounded by construction; audit "
            "and extend the allowlist, or drop the hint and let AQE decide"
        )


def test_speed_perturb_plan_is_map_only(spark):
    """speed_perturb_clips: one explode + one Arrow pass, NO Exchange —
    the tripled corpus stays with its input partitions."""
    from lakehouse.audio import speed_perturb_clips
    from lakehouse.synth import synth_clips_df

    plan = plan_str(
        speed_perturb_clips(synth_clips_df(spark, 8, seed=1)),
        mode="simple",
    )
    assert "Exchange" not in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_pq_encode_plan_is_map_only_and_codegen(spark):
    """pq_encode: a single shuffle-free projection; the nested-literal
    HOF form must keep the plan free of Python eval nodes (the codes
    are pure Catalyst)."""
    from lakehouse.similarity import pq_encode
    from lakehouse.synth import synth_clips_df  # noqa: F401  (env warm)

    emb = spark.range(64).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), i -> CAST(sin(id * i) AS FLOAT)) "
        "AS embedding",
    )
    plan = plan_str(pq_encode(emb), mode="simple")
    assert "Exchange" not in plan, plan
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_mix_noise_plan_has_no_cross_join(spark):
    """mix_noise_clips: the noise-representative join is an equi-join
    on the bucket key — never a cartesian/broadcast-nested-loop."""
    from lakehouse.audio import mix_noise_clips
    from lakehouse.synth import synth_clips_df

    df = synth_clips_df(spark, 8, seed=1)
    noise = synth_clips_df(spark, 16, seed=2)
    plan = plan_str(mix_noise_clips(df, noise), mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_gopher_rules_plan_is_shuffle_free(spark):
    """Gopher rules are ONE codegen'd projection: no Exchange, no
    Python eval node anywhere."""
    from lakehouse.textops import gopher_rules

    df = spark.createDataFrame(
        [(1, "the a of word end")], "doc_id long, text string"
    )
    plan = plan_str(gopher_rules(df), mode="simple")
    assert "Exchange" not in plan, plan
    for node in ("ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan, plan


def test_telephony_and_loudness_plans_are_single_arrow_maps(spark):
    """simulate_telephony_clips / measure_loudness_clips: map-only —
    exactly one Arrow eval, no Exchange (the 10^12-clip shape)."""
    from lakehouse.audio import (
        measure_loudness_clips,
        simulate_telephony_clips,
    )
    from lakehouse.synth import synth_clips_df

    df = synth_clips_df(spark, 4, seed=1, n_days=1)
    for out in (simulate_telephony_clips(df), measure_loudness_clips(df)):
        plan = plan_str(out, mode="simple")
        assert "Exchange" not in plan, plan
        assert plan.count("ArrowEvalPython") == 1, plan


def test_attribution_and_paths_plans_have_no_join(spark):
    """attribution_report (all models) and the journey-path operators
    build from windows over ONE scan — zero Join nodes, zero Python
    eval nodes, and no more than one corpus-scaled Exchange (the
    per-user window sort; later exchanges act on bounded frames)."""
    import datetime as dt

    from lakehouse.attribution import attribution_report
    from lakehouse.paths import event_transitions, top_paths

    ev = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), 1, "view", 1.0)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    frames = [
        attribution_report(ev, ["view"], "purchase", model="last_touch"),
        attribution_report(
            ev, ["view"], "purchase", model="first_touch", lookback=60.0
        ),
        attribution_report(ev, ["view"], "purchase", model="linear"),
        event_transitions(ev),
        top_paths(ev),
    ]
    for out in frames:
        plan = plan_str(out, mode="simple")
        assert "Join" not in plan, plan
        for node in ("ArrowEvalPython", "BatchEvalPython"):
            assert node not in plan, plan


def test_time_stretch_plan_is_map_only(spark):
    """time_stretch_clips: exactly one Arrow eval, no Exchange."""
    from lakehouse.audio import time_stretch_clips
    from lakehouse.synth import synth_clips_df

    df = synth_clips_df(spark, 4, seed=1, n_days=1)
    plan = plan_str(time_stretch_clips(df, 1.25), mode="simple")
    assert "Exchange" not in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_interval_join_plan_is_equi_join(spark):
    """interval_join must plan as an equi join on the key with the time
    range as residual — never a BroadcastNestedLoopJoin (the plan that
    dies at 10^12 events)."""
    import datetime as dt

    from lakehouse.streaming_agg import interval_join

    ev = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), 1, "view")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    plan = plan_str(interval_join(ev), mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" in plan, plan
