"""Plan-shape tests: pin that flagship plans push filters, prune
columns, broadcast dims, and stay in codegen — the properties that
decide 100 TB behavior, asserted at test scale."""

import pytest

import __spark_entry__ as em
from dfsql_spark.plans.audit import (
    assert_broadcast_join,
    assert_filter_pushed,
    assert_max_read_columns,
    plan_summary,
)

SF = "/root/testdata/sf0.001"


def test_flagship_broadcasts_dims_and_prunes(spark):
    df = em.queries()["q22_flagship_revenue"](spark, SF)
    assert_broadcast_join(df)
    # Only fixed-size dims may carry an EXPLICIT broadcast hint: nation
    # (25 rows at every sf).  customer is sf-scaled and must NOT be
    # hinted — at test sf AQE/size heuristics may still broadcast it,
    # which is fine (runtime-sized), but a hint would pin the broadcast
    # at 100 TB too.
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1, analyzed
    # lineitem has 11 columns; the query needs 3
    assert_max_read_columns(df, 4)
    s = plan_summary(df, execute=True)  # audit AQE's FINAL plan
    assert s.wholestage_codegen


def test_filter_reaches_parquet_scan(spark):
    df = em.queries()["q02_filter"](spark, SF)
    assert_filter_pushed(df, "o_totalprice")


def test_projection_reads_only_needed_columns(spark):
    df = em.queries()["q01_projection"](spark, SF)
    assert_max_read_columns(df, 5)


def test_winnow_is_shuffle_free(spark):
    """Winnowing is a pure map + explode: zero exchanges at any scale
    (t14 left the contract in the round-13 swap; the entry function
    stays as the bench extra b_winnow_fingerprints)."""
    df = em.t14_winnow_fingerprints(spark, SF)
    assert plan_summary(df).n_exchanges == 0


def test_mix_rebalance_single_corpus_scan(spark):
    """t13's rate derivation must cost one stratum-column-only scan,
    never a second full-width pass, and the corpus side must reach the
    keep filter via a broadcast of the rates (no corpus shuffle)."""
    df = em.queries()["t13_mix_rebalance"](spark, SF)
    s = plan_summary(df)
    full = [r for r in s.read_schemas if "text" in r]
    thin = [r for r in s.read_schemas if "text" not in r]
    assert len(full) == 1, s.read_schemas   # corpus scanned exactly once
    assert all(r == "struct<source:string>" for r in thin), s.read_schemas
    assert_broadcast_join(df)


def test_sql_path_query_leaves_no_cache_footprint(spark):
    """Regression: f01 runs through the DataSource SQL path in the
    shared session.  With the default cache-on-access it would pin the
    full lineitem relation in the session cache manager, and Spark's
    plan-global cache substitution would then swap the unpruned
    InMemoryRelation into EVERY later lineitem scan — silently
    defeating column pruning for unrelated queries (the exact failure:
    q22/q01 pruning audits red after the oracle-mirror ran f01).
    f01 must opt out of the pin, and a fresh projection afterwards
    must still prune to its ReadSchema."""
    em.queries()["f01_custom_agg_sql"](spark, SF).collect()
    fresh = em.queries()["q01_projection"](spark, SF)
    assert_max_read_columns(fresh, 5)


def test_exact_dedup_single_exchange(spark):
    # one groupBy == one shuffle; anything more is waste
    df = em.queries()["d01_dedup_exact"](spark, SF)
    assert plan_summary(df).n_exchanges <= 1


def test_window_topk_plan_shape(spark):
    df = em.queries()["q27_window_topk"](spark, SF)
    s = plan_summary(df, execute=True)
    assert s.wholestage_codegen


def test_embedding_neardup_scale_path_is_bucketed_equijoin(spark):
    """d05's 100 TB shape: above the auto gate the pair join must be a
    (table, bucket) equi-join — never a cartesian / nested-loop O(n²)
    pair join."""
    from dfsql_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # lsh_min_docs=1 forces the auto gate onto the scale path at test size
    df = embedding_neardup_pairs(emb, threshold=0.3, lsh_min_docs=1)
    s = plan_summary(df)
    assert "BroadcastNestedLoopJoin" not in s.text, s.text
    assert "CartesianProduct" not in s.text, s.text


def test_bloom_semi_join_small_side_broadcasts(spark):
    """Test-scale regime: the filtered key side fits the broadcast
    threshold, so the semi join must broadcast (no shuffle of the fact
    table) and no bloom filter is needed."""
    from dfsql_spark.operators.joins import bloom_semi_join
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    urgent = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    df = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    assert_broadcast_join(df)


def test_bloom_semi_join_same_column_name(spark):
    """Semi-joining on a shared column name (fact_key == keys_key) must
    not raise AMBIGUOUS_REFERENCE — the key side is aliased internally."""
    from dfsql_spark.operators.joins import bloom_semi_join

    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    keys = spark.createDataFrame([(1,), (3,)], ["k"])
    got = sorted(r.k for r in bloom_semi_join(fact, keys, "k", "k").collect())
    assert got == [1, 3]
    anti = sorted(
        r.k for r in bloom_semi_join(fact, keys, "k", "k", how="left_anti").collect()
    )
    assert anti == [2]


def test_bloom_semi_join_big_big_regime_injects_runtime_filter(spark):
    """100 TB regime simulated (broadcast off, application-side scan
    threshold 0): Catalyst must inject might_contain(bloom, ...) into
    the fact scan so the shuffle carries only probable matches."""
    from dfsql_spark.operators.joins import bloom_semi_join
    from pyspark.sql import functions as F

    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        urgent = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        df = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_embedding_neardup_small_path_stays_exact(spark):
    """Below the gate the auto default must still be the exact O(n²)
    baseline (what the driver's d05 oracle hash-checks at sf0.01)."""
    from dfsql_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    auto = embedding_neardup_pairs(emb, threshold=0.3)
    exact = embedding_neardup_pairs(emb, threshold=0.3, use_lsh=False)
    assert sorted((r.id_a, r.id_b) for r in auto.collect()) == sorted(
        (r.id_a, r.id_b) for r in exact.collect()
    )


def test_minhash_band_join_never_broadcasts(spark):
    """The banded table is corpus-sized (bands rows per doc): the band
    self-join and the signature attach must be shuffle joins, not
    broadcasts — AQE's runtime-size heuristic would broadcast them at
    toy scale, which is both the wrong 100 TB plan and measured 5×
    slower even locally (broadcast build dominates)."""
    from dfsql_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = minhash_lsh_pairs(docs, verify_threshold=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_round10_contract_entry_plan_shapes(spark):
    """Shape pins for the three round-10 contract promotions:
    t24 (Gopher rules) is a zero-exchange codegen map; w01 (URL
    dedup) pays exactly one aggregation exchange shipping only
    (canonical_url, id) — never text; t25 (DSIR) broadcasts only the
    bucket-bounded weight table (hint audit covers the bound)."""
    qs = em.queries()

    t24 = plan_summary(qs["t24_gopher_filters"](spark, SF))
    assert t24.n_exchanges == 0, t24.text
    assert "EvalPython" not in t24.text

    w01 = plan_summary(qs["w01_url_dedup"](spark, SF))
    # one two-phase aggregate: partial + final around a single shuffle
    assert w01.n_exchanges == 1, w01.text
    for line in w01.text.splitlines():
        if "hashpartitioning" in line:
            assert "text" not in line, line  # ships canonical_url only
    assert "EvalPython" not in w01.text

    t25 = plan_summary(qs["t25_dsir_weights"](spark, SF))
    assert t25.n_broadcast_joins >= 1, t25.text
    assert "BatchEvalPython" not in t25.text  # Arrow n-gram UDF only


def test_round13_contract_entry_plan_shapes(spark):
    """Shape pins for the round-13 contract promotions, at the ENTRY
    level (the operator-level pins live in test_operators): t27
    (grouped split) and w02 (url host) are zero-exchange codegen maps
    that pipeline into the scan; x07 (group keep report) pays exactly
    one map-side-combined aggregation exchange with the Wilson algebra
    on the #groups-sized table; d16 (dedup report) adds no Python of
    its own beyond the shared exact-Jaccard pair relation's Arrow
    shingling (fleet Python audit covers the allowlist)."""
    qs = em.queries()

    # w02 retired from the contract in round 15; its zero-exchange
    # pin stays, on the entry function directly
    for fn in (qs["t27_grouped_split"], em.w02_url_host):
        s = plan_summary(fn(spark, SF))
        assert s.n_exchanges == 0, s.text
        assert "EvalPython" not in s.text, s.text

    x07 = plan_summary(qs["x07_group_keep_report"](spark, SF))
    assert x07.n_exchanges == 1, x07.text
    assert "EvalPython" not in x07.text
    # the one shuffle carries the three counts, never document text
    for line in x07.text.splitlines():
        if "hashpartitioning" in line:
            assert "text" not in line, line


def test_round14_contract_entry_plan_shapes(spark):
    """Shape pins for the round-14 contract promotions, at the ENTRY
    level (operator-level pins live in test_operators): x08
    (distribution drift) is Python-free with map-side-combined
    (column, bucket) counts and no exchange ever carries document
    text; t28 (vocab coverage) is Python-free and its exchanges ship
    tokens/counts, never the text column; t29 (packing report) runs
    exactly one Python stage — the t09 packer it replays — and the
    documented three exchanges (shard shuffle for the packer, fresh
    doc-grain (shard, seq) agg, one-row rollup)."""
    qs = em.queries()

    x08 = plan_summary(qs["x08_distribution_drift"](spark, SF))
    assert "EvalPython" not in x08.text, x08.text
    assert "partial_count" in x08.text, x08.text
    for line in x08.text.splitlines():
        if "hashpartitioning" in line:
            assert "text" not in line, line

    t28 = plan_summary(qs["t28_vocab_coverage"](spark, SF))
    assert "EvalPython" not in t28.text, t28.text
    for line in t28.text.splitlines():
        if "hashpartitioning" in line:
            assert "text" not in line, line

    import re

    t29 = plan_summary(qs["t29_packing_report"](spark, SF))
    # tree-node count (the formatted text repeats node names in the
    # per-node detail blocks, so a raw substring count would double)
    n_packers = len(re.findall(r"\(\d+\) FlatMapGroupsInPandas", t29.text))
    assert n_packers == 1, t29.text
    assert "BatchEvalPython" not in t29.text
    assert t29.n_exchanges == 3, t29.text


def test_lsh_and_ivf_topk_never_shuffle_embeddings(spark):
    """The round-10 Arrow scoring must keep the documented shuffle
    contract: cosine is computed right after the (broadcast) candidate
    join, so every Exchange in the plan ships only thin (query,
    neighbor, score) rows — the embedding payload never crosses the
    network.  Pinned by walking each Exchange's formatted-plan detail
    block and asserting no vector column appears in it."""
    import re

    from dfsql_spark.operators.similarity import ivf_topk, lsh_topk
    from dfsql_spark.plans.audit import plan_summary

    def exchange_blocks(text):
        lines = text.splitlines()
        out = []
        for i, ln in enumerate(lines):
            if re.match(r"\(\d+\) Exchange", ln.strip()):
                j = i
                blk = []
                while j < len(lines) and lines[j].strip():
                    blk.append(lines[j])
                    j += 1
                out.append("\n".join(blk))
        return out

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = emb.limit(3).selectExpr("vec_id AS query_id", "embedding")
    for df in (
        lsh_topk(emb, qs, k=3, num_tables=4),
        ivf_topk(emb, qs, k=3, n_cells=8, n_probe=2),
    ):
        s = plan_summary(df)
        blocks = exchange_blocks(s.text)
        assert blocks, "expected at least one Exchange (dedup/window merge)"
        for blk in blocks:
            # corpus vectors (c_vec) may never cross a shuffle, and no
            # DATA shuffle (hashpartitioning) may carry any vector;
            # the one sanctioned vector exchange is the query side's
            # SinglePartition gather — |queries| rows by contract.
            assert "c_vec" not in blk, f"corpus vectors shuffle:\n{blk}"
            if "hashpartitioning" in blk:
                assert "vec" not in blk, (
                    f"vector column in a data shuffle:\n{blk}"
                )


def test_ngram_prefix_join_never_broadcasts(spark):
    """Same property for the AllPairs prefix self-join: the prefix
    index scales with the corpus, so the candidate join must shuffle
    on the shingle key."""
    from dfsql_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = ngram_jaccard_pairs(docs, threshold=0.6, strategy="prefix")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_lsh_topk_single_corpus_scan(spark):
    """Multi-table bucketing must cost ONE corpus scan: all tables'
    bucket ids come from a single projection + explode, not a unionAll
    of per-table bucketings (which scans the corpus num_tables times —
    N× the dominant cost at 100 TB)."""
    from dfsql_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = emb.limit(3).selectExpr("vec_id AS query_id", "embedding")
    df = lsh_topk(emb, qs, k=3, num_tables=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one scan for the corpus side, one for the (broadcast) query side
    assert plan.count("Scan parquet") <= 2, plan


def test_embedding_neardup_lsh_single_scan_per_side(spark):
    from dfsql_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = embedding_neardup_pairs(emb, threshold=0.3, lsh_min_docs=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2, plan


def test_split_and_scrub_are_pure_maps(spark):
    """t06/t08-class operators must stay shuffle-free: a pure per-row
    map pipelines into the scan at any scale."""
    from dfsql_spark.operators.text import deterministic_split, pii_scrub

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (deterministic_split(docs), pii_scrub(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_salted_join_plan_is_salted_sort_merge(spark):
    """sk02's 100 TB shape: the join must be a SortMergeJoin keyed on
    (key, _salt) — the salt actually reaches the shuffle keys — with
    no broadcast anywhere (the pin is the point: the pattern exists
    for dim sides too big to broadcast)."""
    df = em.queries()["sk02_salted_join"](spark, SF)
    s = plan_summary(df)
    assert "SortMergeJoin" in s.text, s.text
    assert "_salt" in s.text
    assert "BroadcastHashJoin" not in s.text, s.text


def test_semantic_dedup_cell_equijoin_never_broadcasts(spark):
    """d08's pair generation, both physical paths: the expr path must
    be a cell equi-join with sort-merge pinned — never a broadcast
    (corpus-sized both sides at scale), never a cartesian pair join —
    and the arrow path (default) must shuffle ONCE on the cell key
    into the grouped BLAS compare, with no join at all."""
    from dfsql_spark.operators.similarity import semantic_dedup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    for probe in (1, 2):
        df = semantic_dedup_pairs(
            emb, threshold=0.4, n_clusters=4, n_probe=probe, compare="expr"
        )
        s = plan_summary(df)
        assert "SortMergeJoin" in s.text, s.text
        assert "BroadcastHashJoin" not in s.text, s.text
        assert "CartesianProduct" not in s.text, s.text
        arrow = semantic_dedup_pairs(
            emb, threshold=0.4, n_clusters=4, n_probe=probe, compare="arrow"
        )
        sa = plan_summary(arrow)
        assert "FlatMapGroupsInPandas" in sa.text, sa.text
        assert "Join" not in sa.text, sa.text
        # exchanges: one on cell for the grouping (+ one for the
        # n_probe>1 dropDuplicates over emitted pairs)
        assert sa.n_exchanges == (1 if probe == 1 else 2), sa.text


def test_c4_filters_is_pure_map(spark):
    """t12 must stay a zero-shuffle per-row map."""
    df = em.queries()["t12_c4_filters"](spark, SF)
    assert plan_summary(df).n_exchanges == 0


def test_incremental_dedup_band_join_shape(spark):
    """Incremental (delta-vs-snapshot) LSH pairs: the band join carries
    the combined corpus, so it must be a shuffle join (no broadcast),
    and the base-x-base exclusion must sit INSIDE the join condition —
    visible in the plan as a NOT(_is_base AND _is_base) predicate on
    the join, not a post-join filter over snapshot-squared pairs."""
    from pyspark.sql import functions as F

    from dfsql_spark.operators.dedup import (
        _banded_lsh_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = minhash_signatures(docs.filter("doc_id % 2 = 0"))
    new = minhash_signatures(docs.filter("doc_id % 2 = 1"))
    sigs = new.withColumn("_is_base", F.lit(False)).unionByName(
        base.withColumn("_is_base", F.lit(True))
    )
    df = _banded_lsh_pairs(sigs, 64, 16, 0.5, flag_col="_is_base")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "_is_base" in plan, plan


def test_bm25_two_scan_build_query_side_broadcast(spark):
    """s05's build pass costs exactly two corpus scans — one full-width
    for postings, one TEXT-ONLY for the (N, avgdl) stats row (doc_id
    must be pruned away there) — and everything query-side stays
    broadcast.  Anything beyond that (a third scan, a vocabulary-wide
    aggregate) is a regression."""
    df = em.queries()["s05_bm25"](spark, SF)
    s = plan_summary(df)
    full = [r for r in s.read_schemas if "text" in r]
    assert len(full) == 2, s.read_schemas
    assert "struct<text:string>" in full, s.read_schemas  # stats scan pruned
    assert_broadcast_join(df)


def test_line_dedup_two_corpus_scans_no_python(spark):
    """d11 promises exactly TWO corpus scans (roster + lines, the
    exempt/subject branches share one groupBy) and an all-codegen
    pipeline — no Python eval anywhere in the plan."""
    df = em.queries()["d11_line_dedup"](spark, SF)
    s = plan_summary(df)
    full = [r for r in s.read_schemas if "text" in r]
    assert len(full) == 2, s.read_schemas
    assert "EvalPython" not in s.text  # neither Batch- nor Arrow-


def test_curation_capstone_is_python_free(spark):
    """p01 composes c4_filters + repetition_ratio + dedup survivors +
    pii_scrub: every per-row signal is built-in SQL expressions (t11's
    n-gram counting is the arrays_zip struct form, not the Arrow gram
    UDF), so the composed plan must contain zero Python eval nodes —
    the property that lets the three signals fuse into one projection
    over the scan at 100 TB with no Python workers in the hot path."""
    df = em.queries()["p01_curation_pipeline"](spark, SF)
    s = plan_summary(df)
    assert "EvalPython" not in s.text


def test_hashed_embeddings_contract_is_python_free(spark):
    """t17 (feature-hashing embeddings, exploded triplets): every stage
    — tokenize, md5 bucket/sign, the two map-side-combined aggregates,
    the posexplode — is built-in expressions, zero Python eval nodes,
    so the embedding build scans 100 TB with no Python workers."""
    df = em.queries()["t17_hashed_embeddings"](spark, SF)
    s = plan_summary(df)
    assert "EvalPython" not in s.text


def test_semantic_decontaminate_contract_single_scan_no_exchange(spark):
    """d13: the eval matrix rides a SparkContext broadcast, so the
    corpus side must be ONE scan with NO exchange at all — the shape
    that lets decontamination stream over 100 TB map-only."""
    df = em.queries()["d13_semantic_decontaminate"](spark, SF)
    s = plan_summary(df)
    assert s.n_exchanges == 0, s.text
    full = [r for r in s.read_schemas if "embedding" in r]
    assert len(full) == 1, s.read_schemas


def test_quality_checks_contract_single_scan(spark):
    """x05: six checks, ONE lineitem scan (single groupless agg +
    codegen stack unpivot) — N checks must never become N jobs."""
    df = em.queries()["x05_quality_checks"](spark, SF)
    s = plan_summary(df)
    assert len(s.read_schemas) == 1, s.read_schemas


# Queries allowed to carry EXPLICIT broadcast hints, with the bound
# that justifies each: every hinted side is sized by a query set or a
# parameter, never by the corpus sf.  Anything else in the contract
# must be hint-free — AQE converts shuffled joins to broadcast at
# runtime when a side is genuinely small, so a pinned hint only ever
# *adds* the risk of broadcasting an sf-scaled table at 100 TB (the
# q22-r8 / q11-r9 defect class).  merge/shuffle_hash hints are exempt:
# they pin AWAY from broadcast, which is always scale-safe.
_ALLOWED_BROADCAST_HINTS = {
    "q17_scalar_subquery": (1, "one-row global-average aggregate"),
    "q22_flagship_revenue": (1, "nation: 25 rows at every sf"),
    "s03_sim_ivf": (1, "query+probe cells: n_queries x n_probe rows"),
    "s04_sim_pq": (1, "raw query vectors: n_queries rows"),
    "s05_bm25": (3, "query terms (x2) + one-row corpus stats"),
    "s06_mmr_rerank": (1, "candidate pool: k x n_queries rows"),
    "t13_mix_rebalance": (2, "per-stratum targets/rates: <= #strata rows"),
    "t15_unigram_familiarity": (1, "top-V vocab: bounded by vocab_size"),
    "t25_dsir_weights": (1, "bucket weight table: <= `buckets` rows by construction"),
    "t26_tfidf_top_terms": (1, "one-row corpus-count aggregate"),
    "x08_distribution_drift": (
        4,
        "one-row numeric-edges aggregate, broadcast into the old and"
        " new bucketing scans (2 hints); the analyzed tree prints the"
        " histogram subtree twice (totals join + psi join), doubling"
        " the SAME two hints in the text",
    ),
}

# Streaming executors run availableNow-to-memory on invocation and
# return a memory-sink read whose plan says nothing about the
# streaming transforms; their (hint-free) shapes are pinned by the
# streaming tests instead.
_STREAMING_EXECUTORS = {
    "e04_stream_windowed_counts",
    "e05_stream_stateful",
    "e06_stream_dedupe",
    "e08_stream_interval_join",
    "e09_stream_upsert_sink",
}


# Contract queries allowed to run Python workers, with why: every
# entry is an Arrow-batched form (vectorized shingling / signatures /
# BLAS scoring / media decode / stateful packing) that replaced a
# measured-slower pure-expression formulation, or IS the feature
# (custom Python UDF/UDAF).  Row-at-a-time BatchEvalPython is banned
# fleet-wide with no exceptions — it is never the right plan.
_ALLOWED_PYTHON = {
    "d02_dedup_ngram_jaccard": "Arrow shingling UDF",
    "d03_dedup_minhash_lsh": "Arrow shingling + signature UDFs",
    "d04_dedup_simhash": "Arrow shingling/simhash UDF",
    "d05_embedding_neardup": "Arrow per-candidate-pair cosine (einsum)",
    "d07_decontaminate": "Arrow word-n-gram UDF",
    "d08_semantic_dedup": "multi-probe assign + BLAS in-cell compare",
    "d10_winnow_overlap": "Arrow winnowing fingerprint UDF",
    "d12_incremental_dedup": "Arrow shingling + signature UDFs",
    "d13_semantic_decontaminate": "broadcast eval-matrix BLAS map",
    "f01_custom_agg_sql": "user-registered pandas UDAF (the feature)",
    "f02_custom_scalar_sql": "user-registered scalar UDF (the feature)",
    "m02_media_decode": "Arrow media decode map",
    "w05_wet_ingest": "file-parallel WET member parse via mapInPandas"
    " (binaryFile rows -> byte-exact record framing; the production"
    " WARC unit of parallelism)",
    "s01_sim_topk": "per-partition BLAS top-k map",
    "s03_sim_ivf": "probe-cell assignment + BLAS scoring",
    "s07_ann_recall": "exact + sign-quantized BLAS top-k maps (s01's path, twice)",
    "s04_sim_pq": "PQ encode + LUT scoring maps",
    "s06_mmr_rerank": "per-query MMR selection (tiny groups)",
    "t04_fingerprint": "Arrow rolling-hash UDF (order-sensitive)",
    "t09_pack_sequences": "greedy packing via applyInPandas",
    "t29_packing_report": "replays t09's applyInPandas packing; the"
    " report itself adds no Python (thin agg + one-row rollup)",
    "t25_dsir_weights": "Arrow word-n-gram UDF (shared with d07/d15)",
    "d16_dedup_report": "Arrow shingling UDF via the shared exact-Jaccard"
    " pair relation (d02's path; the report itself adds no Python)",
}


def test_no_unjustified_python_eval_anywhere(spark):
    """Fleet-wide Python audit (companion to the hint audit): no
    contract query may run Python workers unless allowlisted with a
    justification above, and row-at-a-time BatchEvalPython may appear
    NOWHERE — every sanctioned use is Arrow-batched."""
    import re

    py_re = re.compile(
        r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|"
        r"FlatMapCoGroupsInPandas|AggregateInPandas|WindowInPandas"
    )
    offenders, row_at_a_time = {}, {}
    for name, fn in em.queries().items():
        if name in _STREAMING_EXECUTORS:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            row_at_a_time[name] = True
        if py_re.search(plan) and name not in _ALLOWED_PYTHON:
            offenders[name] = sorted(set(py_re.findall(plan)))
    assert not row_at_a_time, (
        f"row-at-a-time Python in: {sorted(row_at_a_time)}"
    )
    assert not offenders, f"unallowlisted Python workers: {offenders}"


def test_no_unjustified_broadcast_hints_anywhere(spark):
    """Fleet-wide audit (round-8 verdict ask): walk EVERY contract
    query's analyzed plan and fail on any explicit broadcast hint not
    on the bounded-side allowlist above.  This is the structural
    guarantee that the q22/q11 pinned-broadcast defect class cannot
    re-enter through any of the 100 entries."""
    import re

    sf = SF
    offenders = {}
    for name, fn in em.queries().items():
        if name in _STREAMING_EXECUTORS:
            continue
        analyzed = fn(spark, sf)._jdf.queryExecution().analyzed().toString()
        n_bcast = len(re.findall(r"ResolvedHint \(strategy=broadcast\)", analyzed))
        allowed = _ALLOWED_BROADCAST_HINTS.get(name, (0, "no hints allowed"))[0]
        if n_bcast > allowed:
            offenders[name] = (n_bcast, allowed)
    assert not offenders, (
        f"explicit broadcast hints beyond the bounded-side allowlist: {offenders}"
    )


def test_round9_library_operator_plan_shapes(spark):
    """Plan pins for the round-9 library operators.  bpe_encode is a
    pure Arrow map — zero exchanges at any scale.  heavy_hitter_ngrams
    recounts only the BROADCAST candidate set (the whole point: the
    shuffle must never carry the gram vocabulary).
    shared_substring_spans' gram self-join must be a shuffle join
    (corpus-sized both sides), never broadcast or cartesian."""
    from dfsql_spark.operators.dedup import shared_substring_spans
    from dfsql_spark.operators.text import bpe_encode, heavy_hitter_ngrams

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    enc = plan_summary(bpe_encode(docs, merges=[("t", "h"), ("th", "e")]))
    assert enc.n_exchanges == 0, enc.text

    hh = heavy_hitter_ngrams(docs, threshold_count=8, n=3)
    s = plan_summary(hh)
    assert "BroadcastHashJoin" in s.text, s.text

    span = plan_summary(shared_substring_spans(docs, min_tokens=8))
    assert "SortMergeJoin" in span.text or "ShuffledHashJoin" in span.text, span.text
    assert "BroadcastHashJoin" not in span.text, span.text
    assert "CartesianProduct" not in span.text, span.text


def test_cap_per_key_salted_two_phase_plan(spark):
    """cap_per_key's scale shape: phase 1 shuffles on (_salt, key) —
    the salt must actually reach the exchange keys so a hot key spreads
    over salt_partitions reducers — and phase 2's by-key exchange runs
    over the bounded survivors.  Exactly two exchanges, no joins."""
    from dfsql_spark.operators.text import cap_per_key

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = cap_per_key(docs, "source", cap=5)
    s = plan_summary(df)
    assert "_salt" in s.text, s.text
    assert s.n_exchanges == 2, s.text
    naive = plan_summary(cap_per_key(docs, "source", cap=5, salt_partitions=None))
    assert naive.n_exchanges == 1, naive.text


def test_weighted_sample_contract_is_pure_filter(spark):
    """t18 (explicit scale): the keep decision is a content-addressed
    md5 filter that pipelines into the scan — zero exchanges, zero
    Python, no derivation aggregate in the plan.  (t18 left the
    contract in the round-13 swap; the entry function stays.)"""
    df = em.t18_weighted_sample(spark, SF)
    s = plan_summary(df)
    assert s.n_exchanges == 0, s.text
    assert "EvalPython" not in s.text
