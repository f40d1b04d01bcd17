"""End-to-end pipeline composition: the operators are designed to
chain as ONE lazy DataFrame DAG — filter → dedup → split → pack —
the way a production training-data pipeline runs them.  This test
pins that the composition stays lazy (no action until the end), that
each stage's output feeds the next by column contract, and that the
end-to-end result is consistent with running the stages standalone.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_filter_dedup_split_pack_composes_lazily(spark, docs):
    from dfsql_spark.operators.dedup import (
        dedup_by_components,
        ngram_jaccard_pairs,
        release_persists,
    )
    from dfsql_spark.operators.text import (
        c4_filters,
        deterministic_split,
        pack_sequences,
    )

    try:
        # 1. quality gate: keep docs passing the C4 word-shape rules
        #    (relaxed min_words — the synthetic corpus is short-doc)
        flags = c4_filters(docs, min_words=10)
        kept = docs.join(
            flags.filter(F.col("keep_doc")).select("doc_id"), "doc_id"
        )

        # 2. near-dup removal: one survivor per duplicate cluster
        pairs = ngram_jaccard_pairs(kept, k=5, threshold=0.6)
        deduped = dedup_by_components(kept, pairs)

        # 3. content-addressed split, then pack only the train split
        split = deterministic_split(deduped.select("doc_id", "text", "source"))
        train = deduped.join(
            split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
        )
        packed = pack_sequences(train, budget=256)

        # everything above is transformations only; the single action:
        rows = packed.collect()

        n_kept = kept.count()
        n_deduped = deduped.count()
        assert 0 < len(rows) == train.count() <= n_deduped <= n_kept
        # ~90% of deduped docs should land in train (md5-bucketed)
        assert len(rows) >= 0.8 * n_deduped
        # budget respected end-to-end
        over = (
            packed.groupBy("source", "seq_id")
            .agg(F.sum("doc_tokens").alias("s"))
            .filter(F.col("s") > 256)
            .count()
        )
        assert over == 0
        # survivors are a subset of the filtered corpus, no duplicates
        assert packed.select("doc_id").distinct().count() == len(rows)
    finally:
        release_persists()


def test_chunk_embed_retrieve_rerank_composes(spark, docs):
    """The retrieval-indexing capstone: chunk long docs → hashed
    embeddings per chunk → cosine shortlist → MMR-diversified top-k,
    all as one lazy DAG.  Pins the column contracts between the four
    stages, provenance back to (doc_id, chunk_idx), and that MMR
    returns each query's own chunk first with diversified follow-ups.
    """
    from dfsql_spark.operators.similarity import cosine_topk, mmr_rerank
    from dfsql_spark.operators.text import chunk_documents, hashed_embeddings

    # 1. chunk with provenance; synthetic docs are short, so a small
    #    budget still yields multi-chunk docs
    chunks = chunk_documents(docs, max_chars=200, overlap=50).withColumn(
        "chunk_id", F.col("doc_id") * 1000 + F.col("chunk_idx")
    )

    # 2. model-free embeddings over the chunk text
    emb = hashed_embeddings(
        chunks, text_col="chunk", id_col="chunk_id", dim=32
    ).withColumnRenamed("chunk_id", "vec_id")

    # 3. shortlist then 4. diversify
    qs = emb.filter("vec_id % 1000 == 0").limit(5).selectExpr(
        "vec_id AS query_id", "embedding"
    )
    shortlist = cosine_topk(emb, qs, k=12)
    final = mmr_rerank(shortlist, emb, k=5, lam=0.7)

    rows = final.collect()  # the single action
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 5
        ranked = sorted(rs, key=lambda r: r.mmr_rank)
        # self-retrieval: the query IS a corpus chunk, so rank 1 = itself
        assert ranked[0].neighbor_id == qid
        assert len({r.neighbor_id for r in rs}) == 5
    # provenance survives: every retrieved chunk joins back to its doc
    hits = final.selectExpr("neighbor_id AS chunk_id").distinct()
    back = hits.join(chunks, "chunk_id").select("doc_id", "chunk_idx")
    assert back.count() == hits.count()


def test_crawl_frontend_composes_with_funnel_report(spark, docs):
    """The crawl front-end chains lazily: script gate → Gopher rules →
    blocklist → line clean → exact dedup, with filter_funnel
    reporting the gates' yield in ONE extra pass over the flags."""
    from dfsql_spark.operators.checks import filter_funnel
    from dfsql_spark.operators.dedup import exact_dedup
    from dfsql_spark.operators.text import (
        blocklist_filter,
        c4_line_clean,
        gopher_filters,
        script_fractions,
    )

    script = script_fractions(docs).select("doc_id", "script")
    gopher = gopher_filters(docs, min_words=10, min_stopword_hits=0).select(
        "doc_id", F.col("keep_doc").alias("keep_gopher")
    )
    block = blocklist_filter(docs, ["zzzz_never_in_corpus"]).select(
        "doc_id", F.col("keep_doc").alias("keep_block")
    )
    flags = (
        docs.select("doc_id", "text")
        .join(script, "doc_id")
        .join(gopher, "doc_id")
        .join(block, "doc_id")
    )
    conds = [
        ("latin", F.col("script") == "latin"),
        ("gopher", F.col("keep_gopher")),
        ("blocklist", F.col("keep_block")),
    ]
    stages = {
        r.stage: (r.n_in, r.n_out) for r in filter_funnel(flags, conds).collect()
    }
    assert stages["latin"][0] == docs.count()
    assert (
        stages["latin"][1] == stages["gopher"][0]
        and stages["gopher"][1] == stages["blocklist"][0]
    )
    assert stages["blocklist"][1] > 0  # the synthetic corpus survives

    kept = flags.filter(
        (F.col("script") == "latin") & F.col("keep_gopher") & F.col("keep_block")
    )
    assert kept.count() == stages["blocklist"][1]

    cleaned = c4_line_clean(kept)
    assert cleaned.count() == kept.count()  # row-preserving report
    surv = exact_dedup(kept)
    assert 0 < surv.count() <= kept.count()

    # the append=True fusion form (one scan, zero joins) keeps the
    # exact same documents as the joined-reports form above
    fused = script_fractions(
        gopher_filters(
            blocklist_filter(
                docs.select("doc_id", "text"),
                ["zzzz_never_in_corpus"],
                append=True,
            ),
            min_words=10,
            min_stopword_hits=0,
            append=True,
        ),
        append=True,
    ).filter(
        (F.col("script") == "latin")
        & F.col("keep_gopher")
        & F.col("keep_blocklist")
    )
    assert sorted(r.doc_id for r in fused.select("doc_id").collect()) == sorted(
        r.doc_id for r in kept.select("doc_id").collect()
    )
    from dfsql_spark.plans.audit import plan_summary

    assert plan_summary(fused).n_exchanges == 0  # gates fuse into the scan


def test_dsir_feeds_weighted_sample(spark, docs):
    """The DSIR -> weighted_sample chain the dsir_log_weights
    docstring promises: exp-shifted log-weights become sampling
    weights, and the realized sample prefers higher-weight docs."""
    from dfsql_spark.operators.text import dsir_log_weights, weighted_sample

    target = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    lw = dsir_log_weights(docs, target, buckets=1024)
    weighted = docs.join(lw, "doc_id").withColumn(
        "w", F.exp(F.col("log_weight") - F.lit(0.0))
    )
    kept = weighted_sample(weighted, "w", target_fraction=0.5)
    n_in, n_out = weighted.count(), kept.count()
    assert 0 < n_out < n_in
    # deterministic: same call, same sample
    again = weighted_sample(weighted, "w", target_fraction=0.5)
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )
    # the kept set's mean log-weight should not be below the corpus mean
    mean_all = weighted.agg(F.avg("log_weight")).first()[0]
    mean_kept = kept.agg(F.avg("log_weight")).first()[0]
    assert mean_kept >= mean_all


def test_quality_budget_mix_epoch_composes(spark, docs):
    """The round-10 trainer-prep tail: quality-score → token-budget
    selection (best docs first) → repeat-factor mix to target source
    shares → deterministic epoch ordering.  Pins the column contracts
    between the four stages, that the budget stage actually bound the
    selection, that the mix emits copy_idx epochs, and that the final
    ordering is reproducible."""
    from dfsql_spark.operators.text import (
        epoch_shuffle,
        quality_score,
        select_token_budget,
        upsample_mix,
    )

    scored = docs.join(quality_score(docs).select("doc_id", "quality"), "doc_id")
    picked = select_token_budget(
        scored.select("doc_id", "source", "text", "quality"),
        10_000,
        priority_col="quality",
        bins=20,
    )
    n_all, n_picked = docs.count(), picked.count()
    assert 0 < n_picked < n_all  # the budget genuinely bound
    srcs = [r[0] for r in picked.select("source").distinct().limit(3).collect()]
    assert len(srcs) >= 2
    mixed = upsample_mix(
        picked.select("doc_id", "source", "text"),
        {srcs[0]: 0.7, srcs[1]: 0.3},
    )
    assert "copy_idx" in mixed.columns
    assert mixed.count() > 0
    ordered = epoch_shuffle(mixed.withColumn(
        "doc_id", F.concat_ws("#", F.col("doc_id"), F.col("copy_idx"))
    ), epoch=1)
    a = [r.doc_id for r in ordered.select("doc_id").collect()]
    b = [r.doc_id for r in ordered.select("doc_id").collect()]
    assert a == b and len(a) == mixed.count()


def test_classifier_calibrates_via_threshold_sweep(spark, docs):
    """The model-based quality filter chains into threshold_sweep:
    train -> score -> one-pass P/R/F1 over candidate cutoffs, with
    the high-cutoff row at least as precise as the low-cutoff row on
    a learnable token signal."""
    from dfsql_spark.operators.checks import threshold_sweep
    from dfsql_spark.operators.classify import (
        classifier_score,
        train_text_classifier,
    )
    from dfsql_spark.operators.text import deterministic_split

    labeled = docs.withColumn(
        "label", F.col("text").rlike(r"\bspark\b").cast("int")
    ).join(deterministic_split(docs), "doc_id")
    train = labeled.filter("split = 'train'")
    test = labeled.filter("split != 'train'")
    w, b = train_text_classifier(train, "label", dim=64)
    scored = test.select("doc_id", "label").join(
        classifier_score(test, w, b), "doc_id"
    )
    sweep = {
        r.threshold: r
        for r in threshold_sweep(
            scored, "prob", "label", [0.1, 0.5, 0.9]
        ).collect()
    }
    assert sweep[0.1].n_kept >= sweep[0.5].n_kept >= sweep[0.9].n_kept
    assert sweep[0.1].recall >= sweep[0.5].recall >= sweep[0.9].recall
    # the learnable signal separates well: mid cutoff is near-perfect
    assert sweep[0.5].f1 is not None and sweep[0.5].f1 >= 0.9


def test_wet_ingest_robots_dedup_composes(spark, tmp_path):
    """The crawl ENTRY path end-to-end, from raw bytes to a curated
    frame: WET members -> read_wet -> canonical urls -> robots
    compliance filter -> url dedup -> stable content ids, exercising
    the round-14 additions as one lazy DAG over real file input."""
    import gzip

    import pandas as pd

    from dfsql_spark.operators.versioning import assign_stable_ids
    from dfsql_spark.operators.web import (
        canonicalize_url,
        parse_robots,
        robots_filter,
        url_dedup,
    )
    from dfsql_spark.sources.warc import read_wet

    def rec(url, payload: bytes):
        head = (
            b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        )
        return head + payload + b"\r\n\r\n"

    member = (
        rec("https://ok.com/a", b"alpha text body")
        + rec("https://ok.com/a?utm_source=x", b"alpha text body dup")
        + rec("https://ok.com/private/x", b"should be dropped by robots")
        + rec("https://other.net/b", b"beta text body")
    )
    d = tmp_path / "wet"
    d.mkdir()
    (d / "m1.warc.wet.gz").write_bytes(gzip.compress(member))

    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["ok.com"],
                "robots_txt": ["User-agent: *\nDisallow: /private\n"],
            }
        )
    )

    docs = read_wet(spark, str(d))
    compliant = robots_filter(docs, parse_robots(robots), url_col="url")
    canon = canonicalize_url(compliant, url_col="url")
    survivors = url_dedup(
        canon.withColumn("doc_id", F.xxhash64("url")),
        url_col="url",
    )
    # 3 compliant pages, 2 distinct canonical urls (utm variant merges)
    rows = survivors.collect()
    assert len(rows) == 2
    assert {r.canonical_url for r in rows} == {
        "https://ok.com/a",
        "https://other.net/b",
    }
    dup = {r.canonical_url: r.n_copies for r in rows}
    assert dup["https://ok.com/a"] == 2

    with_ids = assign_stable_ids(
        canon.select("url", "text"), cols=["text"], algo="md5"
    )
    assert with_ids.select("stable_id").distinct().count() == 3


def test_wat_links_feed_pagerank(spark, tmp_path):
    """The authority arc end-to-end: WAT-style metadata records (JSON
    payloads listing outgoing links, read with read_wet's type
    filter), link edges extracted with from_json + explode, host
    graph ranked with pagerank — raw crawl bytes to a quality prior
    with no adapter glue."""
    import gzip
    import json

    from dfsql_spark.operators.web import pagerank, url_host_expr
    from dfsql_spark.sources.warc import read_wet

    def rec(url, links):
        payload = json.dumps({"url": url, "links": links}).encode()
        head = (
            b"WARC/1.0\r\nWARC-Type: metadata\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        )
        return head + payload + b"\r\n\r\n"

    member = (
        rec("https://a.com/1", ["https://b.com/x", "https://c.com/y"])
        + rec("https://b.com/x", ["https://a.com/1"])
        + rec("https://c.com/y", ["https://a.com/1", "https://a.com/2"])
    )
    f = tmp_path / "m.wat.gz"
    f.write_bytes(gzip.compress(member))

    wat = read_wet(spark, str(f), warc_types=("metadata",))
    parsed = wat.select(
        "url",
        F.from_json(
            F.col("text"), "struct<url string, links array<string>>"
        ).alias("j"),
    )
    edges = parsed.select(
        url_host_expr("url").alias("src"),
        F.explode("j.links").alias("to_url"),
    ).select("src", url_host_expr("to_url").alias("dst"))
    pr = {r.node: r.rank for r in pagerank(edges, max_iter=15).collect()}
    assert set(pr) == {"a.com", "b.com", "c.com"}
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-9)
    # a.com receives links from both other hosts (3 of 4 edges): top rank
    assert pr["a.com"] == max(pr.values())


def test_crawl_frontend_ungated_dupe_branch_is_value_identical(spark, docs):
    """Optimization-round-15 pin for the bench_crawl_frontend
    restructure: the dup-fraction signals are per-document, so
    computing them over the UNGATED corpus and letting the inner join
    restrict to kept ids must be row- and value-identical to feeding
    the gated subtree to both branches (which evaluates the
    regex-heavy gates three times — the form this replaced)."""
    from dfsql_spark.operators.text import (
        blocklist_filter,
        c4_line_clean,
        duplicate_text_fractions,
        gopher_filters,
        script_fractions,
    )

    thin = docs.select("doc_id", "text")
    kept = script_fractions(
        gopher_filters(
            blocklist_filter(thin, ["zzzz_never_in_corpus"], append=True),
            min_words=10,
            min_stopword_hits=0,
            append=True,
        ),
        append=True,
    ).filter(
        (F.col("script") == "latin")
        & F.col("keep_gopher")
        & F.col("keep_blocklist")
    )
    old = c4_line_clean(kept).join(
        duplicate_text_fractions(kept), "doc_id"
    )
    new = c4_line_clean(kept).join(
        duplicate_text_fractions(thin), "doc_id"
    )
    a = sorted(old.collect(), key=lambda r: r.doc_id)
    b = sorted(new.collect(), key=lambda r: r.doc_id)
    assert len(a) > 0 and a == b
