"""Similarity search over embedding columns (array<float>).

North-star capability (BASELINE.json): approximate nearest neighbor
over an ``embedding`` column at corpus scale.  Three tiers:

* :func:`cosine_topk` — exact brute force: broadcast the (small) query
  set against the corpus, dot products as JVM ``zip_with``/``aggregate``
  expressions inside whole-stage codegen, per-query top-k via window.
  The correctness baseline and still the right plan when |queries| is
  small: one corpus scan, no shuffle of the corpus at all.
* :func:`lsh_topk` — random-hyperplane (sign) LSH: deterministic
  hyperplanes broadcast as literals, bucket key from sign bits,
  corpus and queries meet in a bucket equi-join.  Sub-linear candidate
  sets; recall tunable by ``num_planes``/multi-probe.
* :func:`embedding_neardup_pairs` — all corpus pairs above a cosine
  threshold (dedup use-case), LSH-bucketed by default so the join is
  bucket-local instead of a cross join.

All vector math is built-in higher-order functions — no Python UDFs in
any hot path.  Accumulation is double-precision and strictly
sequential over the array (deterministic across partitionings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def dot(a: str, b: str) -> Column:
    """Σ aᵢ·bᵢ as a codegen'd expression (double accumulation)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str, b: str) -> Column:
    """Expression-path cosine; NaN results (a NaN vector component
    anywhere) are masked to NULL.  Spark sorts/compares NaN ABOVE
    every number, so a raw NaN would wrongly PASS ``>= threshold``
    filters and outrank every true neighbor in top-k windows — and
    :func:`cosine_arrow` already masks NaN to NULL at the Arrow
    boundary, so without this both physical paths would disagree on
    NaN-component embeddings (round-10 advisor finding).  Zero /
    NULL / length-mismatched vectors were already NULL on both paths
    (non-ANSI x/0 → NULL; zip_with pads mismatches with NULL)."""
    c = dot(a, b) / (norm(a) * norm(b))
    return F.when(F.isnan(c), F.lit(None).cast("double")).otherwise(c)


def cosine_arrow(a_col: str, b_col: str) -> Column:
    """Arrow-batched per-candidate cosine: one ``einsum`` per batch
    instead of the interpreted per-row ``aggregate(zip_with(...))``
    expression (Spark evaluates higher-order array lambdas interpreted
    — the trap :func:`cosine_topk` documents; this is the same BLAS
    replacement :func:`semantic_dedup_pairs` made in round 9, applied
    to candidate-pair scoring).  Degenerate inputs — zero vectors
    (IEEE 0/0), NULL vectors, length-mismatched pairs — all come back
    as NULL, matching the expression form (non-ANSI x/0 → NULL;
    zip_with pads mismatches with NULL): Spark orders NaN ABOVE every
    number, so a raw NaN would wrongly PASS ``>= threshold`` filters —
    returning NULL keeps both physical paths dropping degenerate
    pairs identically (pinned in tests)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        if not n:
            return pd.Series([], dtype="float64")
        av, bv = a.to_numpy(), b.to_numpy()
        # NULL or length-mismatched vectors score NULL, matching the
        # expression path (zip_with pads with NULL -> NULL cosine)
        valid = np.fromiter(
            (
                x is not None and y is not None and len(x) == len(y)
                for x, y in zip(av, bv)
            ),
            dtype=bool,
            count=n,
        )
        out = np.full(n, np.nan)
        idx = np.nonzero(valid)[0]
        if len(idx):
            try:
                ma = np.stack(av[idx]).astype(np.float64)
                mb = np.stack(bv[idx]).astype(np.float64)
                num = np.einsum("nd,nd->n", ma, mb)
                den = np.sqrt(
                    np.einsum("nd,nd->n", ma, ma)
                    * np.einsum("nd,nd->n", mb, mb)
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    out[idx] = num / den
            except ValueError:
                # rows valid pairwise but dims differ across the batch
                # (mixed-dimension corpus) — per-row fallback
                for i in idx:
                    x = np.asarray(av[i], dtype=np.float64)
                    y = np.asarray(bv[i], dtype=np.float64)
                    d = float(np.sqrt((x @ x) * (y @ y)))
                    out[i] = (float(x @ y) / d) if d else np.nan
        # Float64 (masked) turns NaN into NULL at the Arrow boundary
        return pd.Series(pd.array(out, dtype="Float64"))

    return _cos(F.col(a_col), F.col(b_col))


def with_unit_vector(df: DataFrame, vec_col: str = "embedding", out: str = "unit") -> DataFrame:
    """Pre-normalize once so pairwise cosine = plain dot product —
    at scale this halves the per-pair flops and is done in the scan
    projection (no extra pass)."""
    n = norm(vec_col)
    return df.withColumn(
        out, F.transform(F.col(vec_col), lambda x: x.cast("double") / n)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    use_arrow: bool = True,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``use_arrow=True`` (default): the query matrix (small by contract)
    is collected once, L2-normalized, and broadcast; each corpus
    partition computes a numpy matmul against its Arrow batch and
    emits only its LOCAL top-k rows per query, so the shuffle carries
    ``partitions x queries x k`` rows no matter how large the corpus
    is; a final window merge picks the global top-k.  Exact: a row
    outranked by k rows inside its own partition cannot be in the
    global top-k (ties broken by neighbor id).  ~25x faster than the
    expression formulation at bench scale -- Spark evaluates
    higher-order array lambdas interpreted, so per-pair
    ``aggregate(zip_with(...))`` dominates; BLAS matmul in an
    Arrow-batched map does the same flops vectorized.

    ``use_arrow=False`` keeps the pure-JVM expression plan (no Python
    workers, e.g. for UDF-restricted clusters).
    """
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    if use_arrow:
        from pyspark.sql.functions import pandas_udf  # noqa: F401

        qpd = queries.select(F.col(query_id_col), F.col(vec_col)).toPandas()
        qids = qpd[query_id_col].to_numpy()
        qm = np.stack(qpd[vec_col].to_numpy()).astype(np.float64)
        qm /= np.linalg.norm(qm, axis=1, keepdims=True)
        spark = corpus.sparkSession
        b_q = spark.sparkContext.broadcast((qids, qm))

        def score(batches):
            qids_, qm_ = b_q.value
            nq = len(qids_)
            for pdf in batches:
                if not len(pdf):
                    continue
                cm = np.stack(pdf["c_vec"].to_numpy()).astype(np.float64)
                cm /= np.linalg.norm(cm, axis=1, keepdims=True)
                sims = cm @ qm_.T  # (m, nq)
                nids = pdf["neighbor_id"].to_numpy()
                kk = min(k, len(nids))
                out = []
                for j in range(nq):
                    s = sims[:, j]
                    # exact local top-k with (cos desc, id asc) order
                    idx = np.lexsort((nids, -s))[:kk]
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": qids_[j],
                                "neighbor_id": nids[idx],
                                "cos_sim": s[idx],
                            }
                        )
                    )
                yield pd.concat(out, ignore_index=True)

        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
        qid_type = queries.schema[query_id_col].dataType.simpleString()
        nid_type = corpus.schema[id_col].dataType.simpleString()
        scored = c.mapInPandas(
            score,
            f"query_id {qid_type}, neighbor_id {nid_type}, cos_sim double",
        ).withColumnRenamed("query_id", query_id_col)
    else:
        q = queries.select(F.col(query_id_col), F.col(vec_col).alias("q_vec"))
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
        scored = c.crossJoin(broadcast(q)).select(
            query_id_col,
            "neighbor_id",
            cosine("c_vec", "q_vec").alias("cos_sim"),
        )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim).tolist()


def _bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from ``num_planes`` fixed hyperplanes.

    The hyperplanes are literals — compiled into the plan, identical on
    every executor, no driver state to ship."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        prod = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(prod >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("int")


def _all_table_buckets(
    vec_col: str, dim: int, num_planes: int, num_tables: int, seed: int
) -> Column:
    """``explode(array<struct<tbl,bucket>>)`` — every table's bucket id
    computed in ONE projection, so bucketing costs one corpus scan
    regardless of ``num_tables``.  (The previous unionAll of per-table
    bucketings scanned the corpus ``num_tables`` times — harmless at
    bench scale, N× the dominant cost at 100 TB.)"""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _bucket_expr(
                        vec_col, _hyperplanes(dim, num_planes, seed + t)
                    ).alias("bucket"),
                )
                for t in range(num_tables)
            ]
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
    use_arrow: bool = True,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with ``num_tables``
    independent tables (union of candidates ≈ multi-probe recall).

    Corpus rows are bucketed once for ALL tables in a single
    projection (:func:`_all_table_buckets` — one corpus scan, not
    ``num_tables``) and meet queries in a (table, bucket) equi-join —
    candidate set per query is the union of its buckets, typically a
    small fraction of the corpus.  Cosine is computed right after the
    broadcast join — while both vectors are on hand — so the candidate
    dedup that follows shuffles only thin (query, neighbor, score)
    rows, never the embedding payload, and the corpus itself is never
    shuffled at all.  Cosine is duplicate-invariant, so scoring before
    dedup is value-identical; a pair colliding in several tables
    recomputes it at most ``num_tables`` times.  Recall improves with
    more tables; cost scales with candidate volume, not corpus size.
    Pass ``dim`` (vector width) to skip the one-row lookup job.

    ``use_arrow=True`` (default) scores candidates with
    :func:`cosine_arrow` (vectorized einsum per Arrow batch);
    ``use_arrow=False`` keeps the pure-JVM expression plan for
    UDF-restricted clusters — same candidates, same values up to the
    accumulation-order ulp.
    """
    dim = dim or len(corpus.select(vec_col).first()[0])
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("q_vec"))

    cb = c.select(
        "neighbor_id",
        "c_vec",
        _all_table_buckets("c_vec", dim, num_planes, num_tables, seed).alias("tb"),
    ).select("neighbor_id", "c_vec", "tb.tbl", "tb.bucket")
    qb = q.select(
        query_id_col,
        "q_vec",
        _all_table_buckets("q_vec", dim, num_planes, num_tables, seed).alias("tb"),
    ).select(query_id_col, "q_vec", "tb.tbl", "tb.bucket")

    score = cosine_arrow if use_arrow else cosine
    scored = (
        cb.join(broadcast(qb), ["tbl", "bucket"])
        .select(
            query_id_col, "neighbor_id", score("c_vec", "q_vec").alias("cos_sim")
        )
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: "bool | str" = "auto",
    lsh_min_docs: int = 50_000,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
    n_docs: int | None = None,
    use_arrow: bool = True,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold.

    ``use_lsh="auto"`` (default) picks the physical strategy by corpus
    size — the same gate pattern as ``ngram_jaccard_pairs``:

    * below ``lsh_min_docs`` rows: the exact O(n²) pair join.  Correct
      baseline, and genuinely the fastest plan when n² is small.
    * at or above it: LSH-bucketed join — corpus rows meet only inside
      (table, bucket) partitions, so the candidate set is near-linear
      instead of quadratic.  At 100 TB this is the only viable shape,
      at the price of bounded recall loss (tunable via
      ``num_planes``/``num_tables``; near-dups at high thresholds
      collide with high probability).

      Why a JOIN here when :func:`semantic_dedup_pairs` groups by
      cell and runs an in-memory BLAS tile: SemDeDup's cells are
      SIZED by contract (``n_clusters`` keeps them ~10⁴ vectors), so
      a cell-local matrix is bounded; LSH buckets are hash-determined
      and can be arbitrarily hot, and the sort-merge join STREAMS a
      hot bucket's pair candidates through the scoring + threshold
      filter without ever materializing a |bucket|-sized similarity
      tile — the memory-safe shape for unbounded bucket sizes.

    ``use_lsh=True``/``False`` force a strategy (exact stays available
    as the explicit opt-in baseline).  ``dim`` (vector width) avoids
    the one-row lookup job when the caller already knows it, and
    ``n_docs`` (row count, e.g. from catalog stats) avoids the gate's
    counting job the same way.

    ``use_arrow=True`` (default) scores every candidate pair with
    :func:`cosine_arrow` (vectorized einsum per Arrow batch — the
    round-9 :func:`semantic_dedup_pairs` upgrade applied here);
    ``use_arrow=False`` keeps the pure-JVM ``aggregate(zip_with)``
    expression for UDF-restricted clusters.  Same pair set either way
    (output membership is ulp-robust at any real threshold; degenerate
    vectors — zero, NULL, length-mismatched, NaN-component — score
    NULL and drop on BOTH paths, see :func:`cosine`).
    """
    if use_lsh == "auto":
        # The count is metadata-only when ``df`` is a bare parquet scan
        # (row-group metadata answers it); any upstream filter or
        # transform makes it a full pass — callers holding catalog
        # stats pass ``n_docs=`` (or ``use_lsh=`` explicitly) instead.
        use_lsh = (n_docs if n_docs is not None else df.count()) >= lsh_min_docs
    score = cosine_arrow if use_arrow else cosine
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if not use_lsh:
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", score("va", "vb").alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
        )
    dim = dim or len(df.select(vec_col).first()[0])
    # One projection computes every table's bucket (single corpus scan);
    # cosine is evaluated right after the bucket join while both
    # vectors are in hand, then threshold-filtered, so the pair dedup
    # shuffles only thin (id_a, id_b, cos_sim) survivors — never the
    # embedding payload.  Cosine is duplicate-invariant: filter-then-
    # dedup is value-identical to dedup-then-score.
    ab = a.select(
        "id_a", "va", _all_table_buckets("va", dim, num_planes, num_tables, seed).alias("tb")
    ).select("id_a", "va", "tb.tbl", "tb.bucket")
    bb = b.select(
        "id_b", "vb", _all_table_buckets("vb", dim, num_planes, num_tables, seed).alias("tb")
    ).select("id_b", "vb", "tb.tbl", "tb.bucket")
    # hint("merge"): both sides are the (corpus-sized) bucketed table —
    # pin the shuffle join; AQE would broadcast a side at toy scale,
    # which is the wrong plan everywhere else.
    return (
        ab.hint("merge").join(bb.hint("merge"), ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score("va", "vb").alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def semantic_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 32,
    seed: int = 42,
    train_fraction: float | None = None,
    max_iter: int = 10,
    n_probe: int = 1,
    compare: str = "arrow",
) -> DataFrame:
    """SemDeDup-style semantic dedup (the published recipe: cluster
    embeddings, compare only within clusters): a seeded KMeans coarse
    quantizer assigns every vector to one cell, then exact cosine runs
    inside each cell via a cell equi-join — pair candidates are
    near-duplicates' neighbors, never the corpus cross product.

    Scale shape: candidate volume is Σ|cell|², so ``n_clusters`` must
    grow with the corpus (the published setting is ~corpus_size/10⁴
    clusters; train on a sample via ``train_fraction`` — the quantizer
    needs ~10⁶ vectors, not 100 TB).  The cell join is merge-hinted:
    both sides are the corpus-sized assignment table, never a
    broadcast candidate beyond toy scale.  A true near-dup pair can
    land in two different cells (bounded recall loss, the documented
    SemDeDup trade-off); recall rises as clusters shrink toward the
    duplicate scale.

    ``n_probe`` bounds that boundary-split loss the standard IVF way:
    each vector is assigned to its ``n_probe`` nearest centroids
    (Arrow-batched scoring of the tiny broadcast centroid matrix —
    the same pattern as :func:`ivf_topk`'s query side), so a pair
    splitting across a cell boundary still meets wherever their probe
    sets overlap.  Candidate volume grows ≤ ``n_probe``× (cells
    overlap), found empirically worth it — recall vs the exact
    all-pairs ground truth at threshold 0.4 with 4 cells:

    ========  =========  =========  =========
    corpus    n_probe=1  n_probe=2  n_probe=3
    ========  =========  =========  =========
    sf0.01      0.627      0.966      1.000
    sf0.1       0.491      0.948      1.000
    ========  =========  =========  =========

    (zero spurious pairs at every setting — the in-cell compare is
    exact cosine, probing only adds candidates).  With ``n_probe=1``
    the assignment is Spark ML's own ``transform`` (bit-identical to
    the pre-multi-probe behavior).

    With ``n_probe=1`` each id has exactly one cell so pairs emerge at
    most once; multi-probe pairs can meet in several shared cells, so
    that path adds one ``dropDuplicates`` on (id_a, id_b).  Seeded
    KMeans + deterministic tie-breaks keep output stable run-to-run.

    ``compare`` picks the in-cell physical path:

    * ``"arrow"`` (default) — the published SemDeDup shape: group by
      cell (one shuffle) and compute each cell's pairwise cosine as a
      row-blocked BLAS matmul over L2-normalized vectors inside an
      Arrow ``applyInPandas``.  A cell is in-memory by the operator's
      own sizing contract (``n_clusters`` keeps cells ~10⁴ vectors);
      the row blocking bounds the similarity tile at ``block ×
      |cell|`` doubles regardless of cell size.  Measured at sf0.1
      (5k × 64-dim, 32 cells, n_probe=2): the expression path's
      per-pair ``aggregate(zip_with(...))`` evaluates interpreted —
      the same trap :func:`cosine_topk` documents — while the BLAS
      tile does identical flops vectorized.
    * ``"expr"`` — the pure-JVM cell equi-join + codegen'd cosine
      expression: no Python workers anywhere (UDF-restricted
      clusters), same pair set (pairs at a float-rounding boundary of
      the threshold could in principle differ between accumulation
      orders; both accumulate in double).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_probe < 1:
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    if compare not in ("arrow", "expr"):
        raise ValueError(f"compare must be 'arrow' or 'expr', got {compare!r}")
    feat = array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    c = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), feat.alias("features")
    )
    train = c.sample(train_fraction, seed=seed) if train_fraction else c
    model = KMeans(k=n_clusters, seed=seed, maxIter=max_iter).fit(
        train.select("features")
    )
    if n_probe == 1:
        cells = model.transform(c).select(
            "id", "v", F.col("prediction").alias("cell")
        )
    else:
        centers = np.stack([ctr for ctr in model.clusterCenters()]).astype(
            np.float64
        )
        spark = df.sparkSession
        b_centers = spark.sparkContext.broadcast(centers)
        probe = min(n_probe, len(centers))

        def assign(batches):
            ctrs = b_centers.value  # (k, dim)
            sq = (ctrs * ctrs).sum(axis=1)  # ||c||² per centroid
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                # argpartition over squared L2: ||x-c||² = ||x||² - 2x·c
                # + ||c||²; ||x||² is constant per row, so rank by
                # (||c||² - 2x·c).  Full argsort on k values keeps the
                # probe order deterministic (ties by centroid index).
                d = sq[None, :] - 2.0 * (m @ ctrs.T)
                order = np.argsort(d, axis=1, kind="stable")[:, :probe]
                yield pd.DataFrame(
                    {
                        "id": pdf["id"].to_numpy().repeat(probe),
                        "v": [
                            v for v in pdf["v"] for _ in range(probe)
                        ],
                        "cell": order.reshape(-1),
                    }
                )

        id_type = df.schema[id_col].dataType.simpleString()
        vec_type = df.schema[vec_col].dataType.simpleString()
        cells = c.select("id", "v").mapInPandas(
            assign, f"id {id_type}, v {vec_type}, cell int"
        )
    if compare == "expr":
        a = cells.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "cell")
        b = cells.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "cell")
        pairs = (
            a.hint("merge").join(b.hint("merge"), "cell")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cosine("va", "vb").alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
        )
    else:
        id_out = df.schema[id_col].dataType.simpleString()
        block = 2048  # sim tile ≤ block × |cell| doubles, cell-size-proof
        thr = float(threshold)

        def _cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            n = len(pdf)
            empty = pd.DataFrame(
                {"id_a": pd.Series(dtype=object), "id_b": pd.Series(dtype=object),
                 "cos_sim": pd.Series(dtype="float64")}
            )
            if n < 2:
                return empty
            ids = pdf["id"].to_numpy()
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            norms = np.sqrt((m * m).sum(axis=1))
            # zero vectors: cosine is 0/0 — the expression path yields
            # NaN and the threshold filter drops it; mirror that by
            # making their unit rows NaN (any comparison -> False).
            with np.errstate(divide="ignore", invalid="ignore"):
                u = m / norms[:, None]
            out = []
            for s in range(0, n, block):
                sim = u[s : s + block] @ u.T
                sub = ids[s : s + block]
                with np.errstate(invalid="ignore"):
                    mask = (sim >= thr) & (sub[:, None] < ids[None, :])
                ii, jj = np.nonzero(mask)
                if len(ii):
                    out.append(
                        pd.DataFrame(
                            {"id_a": sub[ii], "id_b": ids[jj], "cos_sim": sim[ii, jj]}
                        )
                    )
            return pd.concat(out, ignore_index=True) if out else empty

        pairs = cells.groupBy("cell").applyInPandas(
            _cell_pairs, f"id_a {id_out}, id_b {id_out}, cos_sim double"
        )
    if n_probe > 1:
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return pairs


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    train_fraction: float | None = None,
    max_iter: int = 10,
    use_arrow: bool = True,
) -> DataFrame:
    """Approximate top-k via IVF-Flat: k-means coarse quantizer, probe
    the ``n_probe`` nearest cells per query, exact cosine rerank inside
    the probed cells.

    Build: Spark ML KMeans (optionally on a ``train_fraction`` sample —
    at 100 TB you train the quantizer on ~10^6 vectors, not the corpus)
    → every corpus row gets its cell id with one distributed
    ``model.transform`` pass.  Search: each query scores the (tiny,
    broadcast) centroid matrix in an Arrow-batched UDF, explodes to its
    ``n_probe`` cells, and meets corpus rows in a cell equi-join — the
    scan per query is ``n_probe / n_cells`` of the corpus instead of
    all of it.  Recall rises with ``n_probe`` (= exact when
    ``n_probe == n_cells``).

    ``use_arrow=True`` (default) scores candidates with
    :func:`cosine_arrow` (vectorized einsum per Arrow batch);
    ``use_arrow=False`` keeps the pure-JVM expression scoring.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        feat.alias("features"),
    )
    train = c.sample(train_fraction, seed=seed) if train_fraction else c
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(
        train.select("features")
    )
    c_cells = model.transform(c).select(
        "neighbor_id", "c_vec", F.col("prediction").alias("cell")
    )

    centers = np.asarray([np.asarray(ctr) for ctr in model.clusterCenters()])
    spark = corpus.sparkSession
    b_centers = spark.sparkContext.broadcast(centers)
    probe = min(n_probe, n_cells)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        ctrs = b_centers.value  # (n_cells, dim)
        out = []
        for v in vecs:
            q = np.asarray(v, dtype=np.float64)
            d2 = ((ctrs - q) ** 2).sum(axis=1)
            out.append(np.argsort(d2, kind="stable")[:probe].astype("int32").tolist())
        return pd.Series(out)

    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("q_vec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    score = cosine_arrow if use_arrow else cosine
    cand = c_cells.join(broadcast(q), "cell").select(
        query_id_col, "neighbor_id", score("c_vec", "q_vec").alias("cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )


# ---------------------------------------------------------------------------
# product quantization (PQ / ADC)
# ---------------------------------------------------------------------------

def _kmeans_np(X: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Deterministic Lloyd's k-means on a (small, driver-side) training
    sample: random-choice init from a fixed seed, empty clusters keep
    their previous centroid.  numpy-only — the training matrix is a
    bounded sample by contract, never the corpus."""
    rng = np.random.RandomState(seed)
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    # argmin over ||x||^2 - 2xC' + ||C||^2: an (n x k) matrix + one
    # BLAS gemm per iteration.  The broadcast form
    # ((X[:,None,:]-C)**2).sum(2) materializes an (n x k x dim)
    # temporary — ~1.6 GB/iteration at the documented posture
    # (train_size=1e5, n_codes=256, sub=8) — on the driver.
    xx = (X * X).sum(axis=1)[:, None]
    for _ in range(iters):
        d2 = xx - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)
        # vectorized centroid update: one scatter-add + bincount beats a
        # k-wide Python mask loop (the loop dominated training time at
        # n_codes=128: 128 masks x iters x subspaces of pure overhead)
        sums = np.zeros_like(C)
        np.add.at(sums, assign, X)
        counts = np.bincount(assign, minlength=k)
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
    return C


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    m: int = 8,
    n_codes: int = 32,
    seed: int = 42,
    train_size: int = 100_000,
    train_fraction: float | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Approximate top-k via product quantization (Jegou et al., PAMI
    2011) with asymmetric distance computation and exact rerank.

    The 100 TB story is MEMORY, not candidate pruning: each
    (unit-normalized) vector is split into ``m`` subspaces and each
    subspace is quantized to one of ``n_codes`` centroids, so a
    ``dim``-float vector compresses to ``m`` code ids (``m`` bytes at
    ``n_codes<=256`` — 32x for dim=64 float32).  The compressed index
    is what a production system materializes and scans; raw vectors
    are only fetched for the final rerank.

    Build: codebooks are trained driver-side on a bounded sample
    (``train_size`` rows max — at 100 TB you train on ~10^5-10^6
    sampled vectors, never the corpus; same posture as
    :func:`ivf_topk`'s ``train_fraction``), then broadcast; encoding
    is one Arrow-batched corpus pass (argmin per subspace).

    Search (ADC): per query, an (m x n_codes) look-up table of partial
    dot products is broadcast; each corpus partition scores its codes
    by LUT gather + sum — no decompression — and emits only its local
    top ``k*rerank_factor`` per query; after the window merge, the
    surviving candidates (|queries| x k x rerank_factor rows) join
    back to raw vectors for the exact cosine rerank.  The shuffle
    carries ``partitions x queries x k*rerank_factor`` thin rows no
    matter the corpus size — the same merge shape as
    :func:`cosine_topk`, on 8-byte codes instead of 256-byte vectors.
    """
    if m < 1 or n_codes < 2:
        raise ValueError(f"need m >= 1 and n_codes >= 2, got m={m}, n_codes={n_codes}")
    spark = corpus.sparkSession
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    nid_type = corpus.schema[id_col].dataType.simpleString()
    empty_schema = (
        f"{query_id_col} {qid_type}, neighbor_id {nid_type}, "
        "rank int, cos_sim double"
    )
    first_row = corpus.select(F.col(vec_col)).first()
    # empty corpus or query set -> empty result, same schema — the
    # contract cosine_topk keeps (pipelines tolerate empty partitions)
    if first_row is None:
        return spark.createDataFrame([], empty_schema)
    dim = len(first_row[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m

    # collect the query matrix FIRST (needed for the LUTs anyway): an
    # empty query set returns before the count/sample/train work below
    qpd = queries.select(F.col(query_id_col), F.col(vec_col)).toPandas()
    if not len(qpd):
        return spark.createDataFrame([], empty_schema)

    # --- train codebooks on a bounded, unit-normalized sample.
    # Pass train_fraction when the corpus size is known (catalog
    # stats): it avoids the count() below, which is itself a full
    # metadata/scan job at 100 TB.  Either way the driver never holds
    # more than train_size vectors.
    if train_fraction is None:
        n_total = corpus.count()
        train_fraction = min(1.0, train_size / max(n_total, 1))
    sample = (
        corpus.sample(train_fraction, seed=seed)
        if train_fraction < 1.0
        else corpus
    ).select(vec_col).limit(train_size).toPandas()
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    codebooks = np.stack(
        [
            _kmeans_np(X[:, j * sub : (j + 1) * sub], n_codes, seed + j)
            for j in range(m)
        ]
    )  # (m, n_codes_eff, sub)
    b_cb = spark.sparkContext.broadcast(codebooks)

    # --- encode the corpus: one Arrow-batched pass, argmin per subspace
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        cb = b_cb.value
        mm, _, sb = cb.shape
        if not len(vecs):
            return pd.Series([], dtype=object)
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        Xs = X.reshape(len(X), mm, sb)
        # argmin_c ||x_j - c||^2 = argmin_c (||c||^2 - 2 x_j . c):
        # one einsum for all rows x subspaces instead of a per-row loop
        dots = np.einsum("nms,mcs->nmc", Xs, cb)
        c_norm2 = (cb * cb).sum(axis=2)  # (m, c)
        code_mat = (c_norm2[None, :, :] - 2.0 * dots).argmin(axis=2)
        return pd.Series(code_mat.astype(np.int32).tolist())

    codes = corpus.select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("code")
    )

    # --- ADC scan: broadcast per-query LUTs, gather+sum per partition
    qids = qpd[query_id_col].to_numpy()
    qm = np.stack(qpd[vec_col].to_numpy()).astype(np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    # luts[q, j, c] = q_sub_j . centroid_{j,c}
    luts = np.einsum("qjs,jcs->qjc", qm.reshape(len(qids), m, sub), codebooks)
    b_lut = spark.sparkContext.broadcast((qids, luts))
    n_cand = k * rerank_factor

    def adc(batches):
        qids_, luts_ = b_lut.value
        nq, mm, _ = luts_.shape
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["code"].to_numpy())  # (n, m)
            nids = pdf["neighbor_id"].to_numpy()
            kk = min(n_cand, len(nids))
            out = []
            for qi in range(nq):
                # gather: sum_j lut[j, code_j] — approximate dot product
                s = luts_[qi][np.arange(mm)[None, :], C].sum(axis=1)
                idx = np.lexsort((nids, -s))[:kk]
                out.append(
                    pd.DataFrame(
                        {"query_id": qids_[qi], "neighbor_id": nids[idx], "adc": s[idx]}
                    )
                )
            yield pd.concat(out, ignore_index=True)

    scored = codes.mapInPandas(
        adc, f"query_id {qid_type}, neighbor_id {nid_type}, adc double"
    ).withColumnRenamed("query_id", query_id_col)
    w_adc = Window.partitionBy(query_id_col).orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        scored.withColumn("r", F.row_number().over(w_adc))
        .filter(F.col("r") <= n_cand)
        .select(query_id_col, "neighbor_id")
    )

    # --- exact rerank of the surviving candidates only
    c_raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    q_raw = queries.select(F.col(query_id_col), F.col(vec_col).alias("q_vec"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.join(c_raw, "neighbor_id")
        .join(broadcast(q_raw), query_id_col)
        .select(query_id_col, "neighbor_id", cosine("c_vec", "q_vec").alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )


# ---------------------------------------------------------------------------
# MMR diversification
# ---------------------------------------------------------------------------

def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    score_col: str = "cos_sim",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking of a per-query candidate
    shortlist (Carbonell & Goldstein, SIGIR 1998): greedily pick the
    candidate maximizing ``lam * relevance - (1 - lam) * max_sim_to_
    already_selected`` until ``k`` are chosen.  Pure relevance top-k
    returns near-duplicate neighbors; retrieval-augmented sampling of
    training data wants coverage, which MMR buys with one knob.

    ``candidates`` is the output shape of :func:`cosine_topk` /
    :func:`lsh_topk` / :func:`ivf_topk` (query id, neighbor id,
    relevance score) — run one of those with a shortlist ``k' > k``
    first.  The greedy argmax is inherently sequential, so it runs in
    ``applyInPandas`` per query group — but only over the shortlist
    (k' rows), never the corpus.  Deterministic: ties broken by
    (mmr score desc, relevance desc, neighbor id asc) at every step.

    Scale shape: ONE hash join attaches candidate embeddings
    (candidate side is |queries| x k' rows — broadcast-eligible; the
    corpus side is scanned, never shuffled), then ONE shuffle of the
    slim (query, neighbor, score, vec) rows onto query_id for the
    per-group greedy pass.  Candidate-to-candidate similarities are
    computed inside the group (k'^2 dot products per query, in numpy)
    and never materialized into a Spark plan, so there is no
    candidate-pair shuffle at any scale.

    Output: (query_id, neighbor_id, mmr_rank, mmr_score, cos_sim) —
    ``mmr_score`` is the objective value at selection time
    (``lam * cos_sim`` for the first pick).
    """
    cand = candidates.select(
        F.col(query_id_col),
        F.col(neighbor_col).alias("neighbor_id"),
        F.col(score_col).cast("double").alias("cos_sim"),
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vec")
    )
    # candidates are |queries| x k' — the small side of the join by
    # contract; broadcast so the corpus scan stays shuffle-free.
    with_vec = vecs.join(broadcast(cand), "neighbor_id")

    qid_type = candidates.schema[query_id_col].dataType.simpleString()
    nid_type = candidates.schema[neighbor_col].dataType.simpleString()
    out_schema = (
        f"{query_id_col} {qid_type}, neighbor_id {nid_type}, "
        "mmr_rank int, mmr_score double, cos_sim double"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic candidate order: relevance desc, id asc
        pdf = pdf.sort_values(
            ["cos_sim", "neighbor_id"], ascending=[False, True]
        ).reset_index(drop=True)
        M = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        sims = M @ M.T  # (k', k') — shortlist-sized by contract
        rel = pdf["cos_sim"].to_numpy()
        n = len(pdf)
        kk = min(k, n)
        selected: list[int] = []
        max_sim = np.full(n, -np.inf)
        chosen_scores = []
        remaining = np.ones(n, dtype=bool)
        for _ in range(kk):
            pen = np.where(np.isfinite(max_sim), max_sim, 0.0)
            obj = lam * rel - (1.0 - lam) * pen
            obj_masked = np.where(remaining, obj, -np.inf)
            # argmax with (obj desc, rel desc, id asc) tie-break: the
            # frame is already sorted rel desc / id asc, and argmax
            # returns the FIRST maximal index.
            i = int(np.argmax(obj_masked))
            selected.append(i)
            chosen_scores.append(obj_masked[i])
            remaining[i] = False
            max_sim = np.maximum(max_sim, sims[:, i])
        out = pdf.iloc[selected][["neighbor_id", "cos_sim"]].copy()
        out.insert(0, query_id_col, pdf[query_id_col].iloc[0])
        out.insert(2, "mmr_rank", np.arange(1, len(selected) + 1, dtype="int32"))
        out.insert(3, "mmr_score", np.asarray(chosen_scores, dtype=np.float64))
        return out

    return with_vec.groupBy(query_id_col).applyInPandas(pick, out_schema)


# ---------------------------------------------------------------------------
# topic-balanced sampling
# ---------------------------------------------------------------------------

def cluster_balanced_sample(
    df: DataFrame,
    alpha: float = 0.3,
    n_clusters: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_fraction: float | None = None,
    max_iter: int = 10,
    buckets: int = 10_000,
    salt: str = "cbal",
    keep_all: bool = False,
) -> DataFrame:
    """Topic-balanced corpus sampling: cluster embeddings with a
    seeded KMeans coarse quantizer and temperature-rebalance the
    CLUSTERS toward target shares ``p_c ∝ n_c^alpha`` — the embedding-
    space analogue of ``text.temperature_rebalance`` (whose strata are
    a metadata column): web corpora are topically lopsided in ways no
    metadata column records, and flattening cluster mass is the
    standard recipe for topic diversity in a pretraining mix.

    Rates use the same closed form as ``temperature_rebalance``
    (``rate_c = (min_t n_t / n_c)^(1-alpha)``: ``alpha=1`` keeps
    everything, ``alpha=0`` targets uniform cluster mass, no cluster
    is ever up-sampled and the smallest is kept fully); the keep
    decision is content-addressed on ``md5(salt:id) % buckets``, so
    GIVEN a row's ``(cell, keep_rate)`` the keep/drop verdict is
    stable across runs, partitionings, and engines.  The cell
    assignment itself carries Spark KMeans' caveat (the same hedge as
    :func:`ivf_topk`): k-means|| init samples in partition order, so
    REPARTITIONED input can train different centroids, shifting cell
    sizes and hence rates — full determinism holds for fixed data,
    parameters, AND partitioning (or a caller-supplied pre-fitted
    assignment).

    Scale shape: pass ``train_fraction`` at scale so KMeans trains on
    a bounded sample (~10^6 vectors at 100 TB, never the corpus; the
    default trains on everything — fine at test scale, the same
    posture as :func:`ivf_topk`/:func:`semantic_dedup_pairs`);
    assignment is one distributed ``model.transform`` map; the
    per-cell count aggregate outputs ``n_clusters`` rows whose derived
    rate table broadcasts back; the keep filter pipelines into the
    one full-width scan.  No corpus-sized shuffle anywhere.

    Returns the kept rows as ``(id, cell, keep_rate)`` — or every row
    plus a ``kept`` boolean when ``keep_all=True`` (audit form).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    feat = array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    c = df.select(F.col(id_col).alias("_id"), feat.alias("features"))
    train = c.sample(train_fraction, seed=seed) if train_fraction else c
    model = KMeans(k=n_clusters, seed=seed, maxIter=max_iter).fit(
        train.select("features")
    )
    cells = model.transform(c).select("_id", F.col("prediction").alias("cell"))

    counts = cells.groupBy("cell").agg(F.count(F.lit(1)).cast("double").alias("_n"))
    # min over the n_clusters-row relation — tiny by construction,
    # same documented pattern as temperature_rebalance/mix_rebalance
    everything = Window.partitionBy()
    rates = counts.select(
        "cell",
        F.pow(F.min("_n").over(everything) / F.col("_n"), F.lit(1.0 - alpha))
        .alias("keep_rate"),
    )
    # THE shared content-addressed bucket (text._salted_bucket is the
    # single-source determinism contract, mirrored by every oracle) —
    # applied to the stringified id, since embeddings have no text
    from .text import _salted_bucket

    bucket = _salted_bucket("_idstr", buckets, salt)
    out = (
        cells.join(broadcast(rates), "cell")
        .withColumn("_idstr", F.col("_id").cast("string"))
        .withColumn("kept", bucket < (F.col("keep_rate") * buckets))
        .select(F.col("_id").alias(id_col), "cell", "keep_rate", "kept")
    )
    if keep_all:
        return out
    return out.filter(F.col("kept")).select(id_col, "cell", "keep_rate")


# ---------------------------------------------------------------------------
# semantic decontamination
# ---------------------------------------------------------------------------

def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    keep_all: bool = False,
) -> DataFrame:
    """Flag corpus docs whose embedding lies within cosine
    ``threshold`` of ANY benchmark/eval item — the semantic
    complement of :func:`~dfsql_spark.operators.dedup.
    ngram_decontaminate`: paraphrased or re-worded eval leakage moves
    every 13-gram but barely moves the embedding, so n-gram collision
    misses exactly what this catches.

    Scale shape: the eval set is small by definition (benchmarks are
    10^3–10^5 items), so its normalized matrix broadcasts to every
    executor and each corpus partition computes one BLAS matmul per
    Arrow batch, emitting (id, max_sim, nearest eval id) — ONE corpus
    scan, NO shuffle, corpus embeddings never leave their partition.
    This is the transposed direction from :func:`cosine_topk` (max
    over the broadcast side per corpus row, not top-k per query), so
    no window merge is needed at all.

    Default output: contaminated rows only (id, nearest_eval_id,
    max_sim ≥ threshold) — anti-join these ids to clean the corpus.
    ``keep_all=True`` returns every corpus row with a ``contaminated``
    boolean for audit/threshold-tuning sweeps.
    """
    epd = eval_df.select(F.col(eval_id_col), F.col(vec_col)).toPandas()
    eids = epd[eval_id_col].to_numpy()
    em = np.stack(epd[vec_col].to_numpy()).astype(np.float64)
    em /= np.maximum(np.linalg.norm(em, axis=1, keepdims=True), 1e-300)
    # sort eval columns by id ONCE before broadcast: argmax returns
    # the first maximal index, so ties deterministically resolve to
    # the lowest eval id regardless of eval_df row order
    order = np.lexsort((eids,))
    eids, em = eids[order], em[order]
    spark = corpus.sparkSession
    b_e = spark.sparkContext.broadcast((eids, em))

    def score(batches):
        eids_, em_ = b_e.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-300)
            sims = cm @ em_.T  # (batch, n_eval)
            j = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"],
                    "nearest_eval_id": eids_[j],
                    "max_sim": sims[np.arange(len(j)), j],
                }
            )

    cid_type = corpus.schema[id_col].dataType.simpleString()
    eid_type = eval_df.schema[eval_id_col].dataType.simpleString()
    scored = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(
        score,
        f"_id {cid_type}, nearest_eval_id {eid_type}, max_sim double",
    )
    out = scored.select(
        F.col("_id").alias(id_col), "nearest_eval_id", "max_sim"
    )
    if keep_all:
        return out.withColumn(
            "contaminated", F.col("max_sim") >= F.lit(float(threshold))
        )
    return out.filter(F.col("max_sim") >= F.lit(float(threshold)))


def truncate_embeddings(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    out_col: "str | None" = None,
    renormalize: bool = True,
) -> DataFrame:
    """Matryoshka-style prefix truncation: keep the first ``dim``
    components of each embedding — the zero-compute compression lever
    for MRL-trained embedding models (Kusupati et al., NeurIPS 2022),
    where the leading coordinates carry a usable coarse representation
    and serving cost scales with the width you keep.  Compose with
    :func:`ann_recall_summary` to measure what a width buys before
    committing the index to it (truncate → :func:`cosine_topk` /
    :func:`ivf_topk` → recall vs the full-width truth).

    ``renormalize=True`` (the MRL serving convention) rescales the
    prefix to unit L2 norm so cosine scores stay calibrated.  NULL
    vectors, vectors shorter than ``dim``, and zero-norm or
    NaN-norm prefixes come back NULL — flag, don't guess (a silently
    half-width or unnormalizable vector would poison every downstream
    score; the NaN gate matters because Spark SQL orders NaN above
    every number, so a bare ``norm > 0`` would wave NaN through).
    With ``renormalize=False`` the prefix components pass through
    verbatim (including NaNs — slice semantics, no score is implied).

    Pure codegen column expressions (slice / fold / transform): zero
    shuffle, zero Python, rides the scan at any scale; the output
    column is ``dim/width`` of the input bytes, which every downstream
    shuffle and ANN stage then inherits.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    for c in ("_t_sliced", "_t_norm"):
        if c in df.columns:
            raise ValueError(
                f"input already has a column named {c!r} (reserved as a "
                "truncate_embeddings staging column) — rename it first"
            )
    out = out_col or vec_col
    v = F.col(vec_col)
    # staged through materialized columns so the prefix is sliced once
    # and the norm fold runs once per ROW — an expression inlined into
    # the transform lambda would re-run per ELEMENT (the same
    # beside-a-generator re-evaluation class pinned in
    # remove_shared_spans; CollapseProject keeps multi-referenced
    # aliases materialized)
    staged = df.withColumn(
        "_t_sliced",
        F.when(
            v.isNotNull() & (F.size(v) >= dim),
            F.transform(F.slice(v, 1, dim), lambda x: x.cast("double")),
        ),
    )
    if not renormalize:
        return staged.withColumn(out, F.col("_t_sliced")).drop("_t_sliced")
    staged = staged.withColumn(
        "_t_norm",
        F.sqrt(
            F.aggregate(
                F.col("_t_sliced"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    )
    # NOT isnan + > 0: Spark orders NaN above every number, so a bare
    # `norm > 0` would pass a NaN norm and emit an all-NaN vector
    scaled = F.when(
        ~F.isnan(F.col("_t_norm")) & (F.col("_t_norm") > 0.0),
        F.transform(F.col("_t_sliced"), lambda x: x / F.col("_t_norm")),
    )
    return staged.withColumn(out, scaled).drop("_t_sliced", "_t_norm")


def random_projection(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    seed: int = 42,
    dim: "int | None" = None,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: multiply every vector
    by a seeded Gaussian matrix ``R[dim, out_dim] / sqrt(out_dim)`` —
    the standard dimensionality reduction in front of ANN / clustering
    when the raw embedding width is the cost driver (JL: pairwise
    distances are preserved within ``eps`` for
    ``out_dim = O(log n / eps²)``, independent of the input width).

    Scale shape: the matrix depends only on ``(seed, dim, out_dim)``
    — a few MB even at 4096→256 — broadcast once; projection is one
    Arrow-batched BLAS matmul per batch riding the scan, ZERO
    shuffle, and the output column is ``out_dim/dim`` of the input
    bytes, which every downstream shuffle/ANN stage then inherits.
    Deterministic by construction: content-independent matrix +
    per-row map, so results are identical across runs, partitionings,
    and cluster sizes.  NULL / width-mismatched vectors project to
    NULL (flag, don't guess — same posture as :func:`cosine`).

    Composes: ``random_projection -> ivf_topk/pq_topk`` (cheaper
    codebooks), ``-> semantic_dedup_pairs`` (cheaper in-cell tiles),
    ``-> cluster_balanced_sample`` (cheaper KMeans).
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    in_dim = dim if dim is not None else len(
        df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()[0]
    )
    rng = np.random.RandomState(seed)
    r_mat = (rng.randn(in_dim, out_dim) / np.sqrt(out_dim)).astype(np.float64)
    spark = df.sparkSession
    b_r = spark.sparkContext.broadcast(r_mat)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        r = b_r.value
        n = len(v)
        if not n:
            return pd.Series([], dtype="object")
        av = v.to_numpy()
        valid = np.fromiter(
            (x is not None and len(x) == r.shape[0] for x in av),
            dtype=bool,
            count=n,
        )
        out = np.full(n, None, dtype=object)
        idx = np.nonzero(valid)[0]
        if len(idx):
            m = np.stack(av[idx]).astype(np.float64)
            p = m @ r
            for j, i in enumerate(idx):
                out[i] = p[j].tolist()
        return pd.Series(out)

    return df.withColumn(out_col, _proj(F.col(vec_col)))


def ann_recall_report(
    truth: DataFrame,
    approx: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query recall@k of an approximate ANN result against exact
    ground truth — the evaluation loop you run on a query sample
    BEFORE trusting :func:`lsh_topk` / :func:`ivf_topk` /
    :func:`pq_topk` parameters on the full corpus (the ANN analog of
    :func:`~dfsql_spark.operators.dedup.pair_metrics`; standard
    ANN-benchmark methodology, e.g. ann-benchmarks.com).

    Both inputs are ``(query_id, neighbor_id, rank, ...)`` result
    tables as produced by every top-k operator in this module.  Each
    side is truncated to its own ``rank <= k`` and deduplicated, so a
    caller may pass results computed at a larger k.  Per query::

        recall = |approx_topk ∩ truth_topk| / |truth_topk|

    The denominator is the TRUTH list size (<= k — a query can have
    fewer than k true neighbors in a small corpus), so recall is 1.0
    exactly when the approximate list contains every true neighbor.
    Queries present only in ``truth`` come back with recall 0 (the
    index missed them entirely); queries only in ``approx`` are
    ignored (no truth to score against).

    Shape: both result tables are ``O(|queries| * k)`` rows — corpus-
    independent — so this is ONE full-outer join of two already-tiny
    tables on ``(query_id, neighbor_id)``, each input consumed exactly
    once (an expensive caller-side ANN plan is never recomputed for a
    second aggregate); nothing wider than two ids ever shuffles, and
    the corpus itself is never touched.  At 100 TB the cost lives in
    producing ``truth`` (one exact pass over a bounded query SAMPLE),
    not here.

    Output: ``(query_id, n_truth, n_approx, n_hit, recall)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qc, nc, rc = query_id_col, neighbor_id_col, rank_col

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col(rc) <= k)
            .select(F.col(qc).alias("_q"), F.col(nc).alias("_n"))
            .distinct()
        )

    t, a = topk(truth), topk(approx)
    # ONE full-outer join consumes each input exactly once (the
    # pair_metrics shape) — an expensive caller-side ANN plan is never
    # recomputed for a second aggregate
    j = t.withColumn("_t", F.lit(1)).join(
        a.withColumn("_a", F.lit(1)), ["_q", "_n"], "full"
    )
    return (
        j.groupBy("_q")
        .agg(
            F.count("_t").alias("n_truth"),
            F.count("_a").alias("n_approx"),
            F.sum(
                (F.col("_t").isNotNull() & F.col("_a").isNotNull()).cast(
                    "long"
                )
            ).alias("n_hit"),
        )
        .filter(F.col("n_truth") > 0)  # approx-only queries are ignored
        .select(
            F.col("_q").alias(qc),
            "n_truth",
            "n_approx",
            "n_hit",
            (F.col("n_hit") / F.col("n_truth")).alias("recall"),
        )
    )


def ann_recall_summary(
    truth: DataFrame,
    approx: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """One-row corpus-level rollup of :func:`ann_recall_report` —
    the number you actually tune ANN parameters against.

    ``macro_recall`` averages per-query recall (every query counts
    equally); ``micro_recall`` is total hits over total truth rows
    (big-truth queries weigh more); ``min_recall`` is the worst query
    and ``frac_perfect`` the fraction of queries with recall 1.0.
    All four are exact relational aggregates of the per-query report
    (no sketches), so the whole evaluation is deterministic and
    mirrorable.  Output: ``(n_queries, macro_recall, micro_recall,
    min_recall, frac_perfect)``.
    """
    rep = ann_recall_report(
        truth, approx, k, query_id_col, neighbor_id_col, rank_col
    )
    return rep.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("recall").alias("macro_recall"),
        (
            F.sum("n_hit").cast("double") / F.sum("n_truth")
        ).alias("micro_recall"),
        F.min("recall").alias("min_recall"),
        F.avg((F.col("recall") == 1.0).cast("double")).alias("frac_perfect"),
    )
