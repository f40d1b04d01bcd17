"""Deduplication operators for large-scale text corpora.

The reference engine has no dedup surface; these are the Spark-era
capabilities a training-data pipeline needs (BASELINE.json north star).
Five strategies, all expressed as declarative DataFrame plans so
Catalyst/AQE handle distribution:

* :func:`exact_dedup` — hash-groupBy on normalized text.
* :func:`ngram_jaccard_pairs` — exact character-shingle Jaccard via a
  shingle-inverted-index self-join (the PPJoin family's candidate
  generation without prefix pruning).
* :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash +
  banded LSH: shingle → 64 permuted min-hashes → band buckets →
  bucket-equi-join.  The classic near-dup pipeline (Broder '97 resemblance
  sketches; Leskovec-Rajaraman-Ullman ch.3 banding).
* :func:`simhash_fingerprints` / :func:`simhash_pairs` — Charikar
  SimHash: signed-sum of token-hash bits → 64-bit fingerprint →
  16-bit-chunk blocking (pigeonhole: hamming≤3 ⇒ one of four 16-bit
  chunks equal) → hamming filter via ``bit_count(a XOR b)``.
* :func:`embedding_neardup_pairs` — cosine-threshold pairs over an
  embedding column (see operators/similarity.py for the primitives).

Scale notes (100 TB posture)
----------------------------
* Shuffle keys are fixed-width hashes (xxhash64), never raw document
  text: grouping 100 TB of text by the string itself ships the corpus
  through the shuffle; grouping by its 8-byte hash ships 8 bytes/row.
* Every pair-generation step is an equi-join on a bucket key (shingle,
  band hash, simhash chunk), so Spark plans a shuffled hash join that
  partitions by bucket — no broadcast of the corpus, no cross join.
* Banding parameters (b bands × r rows, b·r = num_perm) tune the
  similarity threshold s ≈ (1/b)^(1/r); callers pick them per corpus.
* Hot buckets (boilerplate shingles) are the skew risk: AQE skew-join
  splitting is on by default in our session, and
  ``ngram_jaccard_pairs`` drops shingles above ``max_shingle_freq``
  (stopword-shingle pruning), the standard mitigation.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne-ish prime > 2^32: universal-hash modulus for MinHash
# permutations h_j(x) = (a_j·x + b_j) mod P over 32-bit base hashes.
# All arithmetic stays within a 64-bit long (a_j < 2^31, x < 2^32).
_MINHASH_PRIME = 4294967311


def normalize_text(col: "Column | str") -> Column:
    """Canonical text form shared by all dedup strategies: lowercase,
    collapse whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def char_shingles(text_col: str, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text
    (array<string>).  Built with JVM array expressions (``transform``
    over ``sequence``) — no Python in the hot path."""
    return _shingles_expr(text_col, k)


def _shingles_expr(text_col: str, k: int) -> Column:
    norm = f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({norm}), {k}) - {k - 1}),"
            f" i -> substring({norm}, i, {k}))"
        )
    )


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_key: bool = True,
) -> DataFrame:
    """Exact dedup on normalized text: one surviving (min-id) row per
    distinct content, with its duplicate count.

    ``hash_key=True`` groups by ``xxhash64(norm)`` so the shuffle ships
    8-byte keys instead of document bodies — the only sane layout at
    100 TB.  (Collision probability over 10^12 docs ≈ 2.7e-8; callers
    needing certainty set ``hash_key=False`` to group on the text.)
    """
    norm = normalize_text(text_col)
    key = F.xxhash64(norm) if hash_key else norm
    return (
        df.select(F.col(id_col), key.alias("dedup_key"))
        .groupBy("dedup_key")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("dedup_key")
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index self-join)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.6,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold.

    Plan shape: explode distinct shingles → inverted index (shingle →
    ids) → self-equi-join on shingle → count common shingles per pair →
    Jaccard from |A|,|B|,|A∩B|.  Every step is a shuffle on a compact
    key; the pair count, not the corpus size, bounds the reduce side.

    ``max_shingle_freq`` drops shingles occurring in more than that
    many docs (boilerplate/stopword shingles): they explode candidate
    pairs quadratically while carrying no discriminative signal.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles_expr(text_col, k)).alias("sh"),
    ).distinct()
    if max_shingle_freq is not None:
        rare = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df_freq"))
            .filter(F.col("df_freq") <= max_shingle_freq)
            .select("sh")
        )
        sh = sh.join(rare, "sh")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 2**31 - 1), rng.randrange(0, 2**31 - 1))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<bigint>[num_perm]) MinHash sketch per document.

    One explode + one groupBy: the shuffle carries (id, 8-byte shingle
    hash); the ``num_perm`` permuted mins are computed column-wise in
    whole-stage codegen before aggregation (map-side partial min), so
    adding permutations costs CPU, not shuffle bytes.
    """
    params = _minhash_params(num_perm, seed)
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles_expr(text_col, k)).alias("sh"),
    ).distinct()
    # 32-bit base hash keeps (a·x + b) inside a 64-bit long
    ex = ex.withColumn("hx", F.pmod(F.xxhash64("sh"), F.lit(2**32)))
    mins = ex.groupBy("id").agg(
        *[
            F.min(F.pmod(F.col("hx") * F.lit(a) + F.lit(b), F.lit(_MINHASH_PRIME))).alias(f"m{j}")
            for j, (a, b) in enumerate(params)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"m{j}") for j in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    verify_threshold: float | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    ``bands`` bands of ``num_perm//bands`` rows: candidate threshold
    s ≈ (1/b)^(1/r) (b=16, r=4 → ~0.5).  Pairs agreeing on ≥1 band
    hash become candidates; ``verify_threshold`` optionally re-checks
    candidates with the exact estimated Jaccard (fraction of equal
    signature components) — still sketch-based, no second corpus scan.
    """
    r = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, k, num_perm, seed)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[F.col("sig")[bi * r + j].cast("string") for j in range(r)],
                            )
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = pairs.withColumn(
        "est_jaccard",
        F.expr(
            "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)),"
            " 0, (acc, v) -> acc + v)"
        )
        / F.lit(num_perm),
    ).select("id_a", "id_b", "est_jaccard")
    if verify_threshold is not None:
        est = est.filter(F.col("est_jaccard") >= verify_threshold)
    return est


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """Greedy survivor set: drop any doc that is the larger id of a
    near-dup pair (single-pass approximation of connected components —
    a chain a~b~c keeps only a)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **lsh_kwargs)
    losers = pairs.select(F.col("id_b").alias("loser")).distinct()
    return df.join(
        losers, df[id_col] == losers.loser, "left_anti"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, simhash bigint): Charikar signed-bit-sum over token hashes.

    Implementation is one explode + one groupBy with 64 conditional
    sums — all codegen'd; the fingerprint reassembles with shifts/ORs.
    """
    norm = normalize_text(text_col)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(norm, " ")).alias("tok"),
    )
    toks = toks.withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {i}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fp_expr = " | ".join(
        f"(CAST(CASE WHEN b{i} > 0 THEN 1 ELSE 0 END AS BIGINT) << {i})"
        for i in range(64)
    )
    return bit_sums.select("id", F.expr(fp_expr).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Blocking: split the 64-bit fingerprint into 4 × 16-bit chunks; by
    pigeonhole any pair within hamming ≤ 3 agrees on ≥1 chunk, so an
    equi-join on (chunk_idx, chunk_value) finds all of them without a
    cross join.  The hamming check is ``bit_count(a XOR b)`` — one
    instruction per pair.
    """
    fp = simhash_fingerprints(df, text_col, id_col)
    chunks = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.expr(f"(simhash >> {i * 16}) & 65535").alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
