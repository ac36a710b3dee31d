"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine` — JVM-side cosine via ``zip_with`` + ``aggregate``
  (no UDF; stays in codegen).
* :func:`brute_force_topk` — exact top-k neighbors per query vector:
  broadcast the (small) query set against the corpus, window-rank.
  This is the correctness baseline and is already the right plan for
  "few queries x huge corpus" (one broadcast, no shuffle of the corpus).
* :func:`lsh_bucketed_topk` — the scale path for "corpus x corpus":
  sign-random-projection buckets (hyperplanes derived deterministically
  from md5, not RNG) restrict candidate pairs to same-bucket rows;
  multiple tables (independent projections) recover recall. Verified in
  tests against brute force by recall, not exact equality.
* :func:`embedding_neardup_pairs` — all pairs above a cosine threshold
  via the bucketed candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a, b) -> F.Column:
    """Cosine similarity of two double arrays (cast floats first)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos, rank). Self-matches excluded.
    The query side is broadcast — the corpus never shuffles.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# LSH (sign random projection) — deterministic hyperplanes
# ---------------------------------------------------------------------------


def _planes(dim: int, n_planes: int, table: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: md5-seeded uniform in
    [-1, 1). No RNG state — same planes on every executor/run."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        h = hashlib.md5(f"{seed}:{table}:{p}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        out[p] = rng.uniform(-1.0, 1.0, dim)
    return out


def srp_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """pandas UDF: embedding batch -> array of SRP bucket ids, one per
    hash table (sign bits of the projections, packed to int64). All
    tables' projections run in ONE matmul over the Arrow batch, so the
    corpus is scanned once however many tables are used."""
    all_planes = np.concatenate(
        [_planes(dim, n_planes, t, seed) for t in range(n_tables)], axis=0
    )  # (n_tables*n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (m @ all_planes.T) > 0  # (batch, n_tables*n_planes)
        signs = signs.reshape(len(m), -1, len(weights))  # (batch, tables, planes)
        ids = signs @ weights  # (batch, tables)
        return pd.Series(list(ids))

    return buckets


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing an SRP bucket in
    at least one of ``n_tables`` independent projections.

    One Arrow-vectorized pass tags every vector with all table buckets;
    ``posexplode`` yields (tbl, bucket) keys and the join runs per
    bucket — expected bucket size n / 2^n_planes keeps candidate
    generation near-linear at 10^10 vectors. Recall grows with n_tables.
    """
    b = srp_buckets_udf(dim, n_planes, n_tables, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(b(F.col(vec_col))).alias("tbl", "bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(b(F.col(vec_col))).alias("tbl", "bucket"),
    )
    # dedup candidate IDS first (narrow 16-byte rows), then re-attach
    # the wide embedding arrays once per side — a distinct over
    # (id, qvec, id, cvec) would shuffle every vector n_tables times
    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    pairs = cand.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
    scored = pairs.withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_fraction: float | None = None,
    max_iter: int = 5,
    min_train_rows: int = 10_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path
    beside SRP-LSH: a coarse quantizer (Spark ML KMeans, JVM-side,
    fixed seed) partitions the corpus into ``n_centroids`` cells; each
    query probes its ``n_probe`` nearest cells and runs exact cosine
    only inside them. Candidate volume ~ n_probe/n_centroids of the
    corpus per query instead of all of it.

    At 100 TB the quantizer must NOT fit on the full corpus: by default
    (``train_fraction=None``) it trains on a sample sized
    ``max(min_train_rows, 100 * n_centroids)`` rows — KMeans centroid
    quality needs only O(centroids) examples (sqrt-n centroid guidance:
    keep ``n_centroids ~ sqrt(corpus)`` and the sample stays ~100x
    centroids regardless of corpus size). Pass ``train_fraction=1.0``
    explicitly to force a full fit on small corpora. The assignment
    pass is one KMeans transform (whole-stage JVM), and the probe join
    shuffles only the candidate cells. Recall vs brute force is
    pytest-verified (exact values depend on the trained centroids, so
    there is no SQL oracle).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    ml = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        feats.alias("feat"),
    )
    if train_fraction is None:
        # sampled fit by default — full-corpus KMeans is a scale-killer
        target = max(min_train_rows, 100 * n_centroids)
        n_corpus = corpus.count()
        train_fraction = 1.0 if n_corpus <= target else target / n_corpus
    train = ml if train_fraction >= 1.0 else ml.sample(train_fraction, seed=seed)
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter,
        featuresCol="feat", predictionCol="cid",
    ).fit(train)
    assigned = model.transform(ml).select("neighbor_id", "cvec", "cid")

    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])

    @F.pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        d = ((m[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cid"),
    )
    cand = (
        assigned.join(F.broadcast(q.select("query_id", "cid")), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    pairs = cand.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
    scored = pairs.withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def sign_buckets(vec: F.Column, n_planes: int = 4, n_tables: int = 4) -> F.Column:
    """Coordinate-sign LSH buckets, one per table — the axis-aligned
    special case of sign-random-projection (hyperplane = coordinate
    axis). Pure JVM column exprs, so the SAME bucketing runs in the
    DuckDB oracle; use :func:`srp_buckets_udf` when random hyperplanes
    are preferred (e.g. embeddings with correlated leading dims).

    Table ``t`` bucket = Σ_{i<p} (vec[t·p+i] > 0) << i — requires
    dim >= n_tables * n_planes.
    """
    tables = []
    for t in range(n_tables):
        bits = None
        for i in range(n_planes):
            bit = F.when(
                F.element_at(vec, t * n_planes + i + 1) > 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            bits = bit if bits is None else (bits + bit)
        tables.append(bits.cast("long"))
    return F.array(*tables)


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "bucketed",
    n_planes: int = 4,
    n_tables: int = 4,
    round_dp: int = 6,
) -> DataFrame:
    """(a<b) pairs with cosine >= threshold.

    ``mode='bucketed'`` (default, the scale path): candidates are pairs
    sharing a sign-LSH bucket in >=1 of ``n_tables`` coordinate blocks
    — a banded equi-join like MinHash LSH, candidate count ~O(similar
    pairs), never O(n²); exact cosine verifies each candidate. Pair ids
    are deduped BEFORE the vectors are re-joined, so the wide embedding
    arrays shuffle once per side, not once per table. Plan-guarded
    no-cartesian (tests/test_plans.py). Recall == 1.0 for sign-stable
    near-dups (cos ~ 1 with no coordinate sign flips) and is tested vs
    brute force (tests/test_operators_ext.py).

    ``mode='brute'``: the O(n²) all-pairs verifier — the pytest oracle
    for the bucketed path, never the production default.
    """
    if mode == "brute":
        a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        tagged = corpus.select(
            F.col(id_col).alias("vid"),
            F.posexplode(sign_buckets(F.col(vec_col), n_planes, n_tables)).alias(
                "tbl", "bucket"
            ),
        )
        l, r = tagged.alias("l"), tagged.alias("r")
        cand = (
            l.join(
                r,
                (F.col("l.tbl") == F.col("r.tbl"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.vid") < F.col("r.vid")),
            )
            .select(F.col("l.vid").alias("id_a"), F.col("r.vid").alias("id_b"))
            .distinct()
        )
        va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = cand.join(va, "id_a").join(vb, "id_b")
    return (
        pairs.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), round_dp))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
