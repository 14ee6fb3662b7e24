"""Approximate-nearest-neighbor search over an embedding column.

Two paths:
  * brute-force cosine top-k — the exactness baseline: broadcast the query
    set, JVM-side zip_with dot product (no Python in the scoring loop),
    window top-k per query;
  * LSH-bucketed ANN — random-hyperplane signatures with multi-probe
    (hamming-adjacent buckets), exact cosine re-rank of candidates. The scale
    path: candidates per query are O(bucket), not O(corpus).

An IVF sketch (k-means coarse quantizer) is the natural next step at true
100 TB scale; the LSH path keeps everything join-shaped without an iterative
trainer.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .dedup import cosine_expr


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, rank). Queries are
    broadcast; the big side streams — one pass over the corpus."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr("q_vec", "c_vec").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_signatures(
    df: DataFrame, planes: np.ndarray, id_col: str, vec_col: str, out_id: str
) -> DataFrame:
    n_planes = planes.shape[0]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({out_id: [], "bucket": []})
                continue
            vecs = np.array(list(pdf[vec_col]), dtype=np.float64)
            signs = (vecs @ planes.T) > 0
            buckets = (signs * (1 << np.arange(n_planes))).sum(axis=1)
            yield pd.DataFrame(
                {out_id: pdf[id_col].astype("int64"), "bucket": buckets.astype("int64")}
            )

    return df.select(id_col, vec_col).mapInPandas(batches, f"{out_id} long, bucket long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_planes: int = 12,
    n_probes: int = 8,
    n_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: ``n_tables`` independent hyperplane tables (the classic
    recall lever), each probed at the query's bucket plus its hamming-1
    neighbors; candidate union is exact-cosine re-ranked."""
    first = corpus.select(F.size(vec_col).alias("d")).first()
    dim = first["d"]
    probe_flips = [0] + [1 << i for i in range(min(n_probes, n_planes))]

    cand = None
    for t in range(n_tables):
        rng = np.random.RandomState(seed + t)
        planes = rng.normal(size=(n_planes, dim))
        c_sig = _plane_signatures(corpus, planes, id_col, vec_col, "neighbor_id")
        q_sig = _plane_signatures(queries, planes, id_col, vec_col, "query_id")
        probes = q_sig.select(
            "query_id",
            F.explode(
                F.array(
                    *[F.col("bucket").bitwiseXOR(F.lit(flip)) for flip in probe_flips]
                )
            ).alias("bucket"),
        )
        t_cand = probes.join(c_sig, "bucket").filter(
            F.col("query_id") != F.col("neighbor_id")
        ).select("query_id", "neighbor_id")
        cand = t_cand if cand is None else cand.unionByName(t_cand)
    cand = cand.distinct()

    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cosine_expr("q_vec", "c_vec").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def train_ivf_centroids(
    corpus: DataFrame,
    n_clusters: int = 64,
    *,
    vec_col: str = "embedding",
    sample_rows: int = 20_000,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means (Lloyd) on a driver-side sample.
    At 100 TB the sample is still tiny relative to the corpus and the
    centroid set broadcasts; assignment is the only distributed pass."""
    sample = np.array(
        [r[0] for r in corpus.select(vec_col).limit(sample_rows).collect()],
        dtype=np.float64,
    )
    if len(sample) == 0:
        raise ValueError("empty corpus")
    n_clusters = min(n_clusters, len(sample))
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), n_clusters, replace=False)]
    for _ in range(iters):
        # cosine assignment: normalize then max dot
        sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        assign = (sn @ cn.T).argmax(axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _ivf_assign(df: DataFrame, centroids: np.ndarray, id_col: str, vec_col: str, out_id: str, n_probe: int) -> DataFrame:
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({out_id: [], "cluster": []})
                continue
            vecs = np.array(list(pdf[vec_col]), dtype=np.float64)
            vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = vn @ cn.T
            if n_probe == 1:
                clusters = sims.argmax(axis=1)[:, None]
            else:
                clusters = np.argsort(-sims, axis=1)[:, :n_probe]
            ids = np.repeat(pdf[id_col].to_numpy().astype("int64"), clusters.shape[1])
            yield pd.DataFrame({out_id: ids, "cluster": clusters.ravel().astype("int64")})

    return df.select(id_col, vec_col).mapInPandas(batches, f"{out_id} long, cluster long")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_clusters: int = 64,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: corpus rows live in exactly one coarse cluster; each query
    probes its ``n_probe`` nearest clusters; exact cosine re-rank inside.
    Candidates per query ~ corpus * n_probe / n_clusters."""
    centroids = train_ivf_centroids(
        corpus, n_clusters, vec_col=vec_col, seed=seed
    )
    c_assign = _ivf_assign(corpus, centroids, id_col, vec_col, "neighbor_id", 1)
    q_assign = _ivf_assign(queries, centroids, id_col, vec_col, "query_id", n_probe)
    cand = q_assign.join(c_assign, "cluster").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id").distinct()
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cosine_expr("q_vec", "c_vec").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def recall_at_k(exact: DataFrame, approx: DataFrame, k: int = 10) -> float:
    """Evaluation helper: |approx ∩ exact| / |exact| over (query, neighbor)."""
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    hit = e.join(a, ["query_id", "neighbor_id"]).count()
    total = e.count()
    return hit / total if total else 0.0
