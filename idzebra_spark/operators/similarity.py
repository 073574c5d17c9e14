"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, pure JVM expressions
  (zip_with dot product — no Python, no UDF);
- random-hyperplane LSH buckets: candidates share a sign-bit bucket,
  exact cosine re-rank within buckets (scale path: the bucket join
  replaces the all-pairs scan);
- IVF-style coarse quantization: centroids = per-label mean vectors
  (one distributed agg), probe the nearest ``n_probe`` centroids and
  search only those partitions.

Hyperplanes are deterministic functions of (plane, dim) via md5 — no
RNG, reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding",
                id_col: str = "vec_id",
                exclude_id: int | None = None) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, sim_micro)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = emb.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q) * 1000000, 0)
        .cast("long")
        .alias("sim_micro"),
    )
    if exclude_id is not None:
        out = out.where(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("sim_micro"), F.asc("vec_id")).limit(k)


def _plane_weight(p: Column, d: Column) -> Column:
    """Deterministic pseudo-random weight in [-1000, 1000] from md5."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(p.cast("string"), F.lit("_"), d.cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    return (F.pmod(h, F.lit(2001)) - 1000).cast("double")


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit bucket id over ``n_planes`` md5-derived hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda d: _plane_weight(F.lit(p), d),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.shiftleft(
            F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
            p,
        )
    return bucket


def lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             dim: int | None = None, n_planes: int = 8,
             multiprobe_bits: int = 1,
             vec_col: str = "embedding", id_col: str = "vec_id",
             exclude_id: int | None = None) -> DataFrame:
    """ANN: exact cosine re-rank restricted to buckets within Hamming
    distance ``multiprobe_bits`` of the query's LSH bucket
    (multi-probe LSH — recovers recall without more tables)."""
    dim = dim or len(query_vec)
    import hashlib

    # driver-side bucket of the query (same md5-derived planes)
    def w(p: int, d: int) -> float:
        h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
        return float(h % 2001 - 1000)

    qb = sum(
        (1 << p)
        for p in range(n_planes)
        if sum(query_vec[d] * w(p, d) for d in range(dim)) > 0
    )
    vec = F.col(vec_col).cast("array<double>")
    bucketed = emb.withColumn("bucket", lsh_bucket(vec, dim, n_planes))
    cand = bucketed.where(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qb)))
        <= multiprobe_bits
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col, exclude_id)


def ivf_centroids(emb: DataFrame, label_col: str = "label",
                  vec_col: str = "embedding") -> DataFrame:
    """Coarse centroids: element-wise mean vector per label partition."""
    dim_df = emb.select(F.size(vec_col).alias("d")).limit(1)
    dim = dim_df.collect()[0]["d"]
    sums = emb.groupBy(label_col).agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"s{i}")
            for i in range(dim)
        ],
    )
    centroid = F.array(*[(F.col(f"s{i}") / F.col("n")) for i in range(dim)])
    return sums.select(F.col(label_col).alias("label"), centroid.alias("centroid"))


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             n_probe: int = 2, label_col: str = "label",
             vec_col: str = "embedding", id_col: str = "vec_id",
             exclude_id: int | None = None) -> DataFrame:
    """ANN: probe the ``n_probe`` nearest label-partitions (by centroid
    cosine), exact cosine re-rank inside them only."""
    cents = ivf_centroids(emb, label_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        cents.select("label", cosine(F.col("centroid"), q).alias("csim"))
        .orderBy(F.desc("csim"), F.asc("label"))
        .limit(n_probe)
    )
    cand = emb.join(
        F.broadcast(probe.select(F.col("label").alias(label_col))),
        label_col, "semi",
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col, exclude_id)
