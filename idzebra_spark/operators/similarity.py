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
    """Exact brute-force cosine top-k: (vec_id, sim_micro).

    Deliberately pure JVM expressions (r6): an exact-fold numpy kernel
    was built and A/B-measured — it won on the full-corpus brute scan
    only within noise (0.30 vs 0.38 s quiet, 0.415 vs 0.365 s in the
    bench) and REGRESSED the partition-pruned LSH/IVF probes that
    funnel their few-hundred-row candidate sets through this function
    (q_sim_lsh_indexed 0.34 → 0.50 s: the Python stage's fixed cost
    dwarfs the tiny input). The interpreted fold stays the right shape
    for both callers."""
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


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Symmetric int8 quantization: per-vector ``scale = max|x|/127``,
    codes ``floor(x/scale + 0.5)`` (|code| ≤ 127 by construction) —
    the 4× memory cut for a 100-TB embedding store. ``floor(+0.5)``
    is used instead of round() because its half-way behavior is
    identical across engines (round() half-even vs half-up differs).
    Returns (vec_id, qvec array<int>, scale)."""
    v = F.col(vec_col).cast("array<double>")
    amax = F.aggregate(v, F.lit(0.0),
                       lambda a, x: F.greatest(a, F.abs(x)))
    # projection boundary: HOF lambdas are interpreted (no codegen
    # CSE) — inlining the amax fold inside the per-element transform
    # would re-run it per component, O(dim^2)/row. Materialize scale
    # first, then code against the column.
    base = emb.select(
        F.col(id_col).alias("vec_id"), v.alias("_v"),
        F.when(amax == 0, F.lit(1.0)).otherwise(amax / F.lit(127.0))
        .alias("scale"),
    )
    return base.select(
        "vec_id",
        F.transform("_v", lambda x: F.floor(x / F.col("scale")
                                            + F.lit(0.5)).cast("int"))
        .alias("qvec"),
        "scale",
    )


def _qnorm_col() -> Column:
    """sum of squared int8 codes (BIGINT) — the per-vector norm term
    of the integer cosine, computable once at build time."""
    return F.aggregate(F.col("qvec").cast("array<long>"),
                       F.lit(0).cast("long"), lambda a, v: a + v * v)


def _quantize_with_qnorm(emb: DataFrame, vec_col: str,
                         id_col: str) -> DataFrame:
    """(vec_id, qvec, scale, qnorm) in ONE Arrow pass — the kernel
    twin of ``quantize_embeddings(...).withColumn('qnorm',
    _qnorm_col())``, replacing ~3·dim interpreted fold/transform steps
    per row. Exactness: amax is a max (associative — reduction order
    free), the code formula ``floor(x/scale + 0.5)`` is the same
    elementwise IEEE op chain, and qnorm is integer arithmetic."""
    import numpy as np
    import pandas as pd

    def quant(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(list(pdf["_v"]), dtype=np.float64)
            amax = np.abs(V).max(axis=1) if V.shape[1] else \
                np.zeros(len(pdf))
            scale = np.where(amax == 0.0, 1.0, amax / 127.0)
            Q = np.floor(V / scale[:, None] + 0.5).astype(np.int32)
            qn = (Q.astype(np.int64) ** 2).sum(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "qvec": list(Q),
                "scale": scale,
                "qnorm": qn,
            })

    return emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).mapInPandas(
        quant, "vec_id long, qvec array<int>, scale double, qnorm long")


def _q8_topk(qframe: DataFrame, query_vec: list[float], k: int,
             exclude_id: int | None) -> DataFrame:
    """Integer-cosine top-k over a (vec_id, qvec, qnorm) frame — the
    shared kernel of the live and the index-backed q8 paths. The
    per-vector scales cancel out of the cosine, so the whole kernel
    is integer dot products — which are associative, making
    cross-engine result parity STRUCTURAL (the float-fold cosine_topk
    oracle relies on summation order). r6: the dot runs as an int64
    matmul in an Arrow kernel (integer addition is order-free, so
    even the reduction order is irrelevant — exactness is free here);
    the one float division chain replicates the JVM expression op for
    op, and rounding + ordering stay JVM-side."""
    import math

    import numpy as np
    import pandas as pd

    amax = max((abs(float(x)) for x in query_vec), default=0.0)
    s = (amax / 127.0) or 1.0
    qq = np.array([int(math.floor(float(x) / s + 0.5))
                   for x in query_vec], dtype=np.int64)
    bb = float(int((qq * qq).sum())) or 1.0
    sqrt_bb = math.sqrt(bb)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qn = pdf["qnorm"].to_numpy(np.int64)
            keep = qn > 0   # zero vectors have no direction — dropped,
            if not keep.any():  # matching the JVM when()'s null branch
                continue
            Q = np.array(list(pdf["qvec"][keep]), dtype=np.int64)
            dot = Q @ qq   # exact: |dot| << 2^53
            # same op order as the JVM expression: dot_double /
            # (sqrt(qnorm_double) * sqrt_bb)
            val = dot.astype(np.float64) / (
                np.sqrt(qn[keep].astype(np.float64)) * sqrt_bb)
            yield pd.DataFrame({"vec_id": pdf["vec_id"][keep],
                                "sim": val})

    out = qframe.select("vec_id", "qvec", "qnorm") \
        .mapInPandas(score, "vec_id long, sim double") \
        .select("vec_id",
                F.round(F.col("sim") * 1000000, 0).cast("long")
                .alias("sim_micro"))
    if exclude_id is not None:
        out = out.where(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("sim_micro"), F.asc("vec_id")).limit(k)


# quantized-frame memo for the live q8 path, keyed by the source
# plan's semantic hash: quantization + the qnorm fold are corpus-wide
# work that belongs to the FIRST query only (the in-session analogue
# of build_q8_index's persisted codes). Entries are Spark-persisted
# int8 codes — ~1/4 the float corpus; for corpora that don't fit
# cluster storage memory use build_q8_index instead.
#
# LRU-BOUNDED (r6): at most Q8_MEMO_MAX distinct source plans stay
# persisted; scoring an (N+1)-th corpus unpersists the least recently
# used entry, so a long session cycling many corpora can no longer
# accrete persisted frames without bound. Staleness contract: the
# memo keys on the PLAN, not the files — overwriting the underlying
# embedding files under an identical plan serves stale codes until
# clear_q8_memo() (or SegmentIndex-style handle discipline) is called.
_Q8_MEMO: dict = {}
Q8_MEMO_MAX = 4


def clear_q8_memo() -> None:
    for q in _Q8_MEMO.values():
        try:
            q.unpersist()
        except Exception:
            pass
    _Q8_MEMO.clear()


def _quantized_memo(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    try:
        key = (emb._jdf.queryExecution().analyzed().semanticHash(),
               vec_col, id_col)
    except Exception:  # plan hash unavailable (e.g. connect) — no memo
        key = None
    if key is not None and key in _Q8_MEMO:
        q = _Q8_MEMO.pop(key)
        _Q8_MEMO[key] = q  # move to MRU position (dicts are ordered)
        return q
    q = _quantize_with_qnorm(emb, vec_col, id_col)
    if key is not None:
        while len(_Q8_MEMO) >= Q8_MEMO_MAX:
            old = _Q8_MEMO.pop(next(iter(_Q8_MEMO)))
            try:
                old.unpersist()
            except Exception:
                pass
        q = q.persist()
        _Q8_MEMO[key] = q
    return q


def cosine_topk_q8(emb: DataFrame, query_vec: list[float], k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   exclude_id: int | None = None) -> DataFrame:
    """Brute-force cosine top-k over int8-QUANTIZED codes:
    (vec_id, sim_micro). The quantized codes + qnorm are memoized
    per source plan (persisted), so only the FIRST query pays the
    corpus-wide quantization pass — repeated queries scan the cached
    int8 frame, same serving shape as the memoized term dictionary.
    For corpora bigger than cluster memory use :func:`build_q8_index`
    + :func:`cosine_topk_q8_indexed` (quantization as a build
    product). Quantization noise bounds the sim error at ~1/127 per
    component — the recall pytest pins the top-k overlap vs the exact
    kernel."""
    return _q8_topk(_quantized_memo(emb, vec_col, id_col),
                    query_vec, k, exclude_id)


def build_q8_index(emb: DataFrame, path: str,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> None:
    """Persist the int8 codes as an index: (vec_id, qvec array<int>,
    scale, qnorm) parquet — the 4× memory cut becomes a BUILD product
    (like build_lsh_index / build_ivf_index), so a query reads ~1/4
    the bytes of the float corpus and does zero quantization work.
    qnorm (sum of squared codes) is precomputed so the query kernel
    is one integer dot + one divide per row. Quantization is
    deterministic, so rebuilds are idempotent."""
    _quantize_with_qnorm(emb, vec_col, id_col) \
        .write.mode("overwrite").parquet(path)


def cosine_topk_q8_indexed(spark, path: str, query_vec: list[float],
                           k: int = 10,
                           exclude_id: int | None = None) -> DataFrame:
    """Integer-cosine top-k over a PERSISTED q8 index — result
    identical to :func:`cosine_topk_q8` on the source corpus (same
    deterministic quantization), but the scan touches only the int8
    codes and the stored norms."""
    return _q8_topk(spark.read.parquet(path), query_vec, k, exclude_id)


def plane_weight(p: int, d: int) -> float:
    """Deterministic pseudo-random weight in [-1000, 1000] from md5 —
    computed driver-side (hashlib md5 == Spark md5 == DuckDB md5 on
    the same string, so all three engines share the planes)."""
    import hashlib

    h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
    return float(h % 2001 - 1000)


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit bucket id over ``n_planes`` md5-derived hyperplanes.

    The weights are row-INDEPENDENT, so they're baked in as literal
    arrays (n_planes × dim floats in the plan) — the executor does one
    multiply-add fold per plane, not n_planes × dim md5 calls per row.

    The projection is INTEGER-quantized before summation:
    sum over d of floor((x_d * w_p,d) * 10^6) as BIGINT. Integer
    addition is associative, so Spark's ordered left fold, DuckDB's
    unordered SUM aggregate, and the driver-side Python loop produce
    the SAME bucket structurally — a raw double sum near zero could
    flip its sign bit with summation order (float addition is not
    associative), silently changing candidates between engines."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        wlit = F.array(*[F.lit(plane_weight(p, d)) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec, wlit,
                       lambda x, w: F.floor(x * w * F.lit(1000000.0))),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.shiftleft(
            F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
            p,
        )
    return bucket


def query_bucket(query_vec: list[float], n_planes: int = 8,
                 dim: int | None = None) -> int:
    """Driver-side bucket of a query vector (same md5-derived planes
    and the same integer-quantized projection as :func:`lsh_bucket`)
    — O(n_planes × dim) scalar math."""
    import math

    dim = dim or len(query_vec)
    return sum(
        (1 << p)
        for p in range(n_planes)
        if sum(math.floor(query_vec[d] * plane_weight(p, d) * 1000000.0)
               for d in range(dim)) > 0
    )


def probe_buckets(qb: int, n_planes: int, multiprobe_bits: int = 1) -> list[int]:
    """All bucket ids within Hamming distance ``multiprobe_bits`` of
    the query bucket — the multi-probe set, enumerated driver-side
    (|set| = sum of C(n_planes, i), metadata-sized)."""
    from itertools import combinations

    out = {qb}
    for r in range(1, multiprobe_bits + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            out.add(qb ^ m)
    return sorted(out)


def _with_bucket(emb: DataFrame, vec_col: str, n_planes: int,
                 dim: int) -> DataFrame:
    """``emb`` + a ``bucket`` column — the numpy twin of
    ``withColumn('bucket', lsh_bucket(...))`` (exact integer
    projection, see :func:`_bucket_ids_np`), computed in one Arrow
    pass instead of n_planes × dim interpreted fold steps per row.
    All other columns pass through byte-exact."""
    import numpy as np

    from pyspark.sql import types as T

    W = _plane_matrix(n_planes, dim)
    schema = T.StructType(list(emb.schema.fields)
                          + [T.StructField("bucket", T.LongType())])

    def add(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(x, dtype=np.float64)
                          for x in pdf[vec_col]])
            yield pdf.assign(bucket=_bucket_ids_np(V, W))

    return emb.mapInPandas(add, schema)


def lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             dim: int | None = None, n_planes: int = 8,
             multiprobe_bits: int = 1,
             vec_col: str = "embedding", id_col: str = "vec_id",
             exclude_id: int | None = None) -> DataFrame:
    """ANN: exact cosine re-rank restricted to buckets within Hamming
    distance ``multiprobe_bits`` of the query's LSH bucket
    (multi-probe LSH — recovers recall without more tables).

    This is the from-scratch form (computes the bucket per row). The
    scale path is :func:`build_lsh_index` + :func:`lsh_topk_indexed`,
    where the bucket is a stored PARTITION column and a probe reads
    only the probed buckets' files."""
    dim = dim or len(query_vec)
    qb = query_bucket(query_vec, n_planes, dim)
    bucketed = _with_bucket(emb, vec_col, n_planes, dim)
    cand = bucketed.where(
        F.col("bucket").isin(probe_buckets(qb, n_planes, multiprobe_bits))
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col, exclude_id)


def build_lsh_index(emb: DataFrame, path: str, n_planes: int = 8,
                    dim: int | None = None, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> None:
    """Persist the corpus bucket-partitioned: one directory per LSH
    bucket. A probe then reads ONLY the probed buckets (partition
    pruning — `PartitionFilters: bucket IN (...)` in the scan), so
    query cost is O(corpus / 2^n_planes × probes) instead of a full
    scan. Buckets are deterministic (md5 planes), so rebuilds are
    idempotent."""
    if dim is None:
        row = emb.select(F.size(vec_col).alias("d")).limit(1).collect()
        if not row:
            raise ValueError("cannot infer dim from an empty embedding "
                             "corpus — pass dim= explicitly")
        dim = row[0]["d"]
    (
        _with_bucket(emb, vec_col, n_planes, dim)
        .repartition("bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    )


def lsh_topk_indexed(spark, path: str, query_vec: list[float], k: int = 10,
                     n_planes: int = 8, multiprobe_bits: int = 1,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     exclude_id: int | None = None) -> DataFrame:
    """ANN over a persisted bucket-partitioned index: enumerate probe
    buckets driver-side, scan only those partitions, re-rank exact."""
    qb = query_bucket(query_vec, n_planes)
    probes = probe_buckets(qb, n_planes, multiprobe_bits)
    cand = spark.read.parquet(path).where(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, vec_col, id_col, exclude_id)


_PLANE_MATRIX_CACHE: dict = {}


def _plane_matrix(n_planes: int, dim: int):
    """(n_planes × dim) float64 weight matrix of the md5 planes —
    the literal arrays :func:`lsh_bucket` bakes into the plan.
    Memoized (it is also computed INSIDE kernels, once per task, so a
    reused python worker pays the ~n_planes·dim md5 calls once)."""
    import numpy as np

    key = (n_planes, dim)
    w = _PLANE_MATRIX_CACHE.get(key)
    if w is None:
        w = np.array(
            [[plane_weight(p, d) for d in range(dim)]
             for p in range(n_planes)],
            dtype=np.float64,
        )
        _PLANE_MATRIX_CACHE[key] = w
    return w


def _bucket_ids_np(V, W):
    """Exact numpy twin of :func:`lsh_bucket` over a (n × dim) float64
    matrix: per plane, proj = Σ_d floor(x_d·w_d·1e6) as int64 (integer
    addition — order-free, identical to the JVM fold and the DuckDB
    SUM); bit p set iff proj > 0. floor operates on |x·w·1e6| ≪ 2^53
    so the float64 floor is exact, and each elementwise op (mul, mul,
    floor) is the same IEEE-754 operation the JVM evaluates."""
    import numpy as np

    n = V.shape[0]
    bucket = np.zeros(n, dtype=np.int64)
    for p in range(W.shape[0]):
        proj = np.zeros(n, dtype=np.int64)
        for d in range(V.shape[1]):
            proj += np.floor(V[:, d] * W[p, d] * 1000000.0).astype(np.int64)
        bucket += np.where(proj > 0, np.int64(1) << p, 0)
    return bucket


def _fold_sq_norm_np(V):
    """sqrt of the LEFT-TO-RIGHT fold Σ_d v_d² — bit-identical to
    ``_norm``'s interpreted ``aggregate`` (IEEE-754 double add/mul in
    the same order), vectorized across rows."""
    import numpy as np

    acc = np.zeros(V.shape[0], dtype=np.float64)
    for d in range(V.shape[1]):
        acc = acc + V[:, d] * V[:, d]
    return np.sqrt(acc)


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.4,
                        n_planes: int = 6, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector analogue of
    MinHash-LSH dedup: candidates share a hyperplane-LSH bucket (the
    bounded band join; never all-pairs), then exact cosine verifies
    ``>= threshold``. Returns (vec_a, vec_b, sim_micro), vec_a < vec_b.

    Physical shape (r6): ONE Arrow pass stamps the bucket (numpy twin
    of the interpreted ``lsh_bucket`` fold), ONE shuffle groups rows by
    bucket, and a per-bucket numpy kernel emits the verified pairs —
    the pairwise dot/norm math runs as dim-many vectorized float64
    accumulations, reproducing the JVM fold's left-to-right IEEE order
    bit-for-bit (float addition is not associative; BLAS/pairwise sums
    would round differently). The kernel pre-filters at
    ``threshold·1e6 − 1`` on the raw similarity and the FINAL
    micro-rounding + threshold cut stay JVM-side expressions, so the
    emitted rows are expression-identical to the join form this
    replaces (same values through ``F.round``). vs the old
    self-join + per-pair interpreted HOF cosine: ~3M interpreted folds
    become 64 numpy axpy loops per bucket, and the bucket shuffle
    moves each vector once instead of twice.

    Single-table LSH trades recall for cost (pairs split across
    buckets are missed); raise n_planes probes/bands off-line for
    higher recall. At 100 TB the bucket shuffle is the only shuffle
    and its groups are 1/2^n_planes of the corpus (raise n_planes to
    keep groups bounded; the kernel blocks its pair enumeration so
    memory stays O(block × group), not O(group²))."""
    import numpy as np
    import pandas as pd

    base = emb.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )

    def add_bucket(batches):
        # dim is read off the data inside the task — no driver-side
        # probe job; the plane matrix is memoized per reused worker
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(list(pdf["v"]), dtype=np.float64)
            pdf = pdf.assign(
                bucket=_bucket_ids_np(V, _plane_matrix(n_planes,
                                                       V.shape[1])))
            yield pdf

    bucketed = base.mapInPandas(
        add_bucket, "vid long, v array<double>, bucket long")

    pre = float(threshold) * 1000000.0 - 1.0  # lossless raw-sim prefilter
    empty = pd.DataFrame({
        "vec_a": pd.Series([], dtype="int64"),
        "vec_b": pd.Series([], dtype="int64"),
        "sim": pd.Series([], dtype="float64"),
    })

    def pair_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return empty
        vid = pdf["vid"].to_numpy(np.int64)
        order = np.argsort(vid, kind="mergesort")
        vid = vid[order]
        V = np.array(list(pdf["v"]), dtype=np.float64)[order]
        norm = _fold_sq_norm_np(V)
        out_a, out_b, out_s = [], [], []
        # block rows so pair state is O(block × n), never O(n²)
        blk = max(1, (1 << 22) // max(n, 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            for i0 in range(0, n - 1, blk):
                i1 = min(i0 + blk, n - 1)
                # sorted order ⇒ vid_j > vid_i needs j > i, so columns
                # ≤ i0 never pair with this row block
                j0 = i0 + 1
                # dot via dim-many ordered accumulations (axpy outer
                # products) — the exact left-to-right fold per pair
                acc = np.zeros((i1 - i0, n - j0), dtype=np.float64)
                for d in range(V.shape[1]):
                    acc = acc + V[i0:i1, d, None] * V[None, j0:, d]
                sim = acc / (norm[i0:i1, None] * norm[None, j0:])
                keep = (vid[None, j0:] > vid[i0:i1, None]) \
                    & (sim * 1000000.0 >= pre)
                ri, ci = np.nonzero(keep)
                if ri.size:
                    out_a.append(vid[i0:i1][ri])
                    out_b.append(vid[j0:][ci])
                    out_s.append(sim[keep])
        if not out_a:
            return empty
        return pd.DataFrame({
            "vec_a": np.concatenate(out_a),
            "vec_b": np.concatenate(out_b),
            "sim": np.concatenate(out_s),
        })

    pairs = bucketed.groupBy("bucket").applyInPandas(
        pair_kernel, "vec_a long, vec_b long, sim double")
    return (
        pairs.select(
            "vec_a", "vec_b",
            F.round(F.col("sim") * 1000000, 0).cast("long")
            .alias("sim_micro"),
        )
        .where(F.col("sim_micro") >= int(threshold * 1000000))
    )


def ivf_centroids(emb: DataFrame, label_col: str = "label",
                  vec_col: str = "embedding") -> DataFrame:
    """Coarse centroids: element-wise mean vector per label.

    Scale shape: posexplode → groupBy(label, dim) with map-side
    combine → per-label reassembly of the sorted (dim, mean) pairs.
    The shuffle is n_labels × dim ROWS (not one column per dim), so
    the plan is identical at dim 16 and dim 768+."""
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x"),
    )
    per = ex.groupBy("label", "d").agg(F.avg("x").alias("c"))
    return per.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "c"))),
            lambda s: s["c"],
        ).alias("centroid")
    )


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
             n_probe: int = 2, label_col: str = "label",
             vec_col: str = "embedding", id_col: str = "vec_id",
             exclude_id: int | None = None) -> DataFrame:
    """ANN: probe the ``n_probe`` nearest label-partitions (by centroid
    cosine), exact cosine re-rank inside them only. Probe selection
    orders by the MICRO-rounded centroid similarity (label asc ties) —
    cross-engine deterministic, so the DuckDB oracle probes the same
    partitions."""
    cents = ivf_centroids(emb, label_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        cents.select(
            "label",
            F.round(cosine(F.col("centroid"), q) * 1000000, 0)
            .cast("long").alias("csim_micro"),
        )
        .orderBy(F.desc("csim_micro"), F.asc("label"))
        .limit(n_probe)
    )
    cand = emb.join(
        F.broadcast(probe.select(F.col("label").alias(label_col))),
        label_col, "semi",
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col, exclude_id)


def build_ivf_index(emb: DataFrame, path: str, k: int = 8,
                    n_iter: int = 3, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> None:
    """Persist an IVF index: vectors in label-PARTITIONED parquet plus
    a k-row centroid table — the IVF twin of :func:`build_lsh_index`.
    Probes read ONLY the probed clusters' partitions
    (``PartitionFilters: label IN (...)``), so query cost is
    O(corpus × n_probe / k), never a full scan; centroids are computed
    once at build instead of per query. Labels come from the
    deterministic k-means (no RNG — rebuilds are byte-identical)."""
    labels = kmeans_labels(emb, k, n_iter, vec_col, id_col)
    labeled = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    ).join(labels, "vec_id")
    labeled.write.mode("overwrite").partitionBy("label") \
        .parquet(f"{path}/vectors")
    # centroids from the JUST-WRITTEN vectors: one assignment-lineage
    # evaluation instead of two, and the read-back validates the files
    written = labeled.sparkSession.read.parquet(f"{path}/vectors")
    ivf_centroids(written, "label", "embedding") \
        .write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_indexed(spark, path: str, query_vec: list[float],
                     k: int = 10, n_probe: int = 2,
                     exclude_id: int | None = None) -> DataFrame:
    """ANN probe against a persisted IVF index: rank the k-row
    centroid table (one tiny job), then exact cosine re-rank inside
    the ``n_probe`` nearest clusters — a partition-pruned read."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = spark.read.parquet(f"{path}/centroids")
    probe = [
        r["label"] for r in cents.select(
            "label",
            F.round(cosine(F.col("centroid"), q) * 1000000, 0)
            .cast("long").alias("csim_micro"))
        .orderBy(F.desc("csim_micro"), F.asc("label"))
        .limit(n_probe).collect()
    ]
    vecs = spark.read.parquet(f"{path}/vectors") \
        .where(F.col("label").isin(probe))
    return cosine_topk(vecs, query_vec, k, "embedding", "vec_id",
                       exclude_id)


def kmeans_labels(emb: DataFrame, k: int = 8, n_iter: int = 4,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Deterministic Lloyd k-means: learned coarse-quantizer labels
    for IVF (when no label column exists). Init = the k vectors with
    the smallest md5-hash of their id (reproducible, no RNG); each
    iteration broadcasts the k×dim centroid table (metadata-sized)
    and reassigns by max cosine; centroids recompute via the same
    posexplode mean as :func:`ivf_centroids`. Returns (vec_id, label)."""
    vec = F.col(vec_col).cast("array<double>")
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
               16, 10).cast("long")
    seed_rows = (
        emb.select(vec.alias("centroid"), h.alias("h"))
        .orderBy(F.asc("h")).limit(k)  # distributed top-k, k rows out
        .collect()
    )
    assigned = None
    cents = None
    for it in range(n_iter):
        cent_rows = (
            [{"label": i, "centroid": r["centroid"]}
             for i, r in enumerate(seed_rows)]
            if it == 0 else cents.collect()  # k rows — metadata-sized
        )
        carr = F.array(*[
            F.array(*[F.lit(float(x)) for x in r["centroid"]])
            for r in sorted(cent_rows, key=lambda r: r["label"])
        ])
        # argmax cosine over the k broadcast centroids, ties → lower label
        sims = F.transform(
            carr, lambda c: F.round(cosine(vec, c) * 1000000, 0).cast("long")
        )
        best = F.array_position(sims, F.array_max(sims)) - 1
        assigned = emb.select(
            F.col(id_col).alias("vec_id"),
            best.cast("int").alias("label"),
            vec.alias("_v"),
        )
        cents = ivf_centroids(
            assigned.select("label", F.col("_v").alias(vec_col)),
            "label", vec_col,
        )
    return assigned.select("vec_id", "label")
