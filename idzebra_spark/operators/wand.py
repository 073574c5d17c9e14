"""Block-max WAND top-k query engine over the segment index.

The read path mirrors Zebra's (SURVEY.md §3.1): dictionary lookup →
posting access → merged key stream → per-doc score → bounded top-k
(/root/reference/index/zsets.c:1084-1191), with the two physical
optimizations the reference leans on:

- **skip/forward**: Zebra's ``isamb_pp_forward`` descends B-tree
  internal nodes to skip whole subtrees
  (/root/reference/isamb/isamb.c:1525); here each posting block carries
  (first_docid, last_docid, max_tf) block-max metadata, and the kernel
  skips blocks that cannot beat the running threshold θ (OR) or cannot
  overlap surviving candidates (AND) — lossless pruning, proved by the
  rank-identity tests against the brute-force plan.
- **child ordering**: multi-AND evaluates children smallest-first
  (/root/reference/rset/rsmultiandor.c:26-31); the kernel intersects
  terms in ascending document frequency.

Distribution: blocks and norms are cogrouped by shard — scoring is
embarrassingly parallel across shards (no cross-shard traffic), then a
tiny global top-k merge. θ for OR queries is seeded by fully scoring
only the highest-idf (rarest) query term — one cheap distributed pass —
then passed into the main kernel as a constant.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from idzebra_spark.functions.codec import varint_decode, delta_varint_decode
from idzebra_spark.functions.scoring import K1, B

TOPK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("raw", T.DoubleType()),
    T.StructField("n_matched", T.IntegerType()),
])

COUNT_SCHEMA = T.StructType([
    T.StructField("hits", T.LongType()),
])

RESULT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("score_milli", T.LongType()),
])


def _bm25_tf(tf, dl, avgdl, k1=K1, b=B):
    tf = np.asarray(tf, dtype=np.float64)
    norm = k1 * ((1.0 - b) + b * np.asarray(dl, dtype=np.float64) / avgdl)
    return tf * (k1 + 1.0) / (tf + norm)


def _decode_docids_tfs(docids_bins, tfs_bins, n_docs):
    """Decode many blocks of one (term, shard) with TWO varint_decode
    calls total: payloads are concatenated, then per-block delta bases
    are restored via a cumsum reset at each block start (first value
    of every block is absolute by construction)."""
    all_deltas = varint_decode(b"".join(docids_bins)).astype(np.int64)
    tfs = varint_decode(b"".join(tfs_bins)).astype(np.int64)
    counts = np.asarray(n_docs, dtype=np.int64)
    starts = np.zeros(counts.size, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    cs = np.cumsum(all_deltas)
    base = cs[starts] - all_deltas[starts]
    docids = cs - np.repeat(base, counts)
    return docids, tfs


def _decode_norms(norms_pdf: pd.DataFrame):
    docids = delta_varint_decode(bytes(norms_pdf["docids_bin"].iloc[0])).astype(
        np.int64
    )
    dls = varint_decode(bytes(norms_pdf["doclens_bin"].iloc[0])).astype(np.int64)
    return docids, dls


def _shard_kernel(term_idf, term_order, avgdl, mode, theta, k, k1=K1, b=B,
                  neg_terms=()):
    """Per-shard scorer. term_idf: {term: idf}; term_order: positive
    terms in ascending df (AND intersection order); neg_terms are
    AND-NOT exclusions (rsbool difference,
    /root/reference/rset/rsbool.c:173-225): any doc containing one is
    dropped before scoring. Returns per-shard top-k."""

    n_terms = len(term_order)
    neg_terms = tuple(neg_terms)
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "raw": pd.Series([], dtype="float64"),
         "n_matched": pd.Series([], dtype="int32")}
    )

    def fn(blocks: pd.DataFrame, norms: pd.DataFrame) -> pd.DataFrame:
        if len(blocks) == 0 or len(norms) == 0:
            return empty
        nd_docids, nd_dls = _decode_norms(norms)
        min_dl = float(norms["min_dl"].iloc[0])

        by_term = {t: g for t, g in blocks.groupby("term", sort=False)}
        present = [t for t in term_order if t in by_term]
        if mode == "and" and len(present) < n_terms:
            return empty
        if not present:
            return empty

        # AND-NOT exclusion set: docids of any negative term in-shard
        excluded = None
        for t in neg_terms:
            if t not in by_term:
                continue
            gt = by_term[t]
            e, _ = _decode_docids_tfs(
                [bytes(x) for x in gt["docids_bin"]],
                [bytes(x) for x in gt["tfs_bin"]],
                gt["n_docs"].to_numpy(np.int64),
            )
            excluded = e if excluded is None else np.union1d(excluded, e)
        if excluded is not None:
            excluded = np.unique(excluded)

        # term-level score upper bounds from block-max metadata
        term_ub = {
            t: float(
                term_idf[t]
                * _bm25_tf(by_term[t]["max_tf"].max(), min_dl, avgdl, k1, b)
            )
            for t in present
        }
        sum_ub = sum(term_ub.values())

        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        candidates: np.ndarray | None = None
        # OR: decode in descending-idf order; after the first (rarest)
        # term is fully scored, its k-th solo score is a valid lower
        # bound on this shard's final k-th score (partial <= final), so
        # later terms' blocks prune against it — in-kernel θ seeding,
        # no extra distributed pass. AND keeps ascending-df order
        # (rsmultiandor.c:26-31 child ordering).
        loop_order = (
            sorted(present, key=lambda t: -term_idf[t]) if mode == "or"
            else present
        )
        theta_local = float(theta)
        for ti, t in enumerate(loop_order):
            g = by_term[t]
            first = g["first_docid"].to_numpy(np.int64)
            last = g["last_docid"].to_numpy(np.int64)
            keep = np.ones(len(g), dtype=bool)
            if mode == "and" and candidates is not None:
                # zig-zag analog: only decode blocks overlapping a
                # surviving candidate (isamb_pp_forward skipping)
                lo = np.searchsorted(candidates, first, side="left")
                hi = np.searchsorted(candidates, last, side="right")
                keep = hi > lo
            elif mode == "or" and theta_local > 0.0 and ti > 0:
                # block-max WAND: block ub + other terms' max ubs < θ
                # ⇒ no doc in this block can reach the top-k (lossless,
                # strict <; ties at θ are kept)
                blk_ub = term_idf[t] * _bm25_tf(
                    g["max_tf"].to_numpy(np.int64), min_dl, avgdl, k1, b
                )
                keep = (blk_ub + (sum_ub - term_ub[t])) >= theta_local
            if not keep.any():
                if mode == "and":
                    return empty
                decoded[t] = (np.empty(0, np.int64), np.empty(0, np.int64))
                continue
            gk = g[keep]
            d, tfv = _decode_docids_tfs(
                [bytes(x) for x in gk["docids_bin"]],
                [bytes(x) for x in gk["tfs_bin"]],
                gk["n_docs"].to_numpy(np.int64),
            )
            o = np.argsort(d, kind="mergesort")
            d, tfv = d[o], tfv[o]
            if excluded is not None and d.size:
                m = ~np.isin(d, excluded, assume_unique=False)
                d, tfv = d[m], tfv[m]
            decoded[t] = (d, tfv)
            if mode == "and":
                candidates = d if candidates is None else np.intersect1d(
                    candidates, d, assume_unique=True
                )
                if candidates.size == 0:
                    return empty
            elif mode == "or" and ti == 0 and k is not None and d.size >= k:
                # in-kernel θ seed from the rarest term's solo scores.
                # One milli (1e-4) of slack keeps the prune lossless
                # under the ROUNDED ordering: a doc whose raw score is
                # just below the kth raw can still round-tie at the
                # milli level and win on doc_id, so it must survive.
                dl0 = nd_dls[np.searchsorted(nd_docids, d)]
                solo = term_idf[t] * _bm25_tf(tfv, dl0, avgdl, k1, b)
                kth = float(np.partition(solo, -k)[-k]) - 1e-4
                theta_local = max(theta_local, kth)

        if mode == "and":
            docs = candidates
            dl = nd_dls[np.searchsorted(nd_docids, docs)]
            raw = np.zeros(docs.size, dtype=np.float64)
            for t in present:
                d, tfv = decoded[t]
                raw += term_idf[t] * _bm25_tf(
                    tfv[np.searchsorted(d, docs)], dl, avgdl, k1, b
                )
            n_matched = np.full(docs.size, n_terms, dtype=np.int32)
        else:
            all_docs = np.concatenate([decoded[t][0] for t in present])
            if all_docs.size == 0:
                return empty
            docs, inv = np.unique(all_docs, return_inverse=True)
            dl = nd_dls[np.searchsorted(nd_docids, docs)]
            raw = np.zeros(docs.size, dtype=np.float64)
            n_matched = np.zeros(docs.size, dtype=np.int64)
            off = 0
            for t in present:
                d, tfv = decoded[t]
                if d.size == 0:
                    continue
                idx = inv[off : off + d.size]
                raw[idx] += term_idf[t] * _bm25_tf(tfv, dl[idx], avgdl, k1, b)
                n_matched[idx] += 1
                off += d.size

        if k is not None and docs.size > k:
            # bounded top-k (score desc, docid asc) — Zebra's
            # resultSetInsertRank tie discipline (zsets.c:716-736).
            # The cut uses ROUNDED milli scores (floor(x*1e4+0.5) ==
            # Spark round HALF_UP for x>=0) so the per-shard selection
            # agrees with the global milli-ordered merge: two raw
            # scores that round to the same milli tie-break by doc_id
            # here exactly as they do in the final orderBy.
            milli = np.floor(raw * 10000.0 + 0.5).astype(np.int64)
            sel = np.lexsort((docs, -milli))[:k]
            docs, raw, n_matched = docs[sel], raw[sel], n_matched[sel]
        return pd.DataFrame(
            {"doc_id": docs.astype(np.int64), "raw": raw,
             "n_matched": n_matched.astype(np.int32)}
        )

    return fn


PHRASE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_occ", T.LongType()),
])


def _decode_block_rows(g: pd.DataFrame, want_positions: bool):
    """Decode one term's block rows → (docids, tfs, positions|None),
    sorted by docid. ONE varint_decode per payload column; positions
    are a flat array with per-doc slices given by tfs."""
    d, tfv = _decode_docids_tfs(
        [bytes(x) for x in g["docids_bin"]],
        [bytes(x) for x in g["tfs_bin"]],
        g["n_docs"].to_numpy(np.int64),
    )
    p = None
    if want_positions and d.size:
        pdeltas = varint_decode(
            b"".join(bytes(x) for x in g["pos_bin"])
        ).astype(np.int64)
        # undo per-doc delta reset: cumsum minus per-doc base
        starts = np.zeros(d.size + 1, dtype=np.int64)
        np.cumsum(tfv, out=starts[1:])
        doc_starts = starts[:-1]
        cs = np.cumsum(pdeltas)
        base = cs[doc_starts] - pdeltas[doc_starts]
        p = cs - np.repeat(base, tfv)
    # blocks arrive per (block_seq) and docids are globally sorted per
    # (term, shard) by construction; enforce order defensively
    o = np.argsort(d, kind="mergesort")
    if want_positions and d.size:
        tok_off = np.zeros(d.size + 1, dtype=np.int64)
        np.cumsum(tfv, out=tok_off[1:])
        p = np.concatenate([p[tok_off[i]:tok_off[i + 1]] for i in o])
    return d[o], tfv[o], p


def _phrase_kernel(term_order: list[str]):
    """Per-shard exact-phrase matcher over stored positions — the
    rsprox ordered distance-1 chain (/root/reference/rset/rsprox.c:
    162-213) evaluated as per-doc sorted-set intersections of
    position arrays shifted by the token offset."""

    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "n_occ": pd.Series([], dtype="int64"),
    })

    def fn(blocks: pd.DataFrame) -> pd.DataFrame:
        if len(blocks) == 0:
            return empty
        by_term = {t: g for t, g in blocks.groupby("term", sort=False)}
        if any(t not in by_term for t in term_order):
            return empty
        decoded = {}
        cand = None
        for t in set(term_order):
            d, tfv, p = _decode_block_rows(by_term[t], True)
            tok_off = np.zeros(d.size + 1, dtype=np.int64)
            np.cumsum(tfv, out=tok_off[1:])
            decoded[t] = (d, tok_off, p)
            cand = d if cand is None else np.intersect1d(
                cand, d, assume_unique=True
            )
            if cand.size == 0:
                return empty
        out_docs, out_occ = [], []
        for doc in cand:
            match = None
            for i, t in enumerate(term_order):
                d, tok_off, p = decoded[t]
                j = np.searchsorted(d, doc)
                pos = p[tok_off[j]:tok_off[j + 1]]
                shifted = pos - i
                match = shifted if match is None else np.intersect1d(
                    match, shifted, assume_unique=False
                )
                if match.size == 0:
                    break
            if match is not None and match.size:
                out_docs.append(int(doc))
                out_occ.append(int(match.size))
        if not out_docs:
            return empty
        return pd.DataFrame({"doc_id": out_docs, "n_occ": out_occ})

    return fn


class SegmentIndex:
    """Query-side handle on a committed segment index."""

    def __init__(self, spark: SparkSession, path: str,
                 cache_hot: bool = False):
        """``cache_hot=True`` pins blocks+norms in Spark storage — the
        serving-mode ISAMB page cache (/root/reference/isamb/isamb.c:
        380-450). Use for repeated-query serving on indexes that fit
        cluster memory; leave off for one-shot batch jobs or
        bigger-than-memory indexes (parquet + term pruning handle it)."""
        self.spark = spark
        self.path = path
        lineage = spark.read.parquet(f"{path}/lineage")
        # latest committed batch per shard (update/reindex wins by seq)
        w_latest = lineage.groupBy("shard").agg(
            F.max("build_seq").alias("build_seq"),
            F.count("*").alias("n_versions"),
        )
        self.shard_batch = (
            lineage.join(w_latest, ["shard", "build_seq"])
            .select("shard", "batch")
            .cache()
        )
        self._batches = [r["batch"] for r in self.shard_batch.select("batch").distinct().collect()]
        # if any shard was reindexed, per-batch dictionary/stats
        # partials contain stale contributions — derive from the
        # shard-filtered tables instead
        self._has_reindex = (
            w_latest.where(F.col("n_versions") > 1).limit(1).count() > 0
        )
        self.blocks = spark.read.parquet(f"{path}/blocks").join(
            F.broadcast(self.shard_batch), ["shard", "batch"], "semi"
        )
        self.norms = spark.read.parquet(f"{path}/norms").join(
            F.broadcast(self.shard_batch), ["shard", "batch"], "semi"
        )
        if cache_hot:
            self.blocks = self.blocks.cache()
            self.norms = self.norms.cache()
        self._stats = None
        self._dict = None
        self._term_memo: dict[str, dict | None] = {}

    # -------------------------------------------------------- metadata

    def stats(self) -> tuple[int, float]:
        """(N, avgdl) — from per-shard norms rows (always shard-exact,
        even after reindex; the batch-level stats partials are only a
        fast path for the append-only case)."""
        if self._stats is None:
            s = self.norms.agg(
                F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s")
            ).collect()[0]
            self._stats = (int(s["n"]), float(s["s"]) / float(s["n"]))
        return self._stats

    def dictionary(self) -> DataFrame:
        """Global (term, df, cf, max_tf) — merged batch partials
        (the kinput.c:709 heap-merge, as a groupBy). After a shard
        reindex the partials are stale, so fall back to aggregating
        block metadata (shard-filtered, no payload decode)."""
        if self._has_reindex:
            return self.blocks.groupBy("term").agg(
                F.sum("n_docs").alias("df"),
                F.sum("sum_tf").alias("cf"),
                F.max("max_tf").alias("max_tf"),
            )
        return (
            self.spark.read.parquet(f"{self.path}/dictionary")
            .where(F.col("batch").isin(self._batches))
            .groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.max("max_tf").alias("max_tf"),
            )
        )

    def doc_meta(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/doc_meta").join(
            F.broadcast(self.shard_batch), ["shard", "batch"], "semi"
        )

    def lookup_terms(self, terms: list[str]) -> dict[str, dict]:
        """Dictionary lookup with a driver-side memo (Zebra's dict LRU,
        dict/dict-p.h:44-70): repeated serving queries skip the job.
        The term filter pushes through the groupBy to the parquet scan
        (grouping-key predicate), so misses read only matching rows."""
        missing = [t for t in terms if t not in self._term_memo]
        if missing:
            rows = self.dictionary().where(F.col("term").isin(missing)).collect()
            found = {
                r["term"]: {"df": r["df"], "cf": r["cf"], "max_tf": r["max_tf"]}
                for r in rows
            }
            for t in missing:
                self._term_memo[t] = found.get(t)
        return {t: self._term_memo[t] for t in terms
                if self._term_memo.get(t) is not None}

    # ----------------------------------------------------------- query

    def _empty_result(self) -> DataFrame:
        return self.spark.createDataFrame([], RESULT_SCHEMA)

    def _run(self, terms_info, avgdl, mode, theta, k,
             neg_terms=()) -> DataFrame:
        terms = [t for t, _ in terms_info]
        term_idf = {t: i["idf"] for t, i in terms_info}
        order = [t for t, _ in sorted(terms_info, key=lambda x: x[1]["df"])]
        blk = self.blocks.where(
            F.col("term").isin(sorted(set(terms) | set(neg_terms)))
        )
        nrm = self.norms.join(
            blk.select("shard").distinct(), "shard", "semi"
        )
        kernel = _shard_kernel(term_idf, order, avgdl, mode, theta, k,
                               neg_terms=neg_terms)
        return (
            blk.groupBy("shard")
            .cogroup(nrm.groupBy("shard"))
            .applyInPandas(kernel, TOPK_SCHEMA)
        )

    def topk(self, terms: list[str], k: int = 10, mode: str = "or",
             not_terms: list[str] | None = None) -> DataFrame:
        """BM25 top-k -> (doc_id, score_milli), rank-identical to
        operators.bruteforce.bm25_topk. ``not_terms``: AND-NOT
        exclusions applied before scoring (rsbool semantics)."""
        neg = tuple(sorted(set(t.lower() for t in (not_terms or []))))
        terms = sorted(set(t.lower() for t in terms))
        n_docs, avgdl = self.stats()
        info = self.lookup_terms(terms)
        if mode == "and" and len(info) < len(terms):
            return self._empty_result()
        if not info:
            return self._empty_result()
        terms_info = []
        for t, d in info.items():
            d["idf"] = math.log(1.0 + (n_docs - d["df"] + 0.5) / (d["df"] + 0.5))
            terms_info.append((t, d))

        # θ is seeded inside the shard kernel (rarest term's solo
        # scores) — no extra distributed pass needed.
        out = self._run(terms_info, avgdl, mode, 0.0, k, neg_terms=neg)
        # order by the ROUNDED score (milli) — the same tie discipline
        # as bruteforce.bm25_topk and the DuckDB oracle, so rank
        # identity holds even when two raw scores round to one milli.
        return (
            out.select(
                "doc_id",
                F.round(F.col("raw") * 10000, 0).cast("long").alias("score_milli"),
            )
            .orderBy(F.desc("score_milli"), F.asc("doc_id"))
            .limit(k)
        )

    def approx_count(self, terms: list[str], mode: str = "or",
                     sample: float = 0.25) -> int:
        """Approximate hit count — Zebra's hits_limit/estimatehits
        stops counting early and extrapolates from the position ratio
        (/root/reference/index/zsets.c:1498-1522). Here: count exactly
        on a deterministic ``sample`` fraction of shards and scale by
        the sampled fraction of documents."""
        terms = sorted(set(t.lower() for t in terms))
        info = self.lookup_terms(terms)
        if not info or (mode == "and" and len(info) < len(terms)):
            return 0
        shards = self.norms.select("shard", "n_docs")
        picked = shards.where(
            F.pmod(F.xxhash64("shard"), 1000) < int(sample * 1000)
        )
        tot = shards.agg(F.sum("n_docs")).collect()[0][0]
        got = picked.agg(F.sum("n_docs")).collect()[0][0]
        if not got:
            return self.count(terms, mode)
        n_docs, avgdl = self.stats()
        terms_info = [(t, {**d, "idf": 1.0}) for t, d in info.items()]
        blk = self.blocks.where(F.col("term").isin(terms)).join(
            picked.select("shard"), "shard", "semi"
        )
        nrm = self.norms.join(blk.select("shard").distinct(), "shard", "semi")
        kernel = _shard_kernel(
            {t: 1.0 for t, _ in terms_info},
            [t for t, _ in sorted(terms_info, key=lambda x: x[1]["df"])],
            avgdl, mode, 0.0, None,
        )
        rows = blk.groupBy("shard").cogroup(nrm.groupBy("shard")).applyInPandas(
            kernel, TOPK_SCHEMA
        )
        if mode == "and":
            rows = rows.where(F.col("n_matched") == len(terms))
        sampled_hits = rows.count()
        return int(round(sampled_hits * (tot / got)))

    def phrase(self, terms: list[str], k: int = 10) -> DataFrame:
        """Exact adjacent phrase over the segment's stored positions →
        (doc_id, n_occ), doc_id asc, limit k. Requires the index to
        have been built with store_positions=True."""
        terms_l = [t.lower() for t in terms]
        blk = self.blocks.where(F.col("term").isin(sorted(set(terms_l))))
        out = blk.groupBy("shard").applyInPandas(
            _phrase_kernel(terms_l), PHRASE_SCHEMA
        )
        return out.orderBy(F.asc("doc_id")).limit(k)

    def count(self, terms: list[str], mode: str = "or") -> int:
        """Exact boolean hit count (tl_query analogue)."""
        terms = sorted(set(t.lower() for t in terms))
        n_docs, avgdl = self.stats()
        info = self.lookup_terms(terms)
        if not info or (mode == "and" and len(info) < len(terms)):
            return 0
        terms_info = [(t, {**d, "idf": 1.0}) for t, d in info.items()]
        rows = self._run(terms_info, avgdl, mode, 0.0, None)
        if mode == "and":
            rows = rows.where(F.col("n_matched") == len(terms))
        return rows.count()
