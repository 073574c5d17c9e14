"""DuckDB oracle SQL for the training-data-pipeline operators
(text analysis, dedup, similarity) — exact twins of
``operators/{textops,dedup,similarity}.py``.

Hash parity: ``('0x' || substr(md5(x),1,15))::BIGINT`` here equals
Spark's ``conv(substr(md5(x),1,15),16,10)::long``.
"""

from __future__ import annotations

from idzebra_spark.operators.textops import (
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_FR,
    BPE_RE,
)

# mirrors tokenize_array: split, drop empties, truncate to 512 chars
# (IT_MAX_WORD) — DuckDB slice x[1:512] is 1-based inclusive.
_ARR = ("list_transform("
        "list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'), "
        "x -> x <> ''), x -> x[1:512])")


def _inlist(words: list[str]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def _stop_hits(arr: str, words: list[str]) -> str:
    return f"len(list_filter({arr}, x -> x IN {_inlist(words)}))"


_H64 = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"


def token_stats_sql(limit: int = 200) -> str:
    return f"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
    AS n_ws_tokens,
  len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_bpe_tokens,
  len({_ARR}) AS n_index_tokens
FROM documents ORDER BY doc_id ASC LIMIT {limit}
"""


def quality_sql(limit: int = 200) -> str:
    arr = _ARR
    return f"""
WITH base AS (
  SELECT doc_id,
    length(text) AS n_chars_,
    length(text) - length(regexp_replace(text, '[^0-9a-zA-Z\\s]', '', 'g'))
      AS n_punct,
    {arr} AS arr
  FROM documents
), m AS (
  SELECT doc_id, n_chars_,
    CASE WHEN n_chars_ > 0 THEN n_punct / n_chars_ ELSE 0.0 END AS punct_r,
    CASE WHEN len(arr) > 0
         THEN {_stop_hits('arr', STOPWORDS_EN)} / len(arr) ELSE 0.0 END
      AS stop_r,
    CASE WHEN len(arr) > 0
         THEN list_sum(list_transform(arr, x -> length(x))) / len(arr)
         ELSE 0.0 END AS mean_wl
  FROM base
)
SELECT doc_id, n_chars_,
  CAST(round(punct_r * 10000) AS BIGINT) AS punct_milli,
  CAST(round(stop_r * 10000) AS BIGINT) AS stop_milli,
  CAST(round((0.5 * stop_r
            + 0.3 * (1.0 - least(punct_r * 4, 1.0))
            + 0.2 * (1.0 - least(abs(mean_wl - 5) / 5, 1.0))) * 10000)
       AS BIGINT) AS quality_milli
FROM m ORDER BY doc_id ASC LIMIT {limit}
"""


def lang_id_sql(limit: int = 200) -> str:
    arr = _ARR
    return f"""
WITH m AS (
  SELECT doc_id,
    {_stop_hits(arr, STOPWORDS_EN)} AS en_hits,
    {_stop_hits(arr, STOPWORDS_DE)} AS de_hits,
    {_stop_hits(arr, STOPWORDS_FR)} AS fr_hits
  FROM documents
)
SELECT doc_id,
  CASE WHEN greatest(en_hits, de_hits, fr_hits) = 0 THEN 'unk'
       WHEN en_hits = greatest(en_hits, de_hits, fr_hits) THEN 'en'
       WHEN de_hits = greatest(en_hits, de_hits, fr_hits) THEN 'de'
       ELSE 'fr' END AS lang_pred,
  en_hits, de_hits, fr_hits
FROM m ORDER BY doc_id ASC LIMIT {limit}
"""


def fingerprint_sql(limit: int = 200) -> str:
    return f"""
SELECT doc_id, md5(array_to_string({_ARR}, ' ')) AS fp
FROM documents ORDER BY doc_id ASC LIMIT {limit}
"""


def dedup_exact_sql() -> str:
    return """
SELECT sha256(text) AS sha256, count(*) AS n_docs, min(doc_id) AS keep_doc
FROM documents GROUP BY sha256(text) HAVING count(*) > 1
ORDER BY sha256 ASC
"""


def cosine_topk_q8_sql(query_vec_id: int = 0, k: int = 10) -> str:
    """Quantized-cosine oracle: the SAME int8 rule (scale=max|x|/127,
    floor(x/scale+0.5)) then INTEGER dot products — associative, so
    parity with the Spark fold is structural, not order-dependent."""
    code = ("list_transform({v}, x -> CAST(floor("
            "x / (CASE WHEN amax{t} = 0 THEN 1.0 ELSE amax{t}/127.0 END)"
            " + 0.5) AS BIGINT))")
    return f"""
WITH q0 AS (
  SELECT embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id = {query_vec_id}
),
q AS (
  SELECT {code.format(v='v', t='q')} AS qc
  FROM (SELECT v, list_max(list_transform(v, x -> abs(x))) AS amaxq
        FROM q0)
),
e AS (
  SELECT vec_id, {code.format(v='v', t='e')} AS ec
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v,
               list_max(list_transform(embedding::DOUBLE[],
                                       x -> abs(x))) AS amaxe
        FROM embeddings WHERE vec_id <> {query_vec_id})
),
parts AS (
  SELECT e.vec_id, unnest(e.ec) AS x, unnest(q.qc) AS y
  FROM e CROSS JOIN q
),
sims AS (
  SELECT vec_id,
         sum(x * y)::DOUBLE
         / (sqrt(sum(x * x)::DOUBLE) * sqrt((SELECT CASE
             WHEN sum(y * y) = 0 THEN 1.0
             ELSE sum(y * y)::DOUBLE END
             FROM (SELECT unnest(qc) AS y FROM q)))) AS sim
  FROM parts GROUP BY vec_id HAVING sum(x * x) > 0
)
SELECT vec_id, CAST(round(sim * 1000000) AS BIGINT) AS sim_micro
FROM sims ORDER BY sim_micro DESC, vec_id ASC LIMIT {k}
"""


def contamination_sql(n: int = 5, threshold: float = 0.3,
                      mod: int = 5, limit: int = 500) -> str:
    """Train→test containment oracle: test = doc_id % mod == 0, train
    = the rest; word n-grams; containment = shared / test-shingles."""
    return f"""
WITH {_shingles_cte(n)},
sht AS (SELECT doc_id AS test_id, shingle FROM sh
        WHERE doc_id % {mod} = 0),
shr AS (SELECT doc_id AS train_id, shingle FROM sh
        WHERE doc_id % {mod} <> 0),
inter AS (
  SELECT test_id, train_id, count(*) AS n_shared
  FROM sht JOIN shr USING (shingle) GROUP BY test_id, train_id
),
sizes AS (SELECT test_id, count(*) AS n_sh FROM sht GROUP BY test_id)
SELECT test_id, train_id, n_shared,
       CAST(round(n_shared / n_sh * 10000) AS BIGINT) AS contain_milli
FROM inter JOIN sizes USING (test_id)
WHERE n_shared / n_sh >= {threshold}
ORDER BY test_id ASC, train_id ASC LIMIT {limit}
"""


def _shingles_cte(n: int = 3) -> str:
    """CTE ``sh(doc_id, shingle)``: distinct word n-grams over the
    documents table — the ONE SQL shingle definition (DuckDB slices
    are inclusive: arr[i:i+n-1] is n elements)."""
    return f"""
sh AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, greatest(len(arr) - {n - 1}, 0) + 1),
                          i -> array_to_string(arr[i:i+{n - 1}], ' ')))
    AS shingle
  FROM (SELECT doc_id, {_ARR} AS arr FROM documents)
)
"""


_SHINGLES = _shingles_cte(3)

_JACC = f"""
{_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jacc AS (
  SELECT doc_a, doc_b,
    n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jacc
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
"""


def jaccard_pairs_sql(threshold: float = 0.5, limit: int = 500) -> str:
    return f"""
WITH {_JACC}
SELECT doc_a, doc_b, CAST(round(jacc * 10000) AS BIGINT) AS jacc_milli
FROM jacc WHERE jacc >= {threshold}
ORDER BY doc_a ASC, doc_b ASC LIMIT {limit}
"""


def minhash_lsh_pairs_sql(threshold: float = 0.5, n_hashes: int = 16,
                          band_rows: int = 4, limit: int = 500) -> str:
    h = _H64.format(x="j::VARCHAR || ':' || shingle")
    return f"""
WITH {_JACC},
mh AS (
  SELECT doc_id, j, min({h}) AS minhash
  FROM sh CROSS JOIN (SELECT unnest(range(0, {n_hashes})) AS j)
  GROUP BY doc_id, j
),
bands AS (
  SELECT doc_id, j // {band_rows} AS band,
         md5(string_agg(minhash::VARCHAR, ',' ORDER BY j)) AS band_key
  FROM mh GROUP BY doc_id, j // {band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, CAST(round(j.jacc * 10000) AS BIGINT) AS jacc_milli
FROM cand c JOIN jacc j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
WHERE j.jacc >= {threshold}
ORDER BY c.doc_a ASC, c.doc_b ASC LIMIT {limit}
"""


def _simhash_cte(n_bits: int = 32) -> str:
    """CTE chain ending in sims(doc_id, simhash) — the tf-weighted
    SimHash twin of operators.dedup.simhash."""
    h = _H64.format(x="term")
    bit_sums = ",\n    ".join(
        f"sum(CASE WHEN (h >> {k}) & 1 = 1 THEN tf ELSE -tf END) AS b{k}"
        for k in range(n_bits)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN b{k} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END << {k})"
        for k in range(n_bits)
    )
    return f"""toks AS (
  SELECT doc_id, {_ARR} AS arr FROM documents
),
tf AS (
  SELECT doc_id, unnest(arr) AS term FROM toks
),
tfc AS (
  SELECT doc_id, term, count(*) AS tf, {h} AS h
  FROM tf GROUP BY doc_id, term
),
bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM tfc GROUP BY doc_id
),
sims AS (SELECT doc_id, {sim_expr} AS simhash FROM bits)"""


def simhash_groups_sql(n_bits: int = 32) -> str:
    return f"""
WITH {_simhash_cte(n_bits)}
SELECT simhash, count(*) AS n_docs, min(doc_id) AS keep_doc
FROM sims GROUP BY simhash HAVING count(*) > 1
ORDER BY simhash ASC
"""


def simhash_near_pairs_sql(n_bits: int = 32, n_bands: int = 4,
                           max_hamming: int = 3, limit: int = 500) -> str:
    """Mirror of operators.dedup.simhash_near_pairs: band-key equality
    candidates over contiguous bit bands, exact Hamming verify
    (xor + bit_count is integer-exact in both engines)."""
    band_bits = n_bits // n_bands
    mask = (1 << band_bits) - 1
    return f"""
WITH {_simhash_cte(n_bits)},
bands AS (
  SELECT doc_id, b AS band, (simhash >> (b * {band_bits})) & {mask} AS key
  FROM sims CROSS JOIN (SELECT unnest(range(0, {n_bands})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
FROM cand c
JOIN sims sa ON sa.doc_id = c.doc_a
JOIN sims sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
ORDER BY doc_a ASC, doc_b ASC LIMIT {limit}
"""


_RERANK = """
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {qid}),
parts AS (
  SELECT e.vec_id, unnest(e.embedding::DOUBLE[]) AS x, unnest(q.qv) AS y
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
),
sims AS (
  SELECT vec_id, sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS sim
  FROM parts GROUP BY vec_id
)
SELECT vec_id, CAST(round(sim * 1000000) AS BIGINT) AS sim_micro
FROM sims ORDER BY sim_micro DESC, vec_id ASC LIMIT {k}
"""


def lsh_topk_sql(query_vec_id: int = 0, k: int = 10, n_planes: int = 6,
                 multiprobe_bits: int = 1, dim: int = 64) -> str:
    """Mirror of operators.similarity.lsh_topk / lsh_topk_indexed:
    md5-derived hyperplanes, sign-bit bucket, Hamming-≤bits probe,
    exact cosine re-rank — the same candidates bit-for-bit. Structural
    guarantee: the projection is the SUM of per-dimension BIGINT
    floor((x*w)*1e6) terms (integer addition is associative, so this
    unordered SUM equals Spark's ordered fold exactly — a raw double
    sum near zero could flip the sign bit with summation order)."""
    return f"""
WITH planes AS (SELECT unnest(range(0, {n_planes})) AS p),
dims AS (SELECT unnest(range(0, {dim})) AS d),
w AS (
  SELECT p, d,
         CAST(CAST(('0x' || substring(md5(p::VARCHAR || '_' || d::VARCHAR),
                                      1, 15)) AS BIGINT) % 2001 - 1000
              AS DOUBLE) AS wt
  FROM planes, dims
),
proj AS (
  SELECT e.vec_id, w.p,
         sum(CAST(floor(e.embedding[w.d + 1]::DOUBLE * w.wt * 1000000)
                  AS BIGINT)) AS proj
  FROM embeddings e, w
  GROUP BY e.vec_id, w.p
),
bucket AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
),
qb AS (SELECT bucket AS qbucket FROM bucket WHERE vec_id = {query_vec_id}),
cand AS (
  SELECT b.vec_id FROM bucket b, qb
  WHERE bit_count(xor(b.bucket, qbucket)) <= {multiprobe_bits}
    AND b.vec_id <> {query_vec_id}
),
{_RERANK.format(qid=query_vec_id, k=k)}
"""


def embedding_dup_pairs_sql(threshold: float = 0.4, n_planes: int = 6,
                            dim: int = 64, limit: int = 500) -> str:
    """Mirror of operators.similarity.embedding_dup_pairs: same-bucket
    LSH candidates, exact cosine >= threshold on the MICRO-rounded
    value (cross-engine stable). The bucket projection uses the same
    integer-quantized sum as :func:`lsh_topk_sql` (associative — safe
    under DuckDB's unordered aggregation)."""
    return f"""
WITH planes AS (SELECT unnest(range(0, {n_planes})) AS p),
dims AS (SELECT unnest(range(0, {dim})) AS d),
w AS (
  SELECT p, d,
         CAST(CAST(('0x' || substring(md5(p::VARCHAR || '_' || d::VARCHAR),
                                      1, 15)) AS BIGINT) % 2001 - 1000
              AS DOUBLE) AS wt
  FROM planes, dims
),
proj AS (
  SELECT e.vec_id, w.p,
         sum(CAST(floor(e.embedding[w.d + 1]::DOUBLE * w.wt * 1000000)
                  AS BIGINT)) AS proj
  FROM embeddings e, w
  GROUP BY e.vec_id, w.p
),
bucket AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bucket a JOIN bucket b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
parts AS (
  SELECT c.vec_a, c.vec_b,
         unnest(ea.embedding::DOUBLE[]) AS x,
         unnest(eb.embedding::DOUBLE[]) AS y
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.vec_a
  JOIN embeddings eb ON eb.vec_id = c.vec_b
),
sims AS (
  SELECT vec_a, vec_b,
         CAST(round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)))
                    * 1000000) AS BIGINT) AS sim_micro
  FROM parts GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b, sim_micro FROM sims
WHERE sim_micro >= {int(threshold * 1000000)}
ORDER BY vec_a ASC, vec_b ASC LIMIT {limit}
"""


def ivf_topk_sql(query_vec_id: int = 0, k: int = 10, n_probe: int = 2) -> str:
    """Mirror of operators.similarity.ivf_topk: per-(label, dim) mean
    centroids, micro-rounded centroid-cosine probe selection (label
    asc ties), exact cosine re-rank within the probed labels."""
    return f"""
WITH ex AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         unnest(range(1, len(embedding) + 1)) AS d
  FROM embeddings
),
cent AS (SELECT label, d, avg(x) AS c FROM ex GROUP BY label, d),
centv AS (SELECT label, list(c ORDER BY d) AS centroid FROM cent GROUP BY label),
q0 AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
cparts AS (
  SELECT centv.label, unnest(centv.centroid) AS x, unnest(q0.qv) AS y
  FROM centv CROSS JOIN q0
),
csim AS (
  SELECT label,
         CAST(round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)))
                    * 1000000) AS BIGINT) AS csim_micro
  FROM cparts GROUP BY label
),
probe AS (SELECT label FROM csim ORDER BY csim_micro DESC, label ASC LIMIT {n_probe}),
cand AS (
  SELECT vec_id FROM embeddings JOIN probe USING (label)
  WHERE vec_id <> {query_vec_id}
),
{_RERANK.format(qid=query_vec_id, k=k)}
"""


def kmeans_ivf_topk_sql(query_vec_id: int = 0, k: int = 10,
                        n_clusters: int = 8, n_iter: int = 3,
                        n_probe: int = 3) -> str:
    """Mirror of operators.similarity.kmeans_labels + ivf_topk: the
    deterministic Lloyd loop UNROLLED into one CTE chain per iteration
    (fixed n_iter makes the 'iterative' algorithm SQL-expressible).

    Exact twins of the Spark plan: init = the n_clusters vectors with
    the smallest 60-bit md5(vec_id) (label = rank in that order);
    each iteration assigns by MICRO-rounded cosine argmax with ties to
    the lowest centroid POSITION (Spark's array_position over the
    sorted-by-label centroid array — positions are the dense rank of
    the surviving labels, mirrored here with row_number over label);
    centroids recompute as per-(label, dim) means. The final IVF probe
    and exact re-rank match ivf_topk_sql."""
    its = []
    prev = "c0"
    for i in range(1, n_iter + 1):
        its.append(f"""
p{i} AS (
  SELECT hv.vec_id, c.pos, unnest(hv.v) AS x, unnest(c.c) AS y
  FROM h hv CROSS JOIN {prev} c
),
s{i} AS (
  SELECT vec_id, pos,
         CAST(round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)))
                    * 1000000) AS BIGINT) AS sim
  FROM p{i} GROUP BY vec_id, pos
),
a{i} AS (
  SELECT vec_id, pos AS label FROM (
    SELECT vec_id, pos,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, pos ASC) AS rn
    FROM s{i}
  ) WHERE rn = 1
),
c{i} AS (
  SELECT row_number() OVER (ORDER BY label ASC) - 1 AS pos,
         list(m ORDER BY d) AS c
  FROM (
    SELECT label, d, avg(x) AS m FROM (
      SELECT a{i}.label, unnest(hv.v) AS x,
             unnest(range(1, len(hv.v) + 1)) AS d
      FROM h hv JOIN a{i} USING (vec_id)
    ) GROUP BY label, d
  ) GROUP BY label
)""")
        prev = f"c{i}"
    final = f"a{n_iter}"
    return f"""
WITH h AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         CAST(('0x' || substring(md5(vec_id::VARCHAR), 1, 15)) AS BIGINT)
           AS hh
  FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY hh ASC) - 1 AS pos, v AS c
  FROM (SELECT * FROM h ORDER BY hh ASC LIMIT {n_clusters})
),{",".join(its)},
fc AS (
  SELECT label, list(m ORDER BY d) AS c
  FROM (
    SELECT label, d, avg(x) AS m FROM (
      SELECT {final}.label, unnest(hv.v) AS x,
             unnest(range(1, len(hv.v) + 1)) AS d
      FROM h hv JOIN {final} USING (vec_id)
    ) GROUP BY label, d
  ) GROUP BY label
),
q0 AS (SELECT v AS qv FROM h WHERE vec_id = {query_vec_id}),
cp AS (
  SELECT fc.label, unnest(fc.c) AS x, unnest(q0.qv) AS y
  FROM fc CROSS JOIN q0
),
csim AS (
  SELECT label,
         CAST(round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)))
                    * 1000000) AS BIGINT) AS csim_micro
  FROM cp GROUP BY label
),
probe AS (
  SELECT label FROM csim ORDER BY csim_micro DESC, label ASC LIMIT {n_probe}
),
candk AS (
  SELECT {final}.vec_id FROM {final} JOIN probe USING (label)
  WHERE vec_id <> {query_vec_id}
),
fparts AS (
  SELECT hv.vec_id, unnest(hv.v) AS x, unnest(q0.qv) AS y
  FROM h hv JOIN candk USING (vec_id) CROSS JOIN q0
),
fsims AS (
  SELECT vec_id, sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS sim
  FROM fparts GROUP BY vec_id
)
SELECT vec_id, CAST(round(sim * 1000000) AS BIGINT) AS sim_micro
FROM fsims ORDER BY sim_micro DESC, vec_id ASC LIMIT {k}
"""


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    """Explicit dot/norm via parallel unnest (zips), double math —
    mirrors the Spark fold exactly."""
    return f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_vec_id}
),
parts AS (
  SELECT e.vec_id,
         unnest(e.embedding::DOUBLE[]) AS x,
         unnest(q.qv) AS y
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {query_vec_id}
),
sims AS (
  SELECT vec_id,
         sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS sim
  FROM parts GROUP BY vec_id
)
SELECT vec_id, CAST(round(sim * 1000000) AS BIGINT) AS sim_micro
FROM sims ORDER BY sim_micro DESC, vec_id ASC LIMIT {k}
"""
