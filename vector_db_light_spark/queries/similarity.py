"""Similarity-search queries: batch brute-force top-k, hyperplane-LSH
bucketed ANN, IVF partition-pruned ANN (build-plan §7 Phase 4; SURVEY.md
§2.5 V2/V4 generalized to multi-query + approximate paths)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity as S
from .._registry_core import load, register
from ._sqlutil import QUERY_VEC, QUERY_VEC_SQL, dot_sql, vec_sql

DIM = 64
N_PLANES = 6
PLANES = S.random_hyperplanes(N_PLANES, DIM)


# ---------------------------------------------------------------------------
# Batch kNN: 5 query vectors (vec_id < 5 rows reused as queries) x corpus,
# one scan, per-query top-3.
# ---------------------------------------------------------------------------

@register(
    "knn_batch_topk",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id,
         1.0 - {dot_sql('e.embedding', 'q.qv::DOUBLE[]')} AS distance
  FROM embeddings e, q
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY distance ASC, vec_id ASC) AS rk
  FROM scored
)
SELECT query_id, vec_id, distance, rk
FROM ranked WHERE rk <= 3
ORDER BY query_id, rk
""",
)
def knn_batch_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.batch_knn(emb, queries, dim=64, k=3).orderBy("query_id", "rk")


# ---------------------------------------------------------------------------
# LSH-bucketed ANN: 6 sign bits -> scan only the query's bucket.
# ---------------------------------------------------------------------------

def _bucket_sql(vec_expr: str) -> str:
    bits = [
        f"(CASE WHEN {dot_sql(vec_expr, vec_sql(pl))} > 0 THEN '1' ELSE '0' END)"
        for pl in PLANES
    ]
    return " || ".join(bits)


_QBITS = "".join(
    "1" if sum(a * b for a, b in zip(QUERY_VEC, pl)) > 0 else "0" for pl in PLANES
)


@register(
    "ann_lsh_bucketed",
    f"""
SELECT vec_id, 1.0 - {dot_sql('embedding')} AS distance
FROM embeddings
WHERE {_bucket_sql('embedding')} = '{_QBITS}'
ORDER BY distance ASC, vec_id ASC
LIMIT 5
""",
)
def ann_lsh_bucketed(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return S.lsh_topk(emb, QUERY_VEC, PLANES, k=5)


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@5 of the bucket-pruned batch LSH path vs
# the exact batch brute force, per query. Both paths are deterministic, so
# the recall numbers themselves are oracle-checkable — the engine measures
# its own approximation loss.
# ---------------------------------------------------------------------------

_N_RECALL_Q = 20
_RECALL_K = 5


@register(
    "ann_lsh_recall",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < {_N_RECALL_Q}
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
cb AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS b FROM embeddings
),
qb AS (
  SELECT query_id, qv, {_bucket_sql('qv::DOUBLE[]')} AS b FROM q
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT qb.query_id, cb.vec_id,
           row_number() OVER (PARTITION BY qb.query_id
             ORDER BY 1.0 - {dot_sql('cb.embedding', 'qb.qv::DOUBLE[]')} ASC,
                      cb.vec_id ASC) AS rk
    FROM cb JOIN qb ON cb.b = qb.b
  ) WHERE rk <= {_RECALL_K}
),
hits AS (
  SELECT t.query_id, count(a.vec_id) AS n_hits
  FROM truth t
  LEFT JOIN approx a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 1
)
SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_RECALL_K} AS recall_at_k
FROM hits
ORDER BY query_id
""",
)
def ann_lsh_recall(spark, sf_dir):
    """Recall@k of batch LSH vs exact batch kNN over the same query set —
    the evaluation loop every approximate index needs before anyone trusts
    it at 100 TB (tune planes/nprobe against measured recall, not hope)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_RECALL_Q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = S.batch_knn(emb, queries, dim=64, k=_RECALL_K).select("query_id", "vec_id")
    approx = S.batch_lsh_topk(emb, queries, PLANES, dim=64, k=_RECALL_K).select(
        F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid")
    )
    hits = (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_vid").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_k"),
    ).orderBy("query_id")


def _flip_sql(i: int) -> str:
    """Bucket key with sign bit i (0-based) flipped, DuckDB side."""
    return (
        f"substr(b, 1, {i}) || "
        f"(CASE WHEN substr(b, {i + 1}, 1) = '1' THEN '0' ELSE '1' END) || "
        f"substr(b, {i + 2})"
    )


_PROBES_SQL = "list_distinct([b, " + ", ".join(
    _flip_sql(i) for i in range(N_PLANES)
) + "])"


@register(
    "ann_lsh_multiprobe_recall",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < {_N_RECALL_Q}
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
cb AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS b FROM embeddings
),
qb0 AS (
  SELECT query_id, qv, {_bucket_sql('qv::DOUBLE[]')} AS b FROM q
),
qp AS (
  SELECT query_id, qv, unnest({_PROBES_SQL}) AS b FROM qb0
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY distance ASC, vec_id ASC) AS rk
    FROM (
      SELECT DISTINCT qp.query_id, cb.vec_id,
             1.0 - {dot_sql('cb.embedding', 'qp.qv::DOUBLE[]')} AS distance
      FROM cb JOIN qp ON cb.b = qp.b
    )
  ) WHERE rk <= {_RECALL_K}
),
hits AS (
  SELECT t.query_id, count(a.vec_id) AS n_hits
  FROM truth t
  LEFT JOIN approx a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 1
)
SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_RECALL_K} AS recall_at_k
FROM hits
ORDER BY query_id
""",
)
def ann_lsh_multiprobe_recall(spark, sf_dir):
    """Recall@k of MULTI-PROBE batch LSH (own bucket + all Hamming-1
    buckets) vs exact batch kNN — quantifies the recall the extra probes
    buy at a (planes+1)/2^planes scan fraction."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_RECALL_Q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = S.batch_knn(emb, queries, dim=64, k=_RECALL_K).select("query_id", "vec_id")
    approx = S.batch_lsh_multiprobe_topk(
        emb, queries, PLANES, dim=64, k=_RECALL_K
    ).select(F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid"))
    hits = (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_vid").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_k"),
    ).orderBy("query_id")


# Per-element rounded centroid means (defined here because the recall
# oracle below needs it; also used by the ann_ivf_pruned oracle).
_CENT_COLS_SQL = ", ".join(
    f"round(avg(embedding[{i + 1}]::DOUBLE), 4)" for i in range(DIM)
)


@register(
    "ann_ivf_recall",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < {_N_RECALL_Q}
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
cents AS (
  SELECT label, [{_CENT_COLS_SQL}] AS centroid
  FROM embeddings GROUP BY label
),
probes AS (
  SELECT query_id, label, qv FROM (
    SELECT q.query_id, c.label, q.qv,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('c.centroid', 'q.qv::DOUBLE[]')} ASC,
                      c.label ASC) AS pr
    FROM cents c, q
  ) WHERE pr <= 2
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, e.vec_id,
           row_number() OVER (PARTITION BY p.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'p.qv::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e JOIN probes p ON e.label = p.label
  ) WHERE rk <= {_RECALL_K}
),
hits AS (
  SELECT t.query_id, count(a.vec_id) AS n_hits
  FROM truth t
  LEFT JOIN approx a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 1
)
SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_RECALL_K} AS recall_at_k
FROM hits
ORDER BY query_id
""",
)
def ann_ivf_recall(spark, sf_dir):
    """Recall@k of batch IVF (nprobe=2 label clusters) vs exact batch kNN —
    completes the eval triptych (LSH, multi-probe LSH, IVF) so every
    approximate serving path ships with a measured, oracle-checked quality
    number."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_RECALL_Q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = _CENTROID_ARTIFACTS.get(sf_dir)
    if cents is None:
        cents = S.ivf_centroids(emb, DIM).persist()
        cents.count()
        _CENTROID_ARTIFACTS[sf_dir] = cents
    truth = S.batch_knn(emb, queries, dim=64, k=_RECALL_K).select("query_id", "vec_id")
    approx = S.batch_ivf_topk(
        emb, queries, cents, nprobe=2, k=_RECALL_K, dim=64
    ).select(F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid"))
    hits = (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_vid").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_k"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# IVF-style ANN: label-cluster centroids (element-rounded means), probe the
# 2 nearest clusters, brute-force only those.
# ---------------------------------------------------------------------------

_QQ = [round(v * 127) for v in QUERY_VEC]
_QQ_SQL = "[" + ", ".join(str(int(v)) for v in _QQ) + "]::BIGINT[]"


@register(
    "knn_sq8_topk",
    f"""
WITH qz AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * 127, 0) AS BIGINT)) AS q8
  FROM embeddings
)
SELECT vec_id,
       list_reduce(list_transform(list_zip(q8, {_QQ_SQL}), s -> s[1] * s[2]),
                   (a, b) -> a + b) AS qdot
FROM qz
ORDER BY qdot DESC, vec_id ASC
LIMIT 10
""",
)
def knn_sq8_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return S.knn_sq8(emb, QUERY_VEC, k=10)


_CENTROID_ARTIFACTS: dict[str, object] = {}


@register(
    "ann_ivf_pruned",
    f"""
WITH cents AS (
  SELECT label, [{_CENT_COLS_SQL}] AS centroid
  FROM embeddings GROUP BY label
),
probe AS (
  SELECT label FROM cents
  ORDER BY 1.0 - {dot_sql('centroid')} ASC, label ASC
  LIMIT 2
)
SELECT e.vec_id, e.label, 1.0 - {dot_sql('e.embedding')} AS distance
FROM embeddings e
WHERE e.label IN (SELECT label FROM probe)
ORDER BY distance ASC, vec_id ASC
LIMIT 10
""",
)
def ann_ivf_pruned(spark, sf_dir):
    # Build step: materialize the centroid table ONCE per corpus (the
    # persisted frame stands in for the parquet sidecar api.build_ivf_index
    # writes; memoized like a real index — built once, probed per query).
    # The search plan reads centroids from the cached artifact, so there is
    # no corpus-wide groupBy in the query path (pinned by test_plans).
    emb = load(spark, sf_dir, "embeddings")
    cents = _CENTROID_ARTIFACTS.get(sf_dir)
    if cents is None:
        cents = S.ivf_centroids(emb, DIM).persist()
        cents.count()  # materialize the build artifact
        _CENTROID_ARTIFACTS[sf_dir] = cents
    return S.ivf_search(emb, QUERY_VEC, nprobe=2, k=10, centroids=cents)


@register(
    "ann_ivf_filtered",
    f"""
WITH cents AS (
  SELECT label, [{_CENT_COLS_SQL}] AS centroid
  FROM embeddings GROUP BY label
),
probe AS (
  SELECT label FROM cents
  ORDER BY 1.0 - {dot_sql('centroid')} ASC, label ASC
  LIMIT 2
)
SELECT e.vec_id, e.label, 1.0 - {dot_sql('e.embedding')} AS distance
FROM embeddings e
WHERE e.label IN (SELECT label FROM probe)
  AND e.vec_id % 3 = 0
ORDER BY distance ASC, vec_id ASC
LIMIT 10
""",
)
def ann_ivf_filtered(spark, sf_dir):
    """FILTERED vector search — the metadata-predicate-plus-ANN combination
    every vector DB user eventually needs (tenant/source/type scoping).
    Strategy here is PRE-filter: the predicate composes with the IVF
    cluster pruning on the SAME scan (both reach the parquet reader:
    cluster IN (...) as a partition filter on a partitioned layout, the
    metadata predicate as a pushed row filter), so top-k runs over
    already-filtered rows — no post-hoc k starvation where a selective
    filter empties a post-filtered result. Centroids come from the FULL
    corpus build artifact (the index is built once; filters are
    query-time), which is exactly what the oracle replays."""
    emb = load(spark, sf_dir, "embeddings")
    cents = _CENTROID_ARTIFACTS.get(sf_dir)
    if cents is None:
        cents = S.ivf_centroids(emb, DIM).persist()
        cents.count()
        _CENTROID_ARTIFACTS[sf_dir] = cents
    filtered = emb.filter(F.col("vec_id") % 3 == 0)
    return S.ivf_search(filtered, QUERY_VEC, nprobe=2, k=10, centroids=cents)


# ---------------------------------------------------------------------------
# Product quantization (PQ/ADC): 64-dim vectors -> 8 subspaces x 16
# codewords = 8 small-int codes per vector (32x scan-IO vs float32).
# Codebooks are deterministic literals (operators/similarity.pq_codebooks);
# production swaps in per-subspace k-means sidecars without a plan change.
# ---------------------------------------------------------------------------

from ..functions.vector import default_query_vector  # noqa: E402

_PQ_M, _PQ_K, _PQ_SUBDIM = 8, 16, 8
_CODEBOOKS = S.pq_codebooks(_PQ_M, _PQ_K, _PQ_SUBDIM)

_PQ_SUBS_SQL = ",\n         ".join(
    f"list_slice(embedding::DOUBLE[], {s * _PQ_SUBDIM + 1}, "
    f"{(s + 1) * _PQ_SUBDIM}) AS sub_{s}"
    for s in range(_PQ_M)
)


def _pq_d_sql(s: int, c: int) -> str:
    """Squared-L2 to codeword (s, c): same left-to-right fold as the Spark
    _subspace_sumsq."""
    return (
        f"list_reduce(list_transform(list_zip(sub_{s}, "
        f"{vec_sql(_CODEBOOKS[s][c])}), "
        f"s -> (s[1] - s[2]) * (s[1] - s[2])), (a, b) -> a + b)"
    )


_PQ_DISTS_SQL = ",\n         ".join(
    f"{_pq_d_sql(s, c)} AS d_{s}_{c}"
    for s in range(_PQ_M)
    for c in range(_PQ_K)
)
_PQ_MINS_SQL = ",\n         ".join(
    "least(" + ", ".join(f"d_{s}_{c}" for c in range(_PQ_K)) + f") AS m_{s}"
    for s in range(_PQ_M)
)


def _pq_code_sql(s: int) -> str:
    whens = " ".join(
        f"WHEN d_{s}_{c} = m_{s} THEN {c}" for c in range(_PQ_K - 1)
    )
    return f"CAST(CASE {whens} ELSE {_PQ_K - 1} END AS INTEGER) AS code_{s}"


def _pq_codes_ctes(extra: str = "") -> str:
    """The encode pipeline as SQL CTEs; ``extra`` = ', col' to carry extra
    corpus columns (e.g. the IVF cluster label) through to ``codes``."""
    return f"""subs AS (
  SELECT vec_id{extra},
         {_PQ_SUBS_SQL}
  FROM embeddings
),
dists AS (
  SELECT vec_id{extra},
         {_PQ_DISTS_SQL}
  FROM subs
),
mins AS (
  SELECT *,
         {_PQ_MINS_SQL}
  FROM dists
),
codes AS (
  SELECT vec_id{extra}, {", ".join(_pq_code_sql(s) for s in range(_PQ_M))}
  FROM mins
)"""


_PQ_CODES_CTES = _pq_codes_ctes()

_PQ_LUT = S.pq_adc_lut(QUERY_VEC, _CODEBOOKS)
_PQ_ADC_SQL = " + ".join(
    f"({vec_sql(_PQ_LUT[s])})[code_{s} + 1]" for s in range(_PQ_M)
)


@register(
    "knn_pq_adc_topk",
    f"""
WITH {_PQ_CODES_CTES}
SELECT vec_id, {_PQ_ADC_SQL} AS adc
FROM codes
ORDER BY adc ASC, vec_id ASC
LIMIT 10
""",
)
def knn_pq_adc_topk(spark, sf_dir):
    """Single-query ADC top-k over PQ codes — the scan touches 8 small ints
    per row instead of 64 floats (SQ8's 4x IO lever pushed to 32x); ranking
    stays TakeOrderedAndProject, no corpus shuffle. In a deployment
    ``pq_encode``'s output is the stored codes table (built once, like the
    IVF sidecar); here encode+ADC run in one plan so the oracle can rebuild
    both halves arithmetically."""
    emb = load(spark, sf_dir, "embeddings")
    codes = S.pq_encode(emb, _CODEBOOKS)
    return S.pq_adc_topk(codes, _PQ_LUT, k=10)


_N_PQ_Q = 8
_PQ_QUERIES = [default_query_vector(dim=DIM, seed=7 + i) for i in range(_N_PQ_Q)]
_PQ_LUTS = [S.pq_adc_lut(q, _CODEBOOKS) for q in _PQ_QUERIES]

_PQ_Q_ROWS = ", ".join(
    f"({i}, {vec_sql(q)})" for i, q in enumerate(_PQ_QUERIES)
)
_PQ_LUT_ROWS = ", ".join(
    f"({i}, [" + ", ".join(vec_sql(row) for row in lut) + "])"
    for i, lut in enumerate(_PQ_LUTS)
)
_PQ_BATCH_ADC_SQL = " + ".join(
    f"l.lut[{s + 1}][c.code_{s} + 1]" for s in range(_PQ_M)
)


@register(
    "ann_pq_recall",
    f"""
WITH {_PQ_CODES_CTES},
q AS (
  SELECT * FROM (VALUES {_PQ_Q_ROWS}) AS t(query_id, qv)
),
luts AS (
  SELECT * FROM (VALUES {_PQ_LUT_ROWS}) AS t(query_id, lut)
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY adc ASC, vec_id ASC) AS rk
    FROM (
      SELECT l.query_id, c.vec_id, {_PQ_BATCH_ADC_SQL} AS adc
      FROM codes c, luts l
    )
  ) WHERE rk <= {_RECALL_K}
),
hits AS (
  SELECT t.query_id, count(a.vec_id) AS n_hits
  FROM truth t
  LEFT JOIN approx a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 1
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_RECALL_K} AS recall_at_k
FROM hits
ORDER BY query_id
""",
)
def ann_pq_recall(spark, sf_dir):
    """Recall@k of batch PQ/ADC vs exact batch kNN over 8 literal queries —
    the quantization-loss measurement that decides M/K before anyone trusts
    the 32x-compressed codes at 100 TB (re-rank the ADC shortlist with raw
    vectors to claw recall back; that is a k-row lookup, not a scan)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame(
        [(i, q) for i, q in enumerate(_PQ_QUERIES)],
        "query_id INT, query_vec ARRAY<DOUBLE>",
    )
    truth = S.batch_knn(emb, queries, dim=64, k=_RECALL_K).select("query_id", "vec_id")
    codes = S.pq_encode(emb, _CODEBOOKS)
    luts = spark.createDataFrame(
        [(i, lut) for i, lut in enumerate(_PQ_LUTS)],
        "query_id INT, lut ARRAY<ARRAY<DOUBLE>>",
    )
    approx = S.batch_pq_adc_topk(codes, luts, _PQ_M, k=_RECALL_K).select(
        F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid")
    )
    hits = (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_vid").alias("n_hits"))
    )
    return hits.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_k"),
    ).orderBy("query_id")


_RERANK_SHORTLIST = 50


@register(
    "ann_pq_rerank_recall",
    f"""
WITH {_PQ_CODES_CTES},
q AS (
  SELECT * FROM (VALUES {_PQ_Q_ROWS}) AS t(query_id, qv)
),
luts AS (
  SELECT * FROM (VALUES {_PQ_LUT_ROWS}) AS t(query_id, lut)
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
shortlist AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY adc ASC, vec_id ASC) AS rk
    FROM (
      SELECT l.query_id, c.vec_id, {_PQ_BATCH_ADC_SQL} AS adc
      FROM codes c, luts l
    )
  ) WHERE rk <= {_RERANK_SHORTLIST}
),
reranked AS (
  SELECT query_id, vec_id FROM (
    SELECT s.query_id, s.vec_id,
           row_number() OVER (PARTITION BY s.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv')} ASC,
                      s.vec_id ASC) AS rk
    FROM shortlist s
    JOIN embeddings e ON e.vec_id = s.vec_id
    JOIN q ON q.query_id = s.query_id
  ) WHERE rk <= {_RECALL_K}
),
hits AS (
  SELECT t.query_id, count(a.vec_id) AS n_hits
  FROM truth t
  LEFT JOIN reranked a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 1
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_RECALL_K} AS recall_at_k
FROM hits
ORDER BY query_id
""",
)
def ann_pq_rerank_recall(spark, sf_dir):
    """The standard PQ serving pipeline measured end to end: ADC over the
    compressed codes produces a top-50 SHORTLIST (32x-less
    scan IO), then exact distances re-rank ONLY those rows (a broadcast
    k-row lookup into the raw vectors — never a scan) down to top-5.
    Compare with ann_pq_recall (~0.43 without re-rank): the shortlist is
    wide enough that quantization error mostly washes out, which is why
    production PQ always re-ranks."""
    emb = load(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame(
        [(i, q) for i, q in enumerate(_PQ_QUERIES)],
        "query_id INT, query_vec ARRAY<DOUBLE>",
    )
    truth = S.batch_knn(emb, queries, dim=64, k=_RECALL_K).select("query_id", "vec_id")
    codes = S.pq_encode(emb, _CODEBOOKS)
    luts = spark.createDataFrame(
        [(i, lut) for i, lut in enumerate(_PQ_LUTS)],
        "query_id INT, lut ARRAY<ARRAY<DOUBLE>>",
    )
    shortlist = S.batch_pq_adc_topk(
        codes, luts, _PQ_M, k=_RERANK_SHORTLIST
    ).select("query_id", "vec_id")
    qv = queries.select(
        F.col("query_id").alias("q_qid"),
        F.col("query_vec").cast("array<double>").alias("_qv"),
    )
    from pyspark.sql.window import Window
    from ..functions import vector as V

    scored = (
        shortlist.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qv), F.col("query_id") == F.col("q_qid"))
        .select(
            "query_id",
            "vec_id",
            (F.lit(1.0) - V.dot("embedding", "_qv", dim=64)).alias(
                "distance"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("vec_id").asc()
    )
    reranked = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _RECALL_K)
        .select(F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid"))
    )
    hits = (
        truth.join(
            reranked,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_vid").alias("n_hits"))
    )
    return hits.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_k"),
    ).orderBy("query_id")


@register(
    "ann_ivfpq_recall",
    f"""
WITH {_pq_codes_ctes(', label')},
q AS (
  SELECT * FROM (VALUES {_PQ_Q_ROWS}) AS t(query_id, qv)
),
luts AS (
  SELECT * FROM (VALUES {_PQ_LUT_ROWS}) AS t(query_id, lut)
),
cents AS (
  SELECT label, [{_CENT_COLS_SQL}] AS centroid
  FROM embeddings GROUP BY label
),
probes AS (
  SELECT query_id, label FROM (
    SELECT q.query_id, c.label,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('c.centroid', 'q.qv')} ASC,
                      c.label ASC) AS pr
    FROM cents c, q
  ) WHERE pr <= 4
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY adc ASC, vec_id ASC) AS rk
    FROM (
      SELECT p.query_id, c.vec_id, {_PQ_BATCH_ADC_SQL} AS adc
      FROM codes c
      JOIN probes p ON p.label = c.label
      JOIN luts l ON l.query_id = p.query_id
    )
  ) WHERE rk <= {_RECALL_K}
),
hits AS (
  SELECT t.query_id, count(a.vec_id) AS n_hits
  FROM truth t
  LEFT JOIN approx a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 1
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_RECALL_K} AS recall_at_k
FROM hits
ORDER BY query_id
""",
)
def ann_ivfpq_recall(spark, sf_dir):
    """IVF + PQ stacked (the FAISS IVFPQ architecture): the probe list
    prunes clusters BEFORE the ADC scan (nprobe=4 here), so per query the
    engine reads ~nprobe/|clusters| of the corpus AND only its 8-byte codes — the two
    scale levers multiplied. Recall compounds both approximations
    (cluster pruning x quantization); re-rank the shortlist against raw
    vectors to recover, as ann_pq_rerank_recall measures for plain PQ."""
    emb = load(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame(
        [(i, q) for i, q in enumerate(_PQ_QUERIES)],
        "query_id INT, query_vec ARRAY<DOUBLE>",
    )
    cents = _CENTROID_ARTIFACTS.get(sf_dir)
    if cents is None:
        cents = S.ivf_centroids(emb, DIM).persist()
        cents.count()
        _CENTROID_ARTIFACTS[sf_dir] = cents
    truth = S.batch_knn(emb, queries, dim=64, k=_RECALL_K).select("query_id", "vec_id")
    codes = S.pq_encode(emb, _CODEBOOKS, keep_cols=["label"])
    probes = S.batch_ivf_probes(queries, cents, nprobe=4, dim=64)
    luts = spark.createDataFrame(
        [(i, lut) for i, lut in enumerate(_PQ_LUTS)],
        "query_id INT, lut ARRAY<ARRAY<DOUBLE>>",
    )
    approx = S.batch_ivf_pq_topk(
        codes, probes, luts, _PQ_M, k=_RECALL_K
    ).select(F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid"))
    hits = (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_vid").alias("n_hits"))
    )
    return hits.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_k"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# MMR diversity re-rank: greedy over the top-20 candidates only. The
# oracle unrolls the 5 greedy steps as chained CTEs (no recursion); both
# sides compute every score through the identical left-to-right fold.
# ---------------------------------------------------------------------------

_MMR_K, _MMR_N_CAND = 5, 20


def _mmr_steps_sql() -> str:
    parts = []
    prev_union = "SELECT vec_id FROM s1"
    for i in range(2, _MMR_K + 1):
        parts.append(f"""r{i} AS (
  SELECT c.vec_id,
         '0.5'::DOUBLE * c.rel - '0.5'::DOUBLE * max(p.s) AS mmr_score
  FROM cand c
  JOIN psim p ON p.ia = c.vec_id AND p.ib IN ({prev_union})
  WHERE c.vec_id NOT IN ({prev_union})
  GROUP BY c.vec_id, c.rel
),
s{i} AS (
  SELECT vec_id, mmr_score FROM r{i}
  ORDER BY mmr_score DESC, vec_id ASC LIMIT 1
)""")
        prev_union += f" UNION ALL SELECT vec_id FROM s{i}"
    return ",\n".join(parts)


_MMR_FINAL_SQL = "\nUNION ALL\n".join(
    f"SELECT {i} AS rank, vec_id, mmr_score FROM s{i}"
    for i in range(1, _MMR_K + 1)
)


@register(
    "search_mmr_diversify",
    f"""
WITH cand AS (
  SELECT vec_id, {dot_sql('embedding')} AS rel, embedding::DOUBLE[] AS emb
  FROM embeddings
  ORDER BY rel DESC, vec_id ASC
  LIMIT {_MMR_N_CAND}
),
psim AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {dot_sql('a.emb', 'b.emb')} AS s
  FROM cand a, cand b
),
s1 AS (
  SELECT vec_id, rel AS mmr_score FROM cand
  ORDER BY rel DESC, vec_id ASC LIMIT 1
),
{_mmr_steps_sql()}
SELECT CAST(rank AS INTEGER) AS rank, vec_id, mmr_score
FROM ({_MMR_FINAL_SQL})
ORDER BY rank
""",
)
def search_mmr_diversify(spark, sf_dir):
    """Diversity-aware top-5 from the relevance top-20 (MMR, lambda=0.5):
    the greedy stage sees 20 rows regardless of corpus size (same cost
    contract as cross_rerank); the first pick is pure relevance, each
    later pick trades relevance against similarity to what's already
    chosen — the anti-redundancy step RAG context windows need after
    near-dup corpora."""
    from ..functions.vector import vector_lit
    from ..functions import vector as V

    emb = load(spark, sf_dir, "embeddings")
    rel = V.dot("embedding", QUERY_VEC)
    cand = (
        emb.select("vec_id", rel.alias("rel"), "embedding")
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(_MMR_N_CAND)
    )
    return S.mmr_rerank(cand, lam=0.5, k=_MMR_K).orderBy("rank")


# ---------------------------------------------------------------------------
# NDCG@5 of the LSH path vs exact: rank-aware quality (recall treats all
# top-k slots equally; NDCG discounts the tail). The 1/log2(r+1) rank
# discounts are PYTHON literals injected into both engines — no engine
# log() in the plan, so no libm-parity surface; the DCG sum is a fixed
# 5-term expression over 0/1 hit pivots, not an aggregate over doubles.
# ---------------------------------------------------------------------------

import math as _math

_NDCG_DISC = [1.0 / _math.log2(r + 1) for r in range(1, _RECALL_K + 1)]
_IDCG = sum(_NDCG_DISC)


def _dcg_sql(prefix: str) -> str:
    return " + ".join(
        f"{prefix}h{r} * '{_NDCG_DISC[r - 1]!r}'::DOUBLE"
        for r in range(1, _RECALL_K + 1)
    )


@register(
    "ann_lsh_ndcg",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < {_N_RECALL_Q}
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
cb AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS b FROM embeddings
),
qb AS (
  SELECT query_id, qv, {_bucket_sql('qv::DOUBLE[]')} AS b FROM q
),
approx AS (
  SELECT query_id, vec_id, rk FROM (
    SELECT qb.query_id, cb.vec_id,
           row_number() OVER (PARTITION BY qb.query_id
             ORDER BY 1.0 - {dot_sql('cb.embedding', 'qb.qv::DOUBLE[]')} ASC,
                      cb.vec_id ASC) AS rk
    FROM cb JOIN qb ON cb.b = qb.b
  ) WHERE rk <= {_RECALL_K}
),
hits AS (
  SELECT q.query_id,
         {", ".join(
           f"max(CASE WHEN a.rk = {r} AND t.vec_id IS NOT NULL "
           f"THEN 1 ELSE 0 END) AS h{r}" for r in range(1, _RECALL_K + 1))}
  FROM q
  LEFT JOIN approx a ON a.query_id = q.query_id
  LEFT JOIN truth t ON t.query_id = a.query_id AND t.vec_id = a.vec_id
  GROUP BY 1
)
SELECT query_id,
       round(({_dcg_sql('')}) / '{_IDCG!r}'::DOUBLE, 6) AS ndcg_at_k
FROM hits
ORDER BY query_id
""",
)
def ann_lsh_ndcg(spark, sf_dir):
    """Rank-aware LSH quality: binary relevance (approx hit is in the
    exact top-5), position-discounted. Complements the recall triptych —
    two rankings with equal recall can differ here when one buries its
    hits at rank 5."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_RECALL_Q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = S.batch_knn(emb, queries, dim=64, k=_RECALL_K).select(
        F.col("query_id").alias("t_qid"), F.col("vec_id").alias("t_vid")
    )
    approx = S.batch_lsh_topk(emb, queries, PLANES, dim=64, k=_RECALL_K).select(
        F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid"), "rk"
    )
    joined = (
        queries.select(F.col("query_id"))
        .join(approx, F.col("query_id") == F.col("a_qid"), "left")
        .join(
            truth,
            (F.col("a_qid") == F.col("t_qid")) & (F.col("a_vid") == F.col("t_vid")),
            "left",
        )
    )
    hit_aggs = [
        F.max(
            F.when((F.col("rk") == r) & F.col("t_vid").isNotNull(), 1).otherwise(0)
        ).alias(f"h{r}")
        for r in range(1, _RECALL_K + 1)
    ]
    hits = joined.groupBy("query_id").agg(*hit_aggs)
    dcg: F.Column | None = None
    for r in range(1, _RECALL_K + 1):
        term = F.col(f"h{r}") * F.lit(_NDCG_DISC[r - 1])
        dcg = term if dcg is None else dcg + term
    return hits.select(
        "query_id", F.round(dcg / F.lit(_IDCG), 6).alias("ndcg_at_k")
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means (the IVF trainer, operators/clustering.py):
# k=4, 2 rounds over the embedding corpus. Fully deterministic — md5-seeded
# init, FIXED-POINT centroid updates (exact BIGINT element sums + integer
# div; no float-summation-order exposure at all, unlike a rounded avg) and
# fold-ordered squared-L2 assignment — so the entire iterative algorithm is
# oracle-checkable: per-cluster sizes, exact inertia (micro-units) and
# centroid fingerprints all hash-match DuckDB replaying the same recipe.
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_DIM = 64


def _km_el_sql(i: int) -> str:
    """Fixed-point centroid element i (0-based) from DuckDB best-CTE rows."""
    return (
        f"((SUM(CAST(round((v[{i + 1}] + 2.0) * 1000000) AS BIGINT)) // COUNT(*))"
        f" - 2000000) / 1000000.0"
    )


def _km_ssq_sql(v: str, c: str) -> str:
    """Squared L2 as the same left-to-right double fold as
    functions/vector.py::sum_of_squares_distance (0.0-init fold == no-init
    fold here: every term is a square >= 0, and 0.0 + x == x)."""
    return (
        f"list_reduce(list_transform(list_zip({v}, {c}), "
        f"s -> (s[1] - s[2]) * (s[1] - s[2])), (a, b) -> a + b)"
    )


def _km_round_sql(t: int) -> str:
    """One Lloyd round: score against cent{t-1}, argmin, fixed-point update."""
    cent_els = ", ".join(_km_el_sql(i) for i in range(_KM_DIM))
    return f"""
score{t} AS (
  SELECT e.id, e.v, c.cluster_id, {_km_ssq_sql('e.v', 'c.centroid')} AS d
  FROM emb e, cent{t - 1} c
),
best{t} AS (
  SELECT id, v, cluster_id, d FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY d ASC, cluster_id ASC) AS rn
    FROM score{t}
  ) WHERE rn = 1
),
cent{t} AS (
  SELECT cluster_id, COUNT(*) AS n, [{cent_els}]::DOUBLE[] AS centroid
  FROM best{t} GROUP BY cluster_id
)"""


_KM_SAMPLED = (0, 16, 32, 48)
_KM_CSUM_SQL = " + ".join(
    f"CAST(round(c.centroid[{i + 1}] * 1000000) AS BIGINT)" for i in range(_KM_DIM)
)
_KM_SAMPLE_SQL = ", ".join(
    f"CAST(round(c.centroid[{i + 1}] * 1000000) AS BIGINT) AS c{i}_u6"
    for i in _KM_SAMPLED
)


@register(
    "kmeans_lloyd",
    f"""
WITH emb AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (
  SELECT id, v, md5(CAST(id AS VARCHAR)) AS h FROM emb ORDER BY h, id LIMIT {_KM_K}
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY h, id) - 1 AS cluster_id, v AS centroid
  FROM seeds
),
{_km_round_sql(1)},
{_km_round_sql(2)},
inertia AS (
  SELECT cluster_id,
         CAST(SUM(CAST(round(d * 1000000) AS BIGINT)) AS BIGINT) AS inertia_u6
  FROM best2 GROUP BY cluster_id
)
SELECT c.cluster_id, c.n, i.inertia_u6,
       {_KM_CSUM_SQL} AS c_sum_u6,
       {_KM_SAMPLE_SQL}
FROM cent2 c JOIN inertia i USING (cluster_id)
ORDER BY c.cluster_id
""",
)
def kmeans_lloyd(spark, sf_dir):
    """k=4, iters=2 Lloyd over embeddings; emits per-cluster size, exact
    micro-unit inertia (distances to the round's pre-update centroids) and
    exact centroid fingerprints. `cents` and the inertia agg share the
    `assigned` sub-plan — at fixture scale the recomputation is free; a
    production trainer would cache the assignment between the two."""
    from ..operators import clustering as C

    emb = load(spark, sf_dir, "embeddings")
    assigned, cents = C.kmeans_train(emb, k=_KM_K, iters=2, dim=_KM_DIM)
    inert = assigned.groupBy("cluster_id").agg(
        F.sum(F.round(F.col("distance") * F.lit(1e6), 0).cast("long")).alias(
            "inertia_u6"
        )
    )
    u6 = lambda i: F.round(F.col("centroid")[i] * F.lit(1e6), 0).cast("long")
    c_sum = None
    for i in range(_KM_DIM):
        c_sum = u6(i) if c_sum is None else c_sum + u6(i)
    return (
        cents.join(inert, "cluster_id")
        .select(
            "cluster_id",
            "n",
            "inertia_u6",
            c_sum.alias("c_sum_u6"),
            *[u6(i).alias(f"c{i}_u6") for i in _KM_SAMPLED],
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (operators/similarity.py::
# random_projection): 64 -> 16 dims with a Rademacher matrix. d_out = 16
# makes the 1/sqrt(d_out) scale (0.25) exactly representable, so each
# output is one fold + one exact multiply — bit-identical on both engines,
# no rounding anywhere.
# ---------------------------------------------------------------------------

_JL_DOUT = 16
_JL_COLS = S.rademacher_matrix(DIM, _JL_DOUT)


@register(
    "embed_random_projection",
    f"""
SELECT vec_id,
       {", ".join(
           f"{dot_sql('embedding', vec_sql(c))} * '0.25'::DOUBLE AS r{j}"
           for j, c in enumerate(_JL_COLS))}
FROM embeddings
ORDER BY vec_id
""",
)
def embed_random_projection(spark, sf_dir):
    """JL compression pre-pass: the narrow no-shuffle map that shrinks
    every downstream ANN/dedup shuffle by d_in/d_out (4x here)."""
    emb = load(spark, sf_dir, "embeddings")
    p = S.random_projection(emb, DIM, _JL_DOUT)
    return p.select(
        "vec_id", *[F.col("proj")[j].alias(f"r{j}") for j in range(_JL_DOUT)]
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Residual IVF+PQ (classic FAISS IndexIVFPQ): PQ codes quantize the
# RESIDUAL v - centroid(v); serving probes nprobe centroids and builds one
# ADC LUT per probed cluster from the query residual. Same codebooks, same
# code size as knn_pq_adc_topk — tighter reconstruction because residuals
# concentrate near zero (Jegou et al. 2011 §III.C).
# ---------------------------------------------------------------------------

_RES_SUBS_SQL = ",\n         ".join(
    f"list_slice(rv, {s * _PQ_SUBDIM + 1}, {(s + 1) * _PQ_SUBDIM}) AS sub_{s}"
    for s in range(_PQ_M)
)


def _res_lut_sql(s: int) -> str:
    folds = ", ".join(
        f"list_reduce(list_transform(list_zip("
        f"list_slice(qr, {s * _PQ_SUBDIM + 1}, {(s + 1) * _PQ_SUBDIM}), "
        f"{vec_sql(cw)}), s -> (s[1] - s[2]) * (s[1] - s[2])), (a, b) -> a + b)"
        for cw in _CODEBOOKS[s]
    )
    return f"[{folds}] AS lut_{s}"


_RES_ADC_SQL = " + ".join(
    f"l.lut_{s}[c.code_{s} + 1]" for s in range(_PQ_M)
)


@register(
    "knn_ivfpq_residual_topk",
    f"""
WITH cents AS (
  SELECT label, [{_CENT_COLS_SQL}] AS centroid
  FROM embeddings GROUP BY label
),
res AS (
  SELECT e.vec_id, e.label,
         list_transform(list_zip(e.embedding::DOUBLE[], c.centroid),
                        s -> s[1] - s[2]) AS rv
  FROM embeddings e JOIN cents c USING (label)
),
subs AS (
  SELECT vec_id, label,
         {_RES_SUBS_SQL}
  FROM res
),
dists AS (
  SELECT vec_id, label,
         {_PQ_DISTS_SQL}
  FROM subs
),
mins AS (
  SELECT *,
         {_PQ_MINS_SQL}
  FROM dists
),
codes AS (
  SELECT vec_id, label, {", ".join(_pq_code_sql(s) for s in range(_PQ_M))}
  FROM mins
),
probes AS (
  SELECT label, centroid FROM (
    SELECT c.label, c.centroid,
           row_number() OVER (ORDER BY 1.0 - {dot_sql('c.centroid')} ASC,
                              c.label ASC) AS pr
    FROM cents c
  ) WHERE pr <= 2
),
qres AS (
  SELECT label,
         list_transform(list_zip({QUERY_VEC_SQL}, centroid),
                        s -> s[1] - s[2]) AS qr
  FROM probes
),
luts AS (
  SELECT label, {", ".join(_res_lut_sql(s) for s in range(_PQ_M))}
  FROM qres
)
SELECT c.vec_id, {_RES_ADC_SQL} AS adc
FROM codes c JOIN luts l USING (label)
ORDER BY adc ASC, c.vec_id ASC
LIMIT 10
""",
)
def knn_ivfpq_residual_topk(spark, sf_dir):
    """Residual-quantizing IVFPQ serving: probe 2 centroids, per-cluster
    residual LUTs, ADC over codes of probed clusters only — the corpus
    scan reads 8 small ints per probed row. Encode here runs in-plan so
    the oracle can replay both halves arithmetically; a deployment stores
    pq_encode_residual's output as the codes table (api.build_pq_index's
    sidecar layout)."""
    emb = load(spark, sf_dir, "embeddings")
    cents = _CENTROID_ARTIFACTS.get(sf_dir)
    if cents is None:
        cents = S.ivf_centroids(emb, DIM).persist()
        cents.count()
        _CENTROID_ARTIFACTS[sf_dir] = cents
    codes = S.pq_encode_residual(emb, cents, _CODEBOOKS)
    return S.ivf_pq_residual_topk(
        codes, cents, QUERY_VEC, _CODEBOOKS, nprobe=2, k=10
    )


# ---------------------------------------------------------------------------
# Trained-IVF recall: the 2-round Lloyd trainer (k=10 to match the fixture
# label count) supplies clusters + centroids; serving assigns the corpus to
# the final centroids and probes nprobe=2 — the full
# build_ivf_index(method="kmeans") path measured for recall@5 against
# exact truth, entirely oracle-checked (fixed-point training makes even
# the trained index deterministic). Compare ann_ivf_recall (fixture-label
# clusters, same nprobe): the trainer's clusters reflect actual geometry.
# ---------------------------------------------------------------------------

_KMIVF_K = 10
_KMIVF_CENTS: dict[str, object] = {}


@register(
    "ann_ivf_kmeans_recall",
    f"""
WITH emb AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (
  SELECT id, v, md5(CAST(id AS VARCHAR)) AS h FROM emb
  ORDER BY h, id LIMIT {_KMIVF_K}
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY h, id) - 1 AS cluster_id, v AS centroid
  FROM seeds
),
{_km_round_sql(1)},
{_km_round_sql(2)},
score3 AS (
  SELECT e.id, c.cluster_id, {_km_ssq_sql('e.v', 'c.centroid')} AS d
  FROM emb e, cent2 c
),
best3 AS (
  SELECT id, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY d ASC, cluster_id ASC) AS rn
    FROM score3
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < {_N_RECALL_Q}
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
probes AS (
  SELECT query_id, cluster_id, qv FROM (
    SELECT q.query_id, c.cluster_id, q.qv,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('c.centroid', 'q.qv::DOUBLE[]')} ASC,
                      c.cluster_id ASC) AS pr
    FROM cent2 c, q
  ) WHERE pr <= 2
),
approx AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, e.vec_id,
           row_number() OVER (PARTITION BY p.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'p.qv::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e
    JOIN best3 b ON b.id = e.vec_id
    JOIN probes p ON p.cluster_id = b.cluster_id
  ) WHERE rk <= {_RECALL_K}
),
hits AS (
  SELECT t.query_id, count(a.vec_id) AS n_hits
  FROM truth t
  LEFT JOIN approx a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 1
)
SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_RECALL_K} AS recall_at_k
FROM hits
ORDER BY query_id
""",
)
def ann_ivf_kmeans_recall(spark, sf_dir):
    """build_ivf_index(method='kmeans') measured: train (fixed-point, 2
    rounds), assign the corpus to the final centroids (the serving
    layout), probe 2, recall@5 vs exact truth."""
    from ..operators import clustering as C

    emb = load(spark, sf_dir, "embeddings")
    cents = _KMIVF_CENTS.get(sf_dir)
    if cents is None:
        cents = (
            C.kmeans_train(emb, k=_KMIVF_K, iters=2, dim=DIM)[1]
            .select("cluster_id", "centroid")
            .persist()
        )
        cents.count()
        _KMIVF_CENTS[sf_dir] = cents
    labeled = C.kmeans_assign(
        emb, cents, id_col="vec_id", vector_col="embedding"
    ).select("vec_id", "embedding", "cluster_id")
    queries = emb.filter(F.col("vec_id") < _N_RECALL_Q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = S.batch_knn(emb, queries, dim=64, k=_RECALL_K).select("query_id", "vec_id")
    approx = S.batch_ivf_topk(
        labeled, queries, cents, nprobe=2, k=_RECALL_K, cluster_col="cluster_id",
        dim=64,
    ).select(F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid"))
    hits = (
        truth.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_vid").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.col("n_hits").cast("bigint").alias("n_hits"),
        (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_k"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# TRAINED product quantization (VERDICT r8 #3): per-subspace k-means
# codebooks (Jegou et al. 2011 §III.A) via the fixed-point Lloyd recipe —
# integer micro-unit centroid updates make the trained codewords
# bit-identical on any engine replaying the recipe, so the WHOLE pipeline
# (train -> encode -> ADC -> recall) is oracle-checkable. The query emits
# literal-codebook and trained-codebook recall side by side: the lift IS
# the result.
#
# Queries are CORPUS-drawn (vec_id < 8, the ann_ivf_kmeans_recall pattern),
# not the synthetic hash vectors: PQ training optimizes reconstruction of
# the data distribution, so its recall win shows on queries FROM that
# distribution (measured on this fixture: 0.09 -> 0.29 recall@5 corpus
# queries, while off-manifold hash queries are a coin flip for both
# codebooks — documented so nobody "fixes" this back).
# ---------------------------------------------------------------------------

_TPQ_ITERS = 4
_N_TPQ_Q = 8


def _tpq_ssq(v: str, c: str) -> str:
    """Same left-to-right fold as operators/similarity._subspace_sumsq and
    the unrolled Spark assign chain; lambda var z avoids shadowing the
    subspace column s."""
    return (
        f"list_reduce(list_transform(list_zip({v}, {c}), "
        f"z -> (z[1] - z[2]) * (z[1] - z[2])), (a, b) -> a + b)"
    )


def _tpq_el_sql(i: int) -> str:
    """Fixed-point centroid element i over subvector rows (clustering.py
    recipe: +2.0 offset, 1e6 scale, exact BIGINT sum, integer div)."""
    return (
        f"((SUM(CAST(round((sv[{i + 1}] + 2.0) * 1000000) AS BIGINT)) "
        f"// COUNT(*)) - 2000000) / 1000000.0"
    )


def _tpq_round_sql(t: int) -> str:
    els = ", ".join(_tpq_el_sql(i) for i in range(_PQ_SUBDIM))
    return f"""
tscore{t} AS (
  SELECT e.id, e.s, e.sv, c.cluster_id, {_tpq_ssq('e.sv', 'c.centroid')} AS d
  FROM tembs e JOIN tcent{t - 1} c ON e.s = c.s
),
tbest{t} AS MATERIALIZED (
  SELECT id, s, sv, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id, s
                                 ORDER BY d ASC, cluster_id ASC) AS rn
    FROM tscore{t}
  ) WHERE rn = 1
),
tcent{t} AS MATERIALIZED (
  SELECT s, cluster_id, [{els}]::DOUBLE[] AS centroid
  FROM tbest{t} GROUP BY s, cluster_id
)"""


_TPQ_CODE_COLS = ", ".join(
    f"MAX(CASE WHEN s = {s} THEN pos END) AS code_{s}" for s in range(_PQ_M)
)
_TPQ_ADC_SQL = " + ".join(
    f"l.lut[{s + 1}][c.code_{s} + 1]" for s in range(_PQ_M)
)


_TPQ_LCW_ROWS = ", ".join(
    f"({s}, {c}, {vec_sql(cw)})"
    for s in range(_PQ_M)
    for c, cw in enumerate(_CODEBOOKS[s])
)


@register(
    "ann_pq_trained_recall",
    f"""
WITH temb AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
),
tembs AS MATERIALIZED (
  SELECT id, s,
         list_slice(v, s * {_PQ_SUBDIM} + 1, s * {_PQ_SUBDIM} + {_PQ_SUBDIM})
           AS sv
  FROM temb, (SELECT unnest(range(0, {_PQ_M})) AS s) sx
),
tseeds AS (
  SELECT id, s, sv, md5(CAST(id AS VARCHAR)) AS h FROM tembs
),
tcent0 AS (
  SELECT s, rn - 1 AS cluster_id, sv AS centroid FROM (
    SELECT *, row_number() OVER (PARTITION BY s ORDER BY h, id) AS rn
    FROM tseeds
  ) WHERE rn <= {_PQ_K}
),
{",".join(_tpq_round_sql(t) for t in range(1, _TPQ_ITERS + 1))},
cpos AS MATERIALIZED (
  SELECT s, cluster_id, centroid,
         row_number() OVER (PARTITION BY s ORDER BY cluster_id) - 1 AS pos
  FROM tcent{_TPQ_ITERS}
),
cscore AS (
  SELECT e.id, e.s, c.pos, {_tpq_ssq('e.sv', 'c.centroid')} AS d
  FROM tembs e JOIN cpos c ON e.s = c.s
),
tcodes_long AS (
  SELECT id, s, pos FROM (
    SELECT *, row_number() OVER (PARTITION BY id, s
                                 ORDER BY d ASC, pos ASC) AS rn
    FROM cscore
  ) WHERE rn = 1
),
tcodes AS MATERIALIZED (
  SELECT id AS vec_id, {_TPQ_CODE_COLS}
  FROM tcodes_long GROUP BY id
),
q AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {_N_TPQ_Q}
),
qsubs AS MATERIALIZED (
  SELECT query_id, s,
         list_slice(qv, s * {_PQ_SUBDIM} + 1,
                    s * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS qsv
  FROM q, (SELECT unnest(range(0, {_PQ_M})) AS s) sx
),
tlut_cells AS (
  SELECT qs.query_id, qs.s, c.pos, {_tpq_ssq('qs.qsv', 'c.centroid')} AS d
  FROM qsubs qs JOIN cpos c ON qs.s = c.s
),
tluts AS MATERIALIZED (
  SELECT query_id, list(cell ORDER BY s) AS lut FROM (
    SELECT query_id, s, list(d ORDER BY pos) AS cell
    FROM tlut_cells GROUP BY query_id, s
  ) GROUP BY query_id
),
lcw AS (
  SELECT * FROM (VALUES {_TPQ_LCW_ROWS}) AS t(s, pos, cw)
),
llut_cells AS (
  SELECT qs.query_id, qs.s, l.pos, {_tpq_ssq('qs.qsv', 'l.cw')} AS d
  FROM qsubs qs JOIN lcw l ON qs.s = l.s
),
lluts AS MATERIALIZED (
  SELECT query_id, list(cell ORDER BY s) AS lut FROM (
    SELECT query_id, s, list(d ORDER BY pos) AS cell
    FROM llut_cells GROUP BY query_id, s
  ) GROUP BY query_id
),
{_PQ_CODES_CTES},
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
approx_lit AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY adc ASC, vec_id ASC) AS rk
    FROM (
      SELECT l.query_id, c.vec_id, {_TPQ_ADC_SQL} AS adc
      FROM codes c, lluts l
    )
  ) WHERE rk <= {_RECALL_K}
),
approx_tr AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY adc ASC, vec_id ASC) AS rk
    FROM (
      SELECT l.query_id, c.vec_id, {_TPQ_ADC_SQL} AS adc
      FROM tcodes c, tluts l
    )
  ) WHERE rk <= {_RECALL_K}
),
hits_lit AS (
  SELECT t.query_id, count(a.vec_id) AS n_hits_lit
  FROM truth t
  LEFT JOIN approx_lit a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 1
),
hits_tr AS (
  SELECT t.query_id, count(a.vec_id) AS n_hits_tr
  FROM truth t
  LEFT JOIN approx_tr a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 1
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(n_hits_lit AS BIGINT) AS n_hits_lit,
       CAST(n_hits_tr AS BIGINT) AS n_hits_tr,
       CAST(n_hits_lit AS DOUBLE) / {_RECALL_K} AS recall_lit,
       CAST(n_hits_tr AS DOUBLE) / {_RECALL_K} AS recall_tr
FROM hits_lit JOIN hits_tr USING (query_id)
ORDER BY query_id
""",
)
def ann_pq_trained_recall(spark, sf_dir):
    """Trained-vs-literal PQ recall@k over corpus-drawn queries:
    per-subspace fixed-point Lloyd codebooks (train_pq_codebooks, 4
    rounds) against the deterministic literal codebooks, both encoded and
    ADC-ranked identically — the measurement that justifies shipping
    trained sidecars (api.build_pq_index(trained=True)) before anyone
    trusts 32x-compressed codes at 100 TB. The oracle replays training,
    encode, LUT build and recall arithmetically (MATERIALIZED round CTEs
    per CLAUDE.md). The query-side LUTs are driver-computed from 8
    collected query vectors (bounded collect, same arithmetic as the
    oracle's SQL fold)."""
    emb = load(spark, sf_dir, "embeddings")
    books = S.train_pq_codebooks(
        emb, _PQ_M, _PQ_K, _PQ_SUBDIM, iters=_TPQ_ITERS
    )
    queries_df = emb.filter(F.col("vec_id") < _N_TPQ_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    qrows = sorted(
        (r["query_id"], [float(x) for x in r["query_vec"]])
        for r in queries_df.collect()  # bounded: _N_TPQ_Q rows
    )
    truth = S.batch_knn(emb, queries_df, dim=DIM, k=_RECALL_K).select(
        "query_id", "vec_id"
    )

    def _hits(codebooks, col):
        codes = S.pq_encode(emb, codebooks)
        luts = spark.createDataFrame(
            [(qid, S.pq_adc_lut(qv, codebooks)) for qid, qv in qrows],
            "query_id BIGINT, lut ARRAY<ARRAY<DOUBLE>>",
        )
        approx = S.batch_pq_adc_topk(codes, luts, _PQ_M, k=_RECALL_K).select(
            F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid")
        )
        return (
            truth.join(
                F.broadcast(approx),  # k x n_queries rows
                (F.col("query_id") == F.col("a_qid"))
                & (F.col("vec_id") == F.col("a_vid")),
                "left",
            )
            .groupBy("query_id")
            .agg(F.count("a_vid").alias(col))
        )

    lit_h = _hits(_CODEBOOKS, "n_hits_lit")
    tr_h = _hits(books, "n_hits_tr")
    return (
        lit_h.join(F.broadcast(tr_h), "query_id")
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("n_hits_lit").cast("bigint").alias("n_hits_lit"),
            F.col("n_hits_tr").cast("bigint").alias("n_hits_tr"),
            (F.col("n_hits_lit").cast("double") / _RECALL_K).alias("recall_lit"),
            (F.col("n_hits_tr").cast("double") / _RECALL_K).alias("recall_tr"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# FILTERED PQ serving: the metadata-scoped ADC search (ann_ivf_filtered's
# pre-filter strategy applied to the codes table). The label predicate is
# a stored column ON the codes table, so it pushes into the codes scan —
# the 32x-smaller artifact — and ADC ranks already-filtered rows; no
# post-top-k starvation, and the raw vectors are never touched.
# ---------------------------------------------------------------------------

@register(
    "knn_pq_filtered_topk",
    f"""
WITH {_pq_codes_ctes(", label")}
SELECT vec_id, {_PQ_ADC_SQL} AS adc
FROM codes
WHERE label % 3 = 0
ORDER BY adc ASC, vec_id ASC
LIMIT 10
""",
)
def knn_pq_filtered_topk(spark, sf_dir):
    """Metadata-filtered ADC top-k: pq_encode carries the label column
    into the codes artifact (keep_cols), the query-time predicate filters
    the codes scan BEFORE ranking, and the top-k is
    TakeOrderedAndProject over filtered codes only."""
    emb = load(spark, sf_dir, "embeddings")
    codes = S.pq_encode(emb, _CODEBOOKS, keep_cols=["label"])
    filtered = codes.filter(F.col("label") % 3 == 0).drop("label")
    return S.pq_adc_topk(filtered, _PQ_LUT, k=10)


# ---------------------------------------------------------------------------
# Triplet mining for contrastive training data (round 10): per anchor, the
# nearest positive (same label), the hardest negative (different label)
# and FaceNet's SEMI-HARD negative (closest negative still farther than
# the positive). Distances are the bit-exact unrolled cosine dots, picks
# are (distance, id)-tie-broken, so the whole mining table hash-matches.
# Anchors whose negatives are all closer than the positive emit the
# -1/999.0 sentinels on both sides (nullable-output rule).
# ---------------------------------------------------------------------------

_N_TRIPLET_ANCHORS = 24


@register(
    "triplet_semihard_mining",
    f"""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS albl, embedding AS qv
  FROM embeddings WHERE vec_id < {_N_TRIPLET_ANCHORS}
),
scored AS (
  SELECT a.anchor_id, a.albl, e.vec_id, e.label,
         1.0 - {dot_sql('e.embedding', 'a.qv::DOUBLE[]')} AS d
  FROM embeddings e, a
  WHERE e.vec_id != a.anchor_id
),
pos AS (
  SELECT anchor_id, vec_id AS pos_id, d AS pos_dist FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor_id
                                 ORDER BY d ASC, vec_id ASC) AS rk
    FROM scored WHERE label = albl
  ) WHERE rk = 1
),
neg AS (
  SELECT anchor_id, vec_id AS neg_id, d AS neg_dist FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor_id
                                 ORDER BY d ASC, vec_id ASC) AS rk
    FROM scored WHERE label != albl
  ) WHERE rk = 1
),
sh AS (
  SELECT anchor_id, vec_id AS semi_neg_id, d AS semi_neg_dist FROM (
    SELECT s.anchor_id, s.vec_id, s.d,
           row_number() OVER (PARTITION BY s.anchor_id
                              ORDER BY s.d ASC, s.vec_id ASC) AS rk
    FROM scored s JOIN pos p USING (anchor_id)
    WHERE s.label != s.albl AND s.d > p.pos_dist
  ) WHERE rk = 1
)
SELECT p.anchor_id, p.pos_id, p.pos_dist, n.neg_id, n.neg_dist,
       CAST(COALESCE(sm.semi_neg_id, -1) AS BIGINT) AS semi_neg_id,
       COALESCE(sm.semi_neg_dist, '999.0'::DOUBLE) AS semi_neg_dist
FROM pos p
JOIN neg n USING (anchor_id)
LEFT JOIN sh sm USING (anchor_id)
""",
)
def triplet_semihard_mining(spark, sf_dir):
    """Contrastive-training triplet table over the labeled embeddings
    (operators/similarity.triplet_semihard_mining): one corpus scan x
    broadcast anchors, WindowGroupLimit picks, semi-hard band via the
    per-anchor positive-distance join — the mining pass an embedding-model
    trainer runs over its labeled pool."""
    emb = load(spark, sf_dir, "embeddings")
    return S.triplet_semihard_mining(emb, _N_TRIPLET_ANCHORS, dim=DIM)


# ---------------------------------------------------------------------------
# Matryoshka prefix-embedding recall (round 10): recall@5 of PREFIX-cosine
# ranking (dims 32/16/8 of 64, truncate + renormalize — the MRL serving
# lever) vs the full-dim exact truth, per query. sqrt is the one libm call
# (parity-safe); zero-norm prefixes score distance 1.0 on both sides.
# ---------------------------------------------------------------------------

_MRL_DIMS = (32, 16, 8)


def _mrl_block(dp: int) -> str:
    e = f"e.embedding[1:{dp}]"
    qv = f"(q.qv[1:{dp}])::DOUBLE[]"
    dot = dot_sql(e, qv)
    sse = dot_sql(e, f"({e})::DOUBLE[]")
    ssq = dot_sql(f"q.qv[1:{dp}]", qv)
    return f"""
px{dp} AS (
  SELECT q.query_id, e.vec_id,
         CASE WHEN {sse} > 0 AND {ssq} > 0
              THEN 1.0 - {dot} / (sqrt({sse}) * sqrt({ssq}))
              ELSE 1.0 END AS d
  FROM embeddings e, q
),
ap{dp} AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY d ASC, vec_id ASC) AS rk
    FROM px{dp}
  ) WHERE rk <= {_RECALL_K}
),
hits{dp} AS (
  SELECT {dp} AS dim_prefix, t.query_id, count(a.vec_id) AS n_hits
  FROM truth t
  LEFT JOIN ap{dp} a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
  GROUP BY 2
)"""


@register(
    "ann_matryoshka_recall",
    f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < {_N_RECALL_Q}
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
{",".join(_mrl_block(dp) for dp in _MRL_DIMS)}
SELECT CAST(dim_prefix AS BIGINT) AS dim_prefix, query_id,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_RECALL_K} AS recall_at_k
FROM ({" UNION ALL ".join(f"SELECT * FROM hits{dp}" for dp in _MRL_DIMS)})
""",
)
def ann_matryoshka_recall(spark, sf_dir):
    """Recall@{_RECALL_K} of Matryoshka prefix-cosine ranking at dims
    {_MRL_DIMS} vs full-dim exact truth
    (operators/similarity.matryoshka_prefix_topk): the measurement that
    decides how short the first-stage representation can be before the
    full vector must rerank — read/compute cost drops proportionally to
    the prefix at 100 TB. Fixture numbers (mean recall@5: 0.35/0.27/0.26
    at dims 32/16/8) are a floor: these embeddings are random, not
    MRL-trained, so prefixes carry no concentrated signal — the
    measurement harness is the deliverable, and it is what shows an
    MRL-trained model's prefixes ARE usable."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_RECALL_Q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = S.batch_knn(emb, queries, dim=DIM, k=_RECALL_K).select(
        "query_id", "vec_id"
    )
    out = None
    for dp in _MRL_DIMS:
        approx = S.matryoshka_prefix_topk(
            emb, queries, prefix_dim=dp, k=_RECALL_K
        ).select(F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid"))
        hits = (
            truth.join(
                approx,
                (F.col("query_id") == F.col("a_qid"))
                & (F.col("vec_id") == F.col("a_vid")),
                "left",
            )
            .groupBy("query_id")
            .agg(F.count("a_vid").alias("n_hits"))
            .select(
                F.lit(dp).cast("long").alias("dim_prefix"),
                "query_id",
                F.col("n_hits").cast("long").alias("n_hits"),
                (F.col("n_hits").cast("double") / _RECALL_K).alias("recall_at_k"),
            )
        )
        out = hits if out is None else out.unionByName(hits)
    return out


# ---------------------------------------------------------------------------
# k-NN graph construction (round 11, VERDICT r10 #6): per node, its k
# nearest neighbors within its LSH sign block — the SemDeDup / graph-ANN
# precursor. The graph itself is oracle-exact (blocked truth replayed in
# SQL); its approximation loss vs the UNBLOCKED graph is itself a
# measured, oracle-checked quantity (knn_graph_recall).
# ---------------------------------------------------------------------------

_KG_K = 3
_KG_RECALL_N = 30
_KG_MAX_BLOCK = 192  # skew cap: inactive at sf0.01/sf0.1 (max bucket 106/148), active at sf1 (1390)


@register(
    "knn_graph_blocked",
    f"""
WITH cb0 AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS b FROM embeddings
),
bc AS (
  SELECT b, CAST((count(*) + {_KG_MAX_BLOCK - 1}) // {_KG_MAX_BLOCK} AS BIGINT)
         AS nsub
  FROM cb0 GROUP BY b
),
cb AS (
  SELECT cb0.vec_id, cb0.embedding, cb0.b,
         ('0x' || substr(md5(CAST(cb0.vec_id AS VARCHAR)), 1, 4))::BIGINT
           % bc.nsub AS sub
  FROM cb0 JOIN bc USING (b)
),
pairs AS (
  SELECT a.vec_id AS src, bb.vec_id AS dst,
         1.0 - {dot_sql('a.embedding', 'bb.embedding::DOUBLE[]')} AS distance
  FROM cb a JOIN cb bb ON a.b = bb.b AND a.sub = bb.sub
                      AND a.vec_id != bb.vec_id
),
ranked AS (
  SELECT src, dst, distance,
         row_number() OVER (PARTITION BY src
                            ORDER BY distance ASC, dst ASC) AS rk
  FROM pairs
)
SELECT src, dst, CAST(rk AS INT) AS rk, distance
FROM ranked WHERE rk <= {_KG_K}
""",
)
def knn_graph_blocked(spark, sf_dir):
    """The blocked k-NN graph over the embeddings table
    (operators/similarity.knn_graph, k=3): one edge list (src, dst, rk,
    distance), WindowGroupLimit per-src top-k inside LSH sign blocks.
    Candidate volume is Σ|block|², never |corpus|²."""
    emb = load(spark, sf_dir, "embeddings")
    # ADAPTIVE plane count (operators/similarity.adaptive_planes): holds
    # expected bucket ~8 so blocked pair work stays linear in the corpus
    # (fixed 6 planes measured 52.8x at 10x rows — SCALE.md round 11).
    # At the oracle's sf0.01 the policy yields exactly the 6 PLANES the
    # SQL twin hardcodes; the driver only compares at sf0.01.
    return S.knn_graph(
        emb, S.adaptive_planes(emb.count()), k=_KG_K, max_block=_KG_MAX_BLOCK,
        dim=DIM,
    )


@register(
    "knn_graph_recall",
    f"""
WITH q AS (SELECT vec_id FROM embeddings WHERE vec_id < {_KG_RECALL_N}),
truth AS (
  SELECT src, dst FROM (
    SELECT qe.vec_id AS src, e.vec_id AS dst,
           row_number() OVER (PARTITION BY qe.vec_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'qe.embedding::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e
    JOIN embeddings qe ON qe.vec_id < {_KG_RECALL_N}
    WHERE e.vec_id != qe.vec_id
  ) WHERE rk <= {_KG_K}
),
cb0 AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS b FROM embeddings
),
bc AS (
  SELECT b, CAST((count(*) + {_KG_MAX_BLOCK - 1}) // {_KG_MAX_BLOCK} AS BIGINT)
         AS nsub
  FROM cb0 GROUP BY b
),
cb AS (
  SELECT cb0.vec_id, cb0.embedding, cb0.b, bc.nsub,
         ('0x' || substr(md5(CAST(cb0.vec_id AS VARCHAR)), 1, 4))::BIGINT
           % bc.nsub AS sub
  FROM cb0 JOIN bc USING (b)
),
approx AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, bb.vec_id AS dst,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY 1.0 - {dot_sql('a.embedding', 'bb.embedding::DOUBLE[]')} ASC,
                      bb.vec_id ASC) AS rk
    FROM cb a JOIN cb bb ON a.b = bb.b AND a.sub = bb.sub
                        AND a.vec_id != bb.vec_id
    WHERE a.vec_id < {_KG_RECALL_N}
  ) WHERE rk <= {_KG_K}
),
probes AS (
  SELECT vec_id, embedding,
         unnest(list_prepend(b, list_transform(range(0, {N_PLANES}),
           i -> substr(b, 1, CAST(i AS INT))
                || (CASE WHEN substr(b, CAST(i AS INT) + 1, 1) = '1'
                    THEN '0' ELSE '1' END)
                || substr(b, CAST(i AS INT) + 2, {N_PLANES})))) AS pb
  FROM cb WHERE vec_id < {_KG_RECALL_N}
),
approx_probed AS (
  SELECT src, dst FROM (
    SELECT p.vec_id AS src, bb.vec_id AS dst,
           row_number() OVER (PARTITION BY p.vec_id
             ORDER BY 1.0 - {dot_sql('p.embedding', 'bb.embedding::DOUBLE[]')} ASC,
                      bb.vec_id ASC) AS rk
    FROM probes p
    JOIN bc pb ON pb.b = p.pb
    JOIN cb bb ON bb.b = p.pb AND bb.vec_id != p.vec_id
              AND bb.sub = ('0x' || substr(md5(CAST(p.vec_id AS VARCHAR)), 1, 4))::BIGINT
                           % pb.nsub
  ) WHERE rk <= {_KG_K}
),
hits AS (
  SELECT t.src,
         count(a.dst) AS n_hits,
         count(ap.dst) AS n_hits_probed
  FROM truth t
  LEFT JOIN approx a ON a.src = t.src AND a.dst = t.dst
  LEFT JOIN approx_probed ap ON ap.src = t.src AND ap.dst = t.dst
  GROUP BY 1
)
SELECT src, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_KG_K} AS recall_at_k,
       CAST(n_hits_probed AS BIGINT) AS n_hits_probed,
       CAST(n_hits_probed AS DOUBLE) / {_KG_K} AS recall_probed
FROM hits
""",
)
def knn_graph_recall(spark, sf_dir):
    """Recall@k of the BLOCKED k-NN graph vs the exact graph, per sample
    node — the number that sizes the plane count before anyone trusts the
    graph downstream (SemDeDup, components, ANN bootstrap). Truth side
    runs the identical knn_graph code path with planes=[] (one global
    block == exact); the exact pass is restricted to the sample nodes so
    its cost is sample x corpus, not corpus²."""
    from pyspark.sql.window import Window

    emb = load(spark, sf_dir, "embeddings")
    planes = S.adaptive_planes(emb.count())  # == PLANES at sf0.01
    approx = (
        S.knn_graph(emb, planes, k=_KG_K, max_block=_KG_MAX_BLOCK, dim=DIM)
        .filter(F.col("src") < _KG_RECALL_N)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    probed = (
        S.knn_graph(emb, planes, k=_KG_K, probe_hamming=1,
                    max_block=_KG_MAX_BLOCK, dim=DIM)
        .filter(F.col("src") < _KG_RECALL_N)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    # exact per-sample-node top-k: broadcast the sample against one
    # corpus scan (batch_knn shape, self excluded)
    q = emb.filter(F.col("vec_id") < _KG_RECALL_N).select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("_qv")
    )
    from ..functions.vector import dot as _dot

    d = F.lit(1.0) - _dot(F.col("_qv"), F.col("embedding").cast("array<double>"))
    w = Window.partitionBy("src").orderBy(F.col("_d").asc(), F.col("dst").asc())
    truth = (
        emb.select(F.col("vec_id").alias("dst"), "embedding")
        .join(F.broadcast(q), F.col("dst") != F.col("src"))
        .select("src", "dst", d.alias("_d"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= _KG_K)
        .select("src", "dst")
        .localCheckpoint(eager=True)  # consumed by two hit joins
    )
    hits = (
        truth.join(
            F.broadcast(approx.withColumn("_hit", F.lit(1))),
            ["src", "dst"],
            "left",
        )
        .join(
            F.broadcast(probed.withColumn("_hp", F.lit(1))),
            ["src", "dst"],
            "left",
        )
        .groupBy("src")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.sum(F.coalesce(F.col("_hp"), F.lit(0))).cast("long").alias("n_hits_probed"),
        )
    )
    return hits.select(
        "src",
        "n_hits",
        (F.col("n_hits").cast("double") / F.lit(float(_KG_K))).alias("recall_at_k"),
        "n_hits_probed",
        (F.col("n_hits_probed").cast("double") / F.lit(float(_KG_K))).alias(
            "recall_probed"
        ),
    )


# ---------------------------------------------------------------------------
# k-means-blocked k-NN graph (round 11, the arc-closer): sign-LSH blocking
# collapses on this fixture's tight label clusters (knn_graph_recall: 0.33
# blocked / 0.52 probed — a random hyperplane splits a pair with
# probability ~angle/π), but TRAINED centroid assignment splits clusters
# GEOMETRICALLY. Same trained index as ann_ivf_kmeans_recall (k=10, 2
# fixed-point Lloyd rounds, oracle replays the training), same skew cap
# as the LSH graph. The recall delta vs knn_graph_recall is the measured
# argument for kmeans blocking on cluster-shaped corpora.
# ---------------------------------------------------------------------------


@register(
    "knn_graph_kmeans_recall",
    f"""
WITH emb AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (
  SELECT id, v, md5(CAST(id AS VARCHAR)) AS h FROM emb
  ORDER BY h, id LIMIT {_KMIVF_K}
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY h, id) - 1 AS cluster_id, v AS centroid
  FROM seeds
),
{_km_round_sql(1)},
{_km_round_sql(2)},
score3 AS (
  SELECT e.id, c.cluster_id, {_km_ssq_sql('e.v', 'c.centroid')} AS d
  FROM emb e, cent2 c
),
best3 AS (
  SELECT id, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY d ASC, cluster_id ASC) AS rn
    FROM score3
  ) WHERE rn = 1
),
bc AS (
  SELECT cluster_id,
         CAST((count(*) + {_KG_MAX_BLOCK - 1}) // {_KG_MAX_BLOCK} AS BIGINT)
           AS nsub
  FROM best3 GROUP BY cluster_id
),
probes3 AS (
  SELECT id, cluster_id, rn AS probe_rank FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY d ASC, cluster_id ASC) AS rn
    FROM score3
  ) WHERE rn <= 2
),
cb AS (
  SELECT e.vec_id, e.embedding, b3.cluster_id,
         ('0x' || substr(md5(CAST(e.vec_id AS VARCHAR)), 1, 4))::BIGINT
           % bc.nsub AS sub
  FROM embeddings e
  JOIN best3 b3 ON b3.id = e.vec_id
  JOIN bc ON bc.cluster_id = b3.cluster_id
),
ca AS (
  SELECT e.vec_id, e.embedding, p3.cluster_id,
         ('0x' || substr(md5(CAST(e.vec_id AS VARCHAR)), 1, 4))::BIGINT
           % bc.nsub AS sub
  FROM embeddings e
  JOIN probes3 p3 ON p3.id = e.vec_id
  JOIN bc ON bc.cluster_id = p3.cluster_id
  WHERE e.vec_id < {_KG_RECALL_N}
),
approx AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, bb.vec_id AS dst,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY 1.0 - {dot_sql('a.embedding', 'bb.embedding::DOUBLE[]')} ASC,
                      bb.vec_id ASC) AS rk
    FROM cb a
    JOIN cb bb ON a.cluster_id = bb.cluster_id AND a.sub = bb.sub
              AND a.vec_id != bb.vec_id
    WHERE a.vec_id < {_KG_RECALL_N}
  ) WHERE rk <= {_KG_K}
),
approx_probed AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, bb.vec_id AS dst,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY 1.0 - {dot_sql('a.embedding', 'bb.embedding::DOUBLE[]')} ASC,
                      bb.vec_id ASC) AS rk
    FROM ca a
    JOIN cb bb ON a.cluster_id = bb.cluster_id AND a.sub = bb.sub
              AND a.vec_id != bb.vec_id
  ) WHERE rk <= {_KG_K}
),
q AS (SELECT vec_id FROM embeddings WHERE vec_id < {_KG_RECALL_N}),
truth AS (
  SELECT src, dst FROM (
    SELECT qe.vec_id AS src, e.vec_id AS dst,
           row_number() OVER (PARTITION BY qe.vec_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'qe.embedding::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e
    JOIN embeddings qe ON qe.vec_id < {_KG_RECALL_N}
    WHERE e.vec_id != qe.vec_id
  ) WHERE rk <= {_KG_K}
),
hits AS (
  SELECT t.src,
         count(a.dst) AS n_hits,
         count(ap.dst) AS n_hits_probed
  FROM truth t
  LEFT JOIN approx a ON a.src = t.src AND a.dst = t.dst
  LEFT JOIN approx_probed ap ON ap.src = t.src AND ap.dst = t.dst
  GROUP BY 1
)
SELECT src, CAST(n_hits AS BIGINT) AS n_hits,
       CAST(n_hits AS DOUBLE) / {_KG_K} AS recall_at_k,
       CAST(n_hits_probed AS BIGINT) AS n_hits_probed,
       CAST(n_hits_probed AS DOUBLE) / {_KG_K} AS recall_probed
FROM hits
""",
)
def knn_graph_kmeans_recall(spark, sf_dir):
    """Recall@3 of the KMEANS-blocked k-NN graph
    (operators/similarity.knn_graph_by over the trained IVF assignment,
    same skew cap as the LSH graph) against the exact graph, plus the
    IVF-PROBED variant (src participates in its 2 nearest cells,
    kmeans_assign_topn — the nprobe lever applied to graph
    construction). Shares ann_ivf_kmeans_recall's trained centroids
    (cached per sf_dir); the oracle replays the fixed-point training
    itself.

    Measured at sf0.01, side by side with knn_graph_recall — an honest
    SPLIT result, not the textbook one: rank-1 kmeans blocking (k=10,
    2 Lloyd rounds) reads 0.24 vs LSH's 0.33, and 2-probe kmeans 0.41 vs
    Hamming-1 LSH's 0.52 — sign-LSH wins on RAW recall here. But the
    budgets differ: Hamming-1 probing scans ~7 blocks/node (~294
    candidates) while 2-probe kmeans scans ~100, so per-candidate the
    trained cells are ~2.4x more efficient (0.41/100 vs 0.52/294) — at
    EQUAL candidate budget the centroid blocking is the better lever,
    which is what matters when the budget, not the probe count, is the
    constraint at 100 TB. Both variants oracle-checked."""
    from pyspark.sql.window import Window

    from ..operators import clustering as C

    emb = load(spark, sf_dir, "embeddings")
    cents = _KMIVF_CENTS.get(sf_dir)
    if cents is None:
        cents = (
            C.kmeans_train(emb, k=_KMIVF_K, iters=2, dim=DIM)[1]
            .select("cluster_id", "centroid")
            .persist()
        )
        cents.count()
        _KMIVF_CENTS[sf_dir] = cents
    labeled = C.kmeans_assign(
        emb, cents, id_col="vec_id", vector_col="embedding"
    ).select("vec_id", "embedding", "cluster_id")
    approx = (
        S.knn_graph_by(
            labeled, "cluster_id", k=_KG_K, max_block=_KG_MAX_BLOCK, dim=DIM
        )
        .filter(F.col("src") < _KG_RECALL_N)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    # IVF-probed variant: the src side participates in its 2 nearest
    # cells (kmeans_assign_topn) — the nprobe lever applied to graph
    # construction; dst side stays rank-1, so block contents are
    # unchanged and no pair is generated twice per (src, cell)
    counts = labeled.groupBy("cluster_id").agg(
        F.expr(f"(count(*) + {_KG_MAX_BLOCK - 1}) div {_KG_MAX_BLOCK}")
        .cast("long")
        .alias("_nsub")
    )
    sub_of = lambda idc: F.expr(  # noqa: E731
        f"cast(conv(substr(md5(cast({idc} as string)), 1, 4), 16, 10)"
        " as bigint) % _nsub"
    )
    b_side = (
        labeled.join(F.broadcast(counts), "cluster_id")
        .select(
            F.col("vec_id").alias("dst"),
            F.col("embedding").alias("_emb_b"),
            "cluster_id",
            sub_of("dst").alias("_sub"),
        )
    )
    a_side = (
        C.kmeans_assign_topn(
            emb.filter(F.col("vec_id") < _KG_RECALL_N), cents, n=2,
            id_col="vec_id", vector_col="embedding",
        )
        .select("vec_id", "embedding", "cluster_id")
        .join(F.broadcast(counts), "cluster_id")
        .select(
            F.col("vec_id").alias("src"),
            F.col("embedding").alias("_emb_a"),
            "cluster_id",
            sub_of("src").alias("_sub"),
        )
    )
    from ..functions.vector import dot as _dot2

    pd_dist = F.lit(1.0) - _dot2(
        F.col("_emb_a"), F.col("_emb_b").cast("array<double>")
    )
    from pyspark.sql.window import Window as _W

    pw = _W.partitionBy("src").orderBy(
        F.col("distance").asc(), F.col("dst").asc()
    )
    probed = (
        a_side.join(b_side, ["cluster_id", "_sub"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", pd_dist.alias("distance"))
        .withColumn("_rk", F.row_number().over(pw))
        .filter(F.col("_rk") <= _KG_K)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    q = emb.filter(F.col("vec_id") < _KG_RECALL_N).select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("_qv")
    )
    from ..functions.vector import dot as _dot

    d = F.lit(1.0) - _dot(F.col("_qv"), F.col("embedding").cast("array<double>"))
    w = Window.partitionBy("src").orderBy(F.col("_d").asc(), F.col("dst").asc())
    truth = (
        emb.select(F.col("vec_id").alias("dst"), "embedding")
        .join(F.broadcast(q), F.col("dst") != F.col("src"))
        .select("src", "dst", d.alias("_d"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= _KG_K)
        .select("src", "dst")
    )
    hits = (
        truth.join(
            F.broadcast(approx.withColumn("_hit", F.lit(1))),
            ["src", "dst"],
            "left",
        )
        .join(
            F.broadcast(probed.withColumn("_hp", F.lit(1))),
            ["src", "dst"],
            "left",
        )
        .groupBy("src")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.sum(F.coalesce(F.col("_hp"), F.lit(0))).cast("long").alias("n_hits_probed"),
        )
    )
    return hits.select(
        "src",
        "n_hits",
        (F.col("n_hits").cast("double") / F.lit(float(_KG_K))).alias("recall_at_k"),
        "n_hits_probed",
        (F.col("n_hits_probed").cast("double") / F.lit(float(_KG_K))).alias(
            "recall_probed"
        ),
    )


# ---------------------------------------------------------------------------
# 1-bit sign-sketch ANN (round 12): Hamming coarse shortlist + exact rerank.
# The sketch is 64x smaller than the float vectors; at 100 TB the coarse
# pass scans a persisted 16-byte column and only shortlist survivors touch
# the embeddings (column pruning does the work). Completes the quantization
# tier: PQ (product codes) / SQ8 (8-bit scalar) / matryoshka (prefix dims)
# / sign bits (1-bit).
# ---------------------------------------------------------------------------

def _sign_word_sql(arr: str, w: int, dim: int = 64) -> str:
    """DuckDB twin of operators/similarity.sign_words_expr word ``w//32``:
    1-based list indexing, per-term BIGINT casts (the i=31 term is 2^31 —
    INT32 overflow without them)."""
    return " + ".join(
        f"(CASE WHEN {arr}[{w + i + 1}] > 0 THEN {1 << i}::BIGINT"
        f" ELSE 0::BIGINT END)"
        for i in range(min(32, dim - w))
    )


_HAM_QW = S.sign_words_py(QUERY_VEC, dim=64)
_HAM_SHORTLIST = 50


@register(
    "knn_hamming_topk",
    f"""
WITH sk AS (
  SELECT vec_id, embedding,
         {_sign_word_sql('embedding', 0)} AS w0,
         {_sign_word_sql('embedding', 32)} AS w1
  FROM embeddings
),
coarse AS (
  SELECT vec_id, embedding,
         CAST(bit_count(xor(w0, {_HAM_QW[0]}::BIGINT))
              + bit_count(xor(w1, {_HAM_QW[1]}::BIGINT)) AS BIGINT) AS hamming
  FROM sk
  ORDER BY hamming ASC, vec_id ASC
  LIMIT {_HAM_SHORTLIST}
)
SELECT vec_id, hamming, 1.0 - {dot_sql('embedding')} AS distance
FROM coarse
ORDER BY distance ASC, vec_id ASC
LIMIT 10
""",
)
def knn_hamming_topk(spark, sf_dir):
    """Two-stage 1-bit ANN for a literal query: coarse top-50 by Hamming
    distance between 32-bit sign words (integer xor+popcount, both stages
    id-tiebroken), exact cosine rerank of the shortlist. The coarse stage
    never evaluates a float dot — the oracle replays the identical integer
    pipeline, so the hash match pins shortlist AND rerank."""
    emb = load(spark, sf_dir, "embeddings")
    return S.knn_hamming_rerank(
        emb, QUERY_VEC, k=10, shortlist=_HAM_SHORTLIST
    )


_HAM_RS = (10, 25, 50)


def _ham_recall_oracle() -> str:
    truth_part = f"""
q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < {_N_RECALL_Q}
),
truth AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY 1.0 - {dot_sql('e.embedding', 'q.qv::DOUBLE[]')} ASC,
                      e.vec_id ASC) AS rk
    FROM embeddings e, q
  ) WHERE rk <= {_RECALL_K}
),
sk AS (
  SELECT vec_id, embedding,
         {_sign_word_sql('embedding', 0)} AS w0,
         {_sign_word_sql('embedding', 32)} AS w1
  FROM embeddings
),
qk AS (
  SELECT query_id, qv,
         {_sign_word_sql('qv', 0)} AS qw0,
         {_sign_word_sql('qv', 32)} AS qw1
  FROM q
),
coarse AS (
  SELECT qk.query_id, sk.vec_id,
         CAST(bit_count(xor(sk.w0, qk.qw0))
              + bit_count(xor(sk.w1, qk.qw1)) AS BIGINT) AS hamming,
         1.0 - {dot_sql('sk.embedding', 'qk.qv::DOUBLE[]')} AS distance
  FROM sk, qk
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY hamming ASC, vec_id ASC) AS crk
  FROM coarse
)"""
    arms = []
    for r in _HAM_RS:
        arms.append(f"""
SELECT {r}::BIGINT AS shortlist_r, CAST(count(*) AS BIGINT) AS n_hits
FROM truth t
JOIN (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY distance ASC, vec_id ASC) AS rk
    FROM ranked WHERE crk <= {r}
  ) WHERE rk <= {_RECALL_K}
) a ON a.query_id = t.query_id AND a.vec_id = t.vec_id""")
    total = _N_RECALL_Q * _RECALL_K
    return (
        "WITH " + truth_part + "\n"
        "SELECT shortlist_r, n_hits,\n"
        f"       CAST(n_hits AS DOUBLE) / {float(total)!r} AS recall_at_k\n"
        "FROM (" + "\nUNION ALL\n".join(arms) + ")\n"
        "ORDER BY shortlist_r"
    )


@register("ann_hamming_recall", _ham_recall_oracle())
def ann_hamming_recall(spark, sf_dir):
    """Recall@5 of the Hamming-shortlist pipeline vs exact batch kNN at
    shortlist sizes 10/25/50 — the tune-the-shortlist-against-measured-
    recall loop the 1-bit sketch needs before anyone trusts it at 100 TB
    (same discipline as the LSH/IVF/PQ recall tier). Measured at sf0.01:
    0.50 / 0.63 / 0.77 at shortlist 10 / 25 / 50 — exact-scoring 10% of
    the corpus after an integer-only coarse pass recovers 77% of the
    true top-5. One corpus sketch
    pass serves all three arms; the truth graph computes once
    (localCheckpoint — consumed by every arm)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_RECALL_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    truth = (
        S.batch_knn(emb, queries, dim=64, k=_RECALL_K)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    total = _N_RECALL_Q * _RECALL_K
    arms = []
    for r in _HAM_RS:
        approx = S.batch_hamming_topk(
            emb, queries, k=_RECALL_K, shortlist=r
        ).select("query_id", "vec_id")
        arms.append(
            truth.join(approx, ["query_id", "vec_id"], "inner")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(
                F.lit(r).cast("bigint").alias("shortlist_r"),
                F.col("n_hits").cast("bigint").alias("n_hits"),
                (F.col("n_hits").cast("double") / F.lit(float(total))).alias(
                    "recall_at_k"
                ),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("shortlist_r")
