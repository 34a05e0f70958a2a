"""Batch embedding stage (V5) — the reference's Spark north star.

Reference flow (``/root/reference/embedding_models.py:116-157``): encode in
batches on one GPU with per-model batch sizes (``utilities_core.py:162-180``),
L2-normalize, per-row fallback when a batch fails. The dtype/batch-size
selection tables are ported torch-free in :mod:`..functions.policy` — a real
model's UDF consults them executor-locally (heterogeneous clusters pick per
executor, not per driver). Spark re-expression:
``mapInPandas`` over Arrow record batches; the model is a PER-EXECUTOR
SINGLETON (loaded once per Python worker, reused across batches — the
distributed analogue of the reference's thread-local model cache at
``vector_db_query.py:293-305``); encode failures yield a row-level
``embed_error`` column instead of silently dropping rows.

Because real sentence-transformer weights aren't available here, the default
model is ``HashedFeatureEmbedder`` — a deterministic surrogate whose math is
integer-exact (token-count buckets normalized by an integer sum of squares),
so the SAME numbers are computable in pure SQL and the whole mapInPandas
path is hash-checkable against a DuckDB oracle. A real model drops in by
registering another loader: the Spark plumbing (schema, batching, executor
cache, fallback) is identical.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_DIM = 16
DEFAULT_BATCH_SIZE = 256  # reference: per-model table, cpu default 2-12


class HashedFeatureEmbedder:
    """Deterministic hashed bag-of-words embedder.

    bucket(token) = first hex digit of md5(token)  (dim must be 16), or the
    first ``ceil(log16(dim))`` digits generally; vector = bucket counts
    L2-normalized with an *integer* sum of squares so the result is
    bit-reproducible across numpy / plain Python / SQL.
    """

    def __init__(self, dim: int = DEFAULT_DIM):
        if dim != 16:
            raise ValueError("oracle-portable surrogate supports dim=16 only")
        self.dim = dim

    def encode_one(self, text: str) -> list[float]:
        counts = [0] * self.dim
        for tok in (text or "").lower().split():
            counts[int(hashlib.md5(tok.encode("utf-8")).hexdigest()[0], 16)] += 1
        sumsq = sum(c * c for c in counts)
        if sumsq == 0:
            return [0.0] * self.dim
        norm = math.sqrt(sumsq)
        return [c / norm for c in counts]

    def encode_batch(self, texts: list[str]) -> list[list[float]]:
        return [self.encode_one(t) for t in texts]


class SentenceTransformerEmbedder:
    """Real-model encoder behind the same ``encode_one``/``encode_batch``
    contract as the surrogate — THE swap for production (reference
    ``embedding_models.py:116-157``). Import-gated: this container has no
    torch, so construction raises ImportError cleanly and the seam test
    auto-skips. Normalization is on (the reference L2-normalizes so cosine
    == dot), and the model loads once per Python worker via the same
    ``_get_model`` cache the surrogate uses."""

    def __init__(self, model_name: str, dim: int | None = None):
        from sentence_transformers import SentenceTransformer  # torch stack

        self._model = SentenceTransformer(model_name)
        self.dim = dim or self._model.get_sentence_embedding_dimension()

    def encode_one(self, text: str) -> list[float]:
        return self.encode_batch([text])[0]

    def encode_batch(self, texts: list[str]) -> list[list[float]]:
        vecs = self._model.encode(
            [t or "" for t in texts], normalize_embeddings=True
        )
        return [[float(x) for x in v] for v in vecs]


# Per-executor singleton cache (one per Python worker process), keyed by
# (factory, dim) so surrogate and real models coexist.
_MODEL_CACHE: dict[tuple, object] = {}


def _get_model(dim: int, factory=HashedFeatureEmbedder):
    key = (factory, dim)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = factory(dim)
    return _MODEL_CACHE[key]


def embed_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    batch_size: int = DEFAULT_BATCH_SIZE,
    encoder_factory=HashedFeatureEmbedder,
) -> DataFrame:
    """Arrow-batched embedding: (id, embedding ARRAY<DOUBLE>, embed_error).

    Batch-level encode with per-row fallback on failure, mirroring
    ``embedding_models.py:134-157``: a poison row degrades only itself.

    ``encoder_factory`` is the ONLY thing that changes between the
    hashed-feature surrogate and a real model: pass
    ``lambda dim: SentenceTransformerEmbedder("BAAI/bge-small-en", dim)``
    where torch is installed and the identical mapInPandas scaffold,
    executor-singleton cache, batching, and fallback run unchanged. The
    factory is SNAPSHOTTED into the closure (module-level lookup on the
    executor would re-import this module and see only the default).
    """
    out_schema = StructType(
        [
            docs.schema[id_col],
            StructField("embedding", ArrayType(DoubleType()), True),
            StructField("embed_error", StringType(), True),
        ]
    )

    factory = encoder_factory

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model(dim, factory)
        for pdf in batches:
            ids = pdf[id_col]
            texts = pdf[text_col].tolist()
            for start in range(0, len(texts), batch_size):
                chunk = texts[start : start + batch_size]
                errors: list[str | None] = [None] * len(chunk)
                try:
                    vecs = model.encode_batch(chunk)
                except Exception:
                    # batch failed: retry row by row (reference fallback)
                    vecs = []
                    for j, t in enumerate(chunk):
                        try:
                            vecs.append(model.encode_one(t))
                        except Exception as ex:  # degrade this row only
                            vecs.append(None)
                            errors[j] = f"{type(ex).__name__}: {ex}"
                yield pd.DataFrame(
                    {
                        id_col: ids.iloc[start : start + len(chunk)].values,
                        "embedding": vecs,
                        "embed_error": errors,
                    }
                )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


# (The matching DuckDB oracle SQL for this embedder lives inline with its
# queries: see queries/pipeline.py embed_hashed_features / search_text.py.)
