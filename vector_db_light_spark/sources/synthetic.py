"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): a
partitioned, deterministic synthetic-corpus generator.

Rounds out S1 past file scans: the reference can only ingest what sits on
disk; scale testing a 100 TB pipeline needs a source that manufactures an
arbitrarily large corpus WITHOUT writing it first. This source generates
documents-table-shaped rows (same schema as the fixtures'
``documents.parquet``) directly inside executor tasks:

* `n_partitions` InputPartitions — generation parallelism equals the
  requested partition count, no driver-side materialization of anything;
* every row derives from ``md5(seed:doc_id)`` alone — partition-
  independent and rerun-stable, the same determinism contract as the
  samplers (operators/sampling.py), so tests/dedup oracles can rely on
  content, not just counts;
* ~5% of docs are exact duplicates of an earlier doc (same text, new id)
  so dedup operators have work to do out of the box.

Usage::

    from vector_db_light_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("synthetic_docs")
          .option("n_docs", 100000).option("n_partitions", 64).load())
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_LANGS = ("en", "zh", "es", "de", "fr")
_VOCAB = (
    "data spark cluster query engine vector index shard batch stream "
    "merge scan join filter group window state shuffle broadcast plan "
    "column row table file block cache disk memory network executor task"
).split()


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 7))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):
        pid = partition.value
        lo = self.n_docs * pid // self.n_partitions
        hi = self.n_docs * (pid + 1) // self.n_partitions
        for doc_id in range(lo, hi):
            h = hashlib.md5(f"{self.seed}:{doc_id}".encode()).digest()
            # ~5%: duplicate an earlier doc. Resolve the WHOLE redirection
            # chain: if the chosen src is itself a duplicate row, its actual
            # text is its own source's text, so stopping after one hop
            # would emit text matching no existing document (ADVICE r6).
            # Each hop maps to [0, src-2], strictly decreasing: terminates.
            hd, src = h, doc_id
            while hd[0] < 13 and src >= 20:
                src = int.from_bytes(hd[1:5], "big") % (src - 1)
                hd = hashlib.md5(f"{self.seed}:{src}".encode()).digest()
            text = self._text(hd)
            lang = _LANGS[h[5] % len(_LANGS)]
            source = f"src{h[6] % 20}"
            yield (doc_id, text, lang, source, len(text))

    @staticmethod
    def _text(h: bytes) -> str:
        n_words = 30 + h[7] % 170
        words = []
        x = int.from_bytes(h[8:16], "big")
        for _ in range(n_words):
            words.append(_VOCAB[x % len(_VOCAB)])
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return " ".join(words)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Register the format on this session (idempotent)."""
    spark.dataSource.register(SyntheticDocsDataSource)
