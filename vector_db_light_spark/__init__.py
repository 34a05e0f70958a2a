"""vector_db_light_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of BBC-Esq/Vector_DB_Light.

The reference (``/root/reference``) is a single-node RAG pipeline:
ingest documents -> chunk -> embed -> store vectors -> brute-force k-NN ->
distance->similarity conversion -> threshold/keyword/doc-type filters ->
metadata join.  This package re-expresses every stage as lazy, distributed
Spark DataFrame plans (Catalyst-optimized), and extends the surface with the
relational / dedup / similarity-search / text-analysis operators a
100 TB-scale training-data pipeline needs.

Design rules (see SURVEY.md §4, §7):
  * declarative DataFrame/SQL everywhere; Catalyst handles pushdown,
    pruning, join strategy, top-k (TakeOrderedAndProject);
  * Python only inside Arrow-batched ``mapInPandas`` (embedding, parsing);
  * broadcast the small side of every lookup join;
  * no ``collect()`` inside operators — everything composes lazily.
"""

__version__ = "0.1.0"
