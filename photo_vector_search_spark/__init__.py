"""photo_vector_search_spark — a PySpark-native batch analytics engine with the
query/data-processing capabilities of rianders/photo-vector-search.

The reference (660-LoC Python CLI over CLIP + Ollama + ChromaDB) is re-expressed
Spark-first: the ChromaDB collection becomes a Parquet-backed ``embeddings`` table
(``array<float>`` vectors), HNSW top-k queries become exact filtered cosine top-k
DataFrame plans (``TakeOrderedAndProject`` / window rank), per-row model calls become
Arrow-batched pandas UDFs, and per-row add/update becomes a merge-style batch upsert.

See SURVEY.md for the full operator inventory with reference file:line citations.
"""

from photo_vector_search_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
