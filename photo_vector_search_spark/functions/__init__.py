from photo_vector_search_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
]
