from photo_vector_search_spark.operators.knn import knn_batch, knn_topk

__all__ = ["knn_batch", "knn_topk"]
