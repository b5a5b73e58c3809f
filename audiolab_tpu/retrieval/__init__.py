from audiolab_tpu.retrieval.index import FeatureIndex, knn_blend, kmeans

__all__ = ["FeatureIndex", "knn_blend", "kmeans"]
