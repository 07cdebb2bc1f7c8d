from graphlearning_tpu.core.sparse import SparseGraph

__all__ = ["SparseGraph"]
