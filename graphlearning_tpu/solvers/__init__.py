from graphlearning_tpu.solvers.cg import conjgrad, constrained_solve

__all__ = ["conjgrad", "constrained_solve"]
