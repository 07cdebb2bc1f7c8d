"""graphlearning_tpu — a TPU-native graph learning framework.

Brand-new JAX/XLA/Pallas framework with the capabilities of
jwcalder/GraphLearning (see SURVEY.md): kNN/epsilon-ball graph construction,
graph Laplacians and calculus, Laplace/Poisson/p-Laplace/AMLE semi-supervised
learning, MBO threshold dynamics, spectral clustering, graph distance /
eikonal solvers, active learning, and the ICML'20 experiment harness —
re-designed TPU-first: padded-ELL device graphs, matrix-free jitted solvers,
mesh-sharded SpMM.

Top-level API mirrors the reference's flat namespace
(reference ``graphlearning/__init__.py:1-8``): ``graph``, ``weightmatrix``,
``ssl``, ``clustering``, ``active_learning``, ``datasets``, ``trainsets``,
``utils``.
"""

from graphlearning_tpu.core.sparse import SparseGraph
from graphlearning_tpu.core.graphclass import graph
from graphlearning_tpu import ops, solvers, utils, weightmatrix
from graphlearning_tpu import ssl, clustering, active_learning
from graphlearning_tpu import datasets, trainsets
from graphlearning_tpu import observability, checkpoint, aot
from graphlearning_tpu.config import GLTConfig
from graphlearning_tpu.ssl import warmup

__version__ = "0.1.0"

__all__ = [
    "SparseGraph",
    "graph",
    "GLTConfig",
    "warmup",
    "ops",
    "solvers",
    "utils",
    "weightmatrix",
    "ssl",
    "clustering",
    "active_learning",
    "datasets",
    "trainsets",
    "observability",
    "checkpoint",
]
