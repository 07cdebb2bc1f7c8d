"""Random-projection 1-D clustering (reference examples/RP1D_mnist.py)."""
import numpy as np
import graphlearning_tpu as gl

rs = np.random.RandomState(0)
X = np.vstack([rs.randn(200, 20), rs.randn(200, 20) + 4.0])
labels = np.repeat([0, 1], 200)
pred = gl.clustering.RP1D(X, T=100, seed=0)
print("accuracy: %.1f%%" % gl.clustering.clustering_accuracy(pred, labels))
