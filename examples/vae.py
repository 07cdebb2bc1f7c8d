"""VAE latent embedding for graph construction (reference
examples/vae_mnist.py, on synthetic data to stay offline)."""
import numpy as np
import graphlearning_tpu as gl

rs = np.random.RandomState(0)
X = np.abs(np.vstack([rs.randn(150, 50) + mu for mu in (0, 3)]))
Z = gl.weightmatrix.vae(X, layer_widths=(64, 8), epochs=10)
print("latent shape:", Z.shape)
W = gl.weightmatrix.knn(Z, 10)
print("graph nnz:", W.nnz)
