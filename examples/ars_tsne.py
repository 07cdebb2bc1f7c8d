"""ARS t-SNE embedding (reference examples/ars_tsne.py, synthetic blobs)."""
import numpy as np
import graphlearning_tpu as gl

rs = np.random.RandomState(0)
X = np.vstack([rs.randn(200, 20) + 6 * e
               for e in np.eye(20)[:4]])
Y = gl.graph.ars(X, perplexity=20, iters=300, use_pca=False)
print("embedding shape:", Y.shape)
