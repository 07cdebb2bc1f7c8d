"""Multi-trial SSL benchmark + LaTeX table + plot (reference examples/ssl_trials.py)."""
import numpy as np
import sklearn.datasets as datasets
import graphlearning_tpu as gl

X, labels = datasets.make_moons(n_samples=500, noise=0.1, random_state=0)
W = gl.weightmatrix.knn(X, 10)
trainsets = [gl.trainsets.generate(labels, rate=r, seed=s)
             for r in (1, 2, 4, 8) for s in range(5)]

models = [gl.ssl.laplace(W), gl.ssl.poisson(W), gl.ssl.randomwalk(W)]
for model in models:
    model.ssl_trials(trainsets, labels, overwrite=True)

gl.ssl.accuracy_table(models, savefile="moons_table.tex", title="TwoMoons")
import matplotlib
matplotlib.use("Agg")
gl.ssl.accuracy_plot(models, savefile="moons_accuracy.png", errorbars=True)
print("wrote moons_table.tex, moons_accuracy.png")
