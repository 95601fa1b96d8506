"""Offline error analytics — JAX-native PCA/KMeans/regression + covariance.

Capability parity with the reference's analysis scripts, re-implemented on
the XLA path instead of sklearn/pandas:
* ``error_analysis``: standardize features -> PCA(2) -> KMeans(3) ->
  linear regression predicting the translation error with MSE/R^2 and
  feature importances; writes ``slam_clustered_data.csv``
  (reference src/analysis/error_analysis.py:17-93).
* ``covariance_report``: covariance of the logged parameters against the
  translation error (reference src/analysis/covarience.py:36-67 computes
  this live; the polling monitor lives in viz/monitor.py).
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_FEATURES = [
    "Number_of_Nodes",
    "Average_Distance",
    "Est_X", "Est_Y", "Est_Z",
    "Est_Roll", "Est_Pitch", "Est_Yaw",
    "Rotation_Difference",
]
TARGET = "Translation_Difference"


def standardize(X: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    mu = jnp.mean(X, axis=0)
    sd = jnp.std(X, axis=0) + 1e-12
    return (X - mu) / sd, mu, sd


def pca(X: jax.Array, n_components: int = 2) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (projected (N, k), components (k, D), explained variance)."""
    Xc = X - jnp.mean(X, axis=0)
    U, S, Vt = jnp.linalg.svd(Xc, full_matrices=False)
    comps = Vt[:n_components]
    proj = Xc @ comps.T
    var = (S**2) / (X.shape[0] - 1)
    return proj, comps, var[:n_components] / jnp.sum(var)


def kmeans(X: jax.Array, k: int = 3, iters: int = 50, seed: int = 0) -> tuple[jax.Array, jax.Array]:
    """Lloyd's algorithm as a lax.scan. Returns (labels (N,), centers (k, D))."""
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, X.shape[0], (k,), replace=False)
    centers0 = X[init_idx]

    def step(centers, _):
        d = jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, axis=-1)  # (N, k)
        lab = jnp.argmin(d, axis=-1)
        onehot = (lab[:, None] == jnp.arange(k)[None, :]).astype(X.dtype)  # (N, k)
        counts = onehot.sum(axis=0)
        sums = onehot.T @ X
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers0, None, length=iters)
    d = jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    return jnp.argmin(d, axis=-1), centers


def linear_regression(X: jax.Array, y: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Least squares with intercept. Returns (coef (D,), intercept, r2/mse)."""
    A = jnp.concatenate([X, jnp.ones((X.shape[0], 1), X.dtype)], axis=1)
    w, *_ = jnp.linalg.lstsq(A, y)
    pred = A @ w
    mse = jnp.mean((pred - y) ** 2)
    ss_res = jnp.sum((y - pred) ** 2)
    ss_tot = jnp.sum((y - jnp.mean(y)) ** 2) + 1e-12
    r2 = 1.0 - ss_res / ss_tot
    return w[:-1], w[-1], jnp.stack([mse, r2])


@dataclass
class ErrorAnalysisResult:
    labels: np.ndarray
    pca_proj: np.ndarray
    explained_variance: np.ndarray
    coefficients: dict
    mse: float
    r2: float
    output_csv: str | None


def error_analysis(
    csv_path: str,
    features: list[str] = DEFAULT_FEATURES,
    target: str = TARGET,
    n_clusters: int = 3,
    output_csv: str | None = None,
) -> ErrorAnalysisResult:
    """Run the full PCA+KMeans+regression pipeline over a logged CSV."""
    with open(csv_path) as f:
        reader = csv.DictReader(f)
        rows = [r for r in reader]
    if not rows:
        raise ValueError(f"no rows in {csv_path}")
    feats = [c for c in features if c in rows[0]]
    X = np.asarray([[float(r[c]) for c in feats] for r in rows], dtype=np.float32)
    y = np.asarray([float(r[target]) for r in rows], dtype=np.float32)

    Xs, mu, sd = standardize(jnp.asarray(X))
    proj, comps, ev = pca(Xs, 2)
    labels, centers = kmeans(Xs, n_clusters)
    coef, intercept, stats = linear_regression(Xs, jnp.asarray(y))
    mse, r2 = float(stats[0]), float(stats[1])

    out_path = None
    if output_csv:
        os.makedirs(os.path.dirname(output_csv) or ".", exist_ok=True)
        with open(output_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(list(rows[0].keys()) + ["PCA1", "PCA2", "Cluster"])
            pj = np.asarray(proj)
            lb = np.asarray(labels)
            for i, r in enumerate(rows):
                w.writerow(list(r.values()) + [round(float(pj[i, 0]), 6),
                                               round(float(pj[i, 1]), 6), int(lb[i])])
        out_path = output_csv

    return ErrorAnalysisResult(
        labels=np.asarray(labels),
        pca_proj=np.asarray(proj),
        explained_variance=np.asarray(ev),
        coefficients={c: float(v) for c, v in zip(feats, np.asarray(coef))},
        mse=mse,
        r2=r2,
        output_csv=out_path,
    )


def covariance_report(csv_path: str, target: str = "Translation_Error") -> dict:
    """Covariance of each logged parameter with the error column
    (covarience.py:36-67 semantics, batch version)."""
    with open(csv_path) as f:
        reader = csv.DictReader(f)
        rows = [r for r in reader]
    if not rows:
        return {}
    cols = [c for c in rows[0] if c != target]
    X = np.asarray([[float(r[c]) for c in cols] for r in rows], dtype=np.float64)
    y = np.asarray([float(r[target]) for r in rows], dtype=np.float64)
    yc = y - y.mean()
    out = {}
    for i, c in enumerate(cols):
        xc = X[:, i] - X[:, i].mean()
        out[c] = float((xc * yc).mean())
    return out
