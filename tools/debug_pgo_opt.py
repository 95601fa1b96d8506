"""Step-by-step diagnosis of pgo_optimize on the saved failing graph."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from aprilslam_tpu.geometry import se3_exp
from aprilslam_tpu.slam.pgo import PoseGraphEdges, pgo_residuals, pgo_cost

d = np.load("/tmp/pgo_state.npz")
poses = jnp.asarray(d["node_pose"])
active = jnp.asarray(d["node_active"])
edges = PoseGraphEdges(
    i=jnp.asarray(d["ei"]), j=jnp.asarray(d["ej"]), T_meas=jnp.asarray(d["eT"]),
    weight=jnp.asarray(d["ew"]), ok=jnp.asarray(d["eok"]),
)
N = poses.shape[0]
dtype = poses.dtype
first_active = jnp.argmax(active)
print("N:", N, "first_active:", int(first_active), "dtype:", dtype)


def residual_flat(xi_all, base):
    perturbed = jax.vmap(lambda x, T: se3_exp(x) @ T)(xi_all.reshape(N, 6), base)
    return pgo_residuals(perturbed, edges).reshape(-1)


gauge_weight = 1e6
eye = jnp.eye(N * 6, dtype=dtype)
gauge_mask = (jnp.arange(N) == first_active).astype(dtype)
prior_diag = jnp.repeat(gauge_weight * gauge_mask + 1e4 * (1.0 - active.astype(dtype)), 6)

lam = 1e-4
cur = poses
for it in range(8):
    z = jnp.zeros((N * 6,), dtype)
    r = residual_flat(z, cur)
    J = jax.jacfwd(residual_flat)(z, cur)
    A = J.T @ J + (lam + 1e-9) * eye + jnp.diag(prior_diag)
    g = J.T @ r
    dx = -jnp.linalg.solve(A, g)
    pred = float(0.5 * dx @ (A @ dx) + g @ dx)
    new_poses = jax.vmap(lambda x, T: se3_exp(x) @ T)(dx.reshape(N, 6), cur)
    new_poses = jnp.where(active[:, None, None], new_poses, cur)
    c0 = float(jnp.sum(r * r))
    c1 = float(pgo_cost(new_poses, edges))
    print(f"it {it}: cost {c0:.3f} -> {c1:.3f}, |dx|={float(jnp.linalg.norm(dx)):.4f}, "
          f"|g|={float(jnp.linalg.norm(g)):.3f}, lam={lam:.2e}, "
          f"Jfinite={bool(jnp.isfinite(J).all())}, dxfinite={bool(jnp.isfinite(dx).all())}")
    if c1 < c0:
        cur = new_poses
        lam *= 0.5
    else:
        lam *= 4.0
