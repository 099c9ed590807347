"""Distributed pose-graph bundle adjustment over a device mesh.

The reduction structure mirrors distributed Schur-style BA: edges (the
"observations") are sharded across the mesh's ``ba`` axis; each device
builds the normal-equation contributions of its edge shard; one ``psum``
reduces H and b over ICI; the (small, dense) solve is replicated.  This is
the collective pattern BASELINE.json mandates (psum/all_gather reductions
over keyframe Hessian blocks) — the reference has no optimizer or
communication at all (SURVEY.md section 2.2).

Single-device semantics are identical to models/posegraph.optimize (tested
for agreement on a virtual CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from topfusion_tpu.config import PoseGraphConfig
from topfusion_tpu.geometry.se3 import se3_exp, se3_log, se3_inverse
from topfusion_tpu.models.posegraph import PoseGraph, _huber_weights


def _shard_residuals(
    twists: jnp.ndarray,
    kf_poses: jnp.ndarray,
    edge_i: jnp.ndarray,
    edge_j: jnp.ndarray,
    edge_T: jnp.ndarray,
    edge_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Residuals [e_local, 6] of one edge shard against the full
    (replicated) pose set."""
    poses = se3_exp(twists) @ kf_poses
    Ti = poses[edge_i]
    Tj = poses[edge_j]
    rel = se3_inverse(Ti) @ Tj
    r = se3_log(se3_inverse(edge_T) @ rel)
    return jnp.where(edge_valid[:, None], r, 0.0)


def optimize_distributed(
    pg: PoseGraph, cfg: PoseGraphConfig, mesh: Mesh, axis: str = "ba"
) -> Tuple[PoseGraph, jnp.ndarray]:
    """Gauss-Newton over keyframe poses with edge-sharded H/b assembly.

    Edges are padded to a multiple of the mesh size and distributed; the
    whole GN loop runs inside one ``shard_map`` so per-iteration traffic
    is exactly one psum of (H [6K, 6K], b [6K]).
    """
    n_dev = mesh.shape[axis]
    k_cap = pg.kf_poses.shape[0]
    e_cap = pg.edge_i.shape[0]
    n_params = 6 * k_cap

    e_pad = ((e_cap + n_dev - 1) // n_dev) * n_dev

    def pad(x, fill=0):
        pad_width = [(0, e_pad - e_cap)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    edge_i = pad(pg.edge_i)
    edge_j = pad(pg.edge_j)
    edge_T = jnp.concatenate(
        [pg.edge_T]
        + [jnp.broadcast_to(jnp.eye(4, dtype=pg.edge_T.dtype),
                            (e_pad - e_cap, 4, 4))],
        axis=0,
    )
    edge_valid = pad(
        jnp.arange(e_cap) < pg.num_edges
    )
    edge_weight = pad(pg.edge_weight)

    espec = P(axis)
    rspec = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(espec, espec, (P(axis, None, None)), espec, espec, rspec),
        out_specs=rspec,
    )
    def run(ei, ej, eT, ev, ew, kf_poses):
        def gn_step(_, twists):
            flat = lambda t: _shard_residuals(
                t, kf_poses, ei, ej, eT, ev
            ).reshape(-1)
            r = flat(twists)
            J = jax.jacfwd(flat)(twists).reshape(-1, n_params)
            w = jnp.repeat(
                _huber_weights(r.reshape(-1, 6), cfg.huber_delta) * ew, 6
            )
            Jw = J * w[:, None]
            H = lax.psum(Jw.T @ J, axis)
            b = lax.psum(Jw.T @ r, axis)
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(n_params - 6)])
            H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            b = b * mask
            H = H + cfg.damping * jnp.eye(n_params)
            dx = jnp.linalg.solve(H, -b)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
            return twists + dx.reshape(k_cap, 6)

        twists0 = jnp.zeros((k_cap, 6), jnp.float32)
        return lax.fori_loop(0, cfg.gn_iters, gn_step, twists0)

    twists = run(edge_i, edge_j, edge_T, edge_valid, edge_weight, pg.kf_poses)

    new_poses = se3_exp(twists) @ pg.kf_poses
    live = (jnp.arange(k_cap) < pg.num_kf)[:, None, None]
    pg = pg._replace(kf_poses=jnp.where(live, new_poses, pg.kf_poses))
    from topfusion_tpu.models.posegraph import edge_residuals

    chi2 = jnp.sum(edge_residuals(jnp.zeros((k_cap, 6)), pg) ** 2)
    return pg, chi2
