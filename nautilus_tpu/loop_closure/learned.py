"""Scan-match scoring + local-uncertainty estimation (service equivalents).

The reference declares ROS service clients to two external learned models —
``match_laser_scans`` and ``estimate_local_uncertainty`` (reference
src/optimization/solver.cc:58-60; torch processes from the
learning-loop-closure submodule) — but never invokes them in the analyzed
snapshot (plumbing only, SURVEY.md §2b).  This module provides in-process,
deterministic JAX equivalents with the same decision surface:

- ``match_score(scan_a, scan_b)`` -> [0, 1]: rotation-invariant polar-
  histogram descriptor similarity (clouds normalized per the reference's
  normalizePointCloud, pointcloud_helpers.cc:111-122).  Compared against
  config ``lc_match_threshold`` (default 0.5).
- ``local_uncertainty(points)`` -> (condition, scale): spectrum of the
  scan's point-to-plane self-registration information matrix.  ``condition``
  is the translation-block eigenvalue ratio (1 = isotropically constrained);
  ``scale`` is 1/sqrt(smallest eigenvalue per point) — larger when the scan
  poorly constrains its own pose.  Compared against
  ``local_uncertainty_condition_threshold`` / ``_scale_threshold``
  (default_config.lua:105-116).

Both are engine-defined scoring functions, not reproductions of the absent
learned models; the decision plumbing and config keys match the reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

RANGE_BINS = 16
THETA_BINS = 64


def normalize_cloud(points, mask, range_scale: float):
    """Mean-center + scale (reference normalizePointCloud,
    pointcloud_helpers.cc:111-122)."""
    w = mask.astype(points.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(points * w[:, None], axis=0) / n
    return (points - mean) / range_scale


@functools.partial(jax.jit, static_argnames=())
def scan_descriptor(points, mask, range_scale=10.0):
    """[RANGE_BINS, THETA_BINS] L2-normalized polar occupancy histogram."""
    p = normalize_cloud(points, mask, range_scale)
    r = jnp.linalg.norm(p, axis=-1)
    th = jnp.arctan2(p[:, 1], p[:, 0])
    ri = jnp.clip((r * RANGE_BINS).astype(jnp.int32), 0, RANGE_BINS - 1)
    ti = jnp.clip(((th + jnp.pi) / (2 * jnp.pi) * THETA_BINS).astype(jnp.int32),
                  0, THETA_BINS - 1)
    flat = ri * THETA_BINS + ti
    hist = jnp.zeros((RANGE_BINS * THETA_BINS,), points.dtype).at[flat].add(
        mask.astype(points.dtype))
    hist = hist.reshape(RANGE_BINS, THETA_BINS)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(hist * hist), 1e-12))
    return hist / norm


@jax.jit
def match_score(points_a, mask_a, points_b, mask_b) -> jnp.ndarray:
    """Rotation-invariant descriptor similarity in [0, 1].

    Rotation invariance: max cosine similarity over all circular shifts of
    the theta axis, evaluated densely (THETA_BINS shifted dot products — a
    small batched matmul).
    """
    da = scan_descriptor(points_a, mask_a)
    db = scan_descriptor(points_b, mask_b)

    def sim(shift):
        return jnp.sum(da * jnp.roll(db, shift, axis=1))

    sims = jax.vmap(sim)(jnp.arange(THETA_BINS))
    return jnp.clip(jnp.max(sims), 0.0, 1.0)


@jax.jit
def local_uncertainty(points, mask, normals) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(condition, scale) of the scan's self-registration information.

    Point-to-plane GN information: H = sum_i J_i^T J_i with
    J_i = [n_x, n_y, n . d(R p)/dtheta] per point.  A corridor constrains
    only one translation direction -> large condition; sparse/short scans
    -> small eigenvalues -> large scale.
    """
    w = mask.astype(points.dtype)
    nx, ny = normals[:, 0], normals[:, 1]
    # d(Rp)/dtheta at theta=0 is (-y, x).
    jth = -points[:, 1] * nx + points[:, 0] * ny
    J = jnp.stack([nx, ny, jth], axis=-1) * w[:, None]
    H = jnp.matmul(J.T, J, precision=jax.lax.Precision.HIGHEST)
    # Translation block condition.
    Ht = H[:2, :2]
    tr = Ht[0, 0] + Ht[1, 1]
    det = Ht[0, 0] * Ht[1, 1] - Ht[0, 1] * Ht[1, 0]
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))
    lam_max = 0.5 * (tr + disc)
    lam_min = jnp.maximum(0.5 * (tr - disc), 1e-12)
    condition = lam_max / lam_min
    n = jnp.maximum(jnp.sum(w), 1.0)
    scale = 1.0 / jnp.sqrt(lam_min / n)
    return condition, scale


def passes_uncertainty_filter(points, mask, normals, config) -> bool:
    """Keyframe gate (config keys default_config.lua:105-116)."""
    cond, scale = local_uncertainty(points, mask, normals)
    return (float(cond) < float(config.local_uncertainty_condition_threshold)
            and float(scale) < float(config.local_uncertainty_scale_threshold))
