"""Matrix-free LM: block-Jacobi preconditioned CG on the normal equations.

The dense-Cholesky path (solve/lm.py) is fastest up to a few thousand poses;
beyond that H [3M, 3M] no longer fits comfortably and a factorization is
O(M^3).  This path never materializes H: per accepted LM step the factors
are linearized once (r, J, dof per factor batch — solve/factors.py
``linearize_two_pose``), and CG iterates with

    H v  =  sum_factors  scatter( J^T (J gather(v)) )

which is two small batched einsums + a scatter per factor type — O(total
residual size) per iteration.  The preconditioner is the inverse of the
3x3 block diagonal of H (one batched closed-form inverse).  Gauge fixing
projects the fixed dofs out of every matvec.

This is also the multi-chip-friendly formulation: with factors sharded over
a mesh axis, each CG iteration all-reduces one [3M] vector instead of a
dense [3M, 3M] Hessian.

The LM trust-region schedule matches solve/lm.py (Ceres defaults).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nautilus_tpu.solve.factors import (FactorGraph, _graph_factor_terms,
                                        total_cost, HIGHEST)
from nautilus_tpu.solve.lm import LMParams, LMResult, mean_step_metric


class CGParams(NamedTuple):
    max_iterations: int = 100
    tolerance: float = 1e-6     # relative-residual floor
    # Eisenstat–Walker forcing (choice 2): the inner solve only needs to be
    # as tight as the outer Newton step warrants, eta_k = gamma *
    # (|g_k| / |g_{k-1}|)^alpha, clamped to [tolerance, eta_max].  Early LM
    # steps then stop CG after a handful of iterations instead of grinding
    # to 1e-6 on a linearization that is about to be discarded.
    ew_gamma: float = 0.9
    ew_alpha: float = 1.6
    ew_eta_max: float = 0.1
    ew_enabled: bool = True


def _linearize(x, graph: FactorGraph):
    """Factor terms + gradient + 3x3 diagonal blocks + cost."""
    terms = _graph_factor_terms(x, graph)
    m = x.shape[0]
    g = jnp.zeros((3 * m,), x.dtype)
    diag = jnp.zeros((m, 3, 3), x.dtype)
    cost = jnp.zeros((), x.dtype)
    for r, J, dof in terms:
        gq = jnp.einsum("qmi,qm->qi", J, r, precision=HIGHEST)
        g = g.at[dof].add(gq)
        # 6x6 block, split into the two 3x3 diagonal sub-blocks.
        Hq = jnp.einsum("qmi,qmj->qij", J, J, precision=HIGHEST)
        pose_a = dof[:, 0] // 3
        pose_b = dof[:, 3] // 3
        diag = diag.at[pose_a].add(Hq[:, :3, :3])
        diag = diag.at[pose_b].add(Hq[:, 3:, 3:])
        cost = cost + 0.5 * jnp.sum(r * r)
    return terms, g, diag, cost


def _hvp(terms, v, n_dof):
    """H v without materializing H."""
    out = jnp.zeros((n_dof,), v.dtype)
    for r, J, dof in terms:
        v6 = v[dof]                                          # [Q, 6]
        w = jnp.einsum("qmi,qi->qm", J, v6, precision=HIGHEST)
        out6 = jnp.einsum("qmi,qm->qi", J, w, precision=HIGHEST)
        out = out.at[dof].add(out6)
    return out


def _inv3x3(blocks):
    """Batched closed-form 3x3 inverse with Tikhonov fallback."""
    blocks = blocks + 1e-10 * jnp.eye(3, dtype=blocks.dtype)
    a, b, c = blocks[:, 0, 0], blocks[:, 0, 1], blocks[:, 0, 2]
    d, e, f = blocks[:, 1, 0], blocks[:, 1, 1], blocks[:, 1, 2]
    g, h, i = blocks[:, 2, 0], blocks[:, 2, 1], blocks[:, 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    inv = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return inv / det[:, None, None]


def _cg(matvec, precond, b, n_iters, tol, x0=None):
    """Standard PCG; runs a fixed lax.while with residual tolerance.

    x0 warm-starts the iteration (the previous LM step is usually a good
    initial direction for the next one)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - (matvec(x) if x0 is not None else jnp.zeros_like(b))
    z = precond(r)
    p = z
    rz = jnp.dot(r, z, precision=HIGHEST)
    b_norm = jnp.sqrt(jnp.dot(b, b, precision=HIGHEST))

    def cond(state):
        x, r, p, z, rz, k = state
        rn = jnp.sqrt(jnp.maximum(jnp.dot(r, r, precision=HIGHEST), 0.0))
        return (k < n_iters) & (rn > tol * jnp.maximum(b_norm, 1e-30))

    def body(state):
        x, r, p, z, rz, k = state
        Ap = matvec(p)
        denom = jnp.dot(p, Ap, precision=HIGHEST)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.dot(r, z, precision=HIGHEST)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return (x, r, p, z, rz_new, k + 1)

    x, r, p, z, rz, k = jax.lax.while_loop(
        cond, body, (x, r, p, z, rz, jnp.asarray(0, jnp.int32)))
    return x


@functools.partial(jax.jit, static_argnames=("params", "cg_params",
                                             "layout"))
def lm_solve_cg(x0, graph: FactorGraph, fixed_dof,
                params: LMParams = LMParams(),
                cg_params: CGParams = CGParams(),
                band_graph: FactorGraph = None,
                layout=None) -> LMResult:
    """LM with matrix-free PCG inner solves.  Same contract as lm_solve.

    band_graph + layout (optional): the band-eligible SUBSET of the
    factor graph (in-window correspondences + in-window odometry —
    everything except the long-range loop closures that forced the CG
    path in the first place).  When given, the inner preconditioner is
    the damped block-band Cholesky of that subset instead of block
    Jacobi: H = Hband + (low-rank long-range part), so M^-1 H clusters
    all but a few eigenvalues at 1 and CG converges in a handful of
    iterations where block-Jacobi needed ~100 (tests/test_cg.py pins the
    iteration collapse).  One band factorization per inner solve,
    O(N w) — the same cost the pure band path pays per LM step.
    """
    m = x0.shape[0]
    n_dof = 3 * m
    dtype = x0.dtype
    free = (~fixed_dof).astype(dtype)
    use_band_precond = band_graph is not None and layout is not None

    def project(v):
        return v * free

    terms0, g0, diag0, cost0 = _linearize(x0, graph)

    def solve_damped(terms, g, diag, radius, dx_prev, eta, x):
        flat_diag = jnp.diagonal(diag, axis1=1, axis2=2).reshape(-1)
        d = jnp.clip(flat_diag, params.min_diagonal, params.max_diagonal)
        d = jnp.where(fixed_dof, 0.0, d) / radius

        def matvec(v):
            v = project(v)
            hv = _hvp(terms, v, n_dof) + d * v
            return project(hv)

        # Damped block-Jacobi blocks (the fallback preconditioner, and
        # the line-pose tail under the band preconditioner).
        damped_blocks = diag + jax.vmap(jnp.diag)(d.reshape(m, 3))
        inv_blocks = _inv3x3(damped_blocks)

        def precond_jacobi(v):
            v3 = project(v).reshape(m, 3)
            z = jnp.einsum("mij,mj->mi", inv_blocks, v3,
                           precision=HIGHEST)
            return project(z.reshape(-1))

        if use_band_precond:
            from nautilus_tpu.solve.band import (_apply_gauge_band,
                                                 band_apply_inverse,
                                                 band_factor)
            from nautilus_tpu.solve.factors import assemble_banded_system
            n_nodes = layout.n
            sys_band, _ = assemble_banded_system(x, band_graph, layout)
            sysg = _apply_gauge_band(sys_band, fixed_dof)
            # Same damped diagonal the matvec uses (full-H clipped diag):
            # the preconditioner then matches H exactly on the band.
            dsys = sysg._replace(
                diag=sysg.diag
                + jax.vmap(jnp.diag)(d[:3 * n_nodes].reshape(n_nodes, 3)))
            from nautilus_tpu.solve.band import resolve_band_plan
            s_pre, m_pre = resolve_band_plan(n_nodes, layout.w)
            fac = band_factor(dsys, s_pre, m_pre)

            def precond(v):
                v = project(v)
                zn = band_apply_inverse(
                    fac, v[:3 * n_nodes].reshape(n_nodes, 3)).reshape(-1)
                # Line-pose tail (HITL border slots): block Jacobi.
                zl = jnp.einsum(
                    "mij,mj->mi", inv_blocks[n_nodes:],
                    v[3 * n_nodes:].reshape(m - n_nodes, 3),
                    precision=HIGHEST).reshape(-1)
                return project(jnp.concatenate([zn, zl]))
        else:
            precond = precond_jacobi

        rhs = project(-g)
        dx = _cg(matvec, precond, rhs, cg_params.max_iterations,
                 eta, x0=project(dx_prev))
        return dx, d

    def forcing(g, g_prev_norm):
        """Eisenstat–Walker choice-2 inner tolerance for this LM step."""
        if not cg_params.ew_enabled:
            return jnp.asarray(cg_params.tolerance, dtype), g_prev_norm
        gn = jnp.sqrt(jnp.dot(project(g), project(g), precision=HIGHEST))
        eta = cg_params.ew_gamma * (gn / jnp.maximum(g_prev_norm, 1e-30)
                                    ) ** cg_params.ew_alpha
        # First iteration (g_prev_norm sentinel inf) starts loose.
        eta = jnp.where(jnp.isfinite(g_prev_norm), eta, cg_params.ew_eta_max)
        return jnp.clip(eta, cg_params.tolerance, cg_params.ew_eta_max), gn

    def cond(state):
        (x, terms, g, diag, cost, radius, divisor, it, done, dx_prev,
         g_prev_norm) = state
        return (~done) & (it < params.max_iterations) & (radius > params.min_radius)

    def body(state):
        (x, terms, g, diag, cost, radius, divisor, it, done, dx_prev,
         g_prev_norm) = state
        eta, g_norm = forcing(g, g_prev_norm)
        dx, d = solve_damped(terms, g, diag, radius, dx_prev, eta, x)
        x_new = x + dx.reshape(m, 3)
        new_cost = total_cost(x_new, graph)
        hdx = _hvp(terms, dx, n_dof)
        gg = project(g)
        model_decrease = -(jnp.dot(gg, dx, precision=HIGHEST)
                           + 0.5 * jnp.dot(dx, project(hdx) + d * dx,
                                           precision=HIGHEST))
        actual = cost - new_cost
        finite = jnp.all(jnp.isfinite(dx)) & jnp.isfinite(new_cost)
        rho = actual / jnp.maximum(model_decrease, 1e-30)
        accept = finite & (model_decrease > 0) & (rho > params.min_relative_decrease)
        grow = 1.0 / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        radius_new = jnp.where(accept,
                               jnp.minimum(radius * grow, params.max_radius),
                               radius / divisor)
        divisor_new = jnp.where(accept, 2.0, divisor * 2.0)

        def relinearize(xn):
            t, gn, dn, cn = _linearize(xn, graph)
            return t, gn, dn, cn

        terms2, g2, diag2, cost2 = jax.lax.cond(
            accept, relinearize, lambda _: (terms, g, diag, cost), x_new)
        x2 = jnp.where(accept, x_new, x)
        converged = accept & (jnp.abs(actual)
                              <= params.function_tolerance * cost)
        if params.step_tolerance > 0:
            # Same mean-step stop as the dense/band bodies
            # (accuracy_change_stop_threshold; lm.mean_step_metric).
            converged = converged | (accept & (mean_step_metric(dx, params)
                                               <= params.step_tolerance))
        # Warm-start the next CG from this step when accepted (the next
        # linearization is nearby); from zero after a rejection (the next
        # system is more heavily damped).
        dx_next = jnp.where(accept, dx, jnp.zeros_like(dx))
        # g (and thus the forcing ratio) only moves on accepted steps.
        g_norm_next = jnp.where(accept, g_norm, g_prev_norm)
        return (x2, terms2, g2, diag2, cost2, radius_new, divisor_new,
                it + 1, converged, dx_next, g_norm_next)

    init = (x0, terms0, g0, diag0, cost0,
            jnp.asarray(params.initial_radius, dtype),
            jnp.asarray(2.0, dtype), jnp.asarray(0, jnp.int32),
            jnp.asarray(False), jnp.zeros((n_dof,), dtype),
            jnp.asarray(jnp.inf, dtype))
    (x, terms, g, diag, cost, radius, divisor, it, done,
     _dx, _gn) = jax.lax.while_loop(cond, body, init)
    return LMResult(x=x, cost=cost, initial_cost=cost0, iterations=it,
                    converged=done)
