"""Matrix-free PCG LM: agreement with the dense Cholesky path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nautilus_tpu.core.luaconf import load_config_text
from nautilus_tpu.ingest.synthetic import make_problem
from nautilus_tpu.solve.cg import CGParams, _hvp, _linearize, lm_solve_cg
from nautilus_tpu.solve.factors import assemble_normal_equations
from nautilus_tpu.solve.lm import fixed_pose_mask, lm_solve
from nautilus_tpu.solve.solver import Solver

CFG = """
translation_weight=1
rotation_weight=1
lidar_constraint_amount_min=1
lidar_constraint_amount_max=3
outlier_threshold=0.25
"""


@pytest.fixture(scope="module")
def setup():
    state, _ = make_problem(num_nodes=10, world_kind="room", num_beams=360,
                            seed=4, odom_noise_trans=0.02,
                            odom_noise_rot=0.01)
    cfg = load_config_text(CFG)
    solver = Solver(state, cfg)
    x = solver._current_x()
    graph = solver.build_graph(x, 3)
    return x, graph


def test_hvp_matches_dense(setup, rng):
    x, graph = setup
    H, g, cost = assemble_normal_equations(x, graph)
    terms, g2, diag, cost2 = _linearize(x, graph)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g), rtol=1e-4,
                               atol=1e-5)
    assert float(cost2) == pytest.approx(float(cost), rel=1e-5)
    v = jnp.asarray(rng.normal(size=g.shape), x.dtype)
    hv_dense = np.asarray(H @ v)
    hv_free = np.asarray(_hvp(terms, v, v.shape[0]))
    np.testing.assert_allclose(hv_free, hv_dense, rtol=1e-3, atol=1e-4)
    # Diagonal blocks match dense H.
    Hd = np.asarray(H)
    for p in range(x.shape[0]):
        np.testing.assert_allclose(np.asarray(diag)[p],
                                   Hd[3 * p:3 * p + 3, 3 * p:3 * p + 3],
                                   rtol=1e-4, atol=1e-5)


def test_cg_lm_matches_cholesky_lm(setup):
    x, graph = setup
    fixed = fixed_pose_mask(3 * x.shape[0])
    res_dense = lm_solve(x, graph, fixed)
    res_cg = lm_solve_cg(x, graph, fixed)
    assert float(res_cg.cost) == pytest.approx(float(res_dense.cost),
                                               rel=2e-3)
    np.testing.assert_allclose(np.asarray(res_cg.x), np.asarray(res_dense.x),
                               atol=1e-2)


def test_gauge_respected(setup):
    x, graph = setup
    fixed = fixed_pose_mask(3 * x.shape[0])
    res = lm_solve_cg(x, graph, fixed)
    np.testing.assert_allclose(np.asarray(res.x)[0], np.asarray(x)[0],
                               atol=1e-7)


def test_full_sweep_dense_vs_cg_agreement():
    """Whole growing-window solve through the Solver with each linear
    solver; final costs must agree (VERDICT r1 item 7 suite-scale anchor —
    the N=2000-5000 points live in benchmarks/LARGE_N.md)."""
    cfg = load_config_text(CFG)
    final = {}
    for kind in ("dense", "cg"):
        state, _ = make_problem(num_nodes=64, world_kind="building",
                                num_beams=240, seed=6,
                                odom_noise_trans=0.02, odom_noise_rot=0.008)
        solver = Solver(state, cfg, linear_solver=kind)
        stats = solver.solve_slam()
        final[kind] = stats.final_cost
    assert final["cg"] == pytest.approx(final["dense"], rel=5e-3)
