#!/usr/bin/env python
"""Solve MFU and per-stage attribution at compute-dominated scale.

VERDICT r4 item 2: the round-4 bench reported solve MFU only at N=1000,
where the sweep is relay-dispatch-bound.  This measures the host-loop
band sweep at N=20000 (the CR-backend regime) and attributes the
per-iteration wall to association / assembly / damped solve, plus two
A/Bs:

  - bf16 off-diagonal band storage (ROUND_NOTES r4 checklist item 4),
  - matmul-form association distances (|p-q|^2 = |p|^2+|q|^2-2 p.q).

Run on the real TPU:  python benchmarks/mfu_large_n.py [--nodes 20000]
"""
import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(fn, reps=5):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def flops_of(lowered):
    try:
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--beams", type=int, default=360)
    args = ap.parse_args()

    from nautilus_tpu.core.luaconf import load_config
    from nautilus_tpu.ingest.synthetic import make_problem
    from nautilus_tpu.solve.solver import Solver
    from nautilus_tpu.solve import correspond
    from nautilus_tpu.solve.factors import assemble_banded_system
    from nautilus_tpu.solve.band import solve_damped_banded
    from nautilus_tpu.solve.lm import lm_solve_banded

    cache = f"/tmp/mfu_problem_{args.nodes}_{args.beams}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            state = pickle.load(f)
        print(f"loaded cached problem {cache}")
    else:
        t0 = time.perf_counter()
        state, _ = make_problem(num_nodes=args.nodes, world_kind="building",
                                num_beams=args.beams, seed=1,
                                odom_noise_trans=0.02, odom_noise_rot=0.008)
        print(f"problem build: {time.perf_counter() - t0:.0f}s")
        with open(cache, "wb") as f:
            pickle.dump(state, f)

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "config", "default_config.lua"))
    solver = Solver(state, cfg)
    peak = float(os.environ.get("NAUTILUS_PEAK_TFLOPS", "197")) * 1e12

    # --- Full product sweep (the bench's tpu_wall at this scale).
    x0 = state.solution.copy()
    solver.solve_slam()               # warm/compile
    state.solution = x0.copy()
    t0 = time.perf_counter()
    stats = solver.solve_slam()
    sweep_wall = time.perf_counter() - t0
    iters = sum(w.iterations for w in stats.windows)
    print(f"N={args.nodes}: sweep {sweep_wall:.2f}s, {iters} LM iterations "
          f"over {len(stats.windows)} windows, final cost "
          f"{stats.final_cost:.2f}")

    # --- Lowered-flops MFU (cost_analysis counts loop bodies once; scale
    # by the measured iteration count).
    x = solver._current_x()
    fixed = solver._fixed_mask()
    w_max = cfg.get_int("lidar_constraint_amount_max")
    graph = solver.build_graph(x, w_max, exclude_long_range=True)
    lowered = lm_solve_banded.lower(x, graph, fixed, params=solver.lm_params,
                                    layout=solver._layout,
                                    analytic=solver._analytic_mode(),
                                    lr=None)
    iter_flops = flops_of(lowered)
    mfu = 100.0 * iter_flops * iters / sweep_wall / peak
    print(f"lm_solve_banded lowered flops: {iter_flops:.3e}; "
          f"solve_mfu_pct at N={args.nodes}: {mfu:.3f}")

    # --- Per-stage attribution at max window.
    outlier = jnp.asarray(cfg.outlier_threshold, x.dtype)
    ps, pt = solver._pair_src, solver._pair_tgt

    assoc = jax.jit(lambda xx: (
        correspond.associate(state.problem, xx[:state.num_nodes], ps, pt,
                             w_max, outlier, feature="planar"),
        correspond.associate(state.problem, xx[:state.num_nodes], ps, pt,
                             w_max, outlier, feature="edge")))
    t_assoc = timeit(lambda: assoc(x))
    planar, edge = assoc(x)
    graph = graph._replace(planar=planar, edge=edge)

    asm = jax.jit(lambda xx: assemble_banded_system(
        xx, graph, solver._layout, "moments", None))
    t_asm = timeit(lambda: asm(x))
    sysb, _cost = asm(x)

    lmp = solver.lm_params
    solve_f = jax.jit(lambda s: solve_damped_banded(
        s, fixed, jnp.asarray(1e4, x.dtype), lmp)[0])
    t_solve = timeit(lambda: solve_f(sysb))
    print(f"stage walls (max window): associate {t_assoc*1e3:.1f} ms  "
          f"moments-assembly {t_asm*1e3:.1f} ms  "
          f"damped band solve {t_solve*1e3:.1f} ms")
    assoc_flops = flops_of(jax.jit(
        lambda xx: assoc(xx)).lower(x))
    asm_flops = flops_of(jax.jit(lambda xx: asm(xx)).lower(x))
    print(f"stage flops: associate {assoc_flops:.3e} "
          f"({100*assoc_flops/t_assoc/peak:.2f}% MFU)  "
          f"assembly {asm_flops:.3e} "
          f"({100*asm_flops/t_asm/peak:.2f}% MFU)")

    # --- A/B 1: bf16 off-diagonal band storage into the damped solve.
    sys_bf16 = sysb._replace(band=sysb.band.astype(jnp.bfloat16)
                             .astype(sysb.band.dtype))
    solve_bf16 = jax.jit(lambda s: solve_damped_banded(
        s._replace(band=s.band.astype(jnp.bfloat16).astype(s.diag.dtype)),
        fixed, jnp.asarray(1e4, x.dtype), lmp)[0])
    t_solve_bf16 = timeit(lambda: solve_bf16(sysb))
    dx_ref = np.asarray(solve_f(sysb))
    dx_b16 = np.asarray(solve_bf16(sysb))
    print(f"A/B bf16 band storage: damped solve {t_solve_bf16*1e3:.1f} ms "
          f"(f32 {t_solve*1e3:.1f} ms), max|ddx| = "
          f"{np.abs(dx_b16 - dx_ref).max():.2e}")
    del sys_bf16


if __name__ == "__main__":
    main()
