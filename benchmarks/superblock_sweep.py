"""Sweep the band solver's superblock size at large N.

The block-tridiagonal factorization + solves run as sequential lax.scans
over K = ceil(N/s) superblocks; at N=5000 the damped solve is ~30 ms
(benchmarks/attrib_large_n.py) and scales with scan DEPTH, not FLOPs —
each step's 3s x 3s Cholesky is tiny.  Larger s trades more parallel
work per step for fewer sequential steps.  This times
solve_damped_banded at several s on the real TPU.

Run: python benchmarks/superblock_sweep.py [--nodes 5000]
(reuses the problem cache written by attrib_large_n.py)
"""
import argparse
import pickle
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=5000)
    ap.add_argument("--beams", type=int, default=360)
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[16, 32, 64, 128])
    ap.add_argument("--methods", nargs="+", default=["scan", "cr"],
                    choices=["scan", "cr"],
                    help="factorization backends to A/B (verdict r3 #7: "
                         "sequential lax.scan vs block cyclic reduction)")
    args = ap.parse_args()

    from nautilus_tpu.core.luaconf import load_config
    from nautilus_tpu.ingest.synthetic import make_problem
    from nautilus_tpu.solve.solver import Solver
    from nautilus_tpu.solve.factors import assemble_banded_system
    from nautilus_tpu.solve.band import solve_damped_banded

    cfg = load_config("/root/repo/config/default_config.lua")
    cache = f"/tmp/attrib_problem_{args.nodes}_{args.beams}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            state = pickle.load(f)
    else:
        state, _ = make_problem(num_nodes=args.nodes, world_kind="building",
                                num_beams=args.beams, seed=1,
                                odom_noise_trans=0.02, odom_noise_rot=0.008)
        with open(cache, "wb") as f:
            pickle.dump(state, f)

    solver = Solver(state, cfg)
    w = cfg.get_int("lidar_constraint_amount_max")
    x = solver._current_x()
    fixed = solver._fixed_mask()
    graph = solver.build_graph(x, w, "feature", exclude_long_range=True)
    sys_, _ = jax.jit(
        lambda xx: assemble_banded_system(xx, graph, solver._layout))(x)
    jax.block_until_ready(sys_)
    radius = jnp.asarray(1e4, x.dtype)

    ref = None
    for s in args.sizes:
        for method in args.methods:
            slv = jax.jit(lambda q, s=s, m=method: solve_damped_banded(
                q, fixed, radius, solver.lm_params, superblock=s, method=m))
            out = jax.block_until_ready(slv(sys_))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(slv(sys_))
                best = min(best, time.perf_counter() - t0)
            dx = np.asarray(out[0])
            if ref is None:
                ref = dx
                err = 0.0
            else:
                err = float(np.max(np.abs(dx - ref)))
            print(f"s={s:4d} {method:>4s}: {best*1e3:7.1f} ms  "
                  f"max|dx - dx_ref| = {err:.2e}")


if __name__ == "__main__":
    main()
