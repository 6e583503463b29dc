"""Device-profile the N=20000 band solve: assembly vs factorization split.

ROUND_NOTES r3 backlog: at large N the per-iteration cost is dominated by
banded assembly (linearization + contiguous band accumulation), with the
block-tridiagonal scan second (the opt-in cyclic-reduction backend gains
~9%/iter at N=20000).  This captures a jax.profiler trace of ONE warm LM
window step at large N and prints device-busy plus the top device ops, so
optimization effort goes where the time actually is.

Run on the real TPU:  python benchmarks/profile_large_n.py [--nodes 20000]
(problem build is ~220 s of host raycast at N=20000; use --nodes 5000 for
a faster probe with the same program structure).
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from benchmarks.profile_solve import analyze_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=5000)
    ap.add_argument("--beams", type=int, default=360)
    args = ap.parse_args()

    from nautilus_tpu.core.luaconf import load_config
    from nautilus_tpu.ingest.synthetic import make_problem
    from nautilus_tpu.solve.solver import Solver

    cfg = load_config("/root/repo/config/default_config.lua")
    t0 = time.perf_counter()
    state, _ = make_problem(num_nodes=args.nodes, world_kind="building",
                            num_beams=args.beams, seed=1,
                            odom_noise_trans=0.02, odom_noise_rot=0.008)
    print(f"problem build: {time.perf_counter()-t0:.0f}s")

    solver = Solver(state, cfg)
    t0 = time.perf_counter()
    solver.solve_slam()                       # warm: compiles + full sweep
    print(f"warm sweep: {time.perf_counter()-t0:.1f}s")

    # Profile a second full sweep (programs now cached; the trace shows the
    # steady-state per-iteration device mix).
    log_dir = "/tmp/large_n_profile"
    with jax.profiler.trace(log_dir):
        t0 = time.perf_counter()
        solver.solve_slam()
        wall = time.perf_counter() - t0
    res = analyze_trace(log_dir)
    if res is None:
        print("no trace captured")
        return
    busy, span, top = res
    print(f"wall {wall:.2f} s  device-busy {busy:.2f} s "
          f"({100*busy/wall:.1f}% of wall)  device-span {span:.2f} s")
    for name, s in top:
        print(f"  {s*1e3:9.1f} ms  {name}")


if __name__ == "__main__":
    main()
