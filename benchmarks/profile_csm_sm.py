"""Device-profile the stage-major CSM batch: where do the 123 ms go?

Captures a jax.profiler trace of one warm 64-pair csm_match_batch_sm at
reference params and prints device-busy vs wall plus the top device ops.

Run on the real TPU: python benchmarks/profile_csm_sm.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from nautilus_tpu.ingest.synthetic import make_problem
from nautilus_tpu.kernels.csm import CSMParams, csm_match_batch_sm
from benchmarks.profile_solve import analyze_trace


def main():
    state, _ = make_problem(num_nodes=65, world_kind="office",
                            num_beams=180, seed=0, pad_multiple=128)
    pts = state.problem.points
    msk = state.problem.points_mask
    ss = np.arange(64)
    tt = ss + 1
    params = CSMParams()

    def run():
        return jax.block_until_ready(
            csm_match_batch_sm(pts[ss], msk[ss], pts[tt], msk[tt], params))

    run()  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    print(f"warm batch: {[f'{t*1e3:.1f}' for t in times]} ms")

    log_dir = "/tmp/csm_sm_profile"
    with jax.profiler.trace(log_dir):
        t0 = time.perf_counter()
        run()
        wall = time.perf_counter() - t0
    res = analyze_trace(log_dir)
    if res is None:
        print("no trace captured")
        return
    busy, span, top = res
    print(f"wall {wall*1e3:.1f} ms  device-busy {busy*1e3:.1f} ms "
          f"({100*busy/wall:.1f}% of wall)  device-span {span*1e3:.1f} ms")
    for name, s in top:
        print(f"  {s*1e3:8.2f} ms  {name}")


if __name__ == "__main__":
    main()
