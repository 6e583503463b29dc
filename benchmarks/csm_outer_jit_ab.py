"""A/B: does the outer jit on csm_match_batch_sm help or hurt on TPU?

The stage-major engine's compiled unit is the lax.map/scan body either
way; the question is whether wrapping the surrounding reshapes/dispatch
in one jitted program helps (fewer dispatches) or hurts (the relay can
no longer pipeline the small host-side dispatches with device work).

Run on the real TPU: python benchmarks/csm_outer_jit_ab.py

Measured 2026-08-17 (v5e via relay, batch 64, reference params, warm,
best of 3): outer jit 518.2 pairs/s (123.5 ms) vs NO outer jit 36.2
pairs/s (1766 ms) — the eager reshapes/gathers around the lax.map each
pay the relay's per-dispatch floor.  The outer jit stays.  Rep-to-rep
variance under the jit was 123-184 ms: engine comparisons need
best-of-N, not single reps.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from nautilus_tpu.ingest.synthetic import make_problem
import nautilus_tpu.kernels.csm as csm


def main():
    state, _ = make_problem(num_nodes=65, world_kind="office",
                            num_beams=180, seed=0, pad_multiple=128)
    pts = state.problem.points
    msk = state.problem.points_mask
    n_pairs = 64
    ss = np.arange(n_pairs)
    tt = ss + 1
    params = csm.CSMParams()

    # The unjitted callable: csm_match_batch_sm's __wrapped__ if it is
    # decorated, else the function itself.
    fn = csm.csm_match_batch_sm
    raw = getattr(fn, "__wrapped__", fn)
    jitted = jax.jit(raw, static_argnames=("params", "pair_chunk",
                                           "rot_chunk"))

    def bench(label, f, reps=3):
        res = f()
        jax.block_until_ready(res)          # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = f()
            jax.block_until_ready(res)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{label:16s}: {n_pairs / dt:7.1f} pairs/s  ({dt * 1e3:.1f} ms)"
              f"  reps={[f'{t*1e3:.1f}' for t in times]}")
        return res

    a = bench("no outer jit", lambda: raw(pts[ss], msk[ss], pts[tt], msk[tt],
                                          params))
    b = bench("outer jit", lambda: jitted(pts[ss], msk[ss], pts[tt], msk[tt],
                                          params))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-5)
    print("scores identical")


if __name__ == "__main__":
    main()
