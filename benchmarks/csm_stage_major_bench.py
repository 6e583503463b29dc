"""TPU timing: pair-major vs stage-major CSM batch engines.

Measures pairs/sec at reference matcher params (solver.cc:56 defaults)
on the same synthetic workload bench.py uses, sweeping the stage-major
(pair_chunk, rot_chunk) grid.  Decides whether csm_match_batch_sm
becomes the auto-LC default (ROUND_NOTES r2 backlog #4 restructure).

Run on the real TPU: python benchmarks/csm_stage_major_bench.py

Measured 2026-08-17 (v5e via relay, batch 64, reference params, warm):
  pair-major        292.8 pairs/s (218.6 ms)
  stage-major 4/32  468.7 pairs/s (136.5 ms)   <- production default (1.6x)
  stage-major 8/32, 4/64: relay compile exceeds 10 min (program too large
  for the remote-compile service); excluded from the default grid.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from nautilus_tpu.core.luaconf import load_config_text
from nautilus_tpu.ingest.synthetic import make_problem
from nautilus_tpu.kernels.csm import (CSMParams, csm_match_batch,
                                      csm_match_batch_sm)


def main():
    n_nodes = 65
    state, _ = make_problem(num_nodes=n_nodes, world_kind="office",
                            num_beams=180, seed=0, pad_multiple=128)
    pts = state.problem.points
    msk = state.problem.points_mask
    n_pairs = 64
    ss = np.arange(n_pairs)
    tt = ss + 1
    params = CSMParams()

    def bench(label, fn):
        res = fn()
        jax.block_until_ready(res)          # compile + warm
        t0 = time.perf_counter()
        res = fn()
        jax.block_until_ready(res)
        dt = time.perf_counter() - t0
        print(f"{label:28s}: {n_pairs / dt:7.1f} pairs/s  ({dt * 1e3:.1f} ms)")
        return res, n_pairs / dt

    ref, base_rate = bench(
        "pair-major",
        lambda: csm_match_batch(pts[ss], msk[ss], pts[tt], msk[tt], params))

    best = ("pair-major", base_rate)
    for pc in (2, 4):
        for rc in (16, 32):
            label = f"stage-major pc={pc} rc={rc}"
            out, rate = bench(
                label,
                lambda pc=pc, rc=rc: csm_match_batch_sm(
                    pts[ss], msk[ss], pts[tt], msk[tt], params,
                    pair_chunk=pc, rot_chunk=rc))
            np.testing.assert_allclose(np.asarray(out[0]),
                                       np.asarray(ref[0]), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(out[1]),
                                       np.asarray(ref[1]), atol=1e-6)
            if rate > best[1]:
                best = (label, rate)
    print(f"best: {best[0]} at {best[1]:.1f} pairs/s "
          f"({best[1] / base_rate:.2f}x pair-major)")


if __name__ == "__main__":
    main()
