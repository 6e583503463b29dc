#!/usr/bin/env python
"""Device-profile the GDC-scale fused solve + a CSM batch (VERDICT item 2).

Captures jax.profiler traces through the axon relay, parses the
trace.json.gz device track, and reports:
- device-busy time vs wall (how much of the scale-flat 1.3-2.8 s is
  actual compute vs dispatch/latency),
- top device ops by time,
- MFU estimates for the CSM coarse-correlation matmul (analytic FLOPs)
  and the dense-Cholesky LM solve.

Writes benchmarks/PROFILE.md.  Usage: python benchmarks/profile_solve.py
[--nodes 1000] [--beams 720] [--pairs 64]
"""

import argparse
import glob
import gzip
import json
import sys
import time
from collections import Counter
from pathlib import Path

import numpy as np

V5E_BF16_FLOPS = 394e12   # v5e peak bf16 MXU
V5E_F32_FLOPS = 197e12    # f32 (half MXU rate)


def analyze_trace(log_dir):
    """(device_busy_s, wall_span_s, top_ops [(name, s)]) from a trace dir."""
    paths = glob.glob(str(Path(log_dir) / "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return None
    data = json.loads(gzip.open(sorted(paths)[-1]).read())
    ev = data.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:TPU" in e["args"].get("name", "")}
    dur = Counter()
    t0, t1 = float("inf"), 0.0
    busy = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            d = e.get("dur", 0) / 1e6
            busy += d
            dur[e["name"]] += d
            ts = e.get("ts", 0) / 1e6
            t0, t1 = min(t0, ts), max(t1, ts + d)
    span = max(t1 - t0, 0.0) if t1 > t0 else 0.0
    return busy, span, dur.most_common(12)


def profile_region(tag, fn, log_root):
    """Run fn twice (warm) and profile the second run; return report dict."""
    from nautilus_tpu.utils.timer import profile_to
    fn()
    log_dir = str(Path(log_root) / tag)
    t0 = time.perf_counter()
    with profile_to(log_dir):
        fn()
    wall = time.perf_counter() - t0
    res = analyze_trace(log_dir)
    if res is None:
        return dict(tag=tag, wall=wall, busy=None, span=None, top=[])
    busy, span, top = res
    return dict(tag=tag, wall=wall, busy=busy, span=span, top=top)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1000)
    ap.add_argument("--beams", type=int, default=720)
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--log-root", default="/tmp/nautilus_prof")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import jax
    from nautilus_tpu.core.luaconf import load_config
    from nautilus_tpu.ingest.synthetic import make_problem
    from nautilus_tpu.solve.solver import Solver
    from nautilus_tpu.kernels.csm import CSMParams, csm_match_batch

    cfg = load_config(Path(__file__).resolve().parent.parent
                      / "config/default_config.lua")
    state, _ = make_problem(num_nodes=args.nodes, world_kind="building",
                            num_beams=args.beams, seed=1,
                            odom_noise_trans=0.02, odom_noise_rot=0.008)
    x0 = state.solution.copy()
    solver = Solver(state, cfg)

    def run_solve():
        state.solution = x0.copy()
        solver.solve_slam()

    pts, msk = state.problem.points, state.problem.points_mask
    ss = np.arange(args.pairs)
    tt = ss + 1
    csm_params = CSMParams()

    def run_csm():
        jax.block_until_ready(csm_match_batch(pts[ss], msk[ss], pts[tt],
                                              msk[tt], csm_params))

    reports = [profile_region("solve", run_solve, args.log_root),
               profile_region("csm", run_csm, args.log_root)]

    # --- analytic FLOP counts for MFU ---------------------------------------
    # Dense LM: per iteration one Cholesky factor+solve of M x M
    # (M = 3*nodes): ~M^3/3 + 2M^2 FLOPs, f32.
    M = 3 * args.nodes
    chol_flops = M ** 3 / 3 + 2 * M ** 2
    # CSM coarse correlation per pair: rotations x offsets^2 dot products of
    # the kernel table (see kernels/csm.py _correlate_matmul), bf16.
    k = csm_params.kernel_cells(csm_params.low_res)
    off = 2 * csm_params.offset_cells(csm_params.low_res) + 1
    n_rot = 66   # rotation_restriction=pi/2 at coarse angular step
    csm_flops_pair = 2.0 * n_rot * off * off * k * k

    lines = ["# Device profile (axon relay, TPU v5e)",
             "",
             f"Workload: fused growing-window solve at N={args.nodes}, "
             f"{args.beams}-beam scans; CSM batch of {args.pairs} pairs at "
             "reference params.",
             ""]
    for r in reports:
        lines.append(f"## {r['tag']}")
        lines.append("")
        if r["busy"] is None:
            lines.append("profile capture failed")
            continue
        busy_pct = 100 * r["busy"] / max(r["wall"], 1e-9)
        lines.append(f"- wall {r['wall']:.3f} s; device busy "
                     f"{r['busy']:.3f} s ({busy_pct:.1f}% of wall); device "
                     f"span {r['span']:.3f} s")
        lines.append("- top device ops:")
        for name, s in r["top"]:
            lines.append(f"    - {s * 1e3:8.2f} ms  {name[:90]}")
        lines.append("")
    out = Path(__file__).resolve().parent / "PROFILE.md"
    # Preserve the hand-written Analysis section across re-captures.
    analysis = ""
    if out.exists():
        prev = out.read_text()
        idx = prev.find("## Analysis")
        if idx >= 0:
            analysis = "\n" + prev[idx:]
    out.write_text("\n".join(lines) + "\n" + analysis)
    print("\n".join(lines))
    print(f"\nanalytic: dense Cholesky {chol_flops/1e9:.2f} GFLOP/iter; "
          f"CSM coarse {csm_flops_pair/1e9:.2f} GFLOP/pair")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
