#!/usr/bin/env python
"""Config-ladder benchmark (BASELINE.md tracked scales).

Runs the full growing-window solve at each reference config scale on
synthetic worlds, TPU engine vs CPU reference (CPU skipped above a pose
budget unless --full-cpu).  Writes benchmarks/LADDER.md.

Usage: python benchmarks/ladder.py [--full-cpu] [--max-nodes N]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

LADDER = [
    ("synth", 30), ("lgrc", 350), ("multirobot", 450),
    ("airsim", 800), ("gdc_2020", 1000), ("jackal_2020", 1200),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full-cpu", action="store_true",
                    help="run the CPU reference at every scale")
    ap.add_argument("--max-nodes", type=int, default=1200)
    ap.add_argument("--cpu-cap", type=int, default=450,
                    help="largest scale to run the CPU reference at "
                         "(unless --full-cpu)")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from nautilus_tpu.core.luaconf import load_config
    from nautilus_tpu.ingest.synthetic import make_problem
    from nautilus_tpu.solve.solver import Solver
    from nautilus_tpu.baseline import cpu_reference as cpu

    cfg = load_config(Path(__file__).resolve().parent.parent
                      / "config/default_config.lua")
    rows = []
    for name, nodes in LADDER:
        if nodes > args.max_nodes:
            continue
        state, _ = make_problem(num_nodes=nodes, world_kind="building",
                                num_beams=720, seed=1,
                                odom_noise_trans=0.02, odom_noise_rot=0.008)
        x0 = state.solution.copy()
        solver = Solver(state, cfg)
        solver.solve_slam()                   # compile warm-up
        state.solution = x0.copy()
        t0 = time.perf_counter()
        stats = solver.solve_slam()
        tpu_s = time.perf_counter() - t0
        run_cpu = args.full_cpu or nodes <= args.cpu_cap
        if run_cpu:
            prob = cpu.CpuProblem.from_device_problem(state.problem)
            t0 = time.perf_counter()
            cpu.solve_slam(prob, x0, cfg)
            cpu_s = time.perf_counter() - t0
            speedup = f"{cpu_s / tpu_s:.1f}x"
            cpu_txt = f"{cpu_s:.1f}"
        else:
            cpu_txt, speedup = "—", "—"
        rows.append((name, nodes, f"{tpu_s:.2f}", cpu_txt, speedup,
                     f"{stats.final_cost:.2f}"))
        print(f"{name:12s} n={nodes:5d} tpu={tpu_s:7.2f}s cpu={cpu_txt:>8s} "
              f"speedup={speedup:>7s}")

    out = Path(__file__).resolve().parent / "LADDER.md"
    lines = ["# Config-ladder benchmark (synthetic building worlds)",
             "",
             "Full growing-window solve (windows 1-10, default config), "
             "TPU v5e engine vs f64 CPU reference engine.",
             "",
             "| scale | poses | TPU s | CPU s | speedup | final cost |",
             "|---|---|---|---|---|---|"]
    for r in rows:
        lines.append("| " + " | ".join(str(v) for v in r) + " |")
    # Preserve any hand-written narrative (## Notes and below).
    notes = ""
    if out.exists():
        prev = out.read_text()
        idx = prev.find("## Notes")
        if idx >= 0:
            notes = "\n" + prev[idx:]
    out.write_text("\n".join(lines) + "\n" + notes)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
