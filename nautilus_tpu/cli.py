"""CLI driver — the reference's src/main.cc:164-215 without ROS.

Flow: flags -> Lua config -> bag replay (or synthetic world) -> preprocess
on device -> SLAMState -> optional solution reload -> solve -> command loop.

The reference's ROS-topic command surface (/hitl_slam_input, /write_output,
/vectorize_output, main.cc:204-209) maps to:
- ``--hitl_replay FILE``: a text file of line pairs
  (``ax ay ax2 ay2 bx by bx2 by2`` per line) applied sequentially, the
  BASELINE.json "HitlSlamInputMsg replay" workload;
- ``--write`` / ``--vectorize``: one-shot equivalents of the topics;
- ``--interactive``: a stdin loop accepting ``hitl <8 floats>``, ``write``,
  ``vectorize``, ``quit``.

Matching observed reference behavior: with --solution_poses the solution is
loaded first and the solve still runs (main.cc:189-201 calls SolveSLAM
unconditionally; it converges immediately from a solved state).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def build_state(cfg, args, verbose=True):
    from nautilus_tpu.core.preprocess import preprocess
    from nautilus_tpu.core.problem import (SLAMState, build_problem,
                                           resolve_solver_dtype)

    dtype = resolve_solver_dtype(cfg.get("solver_dtype", "float32"))

    if args.synthetic:
        from nautilus_tpu.ingest.synthetic import synthesize
        raw, _ = synthesize(num_nodes=cfg.get_int("pose_number"),
                            world_kind=args.synthetic,
                            seed=args.synthetic_seed)
        if verbose:
            print(f"Synthesized {raw.points.shape[0]} nodes "
                  f"({args.synthetic} world).")
    else:
        bag = Path(cfg.bag_path)
        if not bag.is_absolute():
            bag = Path.cwd() / bag
        if verbose:
            print(f"Loading bag file [{bag}] ...")
        from nautilus_tpu.ingest.cache import load_or_ingest
        raw = load_or_ingest(bag, cfg, verbose=verbose)
        if verbose:
            print(f"Captured {raw.points.shape[0]} nodes.")
    t0 = time.perf_counter()
    normals, pi, pm, ei, em, _ = preprocess(raw.points, raw.points_mask,
                                            config=cfg, as_numpy=False)
    problem = build_problem(raw, normals, pi, pm, ei, em, dtype=dtype)
    if verbose:
        print(f"Preprocessed (normals + features) in "
              f"{time.perf_counter() - t0:.2f}s.")
    return SLAMState.from_problem(problem, raw.timestamps)


def apply_hitl_line(solver, tokens, verbose=True):
    from nautilus_tpu.solve.hitl import HitlSlamInputMsg, hitl_callback
    vals = [float(t) for t in tokens]
    if len(vals) != 8:
        raise ValueError("hitl needs 8 floats: ax ay ax2 ay2 bx by bx2 by2")
    msg = HitlSlamInputMsg.from_points(vals[0:2], vals[2:4], vals[4:6],
                                       vals[6:8])
    hitl_callback(solver, msg, verbose=verbose)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nautilus_tpu")
    ap.add_argument("--config_file", required=True,
                    help="Lua config (same surface as the reference)")
    ap.add_argument("--solution_poses", default="",
                    help="pose file to load before solving")
    ap.add_argument("--synthetic", default="",
                    help="use a synthetic world (corner|room|office|building) "
                         "instead of the configured bag")
    ap.add_argument("--synthetic_seed", type=int, default=0)
    ap.add_argument("--hitl_replay", default="",
                    help="file of HITL line pairs to apply after the solve")
    ap.add_argument("--write", action="store_true",
                    help="write pose_output_file after solving")
    ap.add_argument("--vectorize", action="store_true",
                    help="write map_output_file after solving")
    ap.add_argument("--interactive", action="store_true",
                    help="stdin command loop (hitl/write/vectorize/quit)")
    ap.add_argument("--ros", action="store_true",
                    help="subscribe to the reference's command topics "
                         "(hitl_lc_topic, /write_output, /vectorize_output) "
                         "via rospy and spin (main.cc:204-213)")
    ap.add_argument("--devices", type=int, default=None,
                    help="run the solve factor-sharded over the first N "
                         "visible devices (overrides the mesh_devices "
                         "config key; 0/1 = single-device)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)
    verbose = not args.quiet

    from nautilus_tpu.core.luaconf import load_config, validate_config
    from nautilus_tpu.io.poses import load_solution, write_poses
    from nautilus_tpu.io.vectorize import vectorize
    from nautilus_tpu.solve.solver import Solver

    cfg = load_config(args.config_file)
    validate_config(cfg, require_bag=not args.synthetic)
    if not args.synthetic and not cfg.bag_path:
        print("Must specify an input bag!")
        return 1

    state = build_state(cfg, args, verbose=verbose)
    if args.solution_poses:
        if verbose:
            print("Loading solution poses.")
        load_solution(state, args.solution_poses, verbose=verbose)

    visualizer = None
    if args.ros:
        from nautilus_tpu.viz.visualizer import RosBridgeVisualizer
        visualizer = RosBridgeVisualizer()
        if not visualizer.available:
            print("--ros requested but rospy is not importable.")
            return 1
    # Multi-chip: --devices flag > mesh_devices config key.  N > 1 routes
    # the solve through the factor-sharded sweep (parallel/sharded.py) and
    # auto-LC's CSM batch over the pair dimension.
    mesh = None
    n_mesh = args.devices if args.devices is not None else int(
        cfg.get("mesh_devices", 0))
    if n_mesh > 1:
        import jax
        avail = len(jax.devices())
        if n_mesh > avail:
            print(f"--devices/mesh_devices={n_mesh} but only {avail} "
                  f"device(s) visible.")
            return 1
        from nautilus_tpu.parallel.sharded import default_mesh
        mesh = default_mesh(n_mesh)
        if verbose:
            print(f"Sharding the solve over {n_mesh} devices "
                  f"({jax.devices()[0].platform}).")

    solver = Solver(state, cfg, visualizer=visualizer,
                    linear_solver=cfg.get("linear_solver", "auto"),
                    assembly=cfg.get("assembly", None) or None,
                    mesh=mesh)
    t0 = time.perf_counter()
    stats = solver.solve_slam()
    if verbose:
        print(f"Solved {state.num_nodes} poses in "
              f"{time.perf_counter() - t0:.2f}s; final cost "
              f"{stats.final_cost:.4f}.")

    if args.interactive or args.ros:
        # Compile the HITL-shaped programs while waiting for the operator:
        # the first curation message then pays ~a warm solve instead of
        # the full XLA compile (solve/hitl.prewarm_hitl).
        import threading
        from nautilus_tpu.solve.hitl import prewarm_hitl

        def _prewarm():
            try:
                wall = prewarm_hitl(solver)
                if verbose:
                    print(f"(HITL programs prewarmed in {wall:.1f}s)")
            except Exception as e:  # never let prewarm kill the session
                if verbose:
                    print(f"(HITL prewarm failed: {e})")

        threading.Thread(target=_prewarm, daemon=True).start()

    if cfg.get("auto_lc", False):
        from nautilus_tpu.loop_closure.auto_lc import solve_auto_lc
        solve_auto_lc(solver, apply=True, verbose=verbose)

    if args.hitl_replay:
        for line in Path(args.hitl_replay).read_text().splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            apply_hitl_line(solver, line.split(), verbose=verbose)

    if args.write:
        write_poses(state, cfg.pose_output_file)
        if verbose:
            print(f"Wrote poses to {cfg.pose_output_file}")
    if args.vectorize:
        vectorize(state, cfg.map_output_file, verbose=verbose)

    if args.ros:
        from nautilus_tpu.viz.bridge import RosInputBridge
        bridge = RosInputBridge(solver, cfg, verbose=verbose)
        bridge.start()
        bridge.spin()
        return 0

    if args.interactive:
        if verbose:
            print("Waiting for Loop Closure input. Commands: "
                  "hitl <8 floats> | write | vectorize | quit")
        for raw_line in sys.stdin:
            tokens = raw_line.split()
            if not tokens:
                continue
            cmd = tokens[0].lower()
            try:
                if cmd == "quit":
                    break
                elif cmd == "hitl":
                    apply_hitl_line(solver, tokens[1:], verbose=verbose)
                elif cmd == "write":
                    write_poses(state, cfg.pose_output_file)
                    print(f"Wrote poses to {cfg.pose_output_file}")
                elif cmd == "vectorize":
                    vectorize(state, cfg.map_output_file, verbose=verbose)
                else:
                    print(f"Unknown command: {cmd}")
            except Exception as e:  # keep the loop alive on bad input
                print(f"Error: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
