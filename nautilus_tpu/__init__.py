"""nautilus_tpu — a TPU-native human-in-the-loop 2D lidar pose-graph SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ut-amrl/nautilus
(reference layout described in SURVEY.md).  The whole optimization is expressed
as pure functions over flat SE(2) pose arrays with fixed-shape (padded + masked)
factor arrays, jitted once and executed on TPU:

- Ceres Levenberg-Marquardt (reference src/optimization/solver.cc:266-356)
  becomes a JAX LM loop with dense/CG normal-equation solves (solve/lm.py).
- Per-point KD-tree correspondence search (reference src/util/kdtree.cc)
  becomes batched masked nearest-neighbor matching (solve/correspond.py).
- Correlative scan matching (reference third_party CSM, used at
  src/optimization/solver.cc:630-649) becomes 2D correlation kernels over
  rasterized lookup tables (kernels/csm.py, kernels/csm_pallas.py).
- ROS bag ingest (reference src/main.cc:46-129, src/input/) becomes a
  host-side bag-to-arrays layer with npz caching (ingest/).
- The Lua config surface (reference config/*.lua) is preserved verbatim via a
  small Lua-subset interpreter (core/luaconf.py).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: TPU compiles of the solver/CSM programs
# take tens of seconds; caching them across processes makes the CLI/bench
# start in seconds.  Set before jax reads its config (first jax import may
# already have happened via sitecustomize; jax also re-reads this config key
# lazily, so set both the env var and, if jax is loaded, the config).
#
# CPU-platform processes (the test suite and the multichip dryrun child
# both export JAX_PLATFORMS=cpu before jax initializes) get a subdirectory
# keyed by a CPU-feature fingerprint: XLA:CPU stores AOT artifacts
# specialized to the compile host's machine features, and loading them on a
# host with a different feature set is flagged as a potential SIGILL by
# cpu_aot_loader.  TPU-lane processes keep the shared directory so the
# relay-compiled solver/CSM programs stay warm across hosts.

_CACHE_BASE = _os.path.expanduser("~/.cache/jax_nautilus")


def _host_cache_key():
    """Key the CPU-lane cache by CPU flags + jaxlib version + XLA_FLAGS:
    XLA:CPU AOT artifacts are specialized to all three, and the round-4/5
    suite segfault traced to deserializing an entry produced under a
    different combination (same cpuinfo, different XLA tuning flags)."""
    import hashlib
    h = hashlib.sha1()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    h.update(line.encode())
                    break
    except Exception:
        import platform as _platform
        h.update((_platform.node() or "default").encode())
    try:
        import jaxlib
        h.update(getattr(jaxlib, "__version__", "?").encode())
    except Exception:
        pass
    h.update(_os.environ.get("XLA_FLAGS", "").encode())
    return h.hexdigest()[:10]


def _cache_dir():
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return _os.path.join(_CACHE_BASE, "cpu-" + _host_cache_key())
    return _CACHE_BASE


_cur = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cur is None or _cur == _CACHE_BASE or _cur.startswith(_CACHE_BASE + _os.sep):
    # Unset, or a value this module itself chose (possibly inherited from a
    # parent process on the other platform) — (re)derive for this process.
    _os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir()
try:  # pragma: no cover - depends on import order
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass

from nautilus_tpu.core.luaconf import load_config  # noqa: F401
from nautilus_tpu.core.problem import SLAMProblem, SLAMState  # noqa: F401
