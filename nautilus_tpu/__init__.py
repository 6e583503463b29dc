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
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/jax_nautilus"))
try:  # pragma: no cover - depends on import order
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass

from nautilus_tpu.core.luaconf import load_config  # noqa: F401
from nautilus_tpu.core.problem import SLAMProblem, SLAMState  # noqa: F401
