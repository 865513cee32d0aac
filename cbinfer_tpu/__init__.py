"""cbinfer_tpu: TPU-native change-based video CNN inference.

A from-scratch JAX/Pallas framework with the capabilities of
lukasc-ch/CBinfer (Cavigelli et al., arXiv 1704.04313 / 1808.05488):
for video from static cameras, each conv/pool layer recomputes only the
output pixels whose receptive field saw a frame-to-frame change beyond a
tunable per-layer threshold, reusing cached per-layer feature maps for
everything else. The per-pixel CUDA gather->GEMM->scatter pipeline of the
reference is reformulated TPU-first as tile-level block sparsity with
exact per-pixel change-detection semantics (see SURVEY.md and
ops/delta_conv.py).
"""

import os as _os

from .tpu_env import ensure_libtpu_flags as _ensure_libtpu_flags

_ensure_libtpu_flags()  # before any jax backend init (tpu_env doc)

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # Restore documented JAX behavior on boxes where a sitecustomize shim
    # registers an experimental TPU platform regardless of JAX_PLATFORMS
    # (observed: the env var is ignored once the shim runs, and device
    # enumeration then hangs indefinitely when the TPU tunnel is down).
    # Setting the config BEFORE the first device query is authoritative.
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

from . import config  # noqa: F401
from . import fileio  # noqa: F401  (numpy-only; real-footage readers)
from . import zoo     # noqa: F401  (registry only; models load lazily)

__version__ = "0.1.0"
