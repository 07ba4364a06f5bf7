"""algp_tpu — TPU-native active-learning Gaussian-process framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
research codebase ``sumitsk/algp`` (active learning of GP field models with
informative path planning, AAMAS 2019; see SURVEY.md for the structural
blueprint).  The numerical core — Gram-matrix construction, Cholesky-based
posterior inference, marginal-likelihood fitting, and the greedy
entropy / mutual-information acquisition loops — runs on device as jitted
XLA programs and tiled Pallas kernels.  Host-side Python orchestrates the
field simulator, path planning, and episode loop, calling only jitted
device functions (BASELINE.json:5).

Layer map (mirrors SURVEY.md §1):
  L0  ops.linalg      — blocked Cholesky/solves, log-det, row-append factor
                        growth, batched log-depth triangular inversion
      ops.updates     — Pallas precision-column kernels (MI loop hot path)
      ops.pallas_chol — native blocked Cholesky (measured design-space map)
  L1  ops.kernels     — RBF / Matérn / composite spatial×feature kernels
      ops.gram        — tiled Pallas Gram kernels (HBM-resident output)
  L1b models.gp       — ExactGP state, MLL fitting (Adam / L-BFGS, vmap
                        restarts), multi-trait batched fitting
      models.networks — deep feature kernels (MLP embedding, joint MLL fit)
  L2  acquisition     — entropy & Krause-MI greedy selection, on-device loops;
                        implicit complement precision; fused replan program
  L3  planning        — row-graph construction + budgeted path enumeration (host)
  L4  episode         — active-sampling episode orchestration (host)
  env field           — row-structured field environment, noise modalities,
                        multi-trait tables
  par parallel        — DP×TP mesh sharding (GSPMD entropy, shard_map MI)
  L5  config          — typed dataclass configs, presets incl. the 5 baseline configs
  L6  cli             — command-line experiment driver
"""

__version__ = "0.1.0"

import jax as _jax

# TPU default lowers f32 matmuls to a single bf16 MXU pass (~8 relative
# decimal digits lost).  The GP stack's selection-fidelity contract
# (BASELINE.json:5 — bitwise-consistent greedy selections vs a f64 CPU
# oracle) needs true f32 accumulation everywhere, so the library forces
# HIGHEST as the default; individual kernels may locally opt back into
# bf16 where precision is provably irrelevant.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: remote compiles through this
# environment's TPU relay cost 30 s–5 min PER PROGRAM per process (a
# fresh benchmark process re-paid ~4 min of compiles); the on-disk cache
# turns warm-program cold starts into sub-second loads (measured
# 48.9 s → 0.53 s for a representative program).  Cache keys include the
# jax/XLA versions and every compile option, so hits are exact.  Opt out
# with ALGP_TPU_NO_COMPILE_CACHE=1; respects an explicit
# JAX_COMPILATION_CACHE_DIR.
import os as _os

if not _os.environ.get("ALGP_TPU_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/algp_tpu/xla"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except (OSError, AttributeError):  # read-only FS / older jax: no cache
        pass

from algp_tpu import config as config  # noqa: F401
