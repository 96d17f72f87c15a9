"""Persistent XLA compilation cache.

The TPU-native analog of the reference's generated-solver cache
(acados_cache/ keyed by config md5, campc_acados_opt.py:51-57 and
mpc_env_new.py:295-301): compiled XLA executables for the MPC/diffusion
programs persist across processes, keyed by HLO fingerprint, so a given
(config, shape) combination compiles once per machine.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "sicnav_tpu_xla")
_enabled = False


def enable_compilation_cache(cache_dir: str = None) -> str:
    global _enabled
    import jax
    d = cache_dir or os.environ.get("SICNAV_TPU_CACHE", _DEFAULT_DIR)
    if not _enabled:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _enabled = True
    return d
