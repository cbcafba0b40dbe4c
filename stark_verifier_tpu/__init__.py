"""stark_verifier_tpu — a TPU-native STARK (plonky2/FRI) proving and
verification framework.

Importing the package enables JAX's persistent compilation cache rooted in
the repository (.jax_cache) unless SVT_NO_CACHE is set: the verifier graphs
are large, and the cache makes their compilation a one-time cost per
machine/backend.
"""
import os as _os
from pathlib import Path as _Path


def _setup_cache():
    if _os.environ.get("SVT_NO_CACHE"):
        return
    try:
        import jax

        cache_dir = _Path(__file__).resolve().parent.parent / ".jax_cache"
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        try:
            jax.config.update("jax_persistent_cache_enable_xla_caches",
                              "all")
        except Exception:
            pass
    except Exception:
        pass


_setup_cache()
