"""Small shared utilities (reference open_clip/utils.py equivalents)."""

from __future__ import annotations

from itertools import repeat
from typing import Any, Iterable


def _ntuple(n):
    def parse(x):
        if isinstance(x, Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(repeat(x, n))

    return parse


to_1tuple = _ntuple(1)
to_2tuple = _ntuple(2)
to_3tuple = _ntuple(3)
to_4tuple = _ntuple(4)


def freeze_batch_stats(variables: dict) -> dict:
    """Equivalent of freeze_batch_norm_2d (utils.py:9): in flax, frozen BN
    means applying with use_running_average=True and never passing
    batch_stats as mutable — this helper just drops any batch_stats
    collection so apply() can't update it."""
    return {k: v for k, v in variables.items() if k != "batch_stats"}


def count_params(tree: Any) -> int:
    import jax

    return sum(x.size for x in jax.tree.leaves(tree))


def convert_weights_to_lp(params: Any, dtype=None) -> Any:
    """Cast floating-point params to a low-precision dtype (reference
    model.py:523-573 convert_weights_to_lp; the per-module CUDA special
    cases don't apply — a param pytree casts uniformly).  Exact-match
    layers the reference keeps in f32 (LayerNorm, logit_scale) should
    instead use the framework's standard policy: keep params f32 and set
    the COMPUTE dtype via precision='bf16' at create_model."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float16
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def convert_weights_to_fp16(params: Any) -> Any:
    """Alias kept for open_clip API parity (model.py:576)."""
    import jax.numpy as jnp

    return convert_weights_to_lp(params, jnp.float16)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache.

    The reference pays zero compile time (eager CUDA kernels); under XLA the
    first compile of the COSMOS train step is minutes of one-time work per
    (model, shape) config.  The persistent cache makes that a once-per-machine
    cost: every later process start (pod restart, eval re-entry, bench rerun)
    deserializes the executable in seconds.

    Default cache location is ``$JAX_COMPILATION_CACHE_DIR`` or
    ``<repo>/.jax_cache`` (gitignored).  Returns the directory used.
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(repo, ".jax_cache")
        if not os.access(repo, os.W_OK):
            # pip-installed into read-only site-packages: fall back to a
            # user cache instead of crashing at startup (or silently
            # polluting site-packages on writable installs)
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "cosmos_tpu", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache regardless of executable size; Mosaic kernels are small but slow
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # the partitionable fused-attention kernel (ops/fused_attention.py)
    # registers jax.experimental.custom_partitioning callbacks, and the
    # serialized module embeds their PYTHON POINTER — a fresh value every
    # process, which silently turns every cross-process cache lookup into
    # a miss (warmup regressed 56s -> ~900s when the wrapper landed).
    # The callbacks are compile-time-only (SPMD propagation), so stripping
    # them from the key is sound; the cached executable needs no pointer.
    jax.config.update("jax_remove_custom_partitioning_ptr_from_cache_key",
                      True)
    _stabilize_mosaic_cache_key()
    return cache_dir


_MOSAIC_KEY_PATCHED = False


def _stabilize_mosaic_cache_key() -> None:
    """Strip debug locations from Mosaic (Pallas) kernel payloads so the
    persistent-cache key is call-site independent.

    The cache key canonicalizes the StableHLO module with a
    strip-debuginfo pass, but a ``tpu_custom_call``'s backend_config
    embeds the SERIALIZED MOSAIC MODULE — including ``loc()`` info for
    every kernel op, which under jax's default
    include_full_tracebacks_in_locations carries the whole Python call
    stack (entry-script path + line numbers).  Any edit that shifts a
    line, or a different entry point (pytest vs bench.py vs -c), changes
    those bytes and silently misses the cache even though the program is
    identical — measured as the r4 warmup regression (56s -> 389s: every
    driver bench recompiled a 296 MB executable).  Verified by
    byte-diffing the canonicalized key IR of two processes: the ONLY
    difference was the entry-script path inside the 36 kernel payloads.

    The fix runs strip-debuginfo on (a clone of) the Mosaic module right
    before mosaic-serde serializes it.  Locations in the payload exist
    for kernel-compile diagnostics only — the compiled executable is
    unaffected."""
    global _MOSAIC_KEY_PATCHED
    if _MOSAIC_KEY_PATCHED:
        return
    try:
        from jax._src import tpu_custom_call as _tcc
        from jax._src.lib.mlir import passmanager as _pm
    except ImportError:  # pallas/tpu internals moved: fall back gracefully
        return

    _orig = _tcc._lower_mosaic_module_to_asm

    def _stripped(module, **kw):
        try:
            # in place: this module exists to be serialized right here,
            # and its locations feed diagnostics only
            strip_module_locations(module)
        except Exception:   # diagnostics-only path: never block lowering
            pass
        return _orig(module, **kw)

    _stripped.__wrapped__ = _orig
    _tcc._lower_mosaic_module_to_asm = _stripped
    _MOSAIC_KEY_PATCHED = True


def strip_module_locations(module) -> None:
    """Run MLIR's strip-debuginfo pass on ``module`` in place, removing
    every ``loc()`` (file paths, line numbers, call stacks)."""
    from jax._src.lib.mlir import passmanager as _pm

    with module.context:
        _pm.PassManager.parse(
            "builtin.module(strip-debuginfo)").run(module.operation)
