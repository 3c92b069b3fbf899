"""Persistent-compile-cache key stability (round-5 regression guard).

The r4 warmup regression's root cause: Pallas kernels' serialized Mosaic
payloads embed MLIR ``loc()`` debug info carrying the Python call stack
(entry-script path + line numbers), which jax's cache-key
canonicalization (outer-module strip-debuginfo) never reaches — so the
key changed per entry point and per unrelated source edit, and every
process recompiled a 296 MB executable.  Guarded here:

  - ``strip_module_locations`` actually removes file/line locations from
    a lowered module (the mechanism).
  - ``enable_compilation_cache`` installs the Mosaic-serialization patch
    (the wiring) exactly once.

The full end-to-end proof (two processes with different entry scripts
hash the train step identically) needs the TPU backend and lives in the
bench/driver flow, byte-verified in round 5 — see README "Warmup
accounting".
"""

import jax
import jax.numpy as jnp

from cosmos_tpu import utils


def test_strip_module_locations_removes_file_lines():
    def f(x):
        return jnp.sin(x) * 2.0 + jnp.cos(x)

    lowered = jax.jit(f).lower(jnp.zeros((4,), jnp.float32))
    module = lowered._lowering.stablehlo()
    asm_before = module.operation.get_asm(enable_debug_info=True)
    assert "test_cache_key_stability.py" in asm_before

    utils.strip_module_locations(module)
    asm_after = module.operation.get_asm(enable_debug_info=True)
    assert "test_cache_key_stability.py" not in asm_after
    assert ".py" not in asm_after


def test_mosaic_serialization_patch_installed():
    utils.enable_compilation_cache()
    from jax._src import tpu_custom_call as tcc

    # the patch wraps the serializer and is idempotent
    assert hasattr(tcc._lower_mosaic_module_to_asm, "__wrapped__")
    before = tcc._lower_mosaic_module_to_asm
    utils.enable_compilation_cache()
    assert tcc._lower_mosaic_module_to_asm is before
