"""Micro-bench: attention formulations at the CC3M bench shapes.

DEPRECATED METHODOLOGY WARNING: the lax.scan wall-clock harness here has
known floors that make small-op numbers unreliable — ~0.3-0.5ms per scan
iteration through the relay, carries that fit in VMEM never touch HBM,
and partially-consumed carries let XLA dead-code-eliminate work.  Use
device traces instead (tools/trace_step.py, or a scan under
jax.profiler.trace reading the per-op durations).  Kept for coarse
(>2ms/op) comparisons only; full-step bench.py is ground truth.

Usage: python tools/attn_micro.py [fwd|grad]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


SHAPES = {
    "globals": (128, 12, 197, 64),
    "locals": (384, 12, 37, 64),
    "text": (512, 8, 77, 64),
}


def xla_attn(q, k, v):
    from cosmos_tpu.models.attention import dot_product_attention

    return dot_product_attention(q, k, v)


def xla_attn_nohead_transpose(q, k, v):
    # q,k,v arrive [B,H,L,D]; re-express as [B,L,H,D] einsums
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
    return out.transpose(0, 2, 1, 3)


def bf16_softmax(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    m = jax.lax.stop_gradient(logits.max(axis=-1, keepdims=True))
    e = jnp.exp(logits - m)
    w = e / e.sum(axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def jnn_attn(q, k, v):
    # jax.nn.dot_product_attention expects [B, L, H, Dh]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = jax.nn.dot_product_attention(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


FNS = {
    "xla": xla_attn,
    "jnn": jnn_attn,
    "xla_blhd": xla_attn_nohead_transpose,
    "bf16sm": bf16_softmax,
}


SCAN_ITERS = 50


def time_fn(fn, args, iters=3):
    """One jit call runs SCAN_ITERS dependent iterations of fn — the
    relay's ~2ms per-call dispatch latency amortizes away and the chain
    prevents DCE/overlap tricks."""
    q, k, v = args

    def body(carry, _):
        out = fn(carry, k, v)
        # feed the output back in as q (same shape) to serialize iterations
        return out.astype(carry.dtype), ()

    @jax.jit
    def many(q):
        out, _ = jax.lax.scan(body, q, None, length=SCAN_ITERS)
        return jnp.sum(out.astype(jnp.float32))

    float(many(q))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = many(q)
    float(acc)
    return (time.perf_counter() - t0) / (iters * SCAN_ITERS)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    rng = np.random.default_rng(0)
    for sname, (b, h, l, dh) in SHAPES.items():
        q, k, v = (
            jnp.asarray(rng.normal(size=(b, h, l, dh)), jnp.bfloat16)
            for _ in range(3)
        )
        for fname, fn in FNS.items():
            if mode == "grad":
                f = jax.jit(jax.grad(
                    lambda q, k, v, fn=fn: jnp.sum(
                        fn(q, k, v).astype(jnp.float32) ** 2
                    ),
                    argnums=(0, 1, 2),
                ))

                def run(q, k, v, f=f):
                    return f(q, k, v)[0]
                dt = time_fn(run, (q, k, v))
            else:
                dt = time_fn(jax.jit(fn), (q, k, v))
            flops = 2 * b * h * l * l * dh * 2
            if mode == "grad":
                flops *= 3
            print(f"{sname:8s} {fname:10s} {mode}: {dt*1e3:7.2f} ms "
                  f"({flops/dt/1e12:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
