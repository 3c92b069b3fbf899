"""Packed-QKV fused attention: the layout-preserving Pallas kernel.

Replaces the reference's F.scaled_dot_product_attention hot loop
(/root/reference/src/open_clip/transformer.py:158-163) — but designed from
the TPU profile, not from the CUDA kernel's shape conventions.

Why packed?  A device profile of the CC3M train step (perfetto trace,
tools/ablate_bench.py config) showed attention costing 207 ms of the 392 ms
step while its matmul FLOPs justify ~15 ms.  The overhead was NOT the
softmax math: the [B,L,D]->[B,H,L,Dh] head-split transposes around XLA's
attention einsums force exotic activation layouts ({2,0,1}-major) that
propagate INTO the surrounding projection matmuls — the packed QKV
projection ran at 7 TF/s (20x below peak) and ~55 ms/step of pure `copy`
ops appeared.  Handing XLA a kernel that consumes the projection's natural
output — the packed row-major ``[B, L, 3*D]`` tensor — and emits row-major
``[B, L, D]`` breaks that layout-poisoning chain: every head slice is read
as a static 64-lane sub-window in VMEM, no HBM transpose ever exists, and
the projections regain their canonical fast layouts.

Kernel shape rules:
  - FORWARD: grid over (batch blocks, head groups).  q, k, v enter as
    three [blk, L, hg*dh] block views of the packed array (three in_specs
    whose index maps select the q/k/v third + head-group column), so the
    per-step VMEM working set is heads/hg times smaller than a whole-row
    slab.  That is a compile-time fix as much as a memory one: Mosaic's
    compile time explodes superlinearly with block working set (777s for
    one monolithic blk=8 all-heads kernel vs 2.9s for the head-grid shape
    at the same blk=8 on v5e).  Per head one [b,L,64]x[b,L,64] batched
    MXU matmul, f32 softmax in VMEM, one PV matmul, result written into
    the head's 64-lane slice of the output block.
  - BACKWARD: grid over batch blocks only (capped at 4 — the same Mosaic
    blowup applies), whole [b, L, 3D] slab resident; recomputes
    probabilities (flash-style) and writes the packed ``d(qkv)``
    [B, L, 3D] — handing the in-projection's backward matmuls the same
    clean layout.  (A head-grid backward would need three separate dq/dk/
    dv outputs plus an HBM concat per call; measured-not-worth-it.)
  - CLIP sequences are short (L in {197, 77, 37, 196, 50}); supported()
    bounds L by the blk=1 backward working set and routes oversized
    shapes to the XLA path.

The CSA segmentation variant and the cross-attention poolers keep the XLA
path (eval-only / tiny).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# supported head dims (static 64/128-lane slicing); all CLIP-family towers
# use 64 (width/heads: 768/12, 512/8, 1024/16)
_OK_DH = (64, 128)


def _causal_add(lq: int, lk: int):
    col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
    return jnp.where(col > row, NEG_INF, 0.0)[None]  # [1, Lq, Lk] f32


_QK_DN = (((2,), (2,)), ((0,), (0,)))   # [b,L,Dh]x[b,L,Dh] -> [b,Lq,Lk]
_PV_DN = (((2,), (1,)), ((0,), (0,)))   # [b,Lq,Lk]x[b,Lk,Dh] -> [b,Lq,Dh]
_TQ_DN = (((1,), (1,)), ((0,), (0,)))   # contract the Lq axis


def _softmax_rows(s: jax.Array) -> jax.Array:
    """Row softmax WITHOUT the per-row max reduction (trace-measured -17%
    on the fwd kernel: drops a [b,L,L] max-reduce + subtract pass).

    Softmax is shift-invariant, so skipping the subtraction is exact as
    long as exp() neither overflows nor yields an all-zero row:
      - overflow: f32 exp overflows past s=88; a min-clamp at 80 (one
        cheap elementwise op, no reduction) guards it.  CLIP attention
        logits are |s| < ~30 for healthy training; clamping only ever
        distorts rows whose softmax is already a one-hot.
      - underflow: rows with all s < -80 would give 0/0; the 1e-30
        denominator guard turns that into 0 (not NaN).  exp(-80)=1.8e-35
        is still a normal f32, so any s >= -80 row is exact.
    Masked entries arrive as s <= -1e30 and exp to exactly 0.

    Documented edge vs exact softmax: a row whose EVERY unmasked logit is
    below ~-88 (reachable only under catastrophic logit collapse, e.g. a
    diverging run) produces a zero output row and zero gradient for that
    query instead of a near-uniform distribution — detectable as a
    zero-norm attention output, never a NaN.  Training that needs exact
    softmax in that regime can force the XLA path (use_flash=False /
    omitting --use-flash-attention on CPU backends), which keeps the
    max-subtracted formulation.
    """
    e = jnp.exp(jnp.minimum(s, 80.0))
    return e / (jnp.sum(e, -1, keepdims=True) + 1e-30)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, hg, dh, scale, causal):
    """One (batch-block, head-group) grid step: hg heads of attention.

    q/k/v arrive as three [blk, L, hg*dh] BLOCK VIEWS of the same packed
    [B, L, 3D] array (three in_specs whose index maps pick the q-, k- and
    v-third plus the head-group column) — no slicing copy, no transpose,
    and the per-step VMEM working set is heads/hg times smaller than a
    whole-row block.  That working-set drop is what kills the Mosaic
    compile blowup: the monolithic all-heads kernel took 777s to compile
    at batch-block 8 on v5e; this shape takes 2.9s."""
    l = q_ref.shape[1]
    cmask = _causal_add(l, l) if causal else None
    for h in range(hg):
        q = q_ref[:, :, h * dh:(h + 1) * dh]
        k = k_ref[:, :, h * dh:(h + 1) * dh]
        v = v_ref[:, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, _QK_DN, preferred_element_type=jnp.float32
        ) * scale
        if cmask is not None:
            s = s + cmask
        p = _softmax_rows(s).astype(v.dtype)
        o = jax.lax.dot_general(p, v, _PV_DN,
                                preferred_element_type=jnp.float32)
        o_ref[:, :, h * dh:(h + 1) * dh] = o.astype(o_ref.dtype)


def _bwd_kernel_hg(q_ref, k_ref, v_ref, do_ref, o_ref, dk_s, dv_s, *,
                   hg, dh, scale, causal):
    """Head-grid backward: grid (batch-block, head-group, 3).

    The packed dqkv's q/k/v strips for a head group are NOT contiguous
    (they sit a D-column apart), so one output block can't cover all
    three — the objection that killed the head-grid backward in round 2.
    The fix: make the strip choice the FASTEST grid axis.  t=0 computes
    the whole head-group backward, writes dq to its output strip and
    stashes dk/dv in VMEM scratch (scratch persists across grid steps);
    t=1/t=2 are pure DMA-out steps that emit the stashed dk/dv to their
    strips.  The in_specs' index maps don't depend on t, so Pallas elides
    the input re-fetch for t=1/2 — input HBM traffic is unchanged.  A
    4-D [B, L, 3, D] block view would be cleaner but Mosaic can't retile
    the middle-axis squeeze at L=197/77/37 (sublane not 8-aligned;
    probed, 'infer-vector-layout: unsupported shape cast').

    Working set is heads/hg times smaller than the whole-slab backward,
    buying batch blocks 2-4x larger at the same compile-safe budget.
    """
    t = pl.program_id(2)
    l = q_ref.shape[1]
    cmask = _causal_add(l, l) if causal else None

    @pl.when(t == 0)
    def _compute():
        for h in range(hg):
            sl = slice(h * dh, (h + 1) * dh)
            q = q_ref[:, :, sl]
            k = k_ref[:, :, sl]
            v = v_ref[:, :, sl]
            do = do_ref[:, :, sl]
            s = jax.lax.dot_general(
                q, k, _QK_DN, preferred_element_type=jnp.float32
            ) * scale
            if cmask is not None:
                s = s + cmask
            p = _softmax_rows(s)
            pc = p.astype(v.dtype)
            dv = jax.lax.dot_general(pc, do, _TQ_DN,
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, _QK_DN,
                                     preferred_element_type=jnp.float32)
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))) * scale
            dsc = ds.astype(q.dtype)
            dq = jax.lax.dot_general(dsc, k, _PV_DN,
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(dsc, q, _TQ_DN,
                                     preferred_element_type=jnp.float32)
            o_ref[:, :, sl] = dq.astype(o_ref.dtype)
            dk_s[:, :, sl] = dk.astype(dk_s.dtype)
            dv_s[:, :, sl] = dv.astype(dv_s.dtype)

    @pl.when(t == 1)
    def _emit_dk():
        o_ref[...] = dk_s[...]

    @pl.when(t == 2)
    def _emit_dv():
        o_ref[...] = dv_s[...]


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, heads, dh, scale, causal):
    l = qkv_ref.shape[1]
    d = heads * dh
    cmask = _causal_add(l, l) if causal else None
    for h in range(heads):
        q = qkv_ref[:, :, h * dh:(h + 1) * dh]
        k = qkv_ref[:, :, d + h * dh:d + (h + 1) * dh]
        v = qkv_ref[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        do = do_ref[:, :, h * dh:(h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, _QK_DN, preferred_element_type=jnp.float32
        ) * scale
        if cmask is not None:
            s = s + cmask
        p = _softmax_rows(s)                              # [b, Lq, Lk] f32
        pc = p.astype(v.dtype)
        dv = jax.lax.dot_general(pc, do, _TQ_DN,
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, _QK_DN,
                                 preferred_element_type=jnp.float32)
        # masked positions have p == 0, so ds == 0 there automatically
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))) * scale
        dsc = ds.astype(q.dtype)
        dq = jax.lax.dot_general(dsc, k, _PV_DN,
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsc, q, _TQ_DN,
                                 preferred_element_type=jnp.float32)
        dqkv_ref[:, :, h * dh:(h + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, d + h * dh:d + (h + 1) * dh] = dk.astype(
            dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh] = dv.astype(
            dqkv_ref.dtype)


# v5e VMEM is far larger than Mosaic's default per-kernel limit; raising the
# limit lets the fwd kernel run batch-block 4 at the CLIP globals shape
# (trace-measured: fwd 0.377->0.356 ms, bwd 1.098->0.954 ms per
# [128,197,12x64] call)
_VMEM_LIMIT = 64 * 1024 * 1024

# Mosaic compile time explodes superlinearly in the per-grid-step VMEM
# working set, measured on v5e (jax 0.9): ~2s at 4MB, ~6s at 8MB, ~11s at
# 11.5MB, 777s (!) at 13.4MB.  Round 2 shipped a 13.4MB fwd block and paid
# a 25-minute driver warmup for a <2% runtime gain.  Blocks are therefore
# picked under a COMPILE-SAFE working-set budget, not a fixed batch count.
_COMPILE_SAFE_WS = 12 * 1024 * 1024


def _working_set(blk: int, l: int, d: int, dh: int, itemsize: int,
                 backward: bool) -> int:
    """VMEM bytes for one batch block (double-buffered in/out slabs +
    per-head f32 probability matrices + head slices of width dh)."""
    slabs = 3 * l * d + l * d            # qkv + out
    if backward:
        slabs += 3 * l * d + l * d       # dqkv + do
    varying = 2 * l * l * 4 + 6 * l * dh * itemsize  # p/dp f32 + slices
    return blk * (slabs * itemsize + varying)


def _pick_block(batch: int, l: int, d: int, dh: int, itemsize: int,
                backward: bool) -> int:
    """Largest compile-time-safe batch block (backward kernel only — the
    forward uses the head-grid scheme with _fwd_block)."""
    for b in (16, 8, 4, 2, 1):
        if batch % b:
            continue
        if _working_set(b, l, d, dh, itemsize, backward) <= _COMPILE_SAFE_WS:
            return b
    return 1


def supported(num_heads: int, d: int, l: Optional[int] = None,
              itemsize: int = 2) -> bool:
    """True when the kernel can handle this geometry.

    Head dim must be a full 64/128-lane slice, and (when the sequence
    length is known) even the blk=1 backward working set must fit the
    compile-safe VMEM budget — long-sequence configs (e.g. ~512px images,
    L >= ~1100 bf16, or f32 runs at roughly half that) would otherwise
    hit the Mosaic compile-time cliff instead of falling back to the XLA
    formulation.  ``itemsize`` is the input dtype's byte width: pass the
    real one (MultiheadAttention does) — assuming bf16 for an f32 run
    would pass the guard and then blow the budget the guard exists to
    enforce.  The bound matches _pick_block's _COMPILE_SAFE_WS so an
    accepted geometry always has a compliant block."""
    dh = d // num_heads
    if dh * num_heads != d or dh not in _OK_DH:
        return False
    if _head_group(num_heads, dh) == 0:
        return False
    if l is not None:
        if _working_set(1, l, d, dh, itemsize,
                        backward=True) > _COMPILE_SAFE_WS:
            return False
    return True


def _cost(b: int, l: int, d: int, heads: int, itemsize: int,
          backward: bool) -> pl.CostEstimate:
    """Advisory cost for the custom call: XLA's scheduler sees it, and
    compiled.cost_analysis() folds it into the module FLOPs total — so
    bench.py's MFU accounting includes the attention core instead of
    counting the kernel as 0 FLOPs.  Forward: QKᵀ + PV = 4·B·L²·D;
    backward additionally recomputes S and forms dV/dP/dQ/dK =
    10·B·L²·D.  Transcendentals: one exp per probability entry."""
    flops = (10 if backward else 4) * b * l * l * d
    io_arrays = 7 if backward else 4          # qkv(+do) in, d(qkv)/out out
    return pl.CostEstimate(
        flops=flops,
        bytes_accessed=io_arrays * b * l * d * itemsize,
        transcendentals=b * heads * l * l,
    )


def _resolve_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_attention_qkv(
    qkv: jax.Array,
    num_heads: int,
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """softmax(q kᵀ/√Dh) v over a packed [B, L, 3D] tensor -> [B, L, D].

    Thirds of the last axis are q|k|v; within each, head h occupies lanes
    [h*Dh, (h+1)*Dh) — exactly torch's in_proj packing (transformer.py:247).
    """
    return _fa_fwd(qkv, num_heads, causal, interpret)[0]


def _head_group(num_heads: int, dh: int) -> int:
    """Heads per forward grid step: the widest group whose lane width is a
    multiple of 128 (Mosaic's block constraint) and divides the head count.
    dh=64 -> 4 (or 2); dh=128 -> 2 (or 1)."""
    for hg in (4, 2, 1):
        if num_heads % hg == 0 and (hg * dh) % 128 == 0:
            return hg
    return 0


def _fwd_ws(blk: int, l: int, w: int, itemsize: int) -> int:
    """Per-grid-step VMEM bytes for the head-grid forward: three q/k/v
    block views + the out block + the f32 probability matrices."""
    return blk * (4 * l * w * itemsize + 2 * l * l * 4)


def _fwd_block(batch: int, l: int, w: int, itemsize: int) -> int:
    """Forward batch block for the head-grid kernel: the largest divisor
    of the batch whose working set stays compile-safe (≈10MB leaves
    double-buffer headroom).  Bigger blocks amortize per-grid-step DMA
    latency — blk=4 measured 6x slower than blk=8 at L=197, and short
    sequences (L=37/77) want far larger blocks still."""
    for b in (96, 64, 48, 32, 16, 8, 4, 2, 1):
        if batch % b:
            continue
        if _fwd_ws(b, l, w, itemsize) <= 10 * 1024 * 1024:
            return b
    return 1


def _batch_only_sharding(sharding, ndim: int = 3):
    """Strip any sequence/feature partitioning, keep the batch axes.

    The kernel is independent across batch rows but needs the WHOLE
    sequence and every head in VMEM — so the SPMD contract is 'shard dim
    0 however you like, replicate dims 1..'.  Under a (data, model) mesh
    the partitioner then all-gathers the model-sharded qkv columns in
    front of the kernel and re-slices afterwards, instead of refusing to
    partition the custom call (the round-3 use_flash=False guards)."""
    from jax.sharding import NamedSharding

    from jax.sharding import PartitionSpec as P

    spec = tuple(sharding.spec) if sharding.spec is not None else ()
    b0 = spec[0] if len(spec) > 0 else None
    return NamedSharding(sharding.mesh, P(*((b0,) + (None,) * (ndim - 1))))


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(num_heads: int, causal: bool, interpret: bool):
    """custom_partitioning wrapper for the forward kernel: batch-sharded,
    sequence/feature replicated (see _batch_only_sharding).  Works under
    plain jit, shard_map (inlined per-device) and GSPMD 2-D meshes —
    CPU-mesh equality tests in tests/test_tp.py."""
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(qkv):
        return _fwd_pallas(qkv, num_heads, causal, interpret)

    fn = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        return _batch_only_sharding(arg_shapes[0].sharding)

    def prop(mesh, user_shape):
        return _batch_only_sharding(user_shape.sharding)

    def part(mesh, arg_shapes, result_shape):
        sh = _batch_only_sharding(arg_shapes[0].sharding)
        return mesh, impl, sh, (sh,)

    fn.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        propagate_user_sharding=prop,
        # shardy rule: batch factor passes through; sequence and the
        # packed/unpacked feature axes must be replicated
        sharding_rule="b l i -> b l o",
        need_replication_factors=("l", "i", "o"),
    )
    return fn


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(num_heads: int, causal: bool, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning

    def impl(qkv, g_out):
        return _bwd_pallas(qkv, g_out, num_heads, causal, interpret)

    fn = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        return _batch_only_sharding(arg_shapes[0].sharding)

    def prop(mesh, user_shape):
        return _batch_only_sharding(user_shape.sharding)

    def part(mesh, arg_shapes, result_shape):
        sh = _batch_only_sharding(arg_shapes[0].sharding)
        return mesh, impl, sh, (sh, _batch_only_sharding(
            arg_shapes[1].sharding))

    fn.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        propagate_user_sharding=prop,
        sharding_rule="b l i, b l o -> b l i",
        need_replication_factors=("l", "i", "o"),
    )
    return fn


def _fa_fwd(qkv, num_heads, causal, interpret):
    b, l, d3 = qkv.shape
    d = d3 // 3
    if d3 != 3 * d or not supported(num_heads, d):
        # fail fast with the geometry instead of a ZeroDivisionError deep
        # in the grid math (supported() is advisory; the public entry
        # point must validate)
        raise ValueError(
            f"fused_attention_qkv: unsupported geometry last_dim={d3} "
            f"num_heads={num_heads} (need last_dim divisible by 3 and a "
            f"64/128 head dim; see ops.fused_attention.supported)"
        )
    interp = _resolve_interpret(interpret)
    out = _fwd_partitioned(num_heads, causal, interp)(qkv)
    return out, (qkv,)


def _fwd_pallas(qkv, num_heads, causal, interpret):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    hg = _head_group(num_heads, dh)
    ng = num_heads // hg
    w = hg * dh
    blk = _fwd_block(b, l, w, qkv.dtype.itemsize)
    spec_q = pl.BlockSpec((blk, l, w), lambda i, g: (i, 0, g),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((blk, l, w), lambda i, g: (i, 0, ng + g),
                          memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((blk, l, w), lambda i, g: (i, 0, 2 * ng + g),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, hg=hg, dh=dh,
                          scale=dh ** -0.5, causal=causal),
        grid=(b // blk, ng),
        in_specs=[spec_q, spec_k, spec_v],
        out_specs=pl.BlockSpec((blk, l, w), lambda i, g: (i, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
        interpret=_resolve_interpret(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=_cost(b, l, d, num_heads, qkv.dtype.itemsize,
                            backward=False),
    )(qkv, qkv, qkv)
    return out


# Head-grid backward toggle (see _bwd_kernel_hg).  OFF by default:
# measured 231.7 -> 223.5 img/s/chip on v5e (same-session A/B) despite
# bit-identical numerics — the 3x longer grid's per-step overhead and the
# serialized t=1/2 DMA-out steps cost more than the smaller working set
# saves.  The whole-slab backward's fewer, fatter grid steps win at CLIP
# sequence lengths.  Kept as a measured negative result and for
# long-sequence configs where the slab would not fit VMEM at blk=1.
BWD_HEAD_GRID: bool = False


def _bwd_hg_ws(blk: int, l: int, w: int, itemsize: int) -> int:
    """Per-grid-step VMEM bytes for the head-grid backward: qkv + dqkv
    blocks (3 strips of width w each), the do block, and the f32 p/dp
    probability matrices."""
    return blk * (7 * l * w * itemsize + 2 * l * l * 4)


def _bwd_hg_block(batch: int, l: int, w: int, itemsize: int) -> int:
    for b in (32, 16, 8, 4, 2, 1):
        if batch % b:
            continue
        if _bwd_hg_ws(b, l, w, itemsize) <= 10 * 1024 * 1024:
            return b
    return 1


def _bwd_pallas_hg(num_heads, causal, interpret, qkv, g_out):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    hg = _head_group(num_heads, dh)
    ng = num_heads // hg
    w = hg * dh
    blk = _bwd_hg_block(b, l, w, qkv.dtype.itemsize)
    spec_q = pl.BlockSpec((blk, l, w), lambda i, g, t: (i, 0, g),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((blk, l, w), lambda i, g, t: (i, 0, ng + g),
                          memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((blk, l, w), lambda i, g, t: (i, 0, 2 * ng + g),
                          memory_space=pltpu.VMEM)
    spec_do = pl.BlockSpec((blk, l, w), lambda i, g, t: (i, 0, g),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((blk, l, w), lambda i, g, t: (i, 0, t * ng + g),
                            memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel_hg, hg=hg, dh=dh,
                          scale=dh ** -0.5, causal=causal),
        grid=(b // blk, ng, 3),
        in_specs=[spec_q, spec_k, spec_v, spec_do],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((b, l, d3), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk, l, w), qkv.dtype),
            pltpu.VMEM((blk, l, w), qkv.dtype),
        ],
        interpret=_resolve_interpret(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=_cost(b, l, d, num_heads, qkv.dtype.itemsize,
                            backward=True),
    )(qkv, qkv, qkv, g_out)
    return dqkv


def _fa_bwd(num_heads, causal, interpret, res, g_out):
    (qkv,) = res
    interp = _resolve_interpret(interpret)
    dqkv = _bwd_partitioned(num_heads, causal, interp)(qkv, g_out)
    return (dqkv,)


def _bwd_pallas(qkv, g_out, num_heads, causal, interpret):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    if BWD_HEAD_GRID:
        return _bwd_pallas_hg(num_heads, causal, interpret, qkv, g_out)
    blk = _pick_block(b, l, d, dh, qkv.dtype.itemsize, backward=True)
    spec3 = pl.BlockSpec((blk, l, d3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((blk, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=num_heads, dh=dh,
                          scale=dh ** -0.5, causal=causal),
        grid=(b // blk,),
        in_specs=[spec3, spec1],
        out_specs=spec3,
        out_shape=jax.ShapeDtypeStruct((b, l, d3), qkv.dtype),
        interpret=_resolve_interpret(interpret),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=_cost(b, l, d, num_heads, qkv.dtype.itemsize,
                            backward=True),
    )(qkv, g_out)
    return dqkv


fused_attention_qkv.defvjp(_fa_fwd, _fa_bwd)
