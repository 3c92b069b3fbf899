"""Headline benchmark: CC3M-recap COSMOS pretraining throughput per chip.

Reproduces the reference's CC3M training configuration
(/root/reference/src/train_cc3m.sh: ViT-B-16, per-device batch 64,
2 global crops @224 + 6 local crops @96, 8 sampled captions, AMP) as one
jitted train step on this host's TPU chip(s) and reports images/sec/chip
(counting batch samples per step, matching the reference's samples/s
accounting at train.py:268-270).

The reference publishes no throughput number; the baseline constant below
is a FLOPs-derived estimate of the reference's A100-40GB per-GPU rate:

  per-sample step cost (ViT-B/16, 2x224 + 6x96 crops, 8 captions):
    student fwd  ~ 2x35 + 6x6.6 + 8x5.8  = 156 GFLOP
    student bwd  ~ 2x fwd                 = 312 GFLOP
    teacher fwd  ~ 2x35 + 2x5.8           =  82 GFLOP
    total        ~ 550 GFLOP/sample  (~35 TFLOP per batch-64 step)
  A100 fp16/bf16 tensor-core peak 312 TFLOP/s; torch AMP with unfused
  SDPA-era kernels, per-crop-group Python loops and a host-side EMA
  parameter loop realistically sustains ~30-35% MFU on this workload
  => 94-109 TFLOP/s => ~170-200 images/sec/GPU.  Baseline set at the
  middle of that range.

Prints ONE JSON line.

``--input-pipeline`` switches to the end-to-end input-path variant: fresh
uint8 host batches (the loader wire format) are shard_batch'd every step,
so H2D + on-device normalize are inside the measurement; the JSON metric
name gains an ``_e2e_input`` suffix.  The default (no args — the driver
contract) remains the compute-only chip metric.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# FLOPs-derived estimate of the reference's A100-40GB per-GPU rate for the
# CC3M COSMOS config (not published; derivation in module docstring).
A100_BASELINE_IMG_PER_SEC_PER_DEV = 185.0

# bf16 dense peak TFLOP/s per chip by device kind (public spec sheets);
# the MFU denominator.  Unknown kinds report mfu=null rather than guess.
_PEAK_TFLOPS = (
    ("v5 lite", 197.0),   # TPU v5e
    ("v5litepod", 197.0),
    ("v6 lite", 918.0),   # Trillium
    ("v6e", 918.0),
    ("v5p", 459.0),
    ("v4", 275.0),
)


def _peak_tflops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for tag, peak in _PEAK_TFLOPS:
        if tag in kind:
            return peak
    return None


def _step_flops(step, state, batch) -> float | None:
    """Per-device FLOPs of one compiled train step, from XLA itself
    (cost_analysis(); the Pallas attention kernels contribute through
    their CostEstimate).  The roofline evidence behind the headline
    img/s — see README 'perf campaign'.  Accepts a jitted function or
    an already-compiled (AOT) executable."""
    import sys

    try:
        if hasattr(step, "lower"):          # jitted function
            ca = step.lower(state, batch).compile().cost_analysis()
        else:                               # jax.stages.Compiled
            ca = step.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as e:  # cost analysis is best-effort on new backends
        print(f"cost_analysis unavailable: {e!r}", file=sys.stderr)
        return None


def _aot_executable(step_fn, state, batch):
    """(callable, save_or_None): load a pickled serialized executable for
    this exact (config, shapes, backend), or AOT-compile now and hand
    back a post-warmup saver.

    The persistent compile cache already makes the XLA compile
    once-per-machine; this additionally skips the ~40s of per-process
    tracing/lowering/key-hashing.  Keyed by the flattened input avals +
    jax version + device kind + device count, so any config change
    recompiles; every failure path falls back to the ordinary jit call.
    """
    import hashlib
    import os
    import pickle
    import sys

    import jax
    from jax.experimental import serialize_executable as se

    args_flat, _ = jax.tree_util.tree_flatten(((state, batch), {}))
    avals = ",".join(f"{x.dtype}{x.shape}" for x in args_flat)
    dev = jax.devices()[0]
    # BENCH_TEXT_BUCKET changes the PROGRAM but not the input avals —
    # it must be part of the key or toggling it would reuse the wrong
    # executable (program-affecting knobs only; shape knobs like
    # BENCH_BATCH are already covered by avals).  So does ANY source
    # edit: the avals can't see the program, so the key folds in a
    # content hash of bench.py + the cosmos_tpu tree — an edited model
    # or train step auto-invalidates instead of silently benchmarking
    # the stale binary.
    knobs = os.environ.get("BENCH_TEXT_BUCKET", "32")
    src = hashlib.sha1()
    repo = os.path.dirname(os.path.abspath(__file__))
    files = [os.path.join(repo, "bench.py")]
    for root, _, names in sorted(os.walk(os.path.join(repo, "cosmos_tpu"))):
        files += [os.path.join(root, n) for n in sorted(names)
                  if n.endswith(".py")]
    for f in files:
        with open(f, "rb") as fh:
            src.update(fh.read())
    tag = hashlib.sha1("|".join([
        jax.__version__, getattr(dev, "device_kind", ""),
        str(jax.device_count()), avals, knobs, src.hexdigest(),
    ]).encode()).hexdigest()[:16]
    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return step_fn, None
    path = os.path.join(cache_dir, f"bench_aot_{tag}.pkl")

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                blob = pickle.load(f)
            compiled = se.deserialize_and_load(
                blob["payload"], blob["in_tree"], blob["out_tree"])
            print("AOT executable loaded (skipping trace+lower)",
                  file=sys.stderr)
            return compiled, None
        except Exception as e:
            print(f"AOT load failed ({e!r}); recompiling", file=sys.stderr)

    try:
        compiled = step_fn.lower(state, batch).compile()
    except Exception as e:
        print(f"AOT compile failed ({e!r}); plain jit call", file=sys.stderr)
        return step_fn, None

    def save():
        try:
            payload, in_tree, out_tree = se.serialize(compiled)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump({"payload": payload, "in_tree": in_tree,
                             "out_tree": out_tree}, f)
            os.replace(tmp, path)
            # superseded tags (old source/config) are dead weight at
            # ~1.2 GB each — keep only the freshest few
            import glob

            kept = sorted(glob.glob(os.path.join(cache_dir,
                                                 "bench_aot_*.pkl")),
                          key=os.path.getmtime, reverse=True)
            for stale in kept[3:]:
                os.unlink(stale)
            print(f"AOT executable saved "
                  f"({os.path.getsize(path) / 1e6:.0f} MB)", file=sys.stderr)
        except Exception as e:
            print(f"AOT save failed ({e!r})", file=sys.stderr)

    return compiled, save


def main() -> None:
    from cosmos_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from cosmos_tpu.models.factory import create_model
    from cosmos_tpu.parallel.mesh import create_mesh, shard_batch
    from cosmos_tpu.training.scheduler import cosine_lr, cosine_scheduler
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        make_train_step,
    )

    n_dev = len(jax.devices())
    mesh = create_mesh(n_dev)

    import os

    # length-bucketed text tower (--text-bucket 32): the 6 textcrop local
    # caption views are single sentences, so the shortest 3/4 of the
    # non-global views run at L=32 instead of padding to 77.
    # Mathematically exact (models/clip.py); BENCH_TEXT_BUCKET=0 for A/B.
    text_bucket = int(os.environ.get("BENCH_TEXT_BUCKET", "32"))
    model, params = create_model(
        "ViT-B-16",
        precision="bf16",
        cosmos=True,
        output_all=True,
        attentional_pool=True,
        add_zero_attn=True,
        act_approx=True,  # tanh GELU: pretraining benchmark (see --gelu-approx)
        text_bucket=text_bucket,
    )
    lr = cosine_lr(5e-4, 2000, 100000)
    optimizer = create_optimizer(
        lr, beta1=0.9, beta2=0.98, eps=1e-8, weight_decay=0.5
    )
    cfg = TrainStepConfig(
        cosmos=True,
        local_loss=True,
        momentum_teacher=0.999,
        fix_momentum=True,
        lr_schedule=lr,
        input_dtype=jnp.bfloat16,
    )
    step_fn = make_train_step(model, optimizer, mesh, cfg)
    state = create_train_state(params, optimizer, mesh)

    import sys
    b = int(os.environ.get("BENCH_BATCH", "64")) * n_dev
    # reference per-device batch is 64 (train_cc3m.sh:36); this framework is
    # free to pick its throughput-optimal per-chip batch — images/sec is what
    # the metric tracks.  Measured on v5e pre-bucket: B=32 -> 223,
    # B=48 -> 225.5, B=64 -> 220, B=80 -> ~120 (HBM cliff).  With the
    # length-bucketed text tower the remat'd cond branches free enough HBM
    # that B=64 becomes the sweet spot: B=48 -> 245.0, B=64 -> 255.3,
    # B=80 -> 242.0 img/s/chip (same session).
    rng = np.random.default_rng(0)

    def make_texts(size):
        """Synthetic captions with the CC3M-recap textcrop length profile
        (data/caption.py): views 0-1 are the long recap globals (EOT in
        the top quarter of the 77-token context), views 2+ are
        single-sentence locals (EOT at 8..24).  Token ids stay below the
        EOT id so argmax-EOT pooling sees real caption geometry — flat
        random tokens would put EOT anywhere and understate/overstate
        the bucketed tower on a workload that never occurs."""
        k_, b_, L = size
        toks = np.zeros(size, dtype=np.int32)
        toks[..., 0] = 49406                       # SOT
        eots = np.where(
            (np.arange(k_) < 2)[:, None],
            rng.integers(58, L, size=(k_, b_)),    # long recap globals
            rng.integers(8, 25, size=(k_, b_)),    # single-sentence locals
        )
        body = rng.integers(1, 49406, size=size)
        pos = np.arange(L)
        toks = np.where(pos < eots[..., None], np.where(pos == 0, toks, body), 0)
        np.put_along_axis(toks, eots[..., None], 49407, axis=-1)
        return toks.astype(np.int32)

    # --input-pipeline: measure the END-TO-END input path too — fresh
    # uint8 host batches (the loader's wire format) re-shard_batch'd every
    # step, so per-step H2D transfer + the fused on-device
    # (x/255 - mean)/std normalization are inside the timed region.
    # uint8 is 4x less H2D traffic than f32 — this is the training path.
    input_pipeline = "--input-pipeline" in sys.argv[1:]
    if input_pipeline:
        # a small pool of distinct pre-built host batches, cycled so the
        # relay can't cache a single transfer
        pool = []
        for s in range(4):
            pool.append({
                "global_images": rng.integers(
                    0, 256, size=(2, b, 224, 224, 3)).astype(np.uint8),
                "local_images": rng.integers(
                    0, 256, size=(6, b, 96, 96, 3)).astype(np.uint8),
                "texts": make_texts((8, b, 77)),
            })

        # depth-2 device prefetch (data/prefetch.py, --prefetch-depth):
        # a producer thread issues the next batches' shard_batch/H2D while
        # the current step runs — the training input path.
        # BENCH_PREFETCH=0 for the serialized A/B.
        prefetch_depth = int(os.environ.get("BENCH_PREFETCH", "2"))
        if prefetch_depth:
            import itertools

            from cosmos_tpu.data.prefetch import DevicePrefetcher

            src = (shard_batch(pool[j % len(pool)], mesh, batch_axis=1)
                   for j in itertools.count())
            pf = DevicePrefetcher(src, depth=prefetch_depth)

            def next_batch(i):
                return next(pf)
        else:
            def next_batch(i):
                return shard_batch(pool[i % len(pool)], mesh, batch_axis=1)
    else:
        batch = {
            "global_images": rng.normal(size=(2, b, 224, 224, 3)).astype(np.float32),
            "local_images": rng.normal(size=(6, b, 96, 96, 3)).astype(np.float32),
            "texts": make_texts((8, b, 77)),
        }
        batch = shard_batch(batch, mesh, batch_axis=1)

        def next_batch(i):
            return batch

    # warmup / compile.  NOTE: a scalar host readback (not
    # block_until_ready) is what forces completion through the PJRT
    # relay in this environment; the sequential state dependency chains
    # every step into the final loss value.
    #
    # AOT fast path: the persistent compile cache already skips the XLA
    # compile, but every process still pays ~40s tracing+lowering the
    # step and recomputing the cache key.  A pickled serialized
    # executable (jax.experimental.serialize_executable) skips all of
    # that: warm runs deserialize the binary and call it.  Keyed by the
    # full bench config + jax version + device kind; any failure falls
    # back to the ordinary jit call (which the persistent cache still
    # protects).
    t_compile = time.perf_counter()
    step_call, aot_save = _aot_executable(step_fn, state, next_batch(0))
    for i in range(3):
        state, metrics = step_call(state, next_batch(i))
    float(metrics["loss"])
    print(f"warmup(3 steps incl compile): {time.perf_counter()-t_compile:.1f}s",
          file=sys.stderr)
    if aot_save is not None:
        aot_save()   # persist AFTER warmup so it never inflates the metric

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_call(state, next_batch(i))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    img_per_sec_per_chip = b / dt / n_dev

    # roofline accounting: achieved TFLOP/s and MFU from the COMPILED
    # step's own cost analysis (per-device SPMD module = per-chip FLOPs)
    flops = _step_flops(step_call, state, next_batch(0))
    peak = _peak_tflops(jax.devices()[0])
    achieved = round(flops / dt / 1e12, 1) if flops else None
    mfu = (round(flops / dt / (peak * 1e12), 3)
           if flops and peak else None)

    record = {
        "metric": ("cc3m_pretrain_images_per_sec_per_chip_e2e_input"
                   if input_pipeline
                   else "cc3m_pretrain_images_per_sec_per_chip"),
        "value": round(img_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(
            img_per_sec_per_chip / A100_BASELINE_IMG_PER_SEC_PER_DEV, 3
        ),
        "step_tflops_per_chip": round(flops / 1e12, 2) if flops else None,
        "achieved_tflops_per_sec": achieved,
        "peak_tflops_per_sec": peak,
        "mfu": mfu,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
