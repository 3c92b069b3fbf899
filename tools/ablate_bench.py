"""Ablation timing of the CC3M bench step: stub out one component at a
time to bound its share of the step.  Honest timing through the relay
requires a scalar readback (see bench.py).

Usage: python tools/ablate_bench.py [variant ...]
Variants: baseline noattn noln nomlp noteacher noopt nocross notext
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(**model_kwargs):
    import jax.numpy as jnp

    from cosmos_tpu.models.factory import create_model
    from cosmos_tpu.parallel.mesh import create_mesh, shard_batch
    from cosmos_tpu.training.scheduler import cosine_lr
    from cosmos_tpu.training.train import (
        TrainStepConfig,
        create_optimizer,
        create_train_state,
        make_train_step,
    )
    import jax

    n_dev = len(jax.devices())
    mesh = create_mesh(n_dev)
    model, params = create_model(
        "ViT-B-16", precision="bf16", cosmos=True, output_all=True,
        attentional_pool=True, add_zero_attn=True, act_approx=True,
        **model_kwargs,
    )
    lr = cosine_lr(5e-4, 2000, 100000)
    optimizer = create_optimizer(lr, beta1=0.9, beta2=0.98, eps=1e-8,
                                 weight_decay=0.5)
    cfg = TrainStepConfig(
        cosmos=True, local_loss=True, momentum_teacher=0.999,
        fix_momentum=True, lr_schedule=lr, input_dtype=jnp.bfloat16,
    )
    step_fn = make_train_step(model, optimizer, mesh, cfg)
    state = create_train_state(params, optimizer, mesh)
    b = int(os.environ.get("BENCH_BATCH", "48")) * n_dev
    rng = np.random.default_rng(0)
    batch = {
        "global_images": rng.normal(size=(2, b, 224, 224, 3)).astype(np.float32),
        "local_images": rng.normal(size=(6, b, 96, 96, 3)).astype(np.float32),
        "texts": rng.integers(1, 49407, size=(8, b, 77)).astype(np.int32),
    }
    return step_fn, state, shard_batch(batch, mesh, batch_axis=1), b, n_dev


def apply_variant(name: str):
    import jax.numpy as jnp

    if name == "baseline":
        return
    if name == "noattn":
        import cosmos_tpu.models.attention as att

        att.dot_product_attention = lambda q, k, v, mask=None: v
    elif name == "noln":
        import cosmos_tpu.models.layers as layers

        class _IdLN(layers.LayerNorm):
            @property
            def _id(self):
                return True

            def __call__(self, x):
                scale = self.param(
                    "scale", __import__("flax").linen.initializers.ones,
                    (x.shape[-1],), jnp.float32)
                bias = self.param(
                    "bias", __import__("flax").linen.initializers.zeros,
                    (x.shape[-1],), jnp.float32)
                return x * scale.astype(x.dtype) + bias.astype(x.dtype)

        layers.LayerNorm = _IdLN
        import cosmos_tpu.models.attention as att
        import cosmos_tpu.models.transformer as tr
        import cosmos_tpu.models.text as txt
        import cosmos_tpu.models.vit as vit

        att.LayerNorm = _IdLN
        tr.LayerNorm = _IdLN
        txt.LayerNorm = _IdLN
        vit.LayerNorm = _IdLN
    elif name == "nomlp":
        import cosmos_tpu.models.layers as layers
        import cosmos_tpu.models.transformer as tr

        class _IdMlp(layers.Mlp):
            def __call__(self, x):
                return x

        tr.Mlp = _IdMlp
    elif name == "noteacher":
        import cosmos_tpu.training.train as trn

        orig = trn.make_train_step

        # handled in train step via cfg? simplest: patch model.apply for
        # teacher calls is invasive; skip (kept for symmetry)
    elif name == "noopt":
        import optax

        import cosmos_tpu.training.train as trn

        trn.create_optimizer = lambda *a, **k: optax.sgd(1e-4)
    elif name == "notext":
        import cosmos_tpu.models.text as txtmod

        class _StubText(txtmod.TextTransformer):
            def __call__(self, text):
                x = self.token_embedding(text).astype(self.dtype)
                pooled = x.mean(axis=1)
                if self.proj_bias:
                    pooled = self.text_projection(pooled)
                else:
                    pooled = pooled @ self.text_projection.astype(pooled.dtype)
                return pooled, x

        import cosmos_tpu.models.clip as clipmod

        clipmod.TextTransformer = _StubText
    else:
        raise SystemExit(f"unknown variant {name}")


def main():
    variants = sys.argv[1:] or ["baseline"]
    assert len(variants) == 1, "one variant per process (import patching)"
    name = variants[0]
    model_kwargs = {}
    feature = {"flash": {"use_flash": True},
               "fuseln": {"fuse_ln": True},
               "remat": {"grad_checkpointing": True},
               "remat+flash": {"grad_checkpointing": True, "use_flash": True},
               "flash+fuseln": {"use_flash": True, "fuse_ln": True}}
    if name in feature:
        model_kwargs = feature[name]
    else:
        apply_variant(name)
    step_fn, state, batch, b, n_dev = build_step(**model_kwargs)
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    warm = time.perf_counter() - t0
    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"VARIANT {name}: {dt*1000:.1f} ms/step "
          f"({b/dt/n_dev:.1f} img/s/chip; warmup {warm:.0f}s)")


if __name__ == "__main__":
    main()
