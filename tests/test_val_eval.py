"""Val-split contrastive loss eval: WdsValLoader + evaluate_on_split."""

import io
import json
import tarfile

import numpy as np
from PIL import Image

from cosmos_tpu.data.loader import WdsValLoader
from cosmos_tpu.models.factory import create_model
from cosmos_tpu.training.evaluate import evaluate_on_split


def _make_val_shard(path, n):
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{i:05d}"
            img = Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
            b = io.BytesIO()
            img.save(b, format="JPEG")
            data = b.getvalue()
            ti = tarfile.TarInfo(f"{key}.jpg")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
            txt = f"caption number {i}".encode()
            tj = tarfile.TarInfo(f"{key}.txt")
            tj.size = len(txt)
            tf.addfile(tj, io.BytesIO(txt))
    return str(path)


def test_val_loader_and_eval(tmp_path):
    shard = _make_val_shard(tmp_path / "val.tar", 10)
    loader = WdsValLoader([shard], batch_size=4, image_size=32,
                          context_length=16)
    batches = list(loader)
    assert sum(b[0].shape[0] for b in batches) == 10
    assert batches[0][0].shape == (4, 32, 32, 3)
    assert batches[0][1].shape == (4, 16)

    model, params = create_model("ViT-Tiny-Test")
    metrics = evaluate_on_split(model, params, loader, keyword="val")
    assert "val_clip_val_loss" in metrics
    assert np.isfinite(metrics["val_clip_val_loss"])
    assert metrics["val_num_samples"] == 10
    assert "val_image_to_text_R@1" in metrics


def test_val_eval_jit_cached(tmp_path):
    """A second evaluate_on_split on the same model reuses the cached jitted
    feature fn (no fresh @jax.jit closure -> no recompile each
    --val-frequency epoch)."""
    from cosmos_tpu.training import evaluate as ev

    shard = _make_val_shard(tmp_path / "val.tar", 8)
    loader = WdsValLoader([shard], batch_size=4, image_size=32,
                          context_length=16)
    model, params = create_model("ViT-Tiny-Test")
    ev._ENCODER_CACHE.clear()
    evaluate_on_split(model, params, loader, keyword="a")
    fn1 = ev._ENCODER_CACHE[("val_feats", id(model))][1]  # (anchors, value)
    n1 = fn1._cache_size()
    evaluate_on_split(model, params, loader, keyword="b")
    fn2 = ev._ENCODER_CACHE[("val_feats", id(model))][1]
    assert fn1 is fn2
    assert fn2._cache_size() == n1  # same signatures -> zero new compiles


def test_host_local_params_reassembles_sharded_leaves(monkeypatch):
    """Multi-host rank-0 eval pulls params host-local: replicated leaves
    copy one shard, SHARDED leaves (2-D dp,tp meshes) reassemble from the
    addressable shards — feeding a bare addressable_data(0) slice of a
    TP-sharded kernel into eval would be silently wrong math."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cosmos_tpu.parallel.mesh import create_mesh
    from cosmos_tpu.training import evaluate as ev

    mesh = create_mesh()  # 8 virtual CPU devices
    full = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sharded = jax.device_put(
        jnp.asarray(full), NamedSharding(mesh, P("data", None)))
    replicated = jax.device_put(jnp.asarray(full), NamedSharding(mesh, P()))

    # pretend this is a 2-process run (all shards still addressable, the
    # layout parallel/tp.py prescribes: model axis within a host)
    monkeypatch.setattr(ev.jax, "process_count", lambda: 2)
    out = ev.host_local_params({"a": sharded, "b": replicated})
    np.testing.assert_array_equal(out["a"], full)
    np.testing.assert_array_equal(out["b"], full)
