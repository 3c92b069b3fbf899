"""Host data-loader throughput vs worker count (synthetic shards).

Round-2 review flagged the loader's claimed linear worker scaling as
untested even synthetically — this tool measures it.  It builds
realistic synthetic tar shards (224px JPEGs + DreamLIP-style multi-
caption json), then times WdsTrainLoader end-to-end (tar streaming,
JPEG decode, multicrop augmentation, caption sampling, tokenize,
collate) at each worker count and reports multicrop samples/sec.

NOTE this dev container exposes ONE CPU core: numbers here show the
per-worker cost honestly but the scaling curve saturates immediately —
run on a production host (100+ vCPUs) for the real curve.  The worker
design shares nothing but the output queue, so scaling is
embarrassingly parallel until the queue or tar IO saturates.

Usage: python tools/bench_loader.py [n_images_per_shard] [seconds_per_run]
       [--workers 0,1,2,4] [--no-native]
"""

import io
import json
import os
import sys
import tarfile
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def build_shards(root: str, n_shards: int = 2, n: int = 64) -> list:
    rng = np.random.default_rng(0)
    urls = []
    for s in range(n_shards):
        path = os.path.join(root, f"bench-{s:04d}.tar")
        with tarfile.open(path, "w") as tf:
            for i in range(n):
                key = f"s{s}x{i:05d}"
                img = Image.fromarray(
                    rng.integers(0, 255, (224, 224, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=90)
                data = buf.getvalue()
                ti = tarfile.TarInfo(f"{key}.jpg")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
                meta = json.dumps({
                    "raw_caption": [f"a synthetic photo number {i}."],
                    "shortIB_captions": [f"short caption {i}."],
                    "longIB_captions": [
                        "one sentence. " * 5 for _ in range(2)],
                }).encode()
                tj = tarfile.TarInfo(f"{key}.json")
                tj.size = len(meta)
                tf.addfile(tj, io.BytesIO(meta))
        urls.append(path)
    return urls


def run(urls, workers: int, seconds: float, use_native: bool) -> float:
    from cosmos_tpu.data.loader import WdsTrainConfig, WdsTrainLoader

    cfg = WdsTrainConfig(
        urls=urls, batch_size=16, num_workers=workers, resampled=True,
        use_native_io=use_native, shuffle_buffer=64,
    )
    loader = WdsTrainLoader(cfg)
    it = iter(loader)
    next(it)                       # warm up workers / first shard open
    t0 = time.perf_counter()
    seen = 0
    while time.perf_counter() - t0 < seconds:
        batch = next(it)
        seen += batch["global_images"].shape[1]
    dt = time.perf_counter() - t0
    loader.shutdown()
    return seen / dt


def main():
    args = sys.argv[1:]
    use_native = "--no-native" not in args
    worker_counts = [0, 1, 2, 4]
    if "--workers" in args:
        i = args.index("--workers")
        worker_counts = [int(x) for x in args[i + 1].split(",")]
        args = args[:i] + args[i + 2:]
    args = [a for a in args if a != "--no-native"]
    n = int(args[0]) if len(args) > 0 else 64
    seconds = float(args[1]) if len(args) > 1 else 10.0

    with tempfile.TemporaryDirectory() as root:
        urls = build_shards(root, n_shards=2, n=n)
        results = {}
        for w in worker_counts:
            rate = run(urls, w, seconds, use_native)
            results[f"workers_{w}"] = round(rate, 1)
            print(f"workers={w}: {rate:.1f} multicrop samples/s",
                  file=sys.stderr)
        print(json.dumps({
            "metric": "loader_multicrop_samples_per_sec",
            "native_io": use_native,
            "host_cpus": os.cpu_count(),
            **results,
        }))


if __name__ == "__main__":
    main()
