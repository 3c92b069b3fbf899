"""Device-trace profiler for the CC3M bench step: where does step time go?

Runs the full train step under ``jax.profiler.trace`` and aggregates the
perfetto device-op durations into buckets (matmuls, attention kernels,
optimizer/EMA updates, LN/elementwise fusions, copies), attributing HLO
fusions via the op definitions embedded in the xplane proto.

This is the ONLY honest way to rank sub-step costs in this environment:
per-op micro-benchmarks are floored by ~2ms relay dispatch and ~0.3-0.5ms
per lax.scan iteration, and lax.scan carries that fit in VMEM (~128MB on
v5e) never touch HBM at all — numbers measured that way do not transfer
(see README "Round-2 perf campaign").

READ THE BUCKETS WITH CARE (round-3 post-mortem): XLA's kOutput fusions
EMBED the neighbouring matmuls — the "optimizer+dW" fusions contain the
89-GFLOP dW matmuls (~0.45 ms each ≈ MXU peak) and the "LN forward"
fusions contain the attention out-projections.  A fat "elementwise" or
"optimizer" bucket is therefore NOT evidence of slow elementwise code;
check a representative fusion's full def (the operands include the
weight tensors when a matmul is inside) before concluding anything.
What remains genuinely serial is the VPU epilogue inside those fusions,
which is not externally controllable.

Usage: python tools/trace_step.py [outdir]
"""

import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_and_trace(outdir: str):
    import jax
    from ablate_bench import build_step

    step_fn, state, batch, b, n_dev = build_step()
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / 10
    print(f"step {dt*1000:.1f} ms  ({b/dt/n_dev:.1f} img/s/chip)", flush=True)
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        for _ in range(3):
            state, metrics = step_fn(state, batch)
        float(metrics["loss"])


def parse(outdir: str, steps: int = 3):
    """Bucket device-op time using the HLO defs stored in the xplane pb."""
    xplane = glob.glob(f"{outdir}/plugins/profile/*/*.xplane.pb")[0]
    raw = open(xplane, "rb").read()
    defs = {}
    for m in re.finditer(
        rb"([a-z][a-z_\-.\d]{2,50}) = ([^\x00-\x1f]{10,700})", raw
    ):
        name = m.group(1).decode()
        if name not in defs:
            defs[name] = m.group(2).decode()[:650]

    trace = glob.glob(f"{outdir}/plugins/profile/*/perfetto_trace.json.gz")[0]
    with gzip.open(trace, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            key = (
                (e.get("pid"), e.get("tid"))
                if e["name"] == "thread_name"
                else (e.get("pid"), None)
            )
            names[key] = e["args"].get("name")
    dev_pids = {k[0] for k, v in names.items() if k[1] is None and v and "TPU" in v}

    def classify(name):
        d = defs.get(name, "")
        # order matters: an optimizer fusion usually CONTAINS the weight-grad
        # matmul (kind=kOutput) — classify by state refs first
        if "opt_state" in d or "mu__" in d:
            return "optimizer+dW-matmul"
        if "teacher_params" in d:
            return "teacher-EMA"
        if name.startswith("attn"):
            return "pallas-attention"
        if "custom-call" in d and "Mosaic" in d:
            return "pallas-attention"
        if "%convolution" in d or name.startswith("convolution"):
            return "matmul"
        if name.startswith(("copy", "slice", "concatenate", "dynamic")):
            return "copies/slices"
        if name.startswith("convert_reduce"):
            return "convert+reduce"
        if name.startswith("reduce"):
            return "reduce"
        # LN fwd fusions emit (stats..., normalized bf16)
        if re.search(r"\(f32\[\d+(,\d+)?\], f32\[\d+,\d+\]", d):
            return "layernorm-ish"
        return "elementwise/other"

    byrole = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        n = e.get("name", "?")
        if (
            n.startswith("jit_")
            or n.endswith(("-done", "-start"))
            or n in ("0", "1", "2", "while")
        ):
            continue
        r = classify(n)
        byrole[r] += e.get("dur", 0) / 1e3
        cnt[r] += 1
    total = sum(byrole.values())
    print(f"\ndevice-op total: {total/steps:.1f} ms/step")
    for r, ms in sorted(byrole.items(), key=lambda kv: -kv[1]):
        print(f"{ms/steps:9.2f} ms/step  x{cnt[r]//steps:<5} {r}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof_step"
    if not glob.glob(f"{outdir}/plugins/profile/*/*.xplane.pb"):
        run_and_trace(outdir)
    parse(outdir)
