"""Headline benchmark: fused ResNet-50 Collect + CLIP ViT-B/32 Embed.

Measures the reference's implied workload (BASELINE.md: one backbone forward
pass over the dataset with multi-layer top-k collection + one
foundation-model forward pass) — executed the TPU-native way: uint8 batches
upload once, are normalized on device, and feed BOTH models in a single fused
pass; the top-k state lives in HBM; embeddings come back in one readback.

Emission protocol (the driver records a bounded TAIL of stdout and parses the
LAST JSON line in it — rounds 3 and 4 lost their numbers to a timeout and to
a >2,000-char final line respectively, so BOTH constraints are load-bearing):

1. Every stdout line is a COMPACT headline (< 1,200 bytes, enforced by
   tests/test_bench_headline.py): metric/value/unit/vs_baseline plus the
   transport-independent trend fields. Full measurement detail goes to
   ``BENCH_DETAIL.json`` next to this file, never to stdout.
2. A static headline (carried trend fields flagged ``*_measured: false``)
   prints BEFORE any device work, then the TRANSPORT-FREE stages run first —
   the in-run sustained probe and the device-compute ceilings use
   device-generated pools, so even a dead tunnel (observed 0.01 MB/s — one
   4 MB upload once cost 570 s) records freshly measured trend fields.
3. The transport-bound end-to-end path follows: a bandwidth probe sizes a
   provisional slice (``provisional: true``), full-methodology repeats
   refine ``value`` via min(). Every stage is budget-gated and
   failure-isolated, and the headline is re-printed after each — last line
   wins; a driver kill at any point leaves the best number so far.
4. ``SL_BENCH_BUDGET_S`` (default 540 s) bounds total wall-clock.

The reference publishes no numbers (BASELINE.md: "this repo establishes the
number"), so ``vs_baseline`` is a MEASURED ratio against the reference's own
pipeline (its ActMaxCache hook machinery driving torch ResNet-50 + a torch
CLIP ViT-B/32 sweep, tools/ref_baseline.py) run on this host's only torch
device — the CPU. The ratio therefore folds in the TPU-vs-1-core-CPU hardware
gap, not just framework overheads; the detail dict labels it as such and
carries the raw baseline measurement. Baseline measurements are cached in
REF_BASELINE.json / SELF_BASELINE.json, which are COMMITTED: a driver
container whose host fingerprint matches pays nothing; a different host
re-measures (the host check stops a foreign cache from masquerading as a
local measurement).

Because the end-to-end number rides the host→device tunnel (observed 7–17
MB/s swings across rounds on identical code, docs/PERF_NOTES.md), the
stable, design-attributable rates are first-class headline fields the driver
can trend across rounds:
  - ``fused_compute_imgs_per_s`` — both networks chained on-device (ceiling)
  - ``sustained_imagenet_scale_imgs_per_s`` — device-resident sustained rate
    at the production batch size, MEASURED IN-RUN by a budget-gated probe
    (``sustained_measured: true``); when budget forces a skip the last chip
    measurement is carried with ``sustained_measured: false`` so a trend
    reader can tell a measurement from a memory.
  - ``mfu_pct`` — sustained rate × analytic model FLOPs/img vs the chip's
    bf16 peak (semanticlens_tpu/utils/flops.py).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from semanticlens_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
from semanticlens_tpu.utils.flops import mfu_pct, resnet_flops_per_image, vit_flops_per_image

_HERE = Path(__file__).resolve().parent
_REF_CACHE = _HERE / "REF_BASELINE.json"
_SELF_CACHE = _HERE / "SELF_BASELINE.json"
_DETAIL_PATH = _HERE / "BENCH_DETAIL.json"
_REF_N, _REF_BATCH = 64, 16

_START = time.perf_counter()
_BUDGET_S = float(os.environ.get("SL_BENCH_BUDGET_S", "540"))

# Fallback for the sustained trend field when the in-run probe is budget-
# skipped: the last full-scale chip measurement (tools/bench_imagenet_scale.py,
# 1,281,167 samples, batch-128 optimum, round 4: 224.6 s = 5,708.2 imgs/s,
# docs/PERF_NOTES.md). Emitted with ``sustained_measured: false`` so it can
# never masquerade as a fresh measurement.
_SUSTAINED_CARRIED = 5708.2
_SUSTAINED_CARRIED_FROM = "r4 full-scale run (tools/bench_imagenet_scale.py)"

# Same contract for the fused ceiling: carried only until the in-run ceiling
# stage overwrites it (``fused_measured: true``) — a process killed before
# the first device stage still trends the field, flagged as a memory.
_FUSED_CARRIED = 4916.0
_FUSED_CARRIED_FROM = "r5 chip run (8-batch scan chain, best of 3)"

# Analytic model FLOPs per image for MFU (multiply-add = 2 FLOPs; see
# semanticlens_tpu/utils/flops.py for the published-table parity tests).
MODEL_FLOPS_PER_IMG = resnet_flops_per_image(50, 224) + vit_flops_per_image(patch=32)

# Headline fields, in emission order. Everything else lives in the detail
# file — tests/test_bench_headline.py pins the compact-line contract.
HEADLINE_KEYS = (
    "metric",
    "value",
    "unit",
    "vs_baseline",
    "fused_compute_imgs_per_s",
    "fused_measured",
    "sustained_imagenet_scale_imgs_per_s",
    "sustained_measured",
    "mfu_pct",
    "model_flops_per_img",
    "provisional",
    "error",
    "detail_file",
)


def make_headline(result: dict) -> dict:
    """Project the full result onto the compact driver-facing headline.

    Pure so the size contract is unit-testable: the returned dict must
    serialize to < 1,200 bytes no matter how large ``result['detail']`` is.
    """
    headline = {}
    for key in HEADLINE_KEYS:
        if key in ("provisional", "error") and not result.get(key):
            continue  # only present when meaningful — keeps the line short
        if key == "detail_file":
            headline[key] = _DETAIL_PATH.name
            continue
        headline[key] = result.get(key)
    err = headline.get("error")
    if isinstance(err, str) and len(err) > 200:
        headline["error"] = err[:200]
    return headline


def _emit(result: dict) -> None:
    """Write the FULL result to BENCH_DETAIL.json; print the compact
    headline as one JSON line and flush — the driver takes the LAST
    parseable line of a bounded stdout tail, so each emission supersedes
    the previous and must stay far under the tail size."""
    try:
        _DETAIL_PATH.write_text(json.dumps(result, indent=1))
    except OSError:
        pass  # a read-only checkout must not cost the round
    print(json.dumps(make_headline(result)), flush=True)


def _remaining() -> float:
    return _BUDGET_S - (time.perf_counter() - _START)


def _host_id() -> str:
    """Per-machine cache key. Includes the hostname: 'x86_64-1cpu' alone
    would let a committed cache from ANY single-CPU x86 container masquerade
    as a local measurement (the hazard both baseline docstrings warn about)."""
    import platform

    return f"{platform.node()}-{platform.machine()}-{os.cpu_count()}cpu"


def _load_cached_baseline(path: Path, rate_key: str) -> dict | None:
    """Committed-or-local cache, accepted only when the host fingerprint
    matches this machine."""
    if not path.exists():
        return None
    try:
        cached = json.loads(path.read_text())
    except (json.JSONDecodeError, OSError):
        return None
    if (
        cached.get("n_images") == _REF_N
        and cached.get(rate_key, 0)
        and cached.get(rate_key, 0) > 0
        and cached.get("host") == _host_id()
    ):
        return cached
    return None


def _measure_baseline(tool_name: str, cache: Path, rate_key: str, timeout_s: float) -> dict:
    tool = _HERE / "tools" / tool_name
    proc = subprocess.run(
        [sys.executable, str(tool), "--n-images", str(_REF_N), "--batch", str(_REF_BATCH)],
        capture_output=True,
        text=True,
        timeout=timeout_s,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},  # baselines never need the TPU
    )
    if proc.returncode != 0:
        return {rate_key: None, "error": proc.stderr[-500:]}
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    result["host"] = _host_id()
    cache.write_text(json.dumps(result))
    return result


def measure_reference_baseline(budget_s: float) -> dict:
    """Measured reference-pipeline throughput on this host (committed cache
    hit is free; re-measured only when the host differs and budget allows)."""
    cached = _load_cached_baseline(_REF_CACHE, "ref_imgs_per_s")
    if cached is not None:
        return cached
    if budget_s < 60:
        return {"ref_imgs_per_s": None, "error": f"no cache for host {_host_id()}; budget too small"}
    try:
        return _measure_baseline("ref_baseline.py", _REF_CACHE, "ref_imgs_per_s", budget_s)
    except subprocess.TimeoutExpired:
        return {"ref_imgs_per_s": None, "error": "baseline measurement timed out"}


def measure_self_cpu_baseline(budget_s: float) -> dict:
    """THIS framework on the same CPU as the reference baseline (cached) —
    the like-for-like framework-vs-framework number. On one CPU core both
    pipelines are bound by their conv libraries (torch MKL vs XLA-CPU), so
    expect ~parity here; the headline ratio is hardware + design."""
    cached = _load_cached_baseline(_SELF_CACHE, "self_cpu_imgs_per_s")
    if cached is not None:
        return cached
    if budget_s < 60:
        return {"self_cpu_imgs_per_s": None, "error": f"no cache for host {_host_id()}; budget too small"}
    try:
        return _measure_baseline("self_baseline.py", _SELF_CACHE, "self_cpu_imgs_per_s", budget_s)
    except subprocess.TimeoutExpired:
        return {"self_cpu_imgs_per_s": None, "error": "baseline measurement timed out"}


def real_data_bench(engine, params, embed_fn, images: np.ndarray, batch: int) -> dict:
    """ImageFolder path: JPEGs on disk → decode → upload → fused pass.

    Attributes the wall time between host decode and the device pipeline by
    also timing a decode-only sweep (same iterator, no device work).
    """
    import tempfile

    from PIL import Image

    from semanticlens_tpu.data import ImageFolder, iter_batches

    n = images.shape[0]
    tmp = Path(tempfile.mkdtemp(prefix="bench-jpegs-"))
    for i in range(n):
        Image.fromarray(images[i]).save(tmp / f"img{i:05d}.jpg", quality=90)
    ds = ImageFolder(tmp, image_size=images.shape[1])
    # warm the decoder (first use may g++-build the native library) and the
    # page cache so neither sweep pays one-time costs
    ds.get_batch(0, min(batch, n))

    # decode-only sweep: host cost of the real-data path (best of 2 — the
    # first sweep can still pay page-cache/thread-pool ramp; see the
    # round-over-round decode trend in docs/PERF_NOTES.md)
    decode_s = math.inf
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in iter_batches(ds, batch):
            pass
        decode_s = min(decode_s, time.perf_counter() - t0)

    t0 = time.perf_counter()
    states, embeds, n_seen = engine.run_fused(params, ds, batch, embed_fn)
    np.asarray(states[next(iter(states))].values)
    e2e_s = time.perf_counter() - t0

    for f in tmp.iterdir():
        f.unlink()
    tmp.rmdir()

    bound = "decode" if decode_s > 0.7 * e2e_s else "device-pipeline"
    return {
        "n_images": n,
        "decode_imgs_per_s": round(n / decode_s, 1),
        "e2e_imgs_per_s": round(n_seen / e2e_s, 1),
        "decode_s": round(decode_s, 3),
        "e2e_s": round(e2e_s, 3),
        "bound": bound,
    }


def serving_latency_bench(fm, concept_db, n_req: int = 40) -> dict:
    """Warm text-search latency through the REAL HTTP serving path.

    Builds a SearchService over the just-computed concept DB (warmup
    compiles before timing), then times ``n_req`` sequential
    ``/text_search`` requests end-to-end (HTTP + tokenize + text tower +
    fused bank search). Reports p50/p95 so the serving-latency claim in
    docs/PERF_NOTES.md is reproduced by every driver run.
    """
    import urllib.parse
    import urllib.request

    from semanticlens_tpu.serve import SearchService, serve

    agg = {k: np.asarray(v, np.float32).mean(1) for k, v in concept_db.items()}
    service = SearchService(fm, agg)
    server, _ = serve(service, port=0, background=True)
    port = server.server_address[1]
    queries = ["dog", "striped pattern", "a red car", "sky at night"]
    lat = []
    try:
        for i in range(n_req):
            q = urllib.parse.quote(queries[i % len(queries)])
            t0 = time.perf_counter()
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/text_search?q={q}&k=5", timeout=120
            ) as r:
                r.read()
            lat.append((time.perf_counter() - t0) * 1e3)
    finally:
        server.shutdown()
        server.server_close()
    lat.sort()

    def nearest_rank(q):  # nearest-rank percentile: ceil(q*n)-th sorted sample
        return lat[max(0, math.ceil(q * len(lat)) - 1)]

    return {
        "n_requests": n_req,
        "p50_ms": round(nearest_rank(0.50), 1),
        "p95_ms": round(nearest_rank(0.95), 1),
        "max_ms": round(lat[-1], 1),
    }


def sustained_probe(
    engine, model_params, fm, image_size: int, *, batch: int, chain: int, n_programs: int
) -> dict:
    """Device-resident sustained rate at the production batch size — the
    in-run version of tools/bench_imagenet_scale.py (same fused program,
    donated state, pipelined dispatch, no per-step readback), sized to a
    bench-budget slice instead of the full 1.28M samples.

    The state dynamics match a real sweep after the top-k slots fill
    (~first program); only the pixels repeat (pool of distinct batches).
    The pool is GENERATED ON DEVICE (uint8 randint) — this stage must stay
    transport-free so a dead tunnel (observed 0.01 MB/s) still records the
    design-attributable trend fields; pixel statistics do not change the
    rate of a fixed-shape bf16 pipeline.
    """
    import functools

    s = image_size
    # one stacked (chain, batch, H, W, 3) pool, scanned inside the program —
    # vs the unrolled chain this compiles the step body ONCE, so the
    # executable is small enough for the committed .xla_cache and a fresh
    # driver container skips this compile entirely
    stacked = jax.jit(
        lambda k: jax.random.randint(k, (chain, batch, s, s, 3), 0, 255, jnp.uint8)
    )(jax.random.PRNGKey(1))
    np.asarray(stacked[:1, :1, :1, :1])  # sync generation out of the timed region
    n_latents = engine.infer_n_latents(model_params, (batch, s, s, 3), np.uint8)

    @functools.partial(jax.jit, donate_argnums=0)
    def program(states, params, fm_params, start, stacked):
        def body(carry, xb):
            st, i = carry
            ids = start + i * jnp.int32(batch) + jnp.arange(batch, dtype=jnp.int32)
            st = engine._local_step(st, params, xb, ids, jnp.ones((batch,), bool))
            emb = jnp.sum(fm._encode_image(fm_params, fm.preprocess(xb)))
            return (st, i + 1), emb

        (states, _), embs = jax.lax.scan(body, (states, jnp.int32(0)), stacked)
        return states, jnp.sum(embs)

    states = engine._init_states(n_latents)
    t_compile = time.perf_counter()
    states, acc = program(states, model_params, fm.params, jnp.int32(0), stacked)
    jax.block_until_ready(states[next(iter(states))].values)
    compile_s = time.perf_counter() - t_compile

    states = engine._init_states(n_latents)
    per_program = batch * chain
    t0 = time.perf_counter()
    for p in range(n_programs):
        states, acc = program(
            states, model_params, fm.params, jnp.int32(p * per_program), stacked
        )
    np.asarray(states[next(iter(states))].values)
    np.asarray(acc)
    wall = time.perf_counter() - t0
    return {
        "imgs_per_s": round(n_programs * per_program / wall, 1),
        "n_samples": n_programs * per_program,
        "wall_s": round(wall, 2),
        "compile_s": round(compile_s, 1),
        "batch": batch,
        "chain": chain,
        "method": "donated-state fused scan chain, pipelined dispatch, no per-step readback",
    }


N_IMAGES = 2048
# Batch 256 for the chained-ceiling + e2e stages: the chained best-of-3
# methodology pays a sync readback per repeat, which favors bigger batches
# (256 -> ~5.0k, 128 -> ~4.7k chained) and keeps fused_compute_imgs_per_s
# comparable across rounds. The PRODUCTION sustained optimum is batch 128
# (pipelined dispatches, no per-step readback): 5,708 imgs/s at full
# ImageNet scale (docs/PERF_NOTES.md round-4 batch sweep) — measured in-run
# by sustained_probe above at SUSTAINED_BATCH.
BATCH = 256
SUSTAINED_BATCH = 128
SUSTAINED_CHAIN = 8
SUSTAINED_PROGRAMS = 48  # 48 x 1024 imgs ~= 49k imgs ~= 9 s at 5.7k/s
IMAGE_SIZE = 224
N_COLLECT = 25
LAYERS = ("layer1", "layer2", "layer3", "layer4")


def main():
    from semanticlens_tpu.core import backend_reachable

    # a dead tunnel makes the first device call hang forever; a bench that
    # hangs is worse than a bench that reports failure
    if not backend_reachable():
        _emit({
            "metric": "fused_collect_embed_throughput",
            "value": 0,
            "unit": "imgs/s/chip",
            "vs_baseline": 0,
            "error": "accelerator backend unreachable (tunnel down); no measurement taken",
        })
        sys.exit(1)

    # A tunneled backend can also die MID-RUN (observed: FAILED_PRECONDITION
    # on a device→host copy between two healthy runs) or degrade to
    # <1 MB/s upload (observed: a 294 MB e2e pass stalling past a 620 s
    # budget). A crash or stall before the first emit must still leave a
    # parseable line — never silence — so the static fields go out BEFORE
    # any device work.
    device_kind = jax.devices()[0].device_kind
    result: dict = {
        "metric": "concept-DB build imgs/s/chip (fused ResNet-50 collect + CLIP ViT-B/32 embed)",
        "value": None,
        "unit": "imgs/s/chip",
        "vs_baseline": None,
        "fused_compute_imgs_per_s": _FUSED_CARRIED,
        "fused_measured": False,
        "sustained_imagenet_scale_imgs_per_s": _SUSTAINED_CARRIED,
        "sustained_measured": False,
        "mfu_pct": mfu_pct(_SUSTAINED_CARRIED, MODEL_FLOPS_PER_IMG, device_kind),
        "model_flops_per_img": MODEL_FLOPS_PER_IMG,
        "provisional": True,
        "detail": {},
    }
    _emit(result)
    try:
        _measured_main(result)
    except BaseException as e:  # noqa: BLE001 — emit, then re-raise
        result["error"] = f"{type(e).__name__}: {e}"
        _emit(result)
        raise


def _measured_main(result: dict):
    from semanticlens_tpu.core import enable_compilation_cache

    # default now points at the repo-committed .xla_cache/ — a fresh driver
    # container skips the ~4-minute XLA warm-up when the committed cache
    # matches its jax/libtpu build (docs/PERF_NOTES.md round 5)
    cache_dir = enable_compilation_cache()

    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.foundation_models.clip import OpenClip
    from semanticlens_tpu.models.resnet import ResNet

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(N_IMAGES, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.uint8)
    ds = ArrayDataset(images, name="bench-synthetic")

    model = ResNet(depth=50, num_classes=1000, dtype=jnp.bfloat16)
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "resnet50-bench"

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def model_preprocess(x):
        return (x.astype(jnp.float32) / 255.0 - mean) / std

    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    fm = OpenClip("ViT-B-32", dtype=jnp.bfloat16, seed=0)
    device_kind = jax.devices()[0].device_kind
    setup_s = time.perf_counter() - _START

    cv = ActivationComponentVisualizer(
        model=model,
        dataset_model=ds,
        dataset_fm=ds,  # same raw images → fused single pass
        layer_names=list(LAYERS),
        num_samples=N_COLLECT,
        aggregate_fn=aggregate_conv_mean,
        cache_dir=None,
        model_preprocess=model_preprocess,
    )

    def embed_fn(x):
        return fm.encode_image(fm.preprocess(x))

    # Baselines: committed caches are free; re-measurement deferred to the
    # extras phase below so the headline is never blocked on a subprocess.
    ref = _load_cached_baseline(_REF_CACHE, "ref_imgs_per_s") or {"ref_imgs_per_s": None}
    self_cpu = _load_cached_baseline(_SELF_CACHE, "self_cpu_imgs_per_s") or {
        "self_cpu_imgs_per_s": None
    }
    ref_rate = ref.get("ref_imgs_per_s")

    result["detail"].update({
            "baseline": {
                **ref,
                "note": (
                    "measured: reference pipeline (its ActMaxCache hooks, torch "
                    "ResNet-50 + CLIP ViT-B/32 two-sweep) on this host's only "
                    "torch device (CPU); ratio folds in TPU-vs-CPU hardware"
                ),
            },
            "backend": jax.default_backend(),
            "device_kind": device_kind,
            "n_images": N_IMAGES,
            "batch": BATCH,
            "layers": list(LAYERS),
            "n_collect": N_COLLECT,
            "uploaded_mb": round(images.nbytes / 2**20, 1),
            "budget_s": _BUDGET_S,
            "setup_s": round(setup_s, 1),
            "xla_cache_dir": cache_dir,
            "sustained_note": f"carried from {_SUSTAINED_CARRIED_FROM}",
            "mfu_note": (
                "mfu = sustained imgs/s x analytic model FLOPs/img (MAC=2) / "
                "chip bf16 peak; see semanticlens_tpu/utils/flops.py"
            ),
            "e2e_note": (
                "end-to-end value rides the host->device tunnel (0.5-17 MB/s "
                "observed variance across rounds on identical code); the "
                "fused_compute / sustained fields are the stable "
                "design-attributable rates"
            ),
    })

    def _set_value(imgs_per_s: float, provisional: bool) -> None:
        result["value"] = round(imgs_per_s, 2)
        result["provisional"] = provisional
        result["vs_baseline"] = round(imgs_per_s / ref_rate, 3) if ref_rate else None

    embed_fn_fused, embed_params = cv._fused_embed(fm)
    walls: list = []
    concept_db = None

    def e2e():
        # ---- Transport probe: one distinct-data upload (dedup-proof) sizes
        # the tunnel before any large transfer. Observed across rounds:
        # 0.01–17 MB/s on identical code — at the bottom of that range every
        # MB spent before the first e2e value is driver-budget risk (a 4 MB
        # probe once cost 570 s, hence the 512 KB size).
        nonlocal concept_db
        probe_kb = 512
        probe_arr = rng.integers(0, 255, size=(probe_kb << 10,), dtype=np.uint8)
        t0 = time.perf_counter()
        np.asarray(jax.jit(lambda a: a[:: 1 << 16].sum())(jax.device_put(probe_arr)))
        transport_mb_s = (probe_kb / 1024) / max(time.perf_counter() - t0, 1e-6)
        result["detail"]["transport_mb_s"] = round(transport_mb_s, 2)

        # ---- Provisional slice first: lands a measured value quickly even
        # when the tunnel is degraded (a full 294 MB pass stalls past whole
        # budgets), and compiles the EXACT program shapes the full repeats
        # use (same engine, same memoized embed_fn). Below ~3 MB/s a 2-batch
        # slice alone risks blowing half the budget (measured: 74 MB at
        # 0.26 MB/s = 280 s), so the slice shrinks to one batch.
        slice_batches = 1 if transport_mb_s < 3.0 else 2
        slice_n = slice_batches * BATCH
        slice_ds = ArrayDataset(images[:slice_n], name="bench-slice")

        def _slice_pass():
            t0 = time.perf_counter()
            s_states, s_embeds, _ = cv.engine.run_fused(
                model.params, slice_ds, BATCH, embed_fn_fused, embed_params=embed_params
            )
            np.asarray(s_states["layer4"].values), np.asarray(s_embeds)
            return time.perf_counter() - t0

        try:
            wall_slice = _slice_pass()
        except Exception as e:
            # observed once: a transient FAILED_PRECONDITION from the
            # tunneled backend between two healthy runs — retry once
            result["detail"]["e2e_slice_retry"] = f"{type(e).__name__}: {e}"[:200]
            time.sleep(5)
            wall_slice = _slice_pass()
        _set_value(slice_n / wall_slice, provisional=True)
        result["detail"]["provisional_slice"] = {
            "n_images": slice_n,
            "wall_s": round(wall_slice, 3),
            "includes_compile": True,
        }
        result["detail"]["time_to_first_value_s"] = round(time.perf_counter() - _START, 1)
        _emit(result)  # a measured e2e value is recorded — refinements follow

        # ---- Full-methodology repeats (N_IMAGES), transport permitting.
        # Transport on shared links is noisy with multi-x swings; compute is
        # deterministic — repeats refine via min(). The slice above compiled
        # everything, so a repeat is upload + compute only.
        est_full = wall_slice * N_IMAGES / slice_n  # pessimistic: slice paid compile
        for i in range(3):
            est = est_full if not walls else walls[-1]
            if _remaining() < 1.25 * est + 45:
                break
            try:
                t0 = time.perf_counter()
                concept_db = cv._compute_concept_db(fm, batch_size=BATCH)
                _force(concept_db)  # host materialization = honest e2e timing
            except Exception as e:
                result["detail"]["e2e_abort"] = f"repeat {i + 1}: {type(e).__name__}: {e}"[:200]
                break
            walls.append(time.perf_counter() - t0)
            _set_value(N_IMAGES / min(walls), provisional=False)
            result["detail"]["wall_s"] = [round(w, 3) for w in walls]
            if i == 0:
                result["detail"]["db_shapes"] = {
                    k: list(np.asarray(v).shape) for k, v in concept_db.items()
                }
            _emit(result)  # headline recorded — a kill now still leaves a number

    # ---- Stages: each budget-gated and failure-isolated ------------------
    def stage(name: str, min_budget_s: float, fn) -> None:
        trace = result["detail"].setdefault("stage_trace", {})
        if _remaining() < min_budget_s:
            result["detail"][name] = {"skipped": f"budget ({_remaining():.0f}s left)"}
            return
        # start marker emitted BEFORE the stage: a budget-kill mid-stage then
        # leaves the detail file naming the stage it died in (a 7-minute cold
        # ceiling compile once looked identical to a hung setup without this)
        trace[name] = {"start_s": round(time.perf_counter() - _START, 1)}
        _emit(result)
        try:
            fn()
        except Exception as e:  # one broken extra must not cost the round
            result["detail"][name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        trace[name]["end_s"] = round(time.perf_counter() - _START, 1)
        _emit(result)

    def ceilings():
        # Device-resident compute throughput — the design's ceiling where the
        # host→device link is not the bottleneck (real TPU hosts). Methodology
        # (docs/PERF_NOTES.md): the tunnel imposes a ~32 ms dispatch+readback
        # floor per program, so all N_CHAIN batches are processed inside ONE
        # jitted program (lax.scan threading the top-k state over a stacked
        # pool — same arithmetic as rounds 1–4's unrolled chain but the step
        # body compiles ONCE, so the executable fits the committed
        # .xla_cache) and the result is reduced on device — best of 3.
        N_CHAIN = min(8, N_IMAGES // BATCH)
        # device-generated pool: keeps this stage transport-free (see
        # sustained_probe) — pixel values do not change a fixed-shape rate
        stacked = jax.jit(
            lambda k: jax.random.randint(
                k, (N_CHAIN, BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), 0, 255, jnp.uint8
            )
        )(jax.random.PRNGKey(2))
        np.asarray(stacked[:1, :1, :1, :1])  # sync generation before timing
        n_latents = cv.engine.infer_n_latents(
            model.params, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), images.dtype
        )

        @jax.jit
        def collect_chain(states, params, stacked):
            def body(carry, xb):
                st, i = carry
                ids = i * jnp.int32(BATCH) + jnp.arange(BATCH, dtype=jnp.int32)
                st = cv.engine._local_step(st, params, xb, ids, jnp.ones((BATCH,), bool))
                return (st, i + 1), ()

            (states, _), _ = jax.lax.scan(body, (states, jnp.int32(0)), stacked)
            return jnp.sum(states["layer4"].values.astype(jnp.float32))

        @jax.jit
        def embed_chain(params, stacked):
            def body(acc, xb):
                return acc + jnp.sum(fm._encode_image(params, xb)), ()

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), stacked)
            return acc

        # Fused ceiling: BOTH networks in one program per batch — the
        # production rate where the host→device link is provisioned
        # (sustained_probe measures the same program pipelined).
        @jax.jit
        def fused_chain(states, params, fparams, stacked):
            def body(carry, xb):
                st, i = carry
                ids = i * jnp.int32(BATCH) + jnp.arange(BATCH, dtype=jnp.int32)
                st = cv.engine._local_step(st, params, xb, ids, jnp.ones((BATCH,), bool))
                emb = jnp.sum(fm._encode_image(fparams, fm.preprocess(xb)))
                return (st, i + 1), emb

            (states, _), embs = jax.lax.scan(body, (states, jnp.int32(0)), stacked)
            return jnp.sum(embs) + jnp.sum(states["layer4"].values.astype(jnp.float32))

        def best_of(fn, *args, n=3):
            np.asarray(fn(*args))  # compile + warm
            times = []
            for _ in range(n):
                t0 = time.perf_counter()
                np.asarray(fn(*args))
                times.append(time.perf_counter() - t0)
            return min(times)

        fused_compute_s = best_of(
            lambda s: fused_chain(
                cv.engine._init_states(n_latents), model.params, fm.params, s
            ),
            stacked,
        )
        result["fused_compute_imgs_per_s"] = round(N_CHAIN * BATCH / fused_compute_s, 1)
        result["fused_measured"] = True
        result["detail"]["compute_ceiling_method"] = (
            f"{N_CHAIN} batches scanned in one program, best of 3; "
            "device-generated pool (transport-free)"
        )
        _emit(result)

        chain_imgs = N_CHAIN * BATCH
        if _remaining() > 60:
            pre = fm.preprocess(stacked.reshape(-1, IMAGE_SIZE, IMAGE_SIZE, 3)).reshape(
                N_CHAIN, BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)
            np.asarray(pre[:1, :1, :1, :1])
            collect_compute_s = best_of(
                lambda s: collect_chain(cv.engine._init_states(n_latents), model.params, s),
                stacked,
            )
            embed_compute_s = best_of(lambda s: embed_chain(fm.params, s), pre)
            result["detail"]["collect_compute_imgs_per_s"] = round(
                chain_imgs / collect_compute_s, 1
            )
            result["detail"]["embed_compute_imgs_per_s"] = round(chain_imgs / embed_compute_s, 1)

    def sustained():
        probe = sustained_probe(
            cv.engine,
            model.params,
            fm,
            IMAGE_SIZE,
            batch=SUSTAINED_BATCH,
            chain=SUSTAINED_CHAIN,
            n_programs=SUSTAINED_PROGRAMS,
        )
        result["sustained_imagenet_scale_imgs_per_s"] = probe["imgs_per_s"]
        result["sustained_measured"] = True
        result["mfu_pct"] = mfu_pct(probe["imgs_per_s"], MODEL_FLOPS_PER_IMG, device_kind)
        result["detail"]["sustained_probe"] = probe
        result["detail"]["sustained_note"] = (
            "measured in-run (device-resident pool, production batch size); "
            "full 1.28M-sample methodology in tools/bench_imagenet_scale.py"
        )

    def real_data():
        result["detail"]["real_data"] = real_data_bench(
            cv.engine, model.params, embed_fn, images[: min(512, N_IMAGES)], BATCH
        )

    def serving():
        if concept_db is None:  # every full e2e repeat was transport-skipped
            result["detail"]["serving_text_search_latency"] = {
                "skipped": "no full e2e pass ran (degraded transport)"
            }
            return
        result["detail"]["serving_text_search_latency"] = serving_latency_bench(fm, concept_db)

    def e2e_retry():
        # Only useful when every full-methodology repeat was transport-
        # skipped: ``value`` then still includes the slice's compile time,
        # and tunnel weather moves on minute scales (observed 0.5–32 MB/s
        # within one round). Spend whatever budget remains on the best
        # compile-free end-to-end measurement the current weather allows:
        # sample one batch, escalate to a full pass only if it forecasts to
        # fit, otherwise refine with slice-sized passes.
        nonlocal concept_db
        if not result.get("provisional"):
            return
        best_rate = result["value"] or 0.0
        probe_ds = ArrayDataset(images[:BATCH], name="bench-slice")
        retries = result["detail"].setdefault("e2e_retry_passes", [])
        while _remaining() > 60:
            t0 = time.perf_counter()
            s_states, s_embeds, n_seen = cv.engine.run_fused(
                model.params, probe_ds, BATCH, embed_fn_fused, embed_params=embed_params
            )
            np.asarray(s_states["layer4"].values), np.asarray(s_embeds)
            w1 = time.perf_counter() - t0
            retries.append({"n_images": int(n_seen), "wall_s": round(w1, 3)})
            if n_seen / w1 > best_rate:
                best_rate = n_seen / w1
                result["value"] = round(best_rate, 2)
                result["vs_baseline"] = round(best_rate / ref_rate, 3) if ref_rate else None
                result["detail"]["value_n_images"] = int(n_seen)
                _emit(result)
            est_full = w1 * (N_IMAGES / max(int(n_seen), 1))
            if _remaining() > 1.3 * est_full + 30:
                t0 = time.perf_counter()
                concept_db = cv._compute_concept_db(fm, batch_size=BATCH)
                _force(concept_db)
                walls.append(time.perf_counter() - t0)
                _set_value(N_IMAGES / min(walls), provisional=False)
                result["detail"]["wall_s"] = [round(w, 3) for w in walls]
                result["detail"].pop("value_n_images", None)
                _emit(result)
                return
            if _remaining() < 1.3 * w1 + 60:
                return  # next probe would not fit — leave headroom for serving

    def baselines():
        nonlocal ref, self_cpu, ref_rate
        if ref.get("ref_imgs_per_s") is None:
            ref = measure_reference_baseline(min(_remaining() - 30, 600))
            rate = ref.get("ref_imgs_per_s")
            result["detail"]["baseline"].update(ref)
            if rate:
                ref_rate = rate
                result["vs_baseline"] = round(result["value"] / rate, 3)
        if self_cpu.get("self_cpu_imgs_per_s") is None and _remaining() > 90:
            self_cpu = measure_self_cpu_baseline(min(_remaining() - 30, 600))
        rate = ref.get("ref_imgs_per_s")
        self_rate = self_cpu.get("self_cpu_imgs_per_s")
        result["detail"]["framework_vs_framework_cpu"] = {
            **self_cpu,
            "ratio_vs_reference_cpu": (
                round(self_rate / rate, 3) if self_rate and rate else None
            ),
            "note": (
                "same workload, same single CPU core, both frameworks; "
                "~parity expected (both conv-library-bound on CPU) - the "
                "headline vs_baseline additionally folds in TPU hardware"
            ),
        }

    # Transport-FREE stages first (device-generated pools, committed-cache
    # compile hits): sustained feeds the headline's sustained_measured +
    # mfu_pct and ceilings the fused ceiling — the fields VERDICT r4
    # required to move with the code. A dead tunnel (observed 0.01 MB/s,
    # which once ate 570 s in one 4 MB upload) then still records every
    # design-attributable trend field before the first big transfer. The
    # transport-bound e2e path follows; baselines on a committed-cache hit
    # cost ~0 s but on a miss can eat the whole budget in subprocesses.
    stage("sustained_probe", 60, sustained)
    stage("ceilings", 45, ceilings)
    stage("e2e", 90, e2e)
    stage("baselines", 5, baselines)
    stage("real_data", 60, real_data)
    # e2e_retry before serving: when the full repeats were transport-skipped
    # it spends the leftover budget re-sampling the end-to-end path compile-
    # free (tunnel weather moves on minute scales), and a recovered full
    # pass also un-skips serving by materializing concept_db.
    stage("e2e_retry", 60, e2e_retry)
    stage("serving_text_search_latency", 45, serving)

    result["detail"]["total_bench_wall_s"] = round(time.perf_counter() - _START, 1)
    _emit(result)


def _force(tree):
    """Materialize every array on host (block_until_ready is unreliable on
    tunneled backends)."""
    for v in tree.values() if isinstance(tree, dict) else [tree]:
        np.asarray(v)


if __name__ == "__main__":
    main()
