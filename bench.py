"""Benchmark: training-step throughput of the flagship 128³ model.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "scenes/sec/chip", "vs_baseline": N}
All diagnostics (per-phase timings, per-window throughputs) go to stderr
so an anomalous run is self-diagnosing.

Measures the steady-state full training step — on-device GT voxelization
(triangle rasterize + interior fill, or exact XOR-parity sampling) →
CoreNet forward → loss → Adam — for the h5/h7 configuration (FG_BG,
128³ decode, 256² images) on one chip.

Robustness: one compile step, a blocked warmup run, then NUM_WINDOWS
independent timing windows of STEPS_PER_WINDOW steps each; the reported
number is the MEDIAN window (a single transport stall or cache-cold event
cannot shift the median the way it shifted round 1's single 10-step
window — BENCH_r01.json recorded 11.98 vs the 41.6 steady state).

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator is an 8 scenes/sec estimate for the reference's
synchronous-DDP step on one V100 (batch 4; GL voxelize + CUDA fill +
ResNet50+3D-decoder fwd/bwd) — the ≥5× target of BASELINE.json then
corresponds to vs_baseline ≥ 5.

The HEADLINE measurement is the production configuration — exactly what
`TrainPipeline` runs by default: raster GT (bit-parity with the
reference's GL+CUDA GT pipeline) under the h5 voxelization contract
(irm=8, the production window), with the scene shell subdivided to the
production target (~12k triangles/scene), packed decoder + phase loss,
bf16. Easier variants (parity GT, toy triangle counts) are --suite
diagnostics only.

Variants (diagnostic, run with --suite or individually):
  --gt {parity,raster}   GT algorithm (default raster — the production
                         default; parity is the fast closed-mesh-only
                         alternative)
  --tris N               approximate triangles/scene (default 2500; for
                         raster GT the production subdivision contract
                         then yields ~12k triangles — use 16 for toy,
                         25000 for 4x-realistic load)
  --profile DIR          capture a jax.profiler trace of the timed steps

Also reports MFU: analytic FLOPs of the compiled step (XLA HLO cost
analysis) / measured step time / chip bf16 peak — so perf is judged
against the hardware ceiling, not only the V100 proxy (BASELINE.md).
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

import numpy as np

V100_BASELINE_SCENES_PER_SEC = 8.0

# Backend-init robustness (round 3 lost its number to a raw traceback when
# the axon tunnel was down — BENCH_r03.json parsed=null). The backend is
# probed in a SUBPROCESS (jax caches a failed backend init for the life of
# the process, and a half-up tunnel can make jax.devices() hang forever,
# so neither retry-in-process nor an unbounded first call is safe), with
# bounded retry + backoff. On permanent failure main() emits a parseable
# one-line JSON error record instead of a traceback.
BACKEND_PROBE_TIMEOUT_SECS = int(
    os.environ.get("CORENET_BENCH_PROBE_TIMEOUT", "240"))
BACKEND_RETRY_BUDGET_SECS = int(
    os.environ.get("CORENET_BENCH_RETRY_BUDGET", "900"))


def probe_backend() -> tuple[bool, str]:
  """Retries backend init in short subprocesses until it works or the
  budget is spent. Returns (ok, diagnostic)."""
  code = ("import jax; ds = jax.devices(); "
          "print('BACKEND_OK', len(ds), ds[0].platform, "
          "getattr(ds[0], 'device_kind', '?'))")
  deadline = time.monotonic() + BACKEND_RETRY_BUDGET_SECS
  attempt, last = 0, "no attempt"
  while True:
    attempt += 1
    t0 = time.monotonic()
    try:
      out = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=BACKEND_PROBE_TIMEOUT_SECS)
      tail = (out.stdout + out.stderr).strip().splitlines()
      if out.returncode == 0 and any("BACKEND_OK" in l for l in tail):
        ok_line = [l for l in tail if "BACKEND_OK" in l][-1]
        log(f"[bench] backend probe ok (attempt {attempt}): {ok_line}")
        return True, ok_line
      last = tail[-1] if tail else f"rc={out.returncode}, no output"
    except subprocess.TimeoutExpired:
      last = (f"probe hung >{BACKEND_PROBE_TIMEOUT_SECS}s "
              "(backend init never returned)")
    log(f"[bench] backend probe attempt {attempt} failed: {last}")
    remaining = deadline - time.monotonic()
    if remaining <= 0:
      return False, last
    backoff = min(30.0 * attempt, 120.0, remaining)
    log(f"[bench] retrying backend probe in {backoff:.0f}s "
        f"({remaining:.0f}s of budget left)")
    time.sleep(backoff)

# Dense bf16 peak per chip (TFLOP/s), by jax device_kind prefix.
PEAK_BF16_TFLOPS = {
    "TPU v6": 918.0,   # Trillium / v6e
    "TPU v5p": 459.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v4": 275.0,
    "TPU v3": 123.0,
    "TPU v2": 45.0,
}


def chip_peak_tflops(device) -> float | None:
  kind = getattr(device, "device_kind", "")
  for prefix in sorted(PEAK_BF16_TFLOPS, key=len, reverse=True):
    if kind.startswith(prefix):
      return PEAK_BF16_TFLOPS[prefix]
  return None


def log(msg):
  print(msg, file=sys.stderr, flush=True)


def _scene_inputs(batch, image_size, resolution, num_tri, num_mesh,
                  required_max_edge=None):
  """Cube-shell scene subdivided to ≥ num_tri triangles (realistic GT
  load: triangle count is what drives the rasterize/scatter cost).
  required_max_edge additionally enforces the rasterizer window contract
  (the production subdivision target)."""
  from __graft_entry__ import _example_inputs
  from corenet_tpu.data.batching import subdivide_triangles
  if num_tri <= 16 and required_max_edge is None:
    return _example_inputs(batch, image_size, resolution,
                           num_tri=max(num_tri, 12), num_mesh=num_mesh)
  # Subdivide the 0.4-wide cube shell until the budget is filled.
  # Each halving of max_edge ≈ 4x the triangle count (12 → 48 → 192 ...).
  edge = 0.4
  max_edge = edge / max(1.0, float(np.sqrt(num_tri / 24.0)))
  if required_max_edge is not None:
    max_edge = min(max_edge, required_max_edge)
  # Pre-count so the padded budget equals the subdivided count.
  cube = _example_inputs(1, 8, resolution, num_tri=16,
                         num_mesh=1)["triangles"][0][:12]
  count = subdivide_triangles(np.asarray(cube), max_edge).shape[0]
  return _example_inputs(batch, image_size, resolution,
                         num_tri=count, num_mesh=num_mesh,
                         max_edge_view=max_edge)


def _cost_only_subprocess(**kwargs):
  """Analytic step FLOPs from a CPU lowering (subprocess so the forced
  CPU platform cannot leak into the TPU-attached parent)."""
  import json as _json
  import os
  import subprocess
  import sys as _sys
  args = [_sys.executable, os.path.abspath(__file__), "--cost-only",
          "--gt", kwargs["gt"], "--tris", str(kwargs["tris"]),
          "--batch", str(kwargs["batch"]),
          "--image_size", str(kwargs["image_size"])]
  if not kwargs["packed"]:
    args.append("--no-packed")
  if kwargs["phase"]:
    args.append("--phase")
  if kwargs.get("pfs") is not None:
    args += ["--pfs", str(kwargs["pfs"])]
  try:
    out = subprocess.run(args, capture_output=True, timeout=900)
    flops = _json.loads(out.stdout.decode().strip().splitlines()[-1])["flops"]
    return float(flops) or None
  except Exception as e:
    log(f"[bench] cost-only subprocess failed: {e}")
    return None


def cost_only(*, gt, tris, batch, image_size, packed, phase, pfs=None):
  """Lowers the identical step on CPU and prints {'flops': N}."""
  import jax
  jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step

  resolution = (128, 128, 128)
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=resolution, num_output_channels=2)),
      compute_dtype=jnp.bfloat16, packed_decoder=packed,
      phase_output=packed or phase,
      **({} if pfs is None else dict(pack_from_stage=pfs)))
  optimizer = state_lib.create_optimizer()
  if gt == "parity":
    vox_kwargs = dict(algorithm="parity")
    required_max_edge = None
  else:
    irm, window = 8, 24
    vox_kwargs = dict(algorithm="raster", image_resolution_multiplier=irm,
                      max_bbox_pixels=window)
    required_max_edge = (window - 4) / irm / max(resolution)
  inputs = _scene_inputs(batch, image_size, resolution, tris, num_mesh=1,
                         required_max_edge=required_max_edge)
  inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
  variables = jax.eval_shape(lambda: model.init(
      jax.random.PRNGKey(0), inputs["image"][:1], jnp.eye(4)[None],
      jnp.full((1, 3), 0.5), train=False))
  variables = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), variables)
  state = state_lib.create_train_state(variables, optimizer)
  step = make_train_step(model, optimizer, "FG_BG", resolution,
                         voxelization_kwargs=vox_kwargs, donate=False)
  cost = step.lower(state, inputs).cost_analysis() or {}
  print(json.dumps({"flops": float(cost.get("flops", 0.0))}))


def run_variant(*, gt, tris, batch, image_size, windows, steps, warmup,
                profile_dir=None, packed=False, phase=False, pfs=None):
  import os
  import jax
  jax.config.update("jax_compilation_cache_dir",
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache"))
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
  import jax.numpy as jnp
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  from corenet_tpu.parallel import mesh as mesh_lib
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step

  resolution = (128, 128, 128)
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=resolution, num_output_channels=2)),
      compute_dtype=jnp.bfloat16, packed_decoder=packed,
      phase_output=packed or phase,
      **({} if pfs is None else dict(pack_from_stage=pfs)))
  optimizer = state_lib.create_optimizer()
  mesh = mesh_lib.create_mesh()

  t_setup = time.perf_counter()
  if gt == "parity":
    vox_kwargs = dict(algorithm="parity")
    required_max_edge = None
  else:
    # h5 voxelization config (configs/models/h5.json5): irm=8, non-
    # conservative, the production window (eval/pipeline.py
    # VOXELIZE_WINDOW_PIXELS) with the matching subdivision target — the
    # configuration the blocked fast path (voxel/raster_fast.py) serves.
    irm, window = 8, 24
    vox_kwargs = dict(algorithm="raster", image_resolution_multiplier=irm,
                      max_bbox_pixels=window)
    required_max_edge = (window - 4) / irm / max(resolution)
  inputs = _scene_inputs(batch, image_size, resolution, tris, num_mesh=1,
                         required_max_edge=required_max_edge)
  n_valid = int(inputs["tri_valid"][0].sum())
  log(f"[bench] variant gt={gt} tris={n_valid} (budget {tris}) "
      f"batch={batch} image={image_size}")

  with mesh:
    init_image = jnp.zeros((1, image_size, image_size, 3), jnp.uint8)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), init_image, jnp.eye(4)[None],
        jnp.full((1, 3), 0.5), train=False))()
    state = state_lib.create_train_state(variables, optimizer)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, mesh_lib.replicated_sharding(mesh)),
        state)
    # donate=False: buffer donation interacts badly with the async axon
    # transport when the host refetches between steps.
    train_step = make_train_step(
        model, optimizer, "FG_BG", resolution,
        voxelization_kwargs=vox_kwargs, donate=False, mesh=mesh)
    batch_on_mesh = mesh_lib.shard_batch(mesh, inputs)
    log(f"[bench] setup {time.perf_counter() - t_setup:.1f}s")

    # Compile (1 step) — NOTE: block_until_ready does not reliably block
    # under the axon transport; a host fetch of the loss scalar does, and
    # each step depends on the previous state, so fetching the final loss
    # bounds the whole chain.
    t0 = time.perf_counter()
    flops_per_step = None
    try:
      # Pre-optimization HLO cost analysis: the analytic FLOPs of the
      # step (matmul/conv dominated — optimization barely moves it), at
      # no backend-compile cost. The axon TPU plugin returns no cost
      # model, so when it comes back empty the FLOPs are computed from
      # an equivalent CPU lowering in a subprocess (--cost-only).
      cost = train_step.lower(state, batch_on_mesh).cost_analysis()
      if cost and cost.get("flops", 0) > 0:
        flops_per_step = float(cost["flops"])
      else:
        flops_per_step = _cost_only_subprocess(
            gt=gt, tris=tris, batch=batch, image_size=image_size,
            packed=packed, phase=phase, pfs=pfs)
    except Exception as e:  # cost analysis is best-effort diagnostics
      log(f"[bench] cost analysis unavailable: {e}")
    state, metrics = train_step(state, batch_on_mesh)
    float(jax.device_get(metrics["loss"]))
    log(f"[bench] compile+first step {time.perf_counter() - t0:.1f}s")

    # Warmup: settle transport/caches before any timed window.
    t0 = time.perf_counter()
    for _ in range(warmup):
      state, metrics = train_step(state, batch_on_mesh)
    float(jax.device_get(metrics["loss"]))
    log(f"[bench] warmup {warmup} steps "
        f"{time.perf_counter() - t0:.2f}s")

    ctx = None
    if profile_dir:
      ctx = jax.profiler.trace(profile_dir)
      ctx.__enter__()
      log(f"[bench] profiling to {profile_dir}")

    window_tputs = []
    for w in range(windows):
      t0 = time.perf_counter()
      for _ in range(steps):
        state, metrics = train_step(state, batch_on_mesh)
      float(jax.device_get(metrics["loss"]))
      dt = time.perf_counter() - t0
      tput = batch * steps / dt
      window_tputs.append(tput)
      log(f"[bench] window {w}: {dt:.3f}s for {steps} steps "
          f"→ {tput:.1f} scenes/s ({1000 * dt / steps:.1f} ms/step)")

    if ctx is not None:
      ctx.__exit__(None, None, None)

  n_chips = len(jax.devices())
  median = statistics.median(window_tputs) / n_chips
  log(f"[bench] median {median:.1f} scenes/s/chip over {windows} windows "
      f"(min {min(window_tputs):.1f}, max {max(window_tputs):.1f})")
  mfu = tflops = None
  if flops_per_step:
    steps_per_sec = median * n_chips / batch
    tflops = flops_per_step * steps_per_sec / n_chips / 1e12
    peak = chip_peak_tflops(jax.devices()[0])
    if peak:
      mfu = 100.0 * tflops / peak
      log(f"[bench] {flops_per_step / 1e12:.3f} TFLOP/step → "
          f"{tflops:.1f} TFLOP/s/chip = {mfu:.1f}% MFU "
          f"(bf16 peak {peak:.0f} TFLOP/s on "
          f"{jax.devices()[0].device_kind})")
  return median, mfu, tflops


def run_eval_variant(*, native, output, batch, image_size, windows,
                     steps, warmup):
  """Inference throughput (the EvalPipeline's hot path): scenes/s/chip
  through SuperResolutionInference — m=1 is the native 128³ forward
  (h5/h7/m7/m9 evals), m=4 with native 32³ is the y1-style m³=64-pass
  super-resolution (reference super_resolution.py:92-112)."""
  import os
  import jax
  jax.config.update("jax_compilation_cache_dir",
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache"))
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
  import jax.numpy as jnp
  from corenet_tpu.eval.super_resolution import super_resolution_from_model
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig

  native = tuple(native)
  output = tuple(output)
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=native, num_output_channels=2)),
      compute_dtype=jnp.bfloat16)
  init_image = jnp.zeros((1, image_size, image_size, 3), jnp.uint8)
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), init_image, jnp.eye(4)[None],
      jnp.full((1, 3), 0.5), train=False))()
  sri = super_resolution_from_model(model, variables, native)

  rng = __import__("numpy").random.RandomState(0)
  image = jnp.asarray(
      (rng.rand(batch, image_size, image_size, 3) * 255).astype("uint8"))
  camera = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (batch, 4, 4))
  m = float(max(native))
  v2x = jnp.broadcast_to(
      jnp.diag(jnp.array([m, m, m, 1.0], jnp.float32)), (batch, 4, 4))
  offsets = jnp.full((batch, 3), 0.5, jnp.float32)

  def run_batches(n):
    """Queue n inference batches, then one scalar host fetch of the
    stacked sums bounds the whole window — one tunnel round-trip per
    window (matching the train bench), not one per batch. The TPU has a
    single compute stream, so queued independent programs still execute
    sequentially and the wall time is honest device busy time."""
    sums = [sri(image, camera, v2x, offsets, output).sum()
            for _ in range(n)]
    return float(jax.device_get(jnp.stack(sums).sum()))

  mult = output[0] // native[0]
  log(f"[bench] eval variant native={native[0]}^3 output={output[0]}^3 "
      f"(m^3={mult ** 3} passes) batch={batch}")
  t0 = time.perf_counter()
  run_batches(1)
  log(f"[bench] eval compile+first batch {time.perf_counter() - t0:.1f}s")
  run_batches(warmup)

  tputs = []
  for w in range(windows):
    t0 = time.perf_counter()
    run_batches(steps)
    dt = time.perf_counter() - t0
    tputs.append(batch * steps / dt)
    log(f"[bench] eval window {w}: {dt:.3f}s for {steps} batches "
        f"→ {tputs[-1]:.1f} scenes/s")
  n_chips = len(jax.devices())
  median = statistics.median(tputs) / n_chips
  log(f"[bench] eval median {median:.1f} scenes/s/chip "
      f"(min {min(tputs):.1f}, max {max(tputs):.1f})")
  return median


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--gt", choices=["parity", "raster"], default="raster")
  p.add_argument("--tris", type=int, default=2500)
  p.add_argument("--batch", type=int, default=8)
  p.add_argument("--image_size", type=int, default=256)
  p.add_argument("--windows", type=int, default=5)
  p.add_argument("--steps", type=int, default=20)
  p.add_argument("--warmup", type=int, default=10)
  p.add_argument("--profile", type=str, default=None)
  p.add_argument("--packed", action=argparse.BooleanOptionalAction,
                 default=True,
                 help="space-to-depth packed decoder execution (the "
                      "production fast path; --no-packed for the fine "
                      "decoder)")
  p.add_argument("--phase", action="store_true",
                 help="phase-major final logits for the loss (skips the "
                      "128^3 interleave; also implied by --packed)")
  p.add_argument("--pfs", type=int, default=None,
                 help="pack_from_stage override for the packed decoder")
  p.add_argument("--suite", action="store_true",
                 help="run the diagnostic variant suite (results on stderr)"
                      " before the headline measurement")
  p.add_argument("--cost-only", action="store_true",
                 help="print the step's analytic FLOPs from a CPU "
                      "lowering and exit (used internally for MFU)")
  p.add_argument("--mode", choices=["train", "eval"], default="train",
                 help="train: the headline jitted train step (default; "
                      "what the driver records). eval: inference "
                      "throughput — native 128^3 forward AND the "
                      "y1-style 32^3->128^3 super-resolution (64 "
                      "passes/scene)")
  args = p.parse_args()

  if args.cost_only:
    cost_only(gt=args.gt, tris=args.tris, batch=args.batch,
              image_size=args.image_size, packed=args.packed,
              phase=args.phase, pfs=args.pfs)
    return

  metric = ("train_scenes_per_sec_per_chip_128cubed_raster_gt"
            if args.gt == "raster"
            else "train_scenes_per_sec_per_chip_128cubed")

  def emit_error(kind: str, detail: str):
    # One parseable record even when the run cannot produce a number:
    # value 0 / vs_baseline 0 cannot be mistaken for a passing result,
    # and `error` carries the diagnosis (VERDICT r3 #2).
    print(json.dumps({
        "metric": metric, "value": 0.0, "unit": "scenes/sec/chip",
        "vs_baseline": 0.0, "error": f"{kind}: {detail[:500]}"}))

  ok, diag = probe_backend()
  if not ok:
    log("[bench] backend permanently unavailable; emitting error record")
    emit_error("backend_unavailable", diag)
    return

  if args.mode == "eval":
    native = run_eval_variant(native=(128, 128, 128),
                              output=(128, 128, 128), batch=args.batch,
                              image_size=args.image_size,
                              windows=args.windows, steps=args.steps,
                              warmup=args.warmup)
    y1 = run_eval_variant(native=(32, 32, 32), output=(128, 128, 128),
                          batch=args.batch, image_size=args.image_size,
                          windows=args.windows, steps=max(args.steps // 4,
                                                          2),
                          warmup=max(args.warmup // 4, 1))
    print(json.dumps({
        "metric": "eval_scenes_per_sec_per_chip_128cubed",
        "value": round(native, 3), "unit": "scenes/sec/chip",
        "vs_baseline": 0.0,  # the reference publishes no eval throughput
        "y1_superres_scenes_per_sec_per_chip": round(y1, 3)}))
    return

  if args.suite:
    for gt, tris in [("raster", 16), ("raster", 25000),
                     ("parity", 16), ("parity", 2500)]:
      v, _, _ = run_variant(gt=gt, tris=tris, batch=args.batch,
                            image_size=args.image_size, windows=3,
                            steps=args.steps, warmup=args.warmup)
      log(f"[bench] SUITE gt={gt} tris={tris}: {v:.1f} scenes/s/chip "
          f"({v / V100_BASELINE_SCENES_PER_SEC:.2f}x)")

  try:
    value, mfu, tflops = run_variant(
        gt=args.gt, tris=args.tris, batch=args.batch,
        image_size=args.image_size, windows=args.windows,
        steps=args.steps, warmup=args.warmup, pfs=args.pfs,
        profile_dir=args.profile, packed=args.packed,
        phase=args.phase)
  except Exception as e:  # emit a diagnosable record, not a bare traceback
    import traceback
    traceback.print_exc(file=sys.stderr)
    emit_error(type(e).__name__, str(e))
    return
  result = {
      "metric": metric,
      "value": round(value, 3),
      "unit": "scenes/sec/chip",
      "vs_baseline": round(value / V100_BASELINE_SCENES_PER_SEC, 3),
  }
  if mfu is not None:
    result["mfu_pct"] = round(mfu, 2)
    result["tflops_per_chip"] = round(tflops, 2)
  print(json.dumps(result))


if __name__ == "__main__":
  main()
