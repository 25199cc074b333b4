"""Multi-device Pallas fast paths (parallel/kernel_sharding.py).

Round-2 gated every fast kernel to a single device; these tests prove the
round-3 shard_map route: on a pure-data mesh each kernel runs per batch
shard with results equal to (a) the single-device kernel and (b) the XLA
fallback — and the production train step actually TAKES the fast paths
(trace counters) instead of silently falling back.

Runs on the virtual CPU mesh with CORENET_FORCE_KERNELS=1 (interpret
mode — the identical shard_map structure the TPU runs compiled)."""

import numpy as np
import numpy.testing as tt
import jax
import jax.numpy as jnp
import pytest

from corenet_tpu.parallel import kernel_sharding, mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh")

RESOLUTION = (32, 32, 32)


@pytest.fixture
def data_mesh():
  mesh = mesh_lib.create_mesh(data=4, space=1, devices=jax.devices()[:4])
  kernel_sharding.register_mesh(mesh)
  yield mesh
  kernel_sharding.register_mesh(None)


@pytest.fixture
def space_mesh():
  mesh = mesh_lib.create_mesh(data=2, space=2, devices=jax.devices()[:4])
  kernel_sharding.register_mesh(mesh)
  yield mesh
  kernel_sharding.register_mesh(None)


def _reset_counters():
  for k in kernel_sharding.trace_counters:
    kernel_sharding.trace_counters[k] = 0


def test_kernel_mode_gates():
  mesh = mesh_lib.create_mesh(data=4, space=1, devices=jax.devices()[:4])
  try:
    kernel_sharding.register_mesh(None)
    assert kernel_sharding.kernel_mode(8) is None  # multi-dev, no mesh
    kernel_sharding.register_mesh(mesh)
    assert kernel_sharding.kernel_mode(8) is mesh
    assert kernel_sharding.kernel_mode(None) is mesh
    assert kernel_sharding.kernel_mode(6) is None  # 6 % 4 != 0
    space_mesh = mesh_lib.create_mesh(data=2, space=2,
                                      devices=jax.devices()[:4])
    kernel_sharding.register_mesh(space_mesh)
    assert kernel_sharding.kernel_mode(8) is None  # non-trivial 'space'
    # 'space'-capable kernels: eligible when the voxel dim divides.
    assert kernel_sharding.kernel_mode(
        8, n=4096, allow_space=True) is space_mesh
    assert kernel_sharding.kernel_mode(
        8, n=4095, allow_space=True) is None  # 4095 % 2 != 0
    assert kernel_sharding.kernel_mode(
        8, n=None, allow_space=True) is None  # space needs n
    # Voxel route still shards batch over 'data': batch 1 (model init)
    # must fall back, not shard_map a 1-row batch over data=2.
    assert kernel_sharding.kernel_mode(
        1, n=4096, allow_space=True) is None
    # Whole-grid route: batch consumes data x space as parallelism.
    assert kernel_sharding.kernel_mode(
        8, allow_space_batch=True) is space_mesh
    assert kernel_sharding.kernel_mode(
        6, allow_space_batch=True) is None  # 6 % (2*2) != 0
  finally:
    kernel_sharding.register_mesh(None)


def test_skip_gather_shard_map_matches_direct(data_mesh):
  from corenet_tpu.ops.skip_gather import skip_gather
  rng = np.random.RandomState(0)
  b, h2, w2, c = 8, 34, 34, 12
  n = 4096
  fmap = jnp.asarray(rng.randn(b, h2, w2, c).astype(np.float32))
  px = jnp.asarray(rng.randint(0, w2, (b, n)), jnp.int32)
  py = jnp.asarray(rng.randint(0, h2, (b, n)), jnp.int32)

  def loss(f, fn):
    return (fn(f, px, py) ** 2).sum()

  kernel_sharding.register_mesh(None)
  direct = skip_gather(fmap, px, py, interpret=True)
  g_direct = jax.grad(lambda f: loss(f, lambda *a: skip_gather(
      *a, interpret=True)))(fmap)

  kernel_sharding.register_mesh(data_mesh)
  fs = jax.device_put(fmap, mesh_lib.batch_sharding(data_mesh))
  sharded = skip_gather(fs, px, py, interpret=True)
  g_sharded = jax.jit(jax.grad(lambda f: loss(f, lambda *a: skip_gather(
      *a, interpret=True))))(fs)

  tt.assert_array_equal(np.asarray(direct), np.asarray(sharded))
  tt.assert_allclose(np.asarray(g_direct), np.asarray(g_sharded),
                     rtol=1e-6)


def test_fgbg_sums_shard_map_matches_direct(data_mesh):
  from corenet_tpu.ops.fgbg_loss import fgbg_sums
  rng = np.random.RandomState(1)
  b, n = 8, 16 * 16 * 16
  diff = jnp.asarray(rng.randn(b, n).astype(np.float32))
  gt = jnp.asarray((rng.rand(b, n) > 0.5).astype(np.int32))

  def loss(d, g):
    inter, union = fgbg_sums(d, g, interpret=True)
    return (1.0 - inter / union).mean()

  kernel_sharding.register_mesh(None)
  ref_v, ref_g = jax.value_and_grad(loss)(diff, gt)

  kernel_sharding.register_mesh(data_mesh)
  ds = jax.device_put(diff, mesh_lib.batch_sharding(data_mesh))
  gs = jax.device_put(gt, mesh_lib.batch_sharding(data_mesh))
  v, g = jax.jit(jax.value_and_grad(loss))(ds, gs)

  tt.assert_allclose(float(ref_v), float(v), rtol=1e-6)
  tt.assert_allclose(np.asarray(ref_g), np.asarray(g), atol=1e-7)


def test_skip_gather_space_mesh_matches_direct(space_mesh):
  """('data', 'space') mesh: the kernel shards the voxel dim over
  'space'; forward exact, and the feature-map gradient (psum'd over
  'space' by shard_map's transpose) matches the unsharded kernel."""
  from corenet_tpu.ops.skip_gather import skip_gather
  rng = np.random.RandomState(2)
  b, h2, w2, c = 4, 34, 34, 12
  n = 4096
  fmap = jnp.asarray(rng.randn(b, h2, w2, c).astype(np.float32))
  px = jnp.asarray(rng.randint(0, w2, (b, n)), jnp.int32)
  py = jnp.asarray(rng.randint(0, h2, (b, n)), jnp.int32)

  def loss(f, fn):
    return (fn(f, px, py) ** 2).sum()

  kernel_sharding.register_mesh(None)
  direct = skip_gather(fmap, px, py, interpret=True)
  g_direct = jax.grad(lambda f: loss(f, lambda *a: skip_gather(
      *a, interpret=True)))(fmap)

  kernel_sharding.register_mesh(space_mesh)
  sharded = jax.jit(lambda f: skip_gather(f, px, py,
                                          interpret=True))(fmap)
  g_sharded = jax.jit(jax.grad(lambda f: loss(f, lambda *a: skip_gather(
      *a, interpret=True))))(fmap)

  tt.assert_array_equal(np.asarray(direct), np.asarray(sharded))
  tt.assert_allclose(np.asarray(g_direct), np.asarray(g_sharded),
                     rtol=1e-6, atol=1e-6)


def test_fgbg_sums_space_mesh_matches_direct(space_mesh):
  """('data', 'space') mesh: per-shard partial sums psum'd over 'space'
  equal the unsharded sums; gradients flow through the custom VJP."""
  from corenet_tpu.ops.fgbg_loss import fgbg_sums
  rng = np.random.RandomState(3)
  b, n = 4, 16 * 16 * 16
  diff = jnp.asarray(rng.randn(b, n).astype(np.float32))
  gt = jnp.asarray((rng.rand(b, n) > 0.5).astype(np.int32))

  def loss(d, g):
    inter, union = fgbg_sums(d, g, interpret=True)
    return (1.0 - inter / union).mean()

  kernel_sharding.register_mesh(None)
  ref_v, ref_g = jax.value_and_grad(loss)(diff, gt)

  kernel_sharding.register_mesh(space_mesh)
  v, g = jax.jit(jax.value_and_grad(loss))(diff, gt)

  tt.assert_allclose(float(ref_v), float(v), rtol=1e-6)
  tt.assert_allclose(np.asarray(ref_g), np.asarray(g), atol=1e-7)


def test_blocked_gt_shard_map_matches_direct(data_mesh):
  from corenet_tpu.train import gt as gt_lib
  from __graft_entry__ import _example_inputs
  inp = _example_inputs(4, 64, RESOLUTION, num_tri=24, num_mesh=2)
  kwargs = dict(resolution=RESOLUTION, image_resolution_multiplier=8,
                max_bbox_pixels=24, conservative_rasterization=False)
  args = [jnp.asarray(inp[k]) for k in
          ("triangles", "tri_mesh_slot", "tri_valid", "mesh_labels",
           "grid_offset")]

  kernel_sharding.register_mesh(None)
  direct, _ = gt_lib.voxelize_batch(*args, **kwargs)
  kernel_sharding.register_mesh(data_mesh)
  sharded, _ = gt_lib.voxelize_batch(*args, **kwargs)
  assert int(np.asarray(direct).sum()) > 0
  tt.assert_array_equal(np.asarray(direct), np.asarray(sharded))


@pytest.mark.slow
def test_train_step_fast_paths_taken_on_data_mesh(data_mesh, monkeypatch):
  """The production step on a data=4 mesh: fast paths TAKEN (counters),
  loss equal to the XLA-fallback step on the same mesh."""
  monkeypatch.setenv("CORENET_FORCE_KERNELS", "1")
  # At the 32³ test resolution the skips run at ≤16³ grids, below the
  # production Pallas floor (32768 voxels); lower it so the kernel
  # engages at test scale.
  from corenet_tpu.models import skip as skip_mod
  monkeypatch.setattr(skip_mod, "_PALLAS_MIN_N", 1024)
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step
  from __graft_entry__ import _example_inputs

  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=RESOLUTION, num_output_channels=2)))
  optimizer = state_lib.create_optimizer()
  image = jnp.zeros((1, 64, 64, 3), jnp.uint8)
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), image, jnp.eye(4)[None],
      jnp.full((1, 3), 0.5), train=False))()
  # irm=8 / window 24 satisfies the blocked contract at 32³.
  vox = dict(image_resolution_multiplier=8, max_bbox_pixels=24,
             conservative_rasterization=False)
  inputs = _example_inputs(4, 64, RESOLUTION)

  losses = {}
  for forced in (True, False):
    monkeypatch.setenv("CORENET_FORCE_KERNELS", "1" if forced else "0")
    state = state_lib.create_train_state(variables, optimizer)
    state = mesh_lib.replicate_tree(data_mesh, state)
    step = make_train_step(model, optimizer, "FG_BG", RESOLUTION,
                           voxelization_kwargs=dict(vox), donate=False,
                           mesh=data_mesh)
    batch = mesh_lib.shard_batch(data_mesh, inputs)
    _reset_counters()
    new_state, metrics = step(state, batch)
    losses[forced] = float(jax.device_get(metrics["loss"]))
    assert int(new_state.global_step) == 4
    c = kernel_sharding.trace_counters
    if forced:
      # skip connections at ≥32³ (n = 32768 ≥ _PALLAS_MIN_N) + the FG_BG
      # loss kernel + the blocked rasterizer all engaged.
      assert c["skip_gather"] > 0, c
      assert c["fgbg"] > 0, c
      assert c["block_scatter"] > 0, c
    else:
      assert c["skip_gather"] == 0 and c["fgbg"] == 0, c
  # The kernels are algorithmically exact (one-hot matmul gather is
  # bit-exact; the loss sums reduce in f32): fast and fallback steps see
  # the same loss to float tolerance.
  tt.assert_allclose(losses[True], losses[False], rtol=2e-5)


@pytest.mark.slow
def test_train_step_fast_paths_taken_on_space_mesh(space_mesh, monkeypatch):
  """The production step on a (data=2, space=2) mesh: the
  'space'-capable kernels (skip gather, FG_BG loss) are TAKEN, and the
  loss equals the XLA-fallback step on the same mesh."""
  monkeypatch.setenv("CORENET_FORCE_KERNELS", "1")
  from corenet_tpu.models import skip as skip_mod
  monkeypatch.setattr(skip_mod, "_PALLAS_MIN_N", 1024)
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step
  from __graft_entry__ import _example_inputs

  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=RESOLUTION, num_output_channels=2)))
  optimizer = state_lib.create_optimizer()
  image = jnp.zeros((1, 64, 64, 3), jnp.uint8)
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), image, jnp.eye(4)[None],
      jnp.full((1, 3), 0.5), train=False))()
  vox = dict(image_resolution_multiplier=8, max_bbox_pixels=24,
             conservative_rasterization=False)
  inputs = _example_inputs(4, 64, RESOLUTION)

  losses = {}
  for forced in (True, False):
    monkeypatch.setenv("CORENET_FORCE_KERNELS", "1" if forced else "0")
    state = state_lib.create_train_state(variables, optimizer)
    state = mesh_lib.replicate_tree(space_mesh, state)
    step = make_train_step(model, optimizer, "FG_BG", RESOLUTION,
                           voxelization_kwargs=dict(vox), donate=False,
                           mesh=space_mesh)
    batch = mesh_lib.shard_batch(space_mesh, inputs)
    _reset_counters()
    new_state, metrics = step(state, batch)
    losses[forced] = float(jax.device_get(metrics["loss"]))
    assert int(new_state.global_step) == 4
    c = kernel_sharding.trace_counters
    if forced:
      assert c["skip_gather"] > 0, c
      assert c["fgbg"] > 0, c
    else:
      assert c["skip_gather"] == 0 and c["fgbg"] == 0, c
  tt.assert_allclose(losses[True], losses[False], rtol=2e-5)


def test_scoped_mesh_and_host_local_mesh():
  """Eval traces run under a scoped registry (ADVICE r3): single-process,
  every device is addressable, so per-host programs may keep the
  registered mesh; the scope restores on exit."""
  mesh = mesh_lib.create_mesh(data=4, space=1, devices=jax.devices()[:4])
  try:
    kernel_sharding.register_mesh(mesh)
    assert kernel_sharding.mesh_for_host_local_programs() is mesh
    with kernel_sharding.scoped_mesh(None):
      assert kernel_sharding.registered_mesh() is None
      assert kernel_sharding.kernel_mode(8) is None
    assert kernel_sharding.registered_mesh() is mesh
    other = mesh_lib.create_mesh(data=2, space=1, devices=jax.devices()[:2])
    with kernel_sharding.scoped_mesh(other):
      assert kernel_sharding.kernel_mode(8) is other
    assert kernel_sharding.registered_mesh() is mesh
  finally:
    kernel_sharding.register_mesh(None)
  assert kernel_sharding.mesh_for_host_local_programs() is None


def test_blocked_gt_space_mesh_matches_direct(space_mesh):
  """('data', 'space') mesh: the blocked GT consumes 'space' as extra
  batch parallelism (whole scenes per device) and must reproduce the
  single-device result exactly."""
  from corenet_tpu.train import gt as gt_lib
  from __graft_entry__ import _example_inputs
  inp = _example_inputs(4, 64, RESOLUTION, num_tri=24, num_mesh=2)
  kwargs = dict(resolution=RESOLUTION, image_resolution_multiplier=8,
                max_bbox_pixels=24, conservative_rasterization=False)
  args = [jnp.asarray(inp[k]) for k in
          ("triangles", "tri_mesh_slot", "tri_valid", "mesh_labels",
           "grid_offset")]

  kernel_sharding.register_mesh(None)
  direct, _ = gt_lib.voxelize_batch(*args, **kwargs)
  kernel_sharding.register_mesh(space_mesh)
  assert kernel_sharding.kernel_mode(
      4, allow_space_batch=True) is space_mesh
  _reset_counters()
  sharded, _ = gt_lib.voxelize_batch(*args, **kwargs)
  assert kernel_sharding.trace_counters["block_scatter"] > 0
  assert int(np.asarray(direct).sum()) > 0
  tt.assert_array_equal(np.asarray(direct), np.asarray(sharded))


def test_phased_gt_space_mesh_matches_direct(space_mesh, monkeypatch):
  """('data', 'space') mesh: phased_gt consumes 'space' as extra batch
  parallelism (allow_space_batch, VERDICT r4 #4) and must reproduce the
  single-device result exactly."""
  monkeypatch.setenv("CORENET_FORCE_KERNELS", "1")
  from corenet_tpu.ops.phased_gt import phased_gt
  rng = np.random.RandomState(7)
  packed = jnp.asarray(
      rng.randint(0, 2 ** 31, (4, 32, 32, 1), dtype=np.int64)
      .astype(np.uint32))

  kernel_sharding.register_mesh(None)
  direct = np.asarray(phased_gt(packed, 2))
  kernel_sharding.register_mesh(space_mesh)
  assert kernel_sharding.kernel_mode(
      4, allow_space_batch=True) is space_mesh
  _reset_counters()
  sharded = np.asarray(phased_gt(packed, 2))
  assert kernel_sharding.trace_counters["phased_gt"] == 1
  assert direct.sum() > 0
  tt.assert_array_equal(direct, sharded)


@pytest.mark.slow
def test_phased_train_step_on_space_mesh(space_mesh, monkeypatch):
  """The phase-loss production step runs on a ('data', 'space') mesh
  (VERDICT r4 #4: the former single-shard restriction is lifted): the
  packed GT + phased_gt kernels are TAKEN, and the loss matches the same
  phased step run unsharded — the 2D-mesh step loses nothing."""
  monkeypatch.setenv("CORENET_FORCE_KERNELS", "1")
  from corenet_tpu.models import skip as skip_mod
  monkeypatch.setattr(skip_mod, "_PALLAS_MIN_N", 1024)
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step
  from __graft_entry__ import _example_inputs

  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=RESOLUTION, num_output_channels=2)), phase_output=True)
  optimizer = state_lib.create_optimizer()
  image = jnp.zeros((1, 64, 64, 3), jnp.uint8)
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), image, jnp.eye(4)[None],
      jnp.full((1, 3), 0.5), train=False))()
  vox = dict(image_resolution_multiplier=8, max_bbox_pixels=24,
             conservative_rasterization=False)
  inputs = _example_inputs(4, 64, RESOLUTION)

  losses = {}
  for on_mesh in (False, True):
    mesh = space_mesh if on_mesh else None
    kernel_sharding.register_mesh(mesh)
    state = state_lib.create_train_state(variables, optimizer)
    if on_mesh:
      state = mesh_lib.replicate_tree(space_mesh, state)
    step = make_train_step(model, optimizer, "FG_BG", RESOLUTION,
                           voxelization_kwargs=dict(vox), donate=False,
                           mesh=mesh)
    batch = mesh_lib.shard_batch(space_mesh, inputs) if on_mesh else {
        k: jnp.asarray(v) for k, v in inputs.items()}
    _reset_counters()
    new_state, metrics = step(state, batch)
    losses[on_mesh] = float(jax.device_get(metrics["loss"]))
    assert int(new_state.global_step) == 4
    if on_mesh:
      c = kernel_sharding.trace_counters
      assert c["phased_gt"] > 0, c
      assert c["block_scatter"] > 0, c
  tt.assert_allclose(losses[True], losses[False], rtol=2e-5)
