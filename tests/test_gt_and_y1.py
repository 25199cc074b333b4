"""On-device GT generation tests + the y1-style configuration path
(sub-grid voxelization at 32³ with random offsets, super-resolution
evaluation at a higher grid)."""

import functools

import numpy as np
import numpy.testing as tt
import jax
import jax.numpy as jnp

from corenet_tpu.cc import native
from corenet_tpu.train import gt as gt_lib

from helpers import cube_mesh


def _scene_inputs(batch=2, num_tri=16, offset=0.5):
  tris = cube_mesh(0.25, 0.75)
  scene = np.zeros((batch, num_tri, 3, 3), np.float32)
  valid = np.zeros((batch, num_tri), bool)
  scene[:, :12] = tris
  valid[:, :12] = True
  return (jnp.asarray(scene), jnp.zeros((batch, num_tri), jnp.int32),
          jnp.asarray(valid), jnp.ones((batch, 1), jnp.int32),
          jnp.full((batch, 3), offset, jnp.float32))


def test_voxelize_batch_matches_native_pipeline():
  """Device GT (voxelize+fill+compose in the jitted step) must equal the
  native host pipeline on the same scene."""
  res = (16, 16, 16)
  args = _scene_inputs()
  grid, v2x = jax.jit(functools.partial(
      gt_lib.voxelize_batch, resolution=res,
      image_resolution_multiplier=2, conservative_rasterization=True,
      max_bbox_pixels=20))(*args)
  grid = np.asarray(grid)
  assert grid.shape == (2, 16, 16, 16)
  tt.assert_allclose(np.asarray(v2x[0]), np.diag([16, 16, 16, 1.0]))

  # Native pipeline: transform triangles to voxel space on host.
  tris = np.asarray(args[0][0][:12])
  m = 16.0
  vox_tris = tris * m  # offset 0.5 → shift 0
  native_grid = native.voxelize_triangles(
      vox_tris.astype(np.float32), np.zeros(12, np.int32), 1, res,
      image_resolution_multiplier=2, conservative_rasterization=True)
  native_grid = native.fill_inside_voxels(native_grid)
  tt.assert_array_equal(grid[0], native_grid[0].astype(np.int32))
  # Cube spans voxels 4..11 → filled block inside.
  assert grid[0][8, 8, 8] == 1 and grid[0][0, 0, 0] == 0


def test_voxelize_batch_random_offsets_shift_grid():
  res = (16, 16, 16)
  base = _scene_inputs(offset=0.5)
  shifted = _scene_inputs(offset=0.999)  # sample near the voxel's far corner
  g0, _ = jax.jit(functools.partial(gt_lib.voxelize_batch, resolution=res,
                                    image_resolution_multiplier=2,
                                    max_bbox_pixels=20))(*base)
  g1, _ = jax.jit(functools.partial(gt_lib.voxelize_batch, resolution=res,
                                    image_resolution_multiplier=2,
                                    max_bbox_pixels=20))(*shifted)
  # Shifting the sample location must change which voxels test as inside.
  assert (np.asarray(g0) != np.asarray(g1)).any()


def test_y1_style_subgrid_gt():
  """y1's GT: 32³ sub-grid sampling with an odd multiplier."""
  res = (32, 32, 32)
  args = _scene_inputs()
  # Full-image sampling windows: the un-subdivided cube faces span ~48 px
  # here, and correctness requires window ≥ bbox (see voxelize.py).
  grid, _ = jax.jit(functools.partial(
      gt_lib.voxelize_batch, resolution=res, sub_grid_sampling=True,
      image_resolution_multiplier=3,
      conservative_rasterization=True))(*args)
  grid = np.asarray(grid)
  assert grid.shape == (2, 32, 32, 32)
  # Cube interior (voxels 8..23) filled, outside empty.
  assert grid[0][16, 16, 16] == 1
  assert grid[0][2, 2, 2] == 0
  assert 8 ** 3 < grid[0].sum() < 20 ** 3


def test_y1_super_resolution_eval_path():
  """A native-32³ model evaluated at 64³ through SuperResolutionInference
  (the y1 eval configuration, super_resolution.py:46-129)."""
  from corenet_tpu.eval.super_resolution import SuperResolutionInference

  native_res = (32, 32, 32)

  def fake_multi_offset(image, camera, v2x, offsets):
    # Plausible PMF: foreground inside the centered half-cube, modulated
    # by the offset so interleaving has visible structure.
    o = offsets.shape[0]
    b = image.shape[0]
    zz, yy, xx = jnp.meshgrid(*([jnp.arange(32) + 0.5] * 3), indexing="ij")
    base = ((xx > 8) & (xx < 24) & (yy > 8) & (yy < 24) &
            (zz > 8) & (zz < 24)).astype(jnp.float32)
    fg = base[None, None] * (0.6 + 0.4 * jnp.linspace(0, 1, o)[:, None,
                                                              None, None,
                                                              None])
    fg = jnp.broadcast_to(fg, (o, b, 32, 32, 32))
    return jnp.stack([1 - fg, fg], axis=-1)

  sri = SuperResolutionInference(fake_multi_offset, native_res)
  image = jnp.zeros((2, 32, 32, 3), jnp.uint8)
  eye = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
  pmf = sri(image, eye, eye, jnp.full((2, 3), 0.5), (64, 64, 64))
  assert pmf.shape == (2, 64, 64, 64, 2)
  pmf = np.asarray(pmf)
  # Foreground region upscales to 16..48.
  assert pmf[0, 32, 32, 32, 1] > 0.5
  assert pmf[0, 4, 4, 4, 1] < 0.5


def test_host_gt_matches_device_gt():
  """The loader's native host-GT path must produce the same grids as the
  on-device path for the same batch."""
  from corenet_tpu.data import batching
  from corenet_tpu.data.dataset import CoreNetDatasetImpl
  from helpers import make_fixture_dataset
  import tempfile

  with tempfile.TemporaryDirectory() as root:
    manifest, meshes_dir = make_fixture_dataset(root, num_scenes=2)
    impl = CoreNetDatasetImpl(manifest, meshes_dir)
    hb = batching.batch([impl[0], impl[1]], max_edge_view=0.08)
    res = (16, 16, 16)
    host_grid, host_v2x = batching.host_voxelize(
        hb, "SEMANTIC", res, image_resolution_multiplier=2,
        conservative_rasterization=True)
    inputs = hb.step_inputs("SEMANTIC")
    dev_grid, dev_v2x = jax.jit(functools.partial(
        gt_lib.voxelize_batch, resolution=res,
        image_resolution_multiplier=2, conservative_rasterization=True,
        max_bbox_pixels=24))(
            inputs["triangles"], inputs["tri_mesh_slot"],
            inputs["tri_valid"], inputs["mesh_labels"],
            inputs["grid_offset"])
    tt.assert_array_equal(host_grid, np.asarray(dev_grid))
    tt.assert_allclose(host_v2x, np.asarray(dev_v2x))
    assert host_grid.max() >= 1


def test_parity_voxelizer_exact_interior():
  """Parity GT == exact center-point sampling; subset of rasterize+fill."""
  from corenet_tpu.voxel.parity import parity_voxelize_batch

  tris = cube_mesh(0.25, 0.75)
  t = 16
  scene = np.zeros((2, t, 3, 3), np.float32)
  scene[:, :12] = tris
  valid = np.zeros((2, t), bool)
  valid[:, :12] = True
  slot = np.zeros((2, t), np.int32)
  labels = np.ones((2, 1), np.int32)

  pg, v2x = parity_voxelize_batch(
      jnp.asarray(scene), jnp.asarray(slot), jnp.asarray(valid),
      jnp.asarray(labels), jnp.full((2, 3), 0.5, jnp.float32),
      num_mesh_slots=1, resolution=(16, 16, 16))
  pg = np.asarray(pg)
  expected = np.zeros((16, 16, 16), np.int32)
  expected[4:12, 4:12, 4:12] = 1  # centers strictly inside [4, 12]^3
  tt.assert_array_equal(pg[0], expected)
  tt.assert_allclose(np.asarray(v2x[0]), np.diag([16, 16, 16, 1.0]))

  rg, _ = jax.jit(functools.partial(
      gt_lib.voxelize_batch, resolution=(16, 16, 16),
      image_resolution_multiplier=8, fill_inside=True))(
          jnp.asarray(scene), jnp.asarray(slot), jnp.asarray(valid),
          jnp.asarray(labels), jnp.full((2, 3), 0.5, jnp.float32))
  assert (pg <= np.asarray(rg)).all()  # raster ⊇ parity (grazed voxels)

  # Offsets shift the sampled interior per-axis.
  off = jnp.asarray(np.array([[0.2, 0.7, 0.9], [0.5, 0.5, 0.01]],
                             np.float32))
  pg2, _ = parity_voxelize_batch(
      jnp.asarray(scene), jnp.asarray(slot), jnp.asarray(valid),
      jnp.asarray(labels), off, num_mesh_slots=1, resolution=(16, 16, 16))
  pg2 = np.asarray(pg2)

  def axis_mask(o):
    return (np.arange(16) + o > 4) & (np.arange(16) + o < 12)

  ez = axis_mask(0.9)[:, None, None]
  ey = axis_mask(0.7)[None, :, None]
  ex = axis_mask(0.2)[None, None, :]
  tt.assert_array_equal(pg2[0], (ez & ey & ex).astype(np.int32))


def test_parity_train_step_runs():
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step
  import sys
  sys.path.insert(0, "/root/repo")
  from __graft_entry__ import _example_inputs

  res = (32, 32, 32)
  inputs = _example_inputs(1, 32, res, num_tri=16, num_mesh=1)
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=res, num_output_channels=2)))
  opt = state_lib.create_optimizer()
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.uint8),
      jnp.eye(4)[None], jnp.full((1, 3), 0.5), train=False))()
  state = state_lib.create_train_state(variables, opt)
  step = make_train_step(model, opt, "FG_BG", res,
                         voxelization_kwargs=dict(algorithm="parity"),
                         donate=False)
  new_state, metrics = step(state, inputs)
  assert np.isfinite(float(metrics["loss"]))
  assert int(new_state.global_step) == 1


def test_y1_subgrid_train_step_runs():
  """The y1 training configuration end-to-end through the jitted step:
  32³ FG_BG with sub-grid sampling and random offsets."""
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step
  import sys
  sys.path.insert(0, "/root/repo")
  from __graft_entry__ import _example_inputs

  res = (32, 32, 32)
  inputs = _example_inputs(1, 32, res, num_tri=16, num_mesh=1)
  inputs["grid_offset"] = np.random.RandomState(1).rand(1, 3).astype(
      np.float32)
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=res, num_output_channels=2)))
  opt = state_lib.create_optimizer()
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.uint8),
      jnp.eye(4)[None], jnp.full((1, 3), 0.5), train=False))()
  state = state_lib.create_train_state(variables, opt)
  step = make_train_step(
      model, opt, "FG_BG", res,
      voxelization_kwargs=dict(sub_grid_sampling=True,
                               image_resolution_multiplier=3,
                               conservative_rasterization=True),
      donate=False)
  new_state, metrics = step(state, inputs)
  assert np.isfinite(float(metrics["loss"]))


def test_phased_gt_step_matches_xla_path(monkeypatch):
  """The bit-packed phased-GT path (gt.voxelize_batch_packed_fgbg +
  ops/phased_gt.py) must produce the identical training loss to the
  dense unpack + phase-permute path — same bits in, same loss out."""
  from corenet_tpu.models.corenet import CoreNet, CoreNetConfig, DecoderConfig
  from corenet_tpu.parallel import kernel_sharding
  from corenet_tpu.train import gt as gt_lib
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.step import make_train_step
  import sys
  sys.path.insert(0, "/root/repo")
  from __graft_entry__ import _example_inputs

  res = (64, 64, 64)
  irm, window = 8, 24
  max_edge = (window - 4) / irm / 64
  inputs = _example_inputs(1, 64, res, num_tri=3072, num_mesh=1,
                           max_edge_view=max_edge)
  model = CoreNet(CoreNetConfig(decoder=DecoderConfig(
      resolution=res, num_output_channels=2)),
      packed_decoder=True, phase_output=True)
  opt = state_lib.create_optimizer()
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8),
      jnp.eye(4)[None], jnp.full((1, 3), 0.5), train=False))()
  vox = dict(image_resolution_multiplier=irm,
             conservative_rasterization=False, max_bbox_pixels=window)

  def run():
    state = state_lib.create_train_state(variables, opt)
    step = make_train_step(model, opt, "FG_BG", res,
                           voxelization_kwargs=dict(vox), donate=False)
    _, metrics = step(state, inputs)
    return float(metrics["loss"])

  kernel_sharding.trace_counters["phased_gt"] = 0
  assert gt_lib.packed_fgbg_eligible(1, resolution=res, **vox)
  loss_fast = run()
  assert kernel_sharding.trace_counters["phased_gt"] == 1  # path taken

  monkeypatch.setattr(gt_lib, "packed_fgbg_eligible",
                      lambda *a, **k: False)
  loss_ref = run()
  np.testing.assert_allclose(loss_fast, loss_ref, rtol=1e-6)


def test_voxelize_batch_large_labels_without_attestation():
  """With num_label_values omitted, labels above 255 must survive (the
  uint8 compose is opt-in via the attestation; ADVICE r3 — previously a
  label of 300 silently wrapped to 44)."""
  res = (32, 32, 32)
  tris, slots, valid, labels, offsets = _scene_inputs()
  big = jnp.full_like(labels, 300)
  grid, _ = jax.jit(functools.partial(
      gt_lib.voxelize_batch, resolution=res,
      image_resolution_multiplier=8, conservative_rasterization=False,
      max_bbox_pixels=24))(tris, slots, valid, big, offsets)
  grid = np.asarray(grid)
  assert grid.max() == 300, grid.max()
  assert set(np.unique(grid)) == {0, 300}
  # With the attestation the same call composes in uint8 (values ≤ 255).
  grid8, _ = jax.jit(functools.partial(
      gt_lib.voxelize_batch, resolution=res,
      image_resolution_multiplier=8, conservative_rasterization=False,
      max_bbox_pixels=24, num_label_values=4))(
          tris, slots, valid, labels * 3, offsets)
  grid8 = np.asarray(grid8)
  assert grid8.dtype == np.uint8 and grid8.max() == 3
  tt.assert_array_equal((grid > 0), (grid8 > 0))
