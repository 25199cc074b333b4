"""Flood-fill edge-case tests (the XLA fill, voxel/fill.py).

A VMEM-resident Pallas fill variant was prototyped in round 1
(ops/fill_pallas.py) and removed in round 3 — see
docs/removed_alternates.md for the A/B record. These tests keep its
adversarial cases pointed at the production fill.
"""

import numpy as np
import pytest
import numpy.testing as tt
import jax.numpy as jnp

from corenet_tpu.voxel.fill import fill_inside_voxels


def test_fill_winding_tunnel():
  g = np.ones((1, 8, 8, 8), np.float32)
  path = [(0, 1, 1), (1, 1, 1), (2, 1, 1), (2, 2, 1), (2, 3, 1),
          (3, 3, 1), (4, 3, 1), (4, 3, 2), (4, 3, 3), (3, 3, 3)]
  for z, y, x in path:
    g[0, z, y, x] = 0
  out = np.asarray(fill_inside_voxels(jnp.asarray(g)))
  tt.assert_array_equal(out, g)  # boundary-connected tunnel stays open

  g2 = g.copy()
  g2[0, 0, 1, 1] = 1  # seal the tunnel mouth
  out2 = np.asarray(fill_inside_voxels(jnp.asarray(g2)))
  assert out2.min() == 1  # now interior → filled


def test_fill_static_rounds_matches_adaptive():
  """The bounded-round fill (static fori_loop — the multi-process-safe
  mode, no data-dependent collective in a while_loop cond) matches the
  adaptive fixpoint when given enough rounds."""
  rng = np.random.default_rng(0)
  g = (rng.random((3, 16, 12, 20)) > 0.7).astype(np.float32)
  adaptive = np.asarray(fill_inside_voxels(jnp.asarray(g)))
  static = np.asarray(fill_inside_voxels(jnp.asarray(g), fill_rounds=8))
  tt.assert_array_equal(adaptive, static)


def _reference_phased(grid_u8, s):
  """The train/step.py GT phase permutation (factor s³)."""
  b, d, h, w = grid_u8.shape
  dq, hq, wq = d // s, h // s, w // s
  if s == 2:
    gp = grid_u8.reshape(b, dq, 2, hq, 2, wq, 2)
    gp = gp.transpose(0, 1, 3, 5, 2, 4, 6)
  else:
    gp = grid_u8.reshape(b, dq, 2, 2, hq, 2, 2, wq, 2, 2)
    gp = gp.transpose(0, 1, 4, 7, 2, 5, 8, 3, 6, 9)
  return gp.reshape(b, dq, hq, wq * s ** 3)


@pytest.mark.parametrize("s,shape", [(2, (2, 64, 64, 64)),
                                     (4, (2, 64, 64, 64)),
                                     (4, (1, 128, 128, 128))])
def test_phased_gt_matches_permute(s, shape):
  """ops/phased_gt.py must equal unpack + the step's phase permutation."""
  from corenet_tpu.ops.phased_gt import phased_gt
  from corenet_tpu.voxel.packed import pack_grid

  rng = np.random.default_rng(11)
  grid = (rng.random(shape) < 0.4).astype(np.uint8)
  packed = pack_grid(jnp.asarray(grid))  # [B, H, W, NW]
  out = np.asarray(phased_gt(packed, s))
  tt.assert_array_equal(out, _reference_phased(grid, s))
