"""Pallas kernel tests (interpret mode — algorithm-level parity; the
real-TPU path is exercised manually, see ops/fill_pallas.py STATUS)."""

import numpy as np
import numpy.testing as tt
import jax.numpy as jnp

from corenet_tpu.ops.fill_pallas import fill_inside_voxels_pallas
from corenet_tpu.voxel.fill import fill_inside_voxels


def test_pallas_fill_matches_xla_random():
  rng = np.random.default_rng(0)
  g = (rng.random((3, 16, 12, 20)) > 0.7).astype(np.float32)
  ours = np.asarray(fill_inside_voxels(jnp.asarray(g)))
  pal = np.asarray(fill_inside_voxels_pallas(jnp.asarray(g), interpret=True))
  tt.assert_array_equal(ours, pal)


def test_pallas_fill_winding_tunnel():
  g = np.ones((1, 8, 8, 8), np.float32)
  path = [(0, 1, 1), (1, 1, 1), (2, 1, 1), (2, 2, 1), (2, 3, 1),
          (3, 3, 1), (4, 3, 1), (4, 3, 2), (4, 3, 3), (3, 3, 3)]
  for z, y, x in path:
    g[0, z, y, x] = 0
  out = np.asarray(fill_inside_voxels_pallas(jnp.asarray(g), interpret=True))
  tt.assert_array_equal(out, g)  # boundary-connected tunnel stays open

  g2 = g.copy()
  g2[0, 0, 1, 1] = 1  # seal the tunnel mouth
  out2 = np.asarray(
      fill_inside_voxels_pallas(jnp.asarray(g2), interpret=True))
  assert out2.min() == 1  # now interior → filled
