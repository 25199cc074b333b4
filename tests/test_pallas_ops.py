"""Flood-fill edge-case tests (the XLA fill, voxel/fill.py).

A VMEM-resident Pallas fill variant was prototyped in round 1
(ops/fill_pallas.py) and removed in round 3 — see
docs/removed_alternates.md for the A/B record. These tests keep its
adversarial cases pointed at the production fill.
"""

import numpy as np
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
