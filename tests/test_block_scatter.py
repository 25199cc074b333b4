"""Direct tests of the packed OR-scatter kernel (ops/block_scatter.py)
against a numpy reference — adversarial origin patterns for the grouped
(uniform-run) accumulation path: pure runs, mixed groups, skips inside
runs, runs crossing group and chunk boundaries."""

import numpy as np
import numpy.testing as tt
import jax.numpy as jnp
import pytest

from corenet_tpu.ops.block_scatter import DB, block_scatter_or


def _reference(origins, pw, meshes, h, w, nw):
  b, t = origins.shape
  out = np.zeros((b, meshes, h, w * nw), np.uint32)
  for i in range(b):
    for k in range(t):
      o = int(origins[i, k])
      if o < 0:
        continue
      ox = o % w
      oy = (o // w) % h
      slot = o // (w * h)
      out[i, slot, oy:oy + DB, ox * nw:(ox + DB) * nw] |= pw[i, k]
  return out


def _run_case(origins, pw, meshes, h, w, nw, group=8):
  got = np.asarray(block_scatter_or(
      jnp.asarray(origins), jnp.asarray(pw),
      meshes=meshes, h=h, w=w, nw=nw, interpret=True, group=group))
  want = _reference(origins, pw, meshes, h, w, nw)
  tt.assert_array_equal(got, want)


def _random_pw(rng, b, t, nw):
  return rng.integers(0, 2 ** 32, (b, t, DB, DB * nw), dtype=np.uint64
                      ).astype(np.uint32)


@pytest.mark.parametrize("group", [2, 8, 16, 32])
def test_block_scatter_run_patterns(group):
  h = w = 32
  nw, meshes, b = 1, 2, 2
  rng = np.random.default_rng(0)
  t = 64

  def origin(slot, oy, ox):
    return (slot * h + oy) * w + ox

  # Long uniform runs (vectorized path), a mixed group, skips inside a
  # uniform run, an all-skip group, and a run crossing a group boundary.
  o = np.full((b, t), -1, np.int32)
  o[0, 0:16] = origin(0, 0, 0)           # two full uniform groups
  o[0, 16:20] = origin(0, 8, 4)          # mixed group: two origins +
  o[0, 20:23] = origin(1, 3, 9)          #   a straddling-rows origin
  o[0, 24:32] = origin(0, 0, 0)          # same origin again (idempotent)
  o[0, 32:40] = origin(0, 16, 16)
  o[0, 34] = -1                          # skip inside a uniform run
  o[0, 40:48] = -1                       # all-skip group
  o[0, 48:64] = origin(1, 24, 24)        # run covering two groups
  o[1, 4:12] = origin(0, 5, 5)           # run crossing a group boundary
  pw = _random_pw(rng, b, t, nw)
  pw[o < 0] = 0                          # contract: skipped rows carry 0
  _run_case(o, pw, meshes, h, w, nw, group=group)


def test_block_scatter_mixed_groups_not_merged():
  """A group whose first and last origins are equal but with a DIFFERENT
  origin in between must NOT take the grouped path (the uniformity mark
  is computed over all rows, not endpoints)."""
  h = w = 32
  nw, meshes, b, t = 1, 1, 1, 8
  rng = np.random.default_rng(1)
  o = np.array([[5, 5, 5, 200, 5, 5, 5, 5]], np.int32)
  pw = _random_pw(rng, b, t, nw)
  _run_case(o, pw, meshes, h, w, nw)


def test_block_scatter_run_across_chunk_boundary():
  h = w = 32
  nw, meshes, b = 1, 1, 1
  t = 1536  # chunk=1024: the run crosses the chunk boundary
  rng = np.random.default_rng(2)
  o = np.full((b, t), 17, np.int32)
  o[0, ::7] = -1
  pw = _random_pw(rng, b, t, nw)
  pw[o < 0] = 0
  _run_case(o, pw, meshes, h, w, nw)


@pytest.mark.parametrize("group", [8, 16, 32])
def test_block_scatter_random_fuzz(group):
  h = w = 32
  nw, meshes, b, t = 1, 3, 2, 256
  rng = np.random.default_rng(3)
  # Runs of random length 1..12 over random origins, 20% skips.
  o = np.full((b, t), -1, np.int32)
  for i in range(b):
    k = 0
    while k < t:
      run = int(rng.integers(1, 13))
      slot = int(rng.integers(0, meshes))
      oy = int(rng.integers(0, h - DB + 1))
      ox = int(rng.integers(0, w - DB + 1))
      o[i, k:k + run] = (slot * h + oy) * w + ox
      k += run
    skip = rng.random((t,)) < 0.2
    o[i, skip] = -1
  pw = _random_pw(rng, b, t, nw)
  pw[o < 0] = 0
  _run_case(o, pw, meshes, h, w, nw, group=group)


@pytest.mark.parametrize("group", [4, 8, 16])
def test_block_scatter_two_origin_groups(group):
  """Adversarial shapes for the TWO-sentinel (A-prefix/B-suffix) path:
  clean splits at every k, skips inside both segments, skip at slot 0,
  B-run continuing into the next group, A reappearing after B (must
  fall back to the element path), and three origins (ditto)."""
  h = w = 32
  nw, meshes, b = 1, 2, 1
  rng = np.random.default_rng(7)

  def origin(slot, oy, ox):
    return (slot * h + oy) * w + ox

  oa, ob, oc = origin(0, 0, 0), origin(1, 8, 4), origin(0, 16, 16)
  rows = []
  for k in range(1, group):            # every split point
    rows.extend([oa] * k + [ob] * (group - k))
  g2 = [-1, oa, -1, ob] + [ob] * (group - 4)      # skips + slot-0 skip
  rows.extend(g2)
  rows.extend([oa] * (group // 2) + [ob] * (group - group // 2))
  rows.extend([ob] * group)                        # B continues
  rows.extend([oa] * 2 + [ob] * (group - 4) + [oa] * 2)  # A after B: mixed
  rows.extend([oa] * 2 + [ob] * 2 + [oc] * (group - 4))  # 3 origins: mixed
  rows.extend([oa, ob] * (group // 2))   # alternating A/B (first!=last,
                                         # order_ok must reject): mixed
  t = ((len(rows) + group - 1) // group) * group
  o = np.full((b, t), -1, np.int32)
  o[0, :len(rows)] = rows
  pw = _random_pw(rng, b, t, nw)
  pw[o < 0] = 0
  _run_case(o, pw, meshes, h, w, nw, group=group)
