"""Blocked triangle rasterization for subdivided meshes — the fast
production GT path.

Same sampling semantics as voxel/voxelize.py (the reference's GL
voxelizer, voxelize.geom:44-56 + voxelize.frag:29-58), restructured around
one invariant the production pipeline already enforces: triangles are
pre-subdivided so the projected bbox spans at most ~2.5 voxels
(data/batching.py max_edge_view from VOXELIZE_WINDOW_PIXELS). Then every
triangle touches at most an 8×8×8-voxel block, so instead of scattering
millions of individual fragments (XLA scatter: ~13µs per update), the
rasterizer:

  Phase A (dense XLA, vectorized over triangles): samples a 4·irm-pixel
    cell-aligned window per triangle, aggregates fragment coverage into a
    4×4×8-cell relative bitmask, orients it by the dominant axis, and
    packs it into z-words (voxel/packed.py layout).
  Phase B (Pallas, ops/block_scatter.py): serially ORs each block into a
    bit-packed VMEM-resident grid — ~50× faster than XLA scatter.

Eligibility (checked by `blocked_eligible`): cubic resolution with depth a
multiple of 32, integer irm, projection_depth_multiplier 1, no sub-grid
sampling, and window/subdivision contract (max_bbox_pixels - 4) ≤ 2.5·irm.
Everything else falls back to voxel/voxelize.py.

Numerics: the in-plane cell of a sample is computed EXACTLY from its
pixel index (cell = pixel // irm — the window is cell-aligned); the
general path reconstructs the same coordinate barycentrically in f32,
which can land one voxel over when a sample sits within fp-noise of a
cell boundary. On generic meshes the two paths are bit-identical (see
tests/test_raster_fast.py); on adversarial random triangles they may
differ by isolated single voxels on the surface, where the exact value
is the defensible one. The depth coordinate uses the same barycentric
expression as the general path and matches it bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from corenet_tpu.ops.block_scatter import block_scatter_or
from corenet_tpu.parallel import kernel_sharding
from corenet_tpu.voxel.packed import fill_inside_packed, unpack_grid
from corenet_tpu.voxel.voxelize import _PLANE_AXES, _dominant_axis, _edge

DEPTH_CELLS = 8
UV_CELLS = 4


def blocked_eligible(*, resolution, sub_grid_sampling,
                     image_resolution_multiplier,
                     projection_depth_multiplier,
                     max_bbox_pixels, batch=None) -> bool:
  d, h, w = resolution
  irm = image_resolution_multiplier
  # On a multi-device TPU mesh the compiled Pallas scatter needs the
  # shard_map route over a registered mesh (parallel/kernel_sharding.py
  # — each device voxelizes a batch shard; under a non-trivial 'space'
  # axis the batch shards over data x space and the consumer's sharding
  # constraint reshards the grids spatially). Without one, the general
  # (pure-XLA) voxelizer partitions automatically, so fall back to it.
  # Interpret-mode backends (the CPU test mesh) partition the emulated
  # kernel either way.
  if (jax.default_backend() == "tpu" and jax.device_count() > 1
      and not isinstance(
          kernel_sharding.kernel_mode(batch, allow_space_batch=True),
          jax.sharding.Mesh)):
    return False
  # Compiled Mosaic needs the packed grid's minor dim (w * d/32 lanes)
  # 128-aligned: d >= 64. At 32³ (lanes = 32, "unsupported unaligned
  # shape") the general path is used — the only 32³ production config
  # (y1) is sub-grid-sampled and thus ineligible anyway.
  if jax.default_backend() == "tpu" and d * (d // 32) < 128:
    return False
  return (d == h == w and d % 32 == 0 and d >= 32
          and not sub_grid_sampling
          and projection_depth_multiplier == 1
          and float(irm) == int(irm) and int(irm) >= 1
          and max_bbox_pixels is not None
          and (max_bbox_pixels - 4) <= 2.5 * int(irm))


def _project(triangles, tri_mesh_slot, view2voxel, *, m, irm,
             uniform_mats=False):
  """Shared per-triangle projection geometry (vertex-level only).

  uniform_mats: all mesh slots share one view→voxel matrix (true for the
  production GT path, where it is scale+shift per scene) — skips the
  per-triangle matrix gather.
  """
  wp = UV_CELLS * irm            # window size in pixels
  image_res = m * irm
  s = jnp.float32(m / image_res)  # sample spacing (1/irm)

  if uniform_mats:
    mat = view2voxel[0]
    v = jnp.einsum("ij,cvj->cvi", mat[:3, :3], triangles) + mat[:3, 3]
  else:
    mats = view2voxel[tri_mesh_slot]
    v = jnp.einsum("cij,cvj->cvi", mats[:, :3, :3], triangles) \
        + mats[:, None, :3, 3]

  e1 = v[:, 1] - v[:, 0]
  e2 = v[:, 2] - v[:, 0]
  normal = jnp.cross(e1, e2)
  k = _dominant_axis(normal)  # [T]

  # Coordinate selection per dominant axis (_PLANE_AXES rows) as select
  # chains — XLA:TPU lowers the take_along_axis form as generic gathers
  # costing ~4 ms/step at production triangle counts.
  vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
  k_ = k[:, None]
  vu = jnp.where(k_ == 0, vy, jnp.where(k_ == 1, vz, vx))  # [T,3]
  vv = jnp.where(k_ == 0, vz, jnp.where(k_ == 1, vx, vy))
  vd = jnp.where(k_ == 0, vx, jnp.where(k_ == 1, vy, vz))
  pa = np.asarray(_PLANE_AXES)
  u_ax = jnp.where(k == 0, pa[0, 0],
                   jnp.where(k == 1, pa[1, 0], pa[2, 0]))
  v_ax = jnp.where(k == 0, pa[0, 1],
                   jnp.where(k == 1, pa[1, 1], pa[2, 1]))

  # Cell-aligned, clipped pixel window (multiples of irm ⇒ sample column
  # a belongs to cell a // irm, exactly).
  def window_start(vmin):
    i0 = (jnp.floor(vmin / s).astype(jnp.int32) - 2) // irm * irm
    return jnp.clip(i0, 0, image_res - wp)

  iu0 = window_start(vu.min(axis=1))
  iv0 = window_start(vv.min(axis=1))
  ou = iu0 // irm  # first covered cell along u, ∈ [0, m-4]
  ov = iv0 // irm
  bu = jnp.minimum(ou // 4 * 4, m - 8)
  bv = jnp.minimum(ov // 4 * 4, m - 8)
  return dict(s=s, v=v, k=k, u_ax=u_ax, v_ax=v_ax, vu=vu, vv=vv, vd=vd,
              iu0=iu0, iv0=iv0, ou=ou, ov=ov, bu=bu, bv=bv)


def _place(u_ax, v_ax, axis, u_val, v_val, d_val):
  return jnp.where(u_ax == axis, u_val,
                   jnp.where(v_ax == axis, v_val, d_val))


def _phase_a(triangles: jnp.ndarray,      # f32[T, 3, 3]
             tri_mesh_slot: jnp.ndarray,  # i32[T]
             view2voxel: jnp.ndarray,     # f32[M, 4, 4]
             tri_valid: jnp.ndarray,      # bool[T]
             *,
             m: int,                      # cubic grid extent
             irm: int,
             conservative: bool,
             uniform_mats: bool = False):
  """Per-triangle packed blocks: (origins i32[T], pw u32[T, 8, 8·NW])."""
  wp = UV_CELLS * irm            # window size in pixels
  nw = m // 32
  g = _project(triangles, tri_mesh_slot, view2voxel, m=m, irm=irm,
               uniform_mats=uniform_mats)
  s, v = g["s"], g["v"]
  k, u_ax, v_ax = g["k"], g["u_ax"], g["v_ax"]
  vu, vv, vd = g["vu"], g["vv"], g["vd"]
  iu0, iv0 = g["iu0"], g["iv0"]
  ou, ov = g["ou"], g["ov"]

  a = jnp.arange(wp, dtype=jnp.int32)
  pu = (iu0[:, None] + a[None]).astype(jnp.float32) * s + 0.5 * s  # [T,WP]
  pv = (iv0[:, None] + a[None]).astype(jnp.float32) * s + 0.5 * s

  pu2 = pu[:, :, None]
  pv2 = pv[:, None, :]
  u0, u1, u2 = vu[:, 0, None, None], vu[:, 1, None, None], vu[:, 2, None, None]
  v0, v1, v2 = vv[:, 0, None, None], vv[:, 1, None, None], vv[:, 2, None, None]

  w0 = _edge(pu2, pv2, u1, v1, u2, v2)
  w1 = _edge(pu2, pv2, u2, v2, u0, v0)
  w2 = _edge(pu2, pv2, u0, v0, u1, v1)
  area2 = w0 + w1 + w2

  if conservative:
    sgn = jnp.sign(area2)
    half = s * 0.5

    def edge_ok(w, a_u, a_v, b_u, b_v):
      du = -(b_v - a_v)
      dv = (b_u - a_u)
      slack = (jnp.abs(du) + jnp.abs(dv)) * half
      return sgn * w + slack >= 0

    cov = (edge_ok(w0, u1, v1, u2, v2) &
           edge_ok(w1, u2, v2, u0, v0) &
           edge_ok(w2, u0, v0, u1, v1))
    bbox_ok = ((pu2 + half >= jnp.minimum(jnp.minimum(u0, u1), u2)) &
               (pu2 - half <= jnp.maximum(jnp.maximum(u0, u1), u2)) &
               (pv2 + half >= jnp.minimum(jnp.minimum(v0, v1), v2)) &
               (pv2 - half <= jnp.maximum(jnp.maximum(v0, v1), v2)))
    cov = cov & bbox_ok
  else:
    eps = 1e-4 * jnp.abs(area2)
    pos_side = (w0 >= -eps) & (w1 >= -eps) & (w2 >= -eps)
    neg_side = (w0 <= eps) & (w1 <= eps) & (w2 <= eps)
    cov = pos_side | neg_side

  nz_area = jnp.abs(area2) > 0
  inv_area = jnp.where(nz_area, 1.0 / jnp.where(nz_area, area2, 1.0), 0.0)
  b0 = w0 * inv_area
  b1 = w1 * inv_area
  b2 = w2 * inv_area
  depth = (b0 * vd[:, 0, None, None] + b1 * vd[:, 1, None, None]
           + b2 * vd[:, 2, None, None])

  cov = (cov & nz_area & tri_valid[:, None, None]
         & (depth >= 0) & (depth < m))
  cd = jnp.floor(depth).astype(jnp.int32)

  big = jnp.int32(1 << 20)
  dmin = jnp.min(jnp.where(cov, cd, big), axis=(1, 2))  # [T]
  od = jnp.clip(dmin, 0, m - DEPTH_CELLS)
  dz = cd - od[:, None, None]
  cov = cov & (dz >= 0) & (dz < DEPTH_CELLS)

  dz_safe = jnp.clip(dz, 0, 31).astype(jnp.uint32)  # masked lanes: any value
  bitz = jnp.where(cov, jnp.uint32(1) << dz_safe, jnp.uint32(0))
  # Aggregate samples per (cu, cv) cell: OR over the irm×irm sub-blocks.
  bitz = bitz.reshape(-1, UV_CELLS, irm, UV_CELLS, irm)
  b3 = jax.lax.reduce(bitz, jnp.uint32(0),
                      lambda x, y: jnp.bitwise_or(x, y), (2, 4))  # [T,4,4]

  # Orient (cu, cv, d) into grid (y, x, z): unpack d bits, permute per
  # dominant axis, repack z bits.
  dbits = ((b3[..., None] >> jnp.arange(DEPTH_CELLS, dtype=jnp.uint32))
           & jnp.uint32(1))  # [T, cu, cv, d]
  dvals = jnp.arange(DEPTH_CELLS, dtype=jnp.uint32)
  uvals = jnp.arange(UV_CELLS, dtype=jnp.uint32)

  def pack_last(x, vals):
    return jnp.sum(x << vals, axis=-1, dtype=jnp.uint32)

  def pad8(x, axes):
    pads = [(0, 0)] * x.ndim
    for ax in axes:
      pads[ax] = (0, 8 - x.shape[ax])
    return jnp.pad(x, pads)

  # k=2: (u,v,d) = (x,y,z): cube[y=cv, x=cu] bits z=d.
  c2 = pad8(pack_last(jnp.transpose(dbits, (0, 2, 1, 3)), dvals), (1, 2))
  # k=0: (u,v,d) = (y,z,x): cube[y=cu, x=d] bits z=cv.
  c0 = pad8(pack_last(jnp.transpose(dbits, (0, 1, 3, 2)), uvals), (1,))
  # k=1: (u,v,d) = (z,x,y): cube[y=d, x=cv] bits z=cu.
  c1 = pad8(pack_last(jnp.transpose(dbits, (0, 3, 2, 1)), uvals), (2,))
  cube = jnp.where((k == 0)[:, None, None], c0,
                   jnp.where((k == 1)[:, None, None], c1, c2))  # [T,8,8] u32

  # u/v block origins are snapped to multiples of 4 in _project (content
  # ≤ 4 cells + ≤ 4 shift = 8 ✓); the depth role keeps its exact origin
  # (its content already spans up to 8 cells). Snapping collapses nearby
  # triangles onto identical (slot, oy, ox) origins so the post-sort
  # duplicate merge can fuse their blocks.
  bu, bv = g["bu"], g["bv"]
  su_ = ou - bu  # ∈ [0, 4]
  sv_ = ov - bv
  bd = od  # already ∈ [0, m-8]

  zero = jnp.zeros_like(su_)
  bx, by, bz = (_place(u_ax, v_ax, a, bu, bv, bd) for a in (0, 1, 2))
  sx, sy, sz = (_place(u_ax, v_ax, a, su_, sv_, zero) for a in (0, 1, 2))

  cube = cube << sz.astype(jnp.uint32)[:, None, None]

  # Dynamic row/col shift (∈ [0, 4], content never pushed out): a static
  # shift per candidate + select — gathers (take_along_axis) are slow on
  # TPU.
  def shift8(x, sh, axis):
    res = jnp.zeros_like(x)
    for cand in range(5):
      if cand == 0:
        shifted = x
      else:
        pads = [(0, 0), (0, 0), (0, 0)]
        pads[axis] = (cand, 0)
        sl = [slice(None)] * 3
        sl[axis] = slice(0, 8)
        shifted = jnp.pad(x, pads)[tuple(sl)]
      res = res | jnp.where((sh == cand)[:, None, None], shifted,
                            jnp.uint32(0))
    return res

  cube = shift8(cube, sy, 1)
  cube = shift8(cube, sx, 2)

  # Pack z-words: bit position bz + bit-index-in-cube.
  #
  # The barrier pins the fusion boundary to the COMPACT cube: without
  # it XLA fuses the shifts with the (triangle-minor-layout) phase-A
  # producers and materializes the lo/hi broadcasts at full
  # [T, 8, 8, NW] before the layout copy the scatter kernel's operand
  # constraint forces — two NW×-bigger transposing copies plus a
  # separate select fusion (~3.0 ms/step at the headline load; the
  # same chain is ~4× at heavy triangle counts). With the barrier the
  # relayout happens on cube/bz and the whole expansion fuses into one
  # pass that writes pw in the kernel's layout (~0.7 ms/step).
  cube, bz = jax.lax.optimization_barrier((cube, bz))
  shift = (bz % 32).astype(jnp.uint32)[:, None, None]
  wd = (bz // 32)[:, None, None]
  lo = cube << shift
  hi = (cube >> 1) >> (jnp.uint32(31) - shift)
  wds = jnp.arange(nw, dtype=jnp.int32)
  pw = jnp.where(wds == wd[..., None], lo[..., None],
                 jnp.where(wds == wd[..., None] + 1, hi[..., None],
                           jnp.uint32(0)))  # [T, 8, 8, NW]
  pw = pw.reshape(-1, 8, 8 * nw)

  nonzero = jnp.any(b3 != 0, axis=(1, 2))
  origins = jnp.where(
      nonzero & tri_valid,
      (tri_mesh_slot * m + by) * m + bx,
      jnp.int32(-1))
  return origins, pw


def voxelize_blocked_packed(
    triangles: jnp.ndarray,          # f32[B, T, 3, 3]
    tri_mesh_slot: jnp.ndarray,      # i32[B, T]
    view2voxel: jnp.ndarray,         # f32[B, M, 4, 4]
    tri_valid: jnp.ndarray,          # bool[B, T]
    **kwargs,
) -> jnp.ndarray:
  """Batched blocked voxelization. Returns packed u32[B, M, H, W, NW].

  On a multi-device pure-data mesh the whole computation (phase A,
  scatter kernel, packed fill) runs per batch shard under shard_map —
  each device voxelizes its local scenes with no cross-device traffic,
  and the fill's adaptive while_loop is shard-local (no collectives in
  its cond, so no multi-host stream-desync hazard on this path).

  Duplicate-origin merging happens inside the scatter kernel (VMEM run
  accumulation, ops/block_scatter.py). An XLA-side log-doubling
  pre-merge pass was A/B'd in round 2 and removed: it cost ~21 ms/step
  at 12k tris and the kernel merge subsumes it at zero extra passes.
  """
  # The shard mesh is resolved OUTSIDE the jitted impl and passed as a
  # static argument: the kernel_sharding registry is process-global
  # mutable state, and baking it into a module-level jit's trace without
  # keying on it would serve stale executables after a re-registration.
  kernel_sharding.trace_counters["block_scatter"] += 1
  mode = kernel_sharding.kernel_mode(triangles.shape[0],
                                     allow_space_batch=True)
  shard_mesh = mode if isinstance(mode, jax.sharding.Mesh) else None
  return _voxelize_blocked_packed(triangles, tri_mesh_slot, view2voxel,
                                  tri_valid, shard_mesh=shard_mesh,
                                  **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("num_meshes", "resolution",
                     "image_resolution_multiplier",
                     "conservative_rasterization", "fill_inside",
                     "fill_rounds", "shard_mesh", "uniform_mats"))
def _voxelize_blocked_packed(
    triangles: jnp.ndarray,
    tri_mesh_slot: jnp.ndarray,
    view2voxel: jnp.ndarray,
    tri_valid: jnp.ndarray,
    *,
    num_meshes: int,
    resolution: Tuple[int, int, int],
    image_resolution_multiplier: int = 8,
    conservative_rasterization: bool = False,
    fill_inside: bool = True,
    fill_rounds=None,
    shard_mesh=None,
    uniform_mats: bool = False,
) -> jnp.ndarray:
  d, h, w = resolution
  assert d == h == w and d % 32 == 0
  m = d
  nw = m // 32
  irm = int(image_resolution_multiplier)

  def core(triangles, tri_mesh_slot, view2voxel, tri_valid):
    origins, pw = jax.vmap(functools.partial(
        _phase_a, m=m, irm=irm,
        conservative=conservative_rasterization,
        uniform_mats=uniform_mats))(
            triangles, tri_mesh_slot, view2voxel, tri_valid)

    packed = block_scatter_or(origins, pw, meshes=num_meshes, h=m, w=m,
                              nw=nw)
    packed = packed.reshape(packed.shape[:-1] + (m, nw))
    if fill_inside:
      packed = fill_inside_packed(packed, fill_rounds=fill_rounds)
    return packed

  if shard_mesh is not None:
    # Under a non-trivial 'space' axis the batch shards over BOTH axes
    # (each device voxelizes whole scenes); the training step's sharding
    # constraint then reshards the grids into P('data', 'space') with an
    # ICI all-to-all — the kernel itself never splits a scene.
    axes = (("data", "space")
            if shard_mesh.shape.get("space", 1) > 1 else ("data",))
    return kernel_sharding.map_over_data(core, shard_mesh, n_in=4,
                                         axes=axes)(
        triangles, tri_mesh_slot, view2voxel, tri_valid)
  return core(triangles, tri_mesh_slot, view2voxel, tri_valid)


def voxelize_blocked(triangles, tri_mesh_slot, view2voxel, tri_valid,
                     dtype=jnp.float32, **kwargs) -> jnp.ndarray:
  """Like voxelize_blocked_packed but returns dtype[B, M, D, H, W]."""
  packed = voxelize_blocked_packed(triangles, tri_mesh_slot, view2voxel,
                                   tri_valid, **kwargs)
  return unpack_grid(packed, dtype=dtype)
