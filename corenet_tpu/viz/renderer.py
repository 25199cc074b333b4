"""Software renderers for qualitative results — jitted XLA, no GL.

Replaces the reference's EGL/OpenGL stack (gl/egl_context.py,
gl/rasterizer.py, the GLSL triangle/voxel geometry shaders) with two
TPU-idiomatic programs:

* `render_mesh` — a chunked z-buffered triangle rasterizer: per chunk of
  triangles, edge functions are evaluated as dense [chunk, H, W] affine
  maps (pure VPU work), depths interpolate barycentrically, and a running
  (zbuffer, color) carry folds chunks with a fori_loop. Eye-light diffuse
  shading (|n·l| + ambient), like the reference's point-light fragment
  shader.

* `render_voxel_grid` — an Amanatides–Woo DDA raycaster over the label
  grid: every pixel's ray marches voxel-by-voxel in lockstep (masked
  fori_loop, fully vectorized), shading the first non-transparent voxel
  by its entry face. This replaces the cube-expansion geometry shader
  (voxel_renderer.geom) with a data-parallel program — no 24-vertex cube
  amplification, memory O(pixels).

Cameras are world→clip 4×4 matrices (see viz/camera.py); images are
uint8[H, W, 3].
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from corenet_tpu.viz.colors import DEFAULT_COLOR_PALETTE

_BG = jnp.asarray([1.0, 1.0, 1.0])  # white background
_AMBIENT = 0.36
_DIFFUSE = 0.64


@functools.partial(jax.jit,
                   static_argnames=("image_size", "chunk", "textured"))
def _render_mesh_impl(triangles, tri_colors, tri_valid, camera,
                      image_size: Tuple[int, int], chunk: int,
                      textured: bool = False,
                      tri_uvs=None, tri_tex=None, textures=None):
  h, w = image_size
  t_total = triangles.shape[0]
  num_chunks = t_total // chunk

  ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]  # [H, 1]
  xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]  # [1, W]

  def rasterize_chunk(i, carry):
    zbuf, color = carry
    tri = jax.lax.dynamic_slice_in_dim(triangles, i * chunk, chunk)
    col = jax.lax.dynamic_slice_in_dim(tri_colors, i * chunk, chunk)
    valid = jax.lax.dynamic_slice_in_dim(tri_valid, i * chunk, chunk)
    if textured:
      uvs = jax.lax.dynamic_slice_in_dim(tri_uvs, i * chunk, chunk)
      tex = jax.lax.dynamic_slice_in_dim(tri_tex, i * chunk, chunk)

    # World-space normal for shading (double-sided).
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    # Project to clip space.
    hom = jnp.einsum("ij,ctj->cti", camera[:3, :3], tri) + camera[:3, 3]
    ww = jnp.einsum("j,ctj->ct", camera[3, :3], tri) + camera[3, 3]
    in_front = jnp.all(ww > 1e-6, axis=1)
    ww = jnp.where(ww == 0, 1e-6, ww)
    ndc = hom / ww[..., None]
    # Viewport: ndc [-1,1] → pixels; y from ndc +1 at row 0 is already
    # handled by the flipped-Y projection, so plain mapping here.
    px = (ndc[..., 0] * 0.5 + 0.5) * w  # [C, 3]
    py = (ndc[..., 1] * 0.5 + 0.5) * h
    pz = ndc[..., 2]

    def edge(ax, ay, bx, by):
      # e(x, y) = (bx-ax)(y-ay) - (by-ay)(x-ax) as affine coefficients.
      a = -(by - ay)
      b = (bx - ax)
      c = (by - ay) * ax - (bx - ax) * ay
      return (a[:, None, None] * xs[None] + b[:, None, None] * ys[None] +
              c[:, None, None])

    e0 = edge(px[:, 1], py[:, 1], px[:, 2], py[:, 2])
    e1 = edge(px[:, 2], py[:, 2], px[:, 0], py[:, 0])
    e2 = edge(px[:, 0], py[:, 0], px[:, 1], py[:, 1])
    area = e0 + e1 + e2  # [C, H, W], constant per triangle
    pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
    neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    nz = jnp.abs(area) > 1e-12
    cover = (pos | neg) & nz & valid[:, None, None] & in_front[:, None, None]

    inv_area = jnp.where(nz, 1.0 / jnp.where(nz, area, 1.0), 0.0)
    depth = (e0 * pz[:, 0, None, None] + e1 * pz[:, 1, None, None] +
             e2 * pz[:, 2, None, None]) * inv_area
    depth = jnp.where(cover & (depth > -1.0) & (depth < 1.0), depth, jnp.inf)

    best = jnp.argmin(depth, axis=0)  # [H, W]
    best_z = jnp.take_along_axis(depth, best[None], axis=0)[0]

    # Eye-light diffuse shading per triangle.
    eye_dir = camera[2, :3] / jnp.maximum(
        jnp.linalg.norm(camera[2, :3]), 1e-12)
    lum = _AMBIENT + _DIFFUSE * jnp.abs(n @ eye_dir)

    base = col[best]  # [H, W, 3]
    if textured:
      # Perspective-correct UV at the winning triangle: interpolate
      # (u/w, v/w, 1/w) with the screen-space barycentrics of `best`,
      # then divide (the GL rasterizer's noperspective-free default).
      def at_best(e):  # [C, H, W] -> [H, W]
        return jnp.take_along_axis(e, best[None], axis=0)[0]
      b0, b1, b2 = at_best(e0), at_best(e1), at_best(e2)
      area_b = at_best(area)
      inv_area_b = jnp.where(jnp.abs(area_b) > 1e-12, 1.0 / area_b, 0.0)
      b0, b1, b2 = b0 * inv_area_b, b1 * inv_area_b, b2 * inv_area_b
      uv_b = uvs[best]                     # [H, W, 3, 2]
      w_b = jnp.maximum(ww[best], 1e-6)    # [H, W, 3]
      inv_w = (b0 / w_b[..., 0] + b1 / w_b[..., 1] + b2 / w_b[..., 2])
      num = (b0[..., None] * uv_b[..., 0, :] / w_b[..., 0, None] +
             b1[..., None] * uv_b[..., 1, :] / w_b[..., 1, None] +
             b2[..., None] * uv_b[..., 2, :] / w_b[..., 2, None])
      uv = num / jnp.where(jnp.abs(inv_w[..., None]) > 1e-12,
                           inv_w[..., None], 1.0)
      # Bilinear sample from the (Y-flipped at load) texture array.
      th, tw = textures.shape[1], textures.shape[2]
      fx = uv[..., 0] * tw - 0.5
      fy = uv[..., 1] * th - 0.5
      x0 = jnp.floor(fx).astype(jnp.int32)
      y0 = jnp.floor(fy).astype(jnp.int32)
      ax = (fx - x0)[..., None]
      ay = (fy - y0)[..., None]
      layer = jnp.clip(tex[best], 0, textures.shape[0] - 1)

      def fetch(yy, xx):
        yy = jnp.clip(yy, 0, th - 1)
        xx = jnp.clip(xx, 0, tw - 1)
        return textures[layer, yy, xx].astype(jnp.float32) / 255.0

      texel = ((1 - ay) * ((1 - ax) * fetch(y0, x0) + ax * fetch(y0, x0 + 1))
               + ay * ((1 - ax) * fetch(y0 + 1, x0)
                       + ax * fetch(y0 + 1, x0 + 1)))
      base = jnp.where((tex[best] >= 0)[..., None], texel, base)
    best_color = jnp.clip(base * lum[best][..., None], 0.0, 1.0)

    closer = best_z < zbuf
    zbuf = jnp.where(closer, best_z, zbuf)
    color = jnp.where(closer[..., None], best_color, color)
    return zbuf, color

  zbuf = jnp.full((h, w), jnp.inf, jnp.float32)
  color = jnp.broadcast_to(_BG, (h, w, 3)).astype(jnp.float32)
  zbuf, color = jax.lax.fori_loop(0, num_chunks, rasterize_chunk,
                                  (zbuf, color))
  return (jnp.clip(color, 0, 1) * 255).astype(jnp.uint8)


def render_mesh(triangles: np.ndarray,
                tri_colors: np.ndarray,
                camera: np.ndarray,
                image_size: Tuple[int, int] = (256, 256),
                chunk: int = 512,
                tri_uvs: Optional[np.ndarray] = None,
                tri_tex: Optional[np.ndarray] = None,
                textures: Optional[np.ndarray] = None) -> np.ndarray:
  """Renders triangles with per-triangle colors and optional textures.

  Args:
    triangles: float32[T, 3, 3] world-space vertices.
    tri_colors: float32[T, 3] RGB in [0, 1].
    camera: float32[4, 4] world→clip.
    tri_uvs: optional float32[T, 3, 2] per-vertex texcoords.
    tri_tex: optional int32[T] texture layer per triangle; -1 = use
      tri_colors (the reference's untextured-material path,
      point_light_illumination.frag:47-70).
    textures: optional uint8[K, TH, TW, 3] texture array (Y-flipped at
      load — see scene_renderer.load_textures).
  Returns: uint8[H, W, 3].
  """
  t = triangles.shape[0]
  if t == 0:
    return np.full(image_size + (3,), 255, np.uint8)
  # Pad the triangle count to a power of two: extracted meshes have a
  # different count per scene, and exact-shape padding would recompile
  # the rasterizer for every render — buckets bound the distinct
  # compiled shapes to log2(max_triangles).
  bucket = 1 << max(t - 1, 7).bit_length()
  chunk = min(chunk, bucket)
  pad = bucket - t
  triangles = np.concatenate(
      [np.asarray(triangles, np.float32),
       np.zeros((pad, 3, 3), np.float32)], 0)
  tri_colors = np.concatenate(
      [np.asarray(tri_colors, np.float32), np.zeros((pad, 3), np.float32)], 0)
  tri_valid = np.arange(t + pad) < t
  textured = textures is not None and tri_uvs is not None
  kwargs = {}
  if textured:
    tri_uvs = np.concatenate(
        [np.asarray(tri_uvs, np.float32),
         np.zeros((pad, 3, 2), np.float32)], 0)
    if tri_tex is None:
      tri_tex = np.zeros((t,), np.int32)
    tri_tex = np.concatenate(
        [np.asarray(tri_tex, np.int32), np.full((pad,), -1, np.int32)], 0)
    kwargs = dict(tri_uvs=jnp.asarray(tri_uvs),
                  tri_tex=jnp.asarray(tri_tex),
                  textures=jnp.asarray(np.asarray(textures, np.uint8)))
  return np.asarray(_render_mesh_impl(
      jnp.asarray(triangles), jnp.asarray(tri_colors),
      jnp.asarray(tri_valid), jnp.asarray(camera, jnp.float32),
      tuple(image_size), int(chunk), textured=textured, **kwargs))


@functools.partial(jax.jit, static_argnames=("image_size",))
def _render_voxels_impl(grid, palette, camera, grid_to_world,
                        image_size: Tuple[int, int]):
  h, w = image_size
  d_, h_, w_ = grid.shape
  dims = jnp.asarray([w_, h_, d_], jnp.float32)  # (x, y, z) extents

  # Rays in grid space: unproject pixel centers at near/far NDC planes
  # through inv(camera @ grid_to_world).
  m = camera @ grid_to_world
  inv = jnp.linalg.inv(m)
  ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2 - 1
  xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2 - 1
  gy, gx = jnp.meshgrid(ys, xs, indexing="ij")

  def unproject(z):
    p = jnp.stack([gx, gy, jnp.full_like(gx, z), jnp.ones_like(gx)], -1)
    q = p @ inv.T
    return q[..., :3] / q[..., 3:4]

  p0 = unproject(-0.9999)
  p1 = unproject(0.9999)
  dirs = p1 - p0
  dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                            1e-12)

  # Slab test against the grid AABB [0, dims].
  inv_dir = 1.0 / jnp.where(jnp.abs(dirs) < 1e-9,
                            jnp.where(dirs >= 0, 1e-9, -1e-9), dirs)
  t0 = (0.0 - p0) * inv_dir
  t1 = (dims - p0) * inv_dir
  t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)
  t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
  t_enter = jnp.maximum(t_enter, 0.0)
  hit_box = t_enter < t_exit

  eps = 1e-4
  start = p0 + dirs * (t_enter + eps)[..., None]
  iv = jnp.clip(jnp.floor(start).astype(jnp.int32), 0,
                jnp.asarray([w_ - 1, h_ - 1, d_ - 1]))
  step = jnp.where(dirs >= 0, 1, -1).astype(jnp.int32)
  next_bound = iv.astype(jnp.float32) + (step > 0)
  tmax = (next_bound - p0) * inv_dir
  tdelta = jnp.abs(inv_dir)

  state = dict(
      iv=iv, tmax=tmax,
      label=jnp.zeros((h, w), jnp.int32),
      face=jnp.zeros((h, w), jnp.int32),   # entry axis (0=x, 1=y, 2=z)
      active=hit_box,
  )
  # Entry face of the box for rays that hit an occupied boundary voxel.
  init_face = jnp.argmax(
      jnp.where(jnp.stack([t0, t1], -1).reshape(h, w, 6) == 0, 0, 0), -1)
  del init_face
  state["face"] = jnp.argmax((jnp.minimum(t0, t1) == t_enter[..., None])
                             .astype(jnp.int32), axis=-1)

  def sample(iv):
    x, y, z = iv[..., 0], iv[..., 1], iv[..., 2]
    inb = ((x >= 0) & (x < w_) & (y >= 0) & (y < h_) & (z >= 0) & (z < d_))
    xc = jnp.clip(x, 0, w_ - 1)
    yc = jnp.clip(y, 0, h_ - 1)
    zc = jnp.clip(z, 0, d_ - 1)
    return jnp.where(inb, grid[zc, yc, xc], 0), inb

  def body(_, st):
    lbl, inb = sample(st["iv"])
    hit = st["active"] & inb & (lbl > 0)
    st = dict(st)
    st["label"] = jnp.where(hit, lbl, st["label"])
    st["active"] = st["active"] & ~hit & inb
    axis = jnp.argmin(st["tmax"], axis=-1)  # next crossing axis
    onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
    st["face"] = jnp.where(st["active"], axis, st["face"])
    st["iv"] = st["iv"] + onehot * step * st["active"][..., None]
    st["tmax"] = st["tmax"] + onehot * tdelta * st["active"][..., None]
    return st

  max_steps = int(w_ + h_ + d_ + 3)
  state = jax.lax.fori_loop(0, max_steps, body, state)

  shade = jnp.asarray([0.92, 0.78, 0.62])  # per entry axis (x, y, z)
  lum = shade[state["face"]]
  col = palette[jnp.clip(state["label"], 0, palette.shape[0] - 1)]
  visible = (state["label"] > 0) & (col[..., 0] >= 0)
  rgb = jnp.where(visible[..., None], jnp.clip(col, 0, 1) * lum[..., None],
                  _BG)
  return (rgb * 255).astype(jnp.uint8)


def render_voxel_grid(grid: np.ndarray,
                      camera: Optional[np.ndarray] = None,
                      palette: Optional[np.ndarray] = None,
                      grid_to_world: Optional[np.ndarray] = None,
                      image_size: Tuple[int, int] = (256, 256)) -> np.ndarray:
  """Renders a labeled voxel grid int[D, H, W] by raycasting.

  A voxel with label L > 0 renders with palette[L] (palette entries with a
  negative first component are transparent). The default camera frames the
  grid box.
  """
  grid = np.asarray(grid, np.int32)
  d_, h_, w_ = grid.shape
  if grid_to_world is None:
    grid_to_world = np.eye(4, dtype=np.float32)
  if camera is None:
    from corenet_tpu.viz import camera as camera_util
    box = np.asarray(grid_to_world[:3, :3] @ [w_, h_, d_] +
                     grid_to_world[:3, 3])
    camera = camera_util.default_camera(
        np.minimum(grid_to_world[:3, 3], box), np.maximum(
            grid_to_world[:3, 3], box))
  if palette is None:
    palette = DEFAULT_COLOR_PALETTE
  return np.asarray(_render_voxels_impl(
      jnp.asarray(grid), jnp.asarray(palette, jnp.float32),
      jnp.asarray(camera, jnp.float32),
      jnp.asarray(grid_to_world, jnp.float32), tuple(image_size)))
