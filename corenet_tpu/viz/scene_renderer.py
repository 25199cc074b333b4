"""High-level scene rendering with per-material diffuse colors.

The role of the reference's scene_renderer.py (GL + texture arrays +
point-light shader): renders a Scene's meshes in world space with each
triangle colored by its material's diffuse color (materials come from the
mesh NPZs' extra fields) and eye-light diffuse shading. Texture *sampling*
is not implemented — textured materials fall back to their diffuse color
(or the palette when no materials are present); qualitative-result parity
does not depend on it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from corenet_tpu import geom
from corenet_tpu.data.scene import Scene
from corenet_tpu.viz import renderer
from corenet_tpu.viz.colors import DEFAULT_COLOR_PALETTE


def scene_triangle_colors(sc: Scene) -> Sequence[np.ndarray]:
  """Per-triangle RGB colors per mesh: material diffuse colors when the
  scene was loaded with extra fields, palette colors otherwise."""
  colors = []
  for i, mesh in enumerate(sc.mesh_vertices):
    t = mesh.shape[0]
    if sc.material_ids and sc.diffuse_colors and len(sc.material_ids) > i:
      ids = np.clip(sc.material_ids[i], 0, len(sc.diffuse_colors[i]) - 1)
      colors.append(np.asarray(sc.diffuse_colors[i], np.float32)[ids])
    else:
      palette_color = DEFAULT_COLOR_PALETTE[(i + 1) %
                                            len(DEFAULT_COLOR_PALETTE)]
      colors.append(np.tile(palette_color[None], (t, 1)))
  return colors


def render_scene(sc: Scene,
                 camera: Optional[np.ndarray] = None,
                 image_size: Tuple[int, int] = (256, 256),
                 world_space: bool = True) -> np.ndarray:
  """Renders all meshes of a scene (o2w-transformed when world_space).

  camera defaults to the scene's own view+camera transform
  (camera_transform @ view_transform), i.e. the input render's viewpoint.
  """
  tris, cols = [], []
  for i, mesh in enumerate(sc.mesh_vertices):
    if not mesh.size:
      continue
    m = mesh
    if world_space:
      m = np.asarray(geom.transform_mesh(m, sc.o2w_transforms[i]))
    tris.append(m)
  colors = scene_triangle_colors(sc)
  cols = [c for c, t in zip(colors, sc.mesh_vertices) if t.size]
  if not tris:
    return np.full(image_size + (3,), 255, np.uint8)
  all_tris = np.concatenate(tris, 0)
  all_cols = np.concatenate(cols, 0)

  if camera is None:
    camera = np.asarray(sc.camera_transform @ sc.view_transform
                        if world_space else sc.camera_transform)
    # The stored camera may not be Y-flipped for image rows; use it as-is.
  return renderer.render_mesh(all_tris, np.clip(all_cols, 0, 1), camera,
                              image_size)
