"""Synthetic fixture datasets for tests: tiny scene/mesh NPZs + manifest,
written in the reference's on-disk format (scene.py / dataset.py)."""

import io
import json
import os

import numpy as np

from corenet_tpu import geom


def cube_mesh(lo=0.25, hi=0.75) -> np.ndarray:
  """A closed axis-aligned cube as 12 triangles, float32[12, 3, 3]."""
  m, x = lo, hi
  tris = [
      [[m, m, m], [m, x, m], [m, m, x]], [[m, x, x], [m, x, m], [m, m, x]],
      [[x, m, m], [x, x, m], [x, m, x]], [[x, x, x], [x, x, m], [x, m, x]],
      [[m, m, m], [m, m, x], [x, m, m]], [[x, m, x], [m, m, x], [x, m, m]],
      [[m, x, m], [m, x, x], [x, x, m]], [[x, x, x], [m, x, x], [x, x, m]],
      [[m, m, m], [m, x, m], [x, m, m]], [[x, x, m], [m, x, m], [x, m, m]],
      [[m, m, x], [m, x, x], [x, m, x]], [[x, x, x], [m, x, x], [x, m, x]],
  ]
  return np.array(tris, np.float32)


def _encode_image(img: np.ndarray) -> bytes:
  import PIL.Image
  buf = io.BytesIO()
  PIL.Image.fromarray(img).save(buf, format="PNG")
  return buf.getvalue()


def make_fixture_dataset(root: str, num_scenes: int = 4, image_size: int = 64,
                         num_classes: int = 2, seed: int = 0):
  """Writes a synthetic dataset and returns (dataset_json_path, meshes_dir).

  Each scene holds one or two cubes with distinct labels; view transform is
  identity, camera is a simple ortho-ish projective matrix mapping the
  world cube [0,1]^3 into NDC.
  """
  rng = np.random.default_rng(seed)
  meshes_dir = os.path.join(root, "meshes")
  scenes_dir = os.path.join(root, "scenes")
  os.makedirs(scenes_dir, exist_ok=True)

  class_ids = [f"0{i}234567" for i in range(num_classes)]
  class_names = [f"class_{chr(ord('a') + i)}" for i in range(num_classes)]

  # One mesh NPZ per class.
  for cid in class_ids:
    d = os.path.join(meshes_dir, cid)
    os.makedirs(d, exist_ok=True)
    verts = cube_mesh()
    np.savez(os.path.join(d, "mesh0.npz"), vertices=verts,
             label=np.array(cid), mesh_id=np.array("mesh0"))

  files = []
  for i in range(num_scenes):
    n_meshes = 1 + (i % 2) % num_classes if num_classes > 1 else 1
    labels = [class_ids[(i + j) % num_classes] for j in range(n_meshes)]
    o2w = []
    for j in range(n_meshes):
      shift = rng.uniform(-0.1, 0.1, size=3).astype(np.float32)
      o2w.append(np.asarray(geom.translate(shift), np.float32))
    o2w = np.stack(o2w)
    image = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
    # Camera: map view-space [0,1]^3 → ndc [-1,1], +w=1 (ortho-like).
    camera = np.array([
        [2, 0, 0, -1],
        [0, 2, 0, -1],
        [0, 0, 2, -1],
        [0, 0, 0, 1],
    ], np.float32)
    name = f"scene_{i:03d}.npz"
    np.savez(
        os.path.join(scenes_dir, name),
        mesh_labels=np.array(labels),
        mesh_filenames=np.array(["mesh0"] * n_meshes),
        view_transform=np.eye(4, dtype=np.float32),
        mesh_object_to_world_transforms=o2w,
        camera_transform=camera,
        mesh_visible_fractions=np.ones([n_meshes], np.float32),
        opengl_image=np.array(_encode_image(image), dtype=object),
        pbrt_image=np.array(_encode_image(image), dtype=object),
    )
    files.append(name)

  manifest = {
      "classes": [{"id": cid, "human_readable": name}
                  for cid, name in zip(class_ids, class_names)],
      "files": files,
  }
  manifest_path = os.path.join(scenes_dir, "dataset.json")
  with open(manifest_path, "w") as f:
    json.dump(manifest, f)
  return manifest_path, meshes_dir
