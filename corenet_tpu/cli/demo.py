"""Single-scene reconstruction demo (the role of corenet_demo.ipynb).

Loads a checkpoint (native .cpt — including ones imported from the
reference's torch releases — or a frozen TF graph), reconstructs one
scene NPZ, and writes a qualitative tile:
[input image | predicted surface | predicted voxels | GT voxels | GT mesh].

Usage:
  python -m corenet_tpu.cli.demo --scene=<scene.npz> --meshes_dir=<dir> \
      --checkpoint=<state.cpt | model.pb> --output=recon.png \
      [--resolution=128]
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from corenet_tpu.utils import flags, fs

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ProgramArgs:
  scene: str = flags.flag("Path to a scene NPZ")
  meshes_dir: str = flags.flag("Directory with mesh NPZs")
  checkpoint: str = flags.flag("corenet-tpu .cpt or frozen-TF .pb")
  output: str = flags.flag("Output PNG path", default="reconstruction.png")
  resolution: int = flags.flag("Output grid resolution", default=128)
  high_realism: bool = flags.flag("Use the PBRT render as input",
                                  default=True)
  packed_inference: bool = flags.flag(
      "Packed (space-to-depth) decoder execution for eligible models;"
      " --nopacked_inference forces fine-grid execution", default=True)


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  args = flags.parse_flags(ProgramArgs, argv)

  import jax.numpy as jnp
  from corenet_tpu.data import batching, scene as scene_lib
  from corenet_tpu.data.dataset import DatasetElement
  from corenet_tpu.eval.qualitative import visualize_scene_output
  from corenet_tpu.train import gt as gt_lib

  sc = scene_lib.load_from_npz(args.scene, args.meshes_dir)
  element = DatasetElement(
      scene_id=fs.splitext(fs.basename(args.scene))[0],
      mesh_vertices=np.concatenate(sc.mesh_vertices, 0),
      mesh_num_tri=np.array([v.shape[0] for v in sc.mesh_vertices],
                            np.int32),
      view_transform=sc.view_transform,
      camera_transform=sc.camera_transform,
      o2w_transforms=sc.o2w_transforms,
      mesh_labels=np.arange(1, len(sc.mesh_vertices) + 1, dtype=np.int32),
      input_image=(sc.pbrt_image if args.high_realism else sc.opengl_image))

  res = (args.resolution,) * 3
  m = float(args.resolution)
  hb = batching.batch([element], max_edge_view=5.0 / m)
  inputs = hb.step_inputs("MESH_INDEX")
  grid, v2x = gt_lib.voxelize_batch(
      inputs["triangles"], inputs["tri_mesh_slot"], inputs["tri_valid"],
      inputs["mesh_labels"], inputs["grid_offset"], resolution=res,
      image_resolution_multiplier=4, max_bbox_pixels=24)

  if args.checkpoint.endswith(".pb"):
    from corenet_tpu.eval.tf_model import super_resolution_from_tf_model
    inference = super_resolution_from_tf_model(args.checkpoint)
  else:
    import jax
    from corenet_tpu.config import TrainPipeline, config_from_dict
    from corenet_tpu.eval.super_resolution import super_resolution_from_model
    from corenet_tpu.models.corenet import CoreNet
    from corenet_tpu.train import checkpoint as cpt_lib
    from corenet_tpu.train import state as state_lib
    from corenet_tpu.train.pipeline import model_config_from_train_config
    raw, extra = cpt_lib.decode_state(fs.read_bytes(args.checkpoint))
    config = config_from_dict(TrainPipeline, extra["full_config"])
    model_config = model_config_from_train_config(
        config.train, len(extra["classes"]))
    model = CoreNet(model_config)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.uint8),
        jnp.eye(4)[None], jnp.full((1, 3), 0.5), train=False))()
    template = state_lib.create_train_state(
        variables, state_lib.create_optimizer())
    state, _ = cpt_lib.decode_state(fs.read_bytes(args.checkpoint), template)
    inference = super_resolution_from_model(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        model_config.decoder.resolution,
        packed_execution=args.packed_inference)

  pmf = inference(jnp.asarray(hb.image), jnp.asarray(hb.camera), v2x,
                  jnp.asarray(hb.grid_offset), res)

  w2x = np.eye(4, dtype=np.float32)
  w2x[:3, :3] *= m
  meshes = [hb.triangles[0][hb.tri_valid[0] & (hb.tri_mesh_slot[0] == j)]
            for j in range(int(hb.mesh_valid[0].sum()))]
  tile = visualize_scene_output(
      hb.image[0], np.asarray(pmf[0]), np.asarray(grid[0]), meshes,
      list(hb.mesh_labels[0]), np.linalg.inv(w2x))

  import io
  import PIL.Image
  buf = io.BytesIO()
  PIL.Image.fromarray(tile).save(buf, format="PNG")
  fs.write_bytes(args.output, buf.getvalue())
  log.info("Wrote %s", args.output)


if __name__ == "__main__":
  main()
