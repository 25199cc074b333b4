"""Frozen-TF-graph eval path (eval/tf_model.py + cli/tf_model_eval.py).

Builds a tiny synthetic frozen GraphDef with the released-model contract
(reference tf_model.py:34-56): input nodes `input_image`,
`camera_transform`, `grid_offset`, `view_to_voxel_transform`, a baked
`output_resolution` int32 const, and a `class_pdf:0` output — then runs
it through TfFrozenGraphModel → SuperResolutionInference → EvalPipeline
to a voxel_metrics.csv via the CLI."""

import json
import os

import numpy as np
import numpy.testing as tt
import pytest

tf = pytest.importorskip("tensorflow")

from helpers import make_fixture_dataset  # noqa: E402

NATIVE = (16, 16, 16)  # baked output resolution (d, h, w)
C = 2


def _build_frozen_graph(path: str):
  """A deterministic stand-in for a released CoreNet graph: foreground
  logit is a linear ramp of the (offset-shifted) voxel coordinates plus
  tiny contributions from every input (so the input_map wiring of all
  four nodes is verified numerically)."""
  tf1 = tf.compat.v1
  g = tf1.Graph()
  d, h, w = NATIVE
  with g.as_default():
    img = tf1.placeholder(tf.float32, [None, None, None, 3],
                          name="input_image")
    cam = tf1.placeholder(tf.float32, [None, 4, 4],
                          name="camera_transform")
    off = tf1.placeholder(tf.float32, [None, 3], name="grid_offset")
    v2x = tf1.placeholder(tf.float32, [None, 4, 4],
                          name="view_to_voxel_transform")
    tf.constant(np.array([d, h, w, C], np.int32),
                name="output_resolution")

    zz, yy, xx = tf.meshgrid(tf.range(d, dtype=tf.float32),
                             tf.range(h, dtype=tf.float32),
                             tf.range(w, dtype=tf.float32), indexing="ij")
    ox = off[:, 0][:, None, None, None]
    oy = off[:, 1][:, None, None, None]
    oz = off[:, 2][:, None, None, None]
    ramp = ((xx[None] + ox) / w + (yy[None] + oy) / h
            + (zz[None] + oz) / d - 1.5)
    extra = (0.01 * tf.reduce_mean(img, axis=[1, 2, 3])
             + 0.01 * cam[:, 0, 0] + 0.01 * v2x[:, 1, 1])
    fg = 4.0 * ramp + extra[:, None, None, None]
    logits = tf.stack([-fg, fg], axis=-1)
    tf.nn.softmax(logits, axis=-1, name="class_pdf")
  with open(path, "wb") as f:
    f.write(g.as_graph_def().SerializeToString())


def _expected_pmf(image, camera, v2x, offsets_b3):
  d, h, w = NATIVE
  zz, yy, xx = np.meshgrid(np.arange(d, dtype=np.float32),
                           np.arange(h, dtype=np.float32),
                           np.arange(w, dtype=np.float32), indexing="ij")
  out = []
  for b in range(image.shape[0]):
    ox, oy, oz = offsets_b3[b]
    ramp = ((xx + ox) / w + (yy + oy) / h + (zz + oz) / d - 1.5)
    extra = (0.01 * image[b].astype(np.float32).mean()
             + 0.01 * camera[b, 0, 0] + 0.01 * v2x[b, 1, 1])
    fg = 4.0 * ramp + extra
    out.append(1.0 / (1.0 + np.exp(-2.0 * fg)))  # softmax of (-fg, fg)
  return np.stack(out)


def test_tf_frozen_graph_model_contract(tmp_path):
  from corenet_tpu.eval.tf_model import TfFrozenGraphModel
  graph_path = str(tmp_path / "model.pb")
  _build_frozen_graph(graph_path)

  model = TfFrozenGraphModel(graph_path)
  assert model.output_shape == NATIVE + (C,)

  rng = np.random.RandomState(0)
  b = 2
  image = (rng.rand(b, 24, 24, 3) * 255).astype(np.float32)
  camera = rng.randn(b, 4, 4).astype(np.float32)
  v2x = rng.randn(b, 4, 4).astype(np.float32)
  offsets = rng.rand(3, b, 3).astype(np.float32)  # [O, B, 3]

  pmf = model(image, camera, v2x, offsets)
  assert pmf.shape == (3, b) + NATIVE + (C,)
  tt.assert_allclose(pmf.sum(-1), np.ones(pmf.shape[:-1]), rtol=1e-5)
  for o in range(3):
    tt.assert_allclose(pmf[o, ..., 1],
                       _expected_pmf(image, camera, v2x, offsets[o]),
                       rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_tf_model_eval_cli_end_to_end(tmp_path):
  """cli/tf_model_eval on the synthetic graph + fixture dataset: runs
  super-resolution (32³ from the 16³ native grid → 8 offsets) through
  the full EvalPipeline and writes voxel_metrics.csv."""
  from corenet_tpu.cli import tf_model_eval
  from corenet_tpu.config import config as c
  from corenet_tpu.config.config import config_to_dict

  graph_path = str(tmp_path / "model.pb")
  _build_frozen_graph(graph_path)
  manifest, meshes_dir = make_fixture_dataset(str(tmp_path / "ds"),
                                              num_scenes=2, image_size=32)

  pipeline = c.TfModelEvalPipeline(
      string_templates=[],
      eval_config=c.EvalConfig(
          name="full_eval", num_qualitative_results=1,
          num_qualitative_results_in_tensor_board=0,
          data=c.DataPipeline(
              datasets=[c.Dataset(dataset_path=manifest,
                                  meshes_dir=meshes_dir,
                                  high_realism=True,
                                  shuffle=c.ShuffleType.NEVER)],
              shuffle=c.ShuffleType.NEVER,
              data_loader=c.DataLoaderConfig(batch_size=2,
                                             num_data_workers=1),
              voxelization_config=c.VoxelizationConfig(
                  task_type=c.TaskType.FG_BG,
                  resolution=c.Resolution(32, 32, 32),
                  voxelization_image_resolution_multiplier=2))),
      frozen_graph_path=graph_path,
      output_path=str(tmp_path / "out"))

  cfg_path = str(tmp_path / "eval.json5")
  with open(cfg_path, "w") as f:
    json.dump(config_to_dict(pipeline), f)

  miou = tf_model_eval.main(["--config_path", cfg_path])
  assert miou is not None and np.isfinite(miou)
  csv_path = os.path.join(str(tmp_path / "out"), "full_eval", "-1",
                          "voxel_metrics.csv")
  assert os.path.exists(csv_path), os.listdir(str(tmp_path / "out"))
