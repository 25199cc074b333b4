"""Imports Keras ResNet-50 ImageNet weights into the encoder param tree.

Functional parity with the reference importer
(/root/reference/src/import_resnet50_checkpoint.py): it maps the Keras
h5 layer names (conv1/bn_conv1, res{S}{B}_branch{1,2a,2b,2c},
bn{S}{B}_branch...) onto the model's parameters. Unlike the torch
version, NO kernel transposition is needed — Keras stores HWIO, which is
this framework's native layout (the reference had to shuffle to OIHW,
import_resnet50_checkpoint.py:428-429).

Output: a single .npz with flat keys
  params/encoder/<module>/<name>   (kernel, bias, scale)
  batch_stats/encoder/<module>/<name>  (mean, var)
BatchRenorm step counters start at 0.

Usage:
  python -m corenet_tpu.cli.import_resnet50_checkpoint \
      --keras_h5=<path to resnet50 weights .h5> --output_path=out.npz
(The reference downloads the h5 from the Keras release URL; in
zero-egress environments supply the file locally.)
"""

from __future__ import annotations

import argparse
import io
from typing import Dict

import numpy as np

from corenet_tpu.utils import fs

KERAS_RESNET50_URL = ("https://github.com/fchollet/deep-learning-models/"
                      "releases/download/v0.2/"
                      "resnet50_weights_tf_dim_ordering_tf_kernels_notop.h5")

# Stage → block letters in Keras ResNet-50.
_BLOCKS = {2: "abc", 3: "abcd", 4: "abcdef", 5: "abc"}
_BRANCHES = {"2a": "a", "2b": "b", "2c": "c", "1": "shortcut"}


def _conv_entries(out: Dict[str, np.ndarray], prefix: str, group):
  out[f"params/{prefix}/kernel"] = np.asarray(group["kernel:0"], np.float32)
  out[f"params/{prefix}/bias"] = np.asarray(group["bias:0"], np.float32)


def _bn_entries(out: Dict[str, np.ndarray], prefix: str, group):
  out[f"params/{prefix}/scale"] = np.asarray(group["gamma:0"], np.float32)
  out[f"params/{prefix}/bias"] = np.asarray(group["beta:0"], np.float32)
  out[f"batch_stats/{prefix}/mean"] = np.asarray(group["moving_mean:0"],
                                                 np.float32)
  out[f"batch_stats/{prefix}/var"] = np.asarray(group["moving_variance:0"],
                                                np.float32)
  out[f"batch_stats/{prefix}/steps"] = np.zeros([], np.int32)


def convert_keras_h5(h5_bytes: bytes) -> Dict[str, np.ndarray]:
  """Converts the Keras notop ResNet-50 h5 into our flat encoder tree."""
  import h5py
  out: Dict[str, np.ndarray] = {}
  with h5py.File(io.BytesIO(h5_bytes), "r") as f:
    def grp(name):
      g = f[name]
      # Keras h5 nests layer weights under the layer name twice.
      return g[name] if name in g else g

    _conv_entries(out, "encoder/stage1_conv", grp("conv1"))
    _bn_entries(out, "encoder/stage1_bn", grp("bn_conv1"))

    for stage, blocks in _BLOCKS.items():
      for block in blocks:
        for keras_branch, ours in _BRANCHES.items():
          conv_name = f"res{stage}{block}_branch{keras_branch}"
          bn_name = f"bn{stage}{block}_branch{keras_branch}"
          is_shortcut = keras_branch == "1"
          if is_shortcut and block != "a":
            continue  # identity blocks have no shortcut conv
          prefix = f"encoder/stage{stage}{block}"
          _conv_entries(out, f"{prefix}/conv_{ours}", grp(conv_name))
          _bn_entries(out, f"{prefix}/bn_{ours}", grp(bn_name))
  return out


def flat_tree_to_nested(flat: Dict[str, np.ndarray]) -> Dict:
  nested: Dict = {}
  for key, value in flat.items():
    node = nested
    parts = key.split("/")
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = value
  return nested


def load_encoder_variables(variables, path: str):
  """Merges an imported encoder .npz into freshly-initialized variables."""
  import jax
  import jax.numpy as jnp
  flat = dict(np.load(io.BytesIO(fs.read_bytes(path))))
  nested = flat_tree_to_nested(flat)

  variables = jax.tree_util.tree_map(lambda x: x, variables)  # copy
  out = {k: dict(v) for k, v in variables.items()}

  def merge(dst, src, path=""):
    for k, v in src.items():
      if isinstance(v, dict):
        assert k in dst, f"missing module {path}/{k} in model"
        dst[k] = dict(dst[k])
        merge(dst[k], v, f"{path}/{k}")
      else:
        assert k in dst, f"missing param {path}/{k} in model"
        expected = dst[k].shape
        assert tuple(v.shape) == tuple(expected), (
            f"{path}/{k}: checkpoint {v.shape} vs model {expected}")
        dst[k] = jnp.asarray(v, dst[k].dtype)

  for collection, tree in nested.items():
    out[collection] = dict(out[collection])
    merge(out[collection], tree, collection)
  return out


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("--keras_h5", required=True,
                      help="Path to Keras ResNet-50 notop weights h5")
  parser.add_argument("--output_path", required=True)
  args = parser.parse_args()

  flat = convert_keras_h5(fs.read_bytes(args.keras_h5))
  buf = io.BytesIO()
  np.savez(buf, **flat)
  fs.write_bytes(args.output_path, buf.getvalue())
  print(f"Wrote {len(flat)} tensors to {args.output_path}")


if __name__ == "__main__":
  main()
