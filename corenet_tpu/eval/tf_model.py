"""Frozen-TF-graph inference for the paper's released models.

Parity with /root/reference/src/corenet/tf_model.py:31-115: loads a frozen
GraphDef, reads its baked `output_resolution` constant, and wraps
`import_graph_def` in a tf.function mapping {input_image (float NHWC),
camera_transform, grid_offset, view_to_voxel_transform} → class_pdf.

Unlike the reference there are no layout shuffles: the TF graphs emit
channel-last PMFs ([B, D, H, W, C]), which is this framework's native
layout — the torch version had to permute to NCDHW both ways
(tf_model.py:76-91). TensorFlow runs on the host CPU; the PMF feeds the
normal eval pipeline as numpy.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from corenet_tpu.eval.super_resolution import SuperResolutionInference
from corenet_tpu.utils import fs


class TfFrozenGraphModel:
  """MultiOffsetInferenceFn over a frozen CoreNet TF graph."""

  def __init__(self, graph_path: str):
    import tensorflow as tf  # deferred: heavyweight, host-only
    self._tf = tf
    tf1 = tf.compat.v1
    graph_def = tf1.GraphDef.FromString(fs.read_bytes(graph_path))
    resolution_node = [
        v.attr["value"] for v in graph_def.node
        if v.name == "output_resolution"][0].tensor
    assert resolution_node.dtype == tf.int32.as_datatype_enum
    # (depth, height, width, channels)
    self.output_shape: Tuple[int, ...] = tuple(
        np.frombuffer(resolution_node.tensor_content, dtype=np.int32))

    @tf.function
    def call_graph(input_image, camera_transform, view_to_voxel_transform,
                   grid_offset):
      pmf, = tf1.import_graph_def(
          graph_def,
          input_map={
              "input_image": input_image,
              "camera_transform": camera_transform,
              "grid_offset": grid_offset,
              "view_to_voxel_transform": view_to_voxel_transform,
          },
          return_elements=["class_pdf:0"])
      return pmf

    self._call_graph = call_graph

  def __call__(self, input_image, camera_transform, view_to_voxel_transform,
               grid_offsets) -> np.ndarray:
    """image uint8/float [B, H, W, 3]; offsets float32[O, B, 3] →
    pmf float32[O, B, d, h, w, C]."""
    tf = self._tf
    image = tf.convert_to_tensor(
        np.asarray(input_image, np.float32))
    camera = tf.convert_to_tensor(np.asarray(camera_transform, np.float32))
    v2x = tf.convert_to_tensor(
        np.asarray(view_to_voxel_transform, np.float32))
    offsets = np.asarray(grid_offsets, np.float32)

    pmfs = [
        self._call_graph(image, camera, v2x,
                         tf.convert_to_tensor(offsets[i]))
        for i in range(offsets.shape[0])
    ]
    return np.stack([np.asarray(p) for p in pmfs], axis=0)


def super_resolution_from_tf_model(graph_path: str) -> SuperResolutionInference:
  model = TfFrozenGraphModel(graph_path)
  return SuperResolutionInference(model, model.output_shape[:-1])
