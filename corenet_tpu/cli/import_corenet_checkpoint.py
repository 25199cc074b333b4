"""Imports a reference (PyTorch) CoreNet checkpoint into a corenet-tpu one.

The reference releases re-trained h5/h7/m7/m9 checkpoints as torch-saved
SavedState blobs (/root/reference/src/corenet/state.py:40-47, README
"PyTorch re-train ckpts"). This tool maps every tensor onto this
framework's param tree — OIHW→HWIO for 2D convs, (I,O,kd,kh,kw)→DHWIO for
transposed 3D convs, (O,I,kd,kh,kw)→DHWIO for 3D convs, [out,in]→[in,out]
for the latent linear, BatchRenorm buffers to 'batch_stats' — and writes a
native .cpt (fresh Adam state) whose extra_metadata embeds the matching
train pipeline config, so `python -m corenet_tpu.cli.eval` runs it
directly.

Usage:
  python -m corenet_tpu.cli.import_corenet_checkpoint \
      --torch_checkpoint=h7.cpt --train_config=configs/models/h7.json5 \
      --output_path=out/h7_imported.cpt [-D data_dir=...]
"""

from __future__ import annotations

import dataclasses
import io
import logging
from typing import Dict, List

import numpy as np

from corenet_tpu.utils import flags, fs

log = logging.getLogger(__name__)

_STAGE_BLOCKS = {2: "abc", 3: "abcd", 4: "abcdef", 5: "abc"}
_OPS = {"op_a": "a", "op_b": "b", "op_c": "c", "shortcut": "shortcut"}


def _bn_entries(out, torch_state, tprefix, prefix):
  out[f"params/{prefix}/scale"] = torch_state[f"{tprefix}.weight"]
  out[f"params/{prefix}/bias"] = torch_state[f"{tprefix}.bias"]
  out[f"batch_stats/{prefix}/mean"] = torch_state[f"{tprefix}.running_mean"]
  out[f"batch_stats/{prefix}/var"] = torch_state[f"{tprefix}.running_var"]
  out[f"batch_stats/{prefix}/steps"] = np.asarray(
      torch_state[f"{tprefix}.num_batches_tracked"], np.int32)


def _conv2d_entries(out, torch_state, tprefix, prefix):
  w = torch_state[f"{tprefix}.weight"]  # [O, I, kh, kw]
  out[f"params/{prefix}/kernel"] = np.transpose(w, (2, 3, 1, 0))
  out[f"params/{prefix}/bias"] = torch_state[f"{tprefix}.bias"]


def convert_torch_state(torch_state: Dict[str, np.ndarray]
                        ) -> Dict[str, np.ndarray]:
  """Maps a reference CoreNet state_dict to our flat variable tree."""
  t = {k: np.asarray(v) for k, v in torch_state.items()}
  out: Dict[str, np.ndarray] = {}

  # ----- encoder -----
  _conv2d_entries(out, t, "encoder.stage1.conv", "encoder/stage1_conv")
  _bn_entries(out, t, "encoder.stage1_part2.bn", "encoder/stage1_bn")
  for stage, blocks in _STAGE_BLOCKS.items():
    for block in blocks:
      for top, ours in _OPS.items():
        if top == "shortcut" and block != "a":
          continue
        tp = f"encoder.stage{stage}.{block}.{top}"
        mp = f"encoder/stage{stage}{block}"
        name = f"conv_{ours}" if top != "shortcut" else "conv_shortcut"
        bn_name = f"bn_{ours}" if top != "shortcut" else "bn_shortcut"
        _conv2d_entries(out, t, f"{tp}.conv", f"{mp}/{name}")
        _bn_entries(out, t, f"{tp}.bn", f"{mp}/{bn_name}")

  # ----- decoder -----
  out["params/decoder/stage_0/kernel"] = np.transpose(
      t["decoder.stage_0.weight"], (1, 0))
  out["params/decoder/stage_0/bias"] = t["decoder.stage_0.bias"]
  _bn_entries(out, t, "decoder.stage_1.b1", "decoder/stage_1_bn")
  # ConvTranspose3d: torch [I, O, kd, kh, kw] → DHWIO.
  w = t["decoder.stage_1.t1.weight"]
  out["params/decoder/stage_1_t/kernel"] = np.transpose(w, (2, 3, 4, 0, 1))
  out["params/decoder/stage_1_t/bias"] = t["decoder.stage_1.t1.bias"]

  for stage in range(2, 7):
    tp = f"decoder.stage_{stage}"
    mp = f"decoder/stage_{stage}"
    _bn_entries(out, t, f"{tp}.b1", f"{mp}_bn1")
    _bn_entries(out, t, f"{tp}.b2", f"{mp}_bn2")
    w = t[f"{tp}.c1.weight"]  # Conv3d [O, I, kd, kh, kw]
    out[f"params/{mp}_c/kernel"] = np.transpose(w, (2, 3, 4, 1, 0))
    out[f"params/{mp}_c/bias"] = t[f"{tp}.c1.bias"]
    w = t[f"{tp}.t1.weight"]  # ConvTranspose3d [I, O, kd, kh, kw]
    out[f"params/{mp}_t/kernel"] = np.transpose(w, (2, 3, 4, 0, 1))
    out[f"params/{mp}_t/bias"] = t[f"{tp}.t1.bias"]

  for stage in range(2, 6):
    tp = f"decoder.rt_skip_{stage}.compress_channels"
    if f"{tp}.weight" not in t:
      continue  # skip_fraction 0
    _conv2d_entries(out, t, tp,
                    f"decoder/rt_skip_{stage}/compress_channels")
  return out


@dataclasses.dataclass
class ProgramArgs:
  torch_checkpoint: str = flags.flag("Reference .cpt (torch-saved)")
  train_config: str = flags.flag(
      "Matching train pipeline JSON5 (e.g. configs/models/h7.json5)")
  output_path: str = flags.flag("Output corenet-tpu .cpt path")
  template_value: List[str] = flags.flag("-D key=value template overrides",
                                         default=[], short_name="D",
                                         repeated=True)


def main(argv=None):
  logging.basicConfig(level=logging.INFO)
  args = flags.parse_flags(ProgramArgs, argv)

  import torch
  import jax
  import jax.numpy as jnp
  from corenet_tpu.cli.import_resnet50_checkpoint import (
      load_encoder_variables)
  from corenet_tpu.config import (TrainPipeline, config_to_dict,
                                  load_config_file, parse_template_mapping)
  from corenet_tpu.data.manager import DatasetManager
  from corenet_tpu.models.corenet import CoreNet
  from corenet_tpu.train import checkpoint as cpt_lib
  from corenet_tpu.train import state as state_lib
  from corenet_tpu.train.pipeline import model_config_from_train_config

  blob = torch.load(io.BytesIO(fs.read_bytes(args.torch_checkpoint)),
                    map_location="cpu", weights_only=False)
  # SavedState dataclass or plain dict — support both.
  if hasattr(blob, "model_state"):
    model_state, global_step = blob.model_state, blob.global_step
  else:
    model_state = blob.get("model_state", blob)
    global_step = int(blob.get("global_step", 0))
  model_state = {k: v.numpy() if hasattr(v, "numpy") else v
                 for k, v in model_state.items()}

  flat = convert_torch_state(model_state)

  config = load_config_file(
      args.train_config, TrainPipeline,
      template_overrides=parse_template_mapping(args.template_value))
  num_classes = len(DatasetManager(config.train.data).classes)
  model_config = model_config_from_train_config(config.train, num_classes)
  model = CoreNet(model_config)
  variables = jax.jit(lambda: model.init(
      jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.uint8),
      jnp.eye(4)[None], jnp.full((1, 3), 0.5), train=False))()

  # Reuse the strict shape-checked merge.
  buf = io.BytesIO()
  np.savez(buf, **flat)
  tmp_path = args.output_path + ".weights.npz"
  fs.write_bytes(tmp_path, buf.getvalue())
  variables = load_encoder_variables(variables, tmp_path)
  fs.unlink(tmp_path)

  optimizer = state_lib.create_optimizer(
      config.train.initial_learning_rate, config.train.adam_epsilon)
  state = state_lib.create_train_state(variables, optimizer,
                                       global_step=int(global_step))
  meta = {"train_config": config_to_dict(config.train),
          "full_config": config_to_dict(config),
          "classes": list(DatasetManager(config.train.data).classes),
          "imported_from": args.torch_checkpoint}
  fs.makedirs(fs.dirname(args.output_path))
  fs.write_bytes(args.output_path, cpt_lib.encode_state(state, meta))
  log.info("Wrote %s (step %d, %d tensors)", args.output_path, global_step,
           len(flat))


if __name__ == "__main__":
  main()
