"""Prefetching data loader: threaded scene loading + batch assembly.

Replaces the reference's torch DataLoader + DistributedSampler
(/root/reference/src/corenet/pipeline.py:102-123,
distributed.py:204-230) with a host-side prefetch pipeline that feeds the
jitted step: worker threads decode scene NPZs, batches assemble into
padded HostBatch buffers, and a bounded queue keeps `prefetch_factor`
batches in flight while the device computes.

Sharding: deterministic permutation (seed 0x1234 by default, like the
reference sampler) of the dataset, split into contiguous per-process
ranges; training pads ranks to equal length by wrapping (pad_data=True),
eval leaves the tail uneven (pad_data=False).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

from corenet_tpu.data import batching
from corenet_tpu.data.dataset import CoreNetDataset


def distributed_indices(num_examples: int, num_shards: int, shard: int,
                        pad_data: bool, seed: int = 0x1234,
                        shuffle: bool = True) -> np.ndarray:
  """Deterministic per-shard index ranges (contiguous in a seeded
  permutation), padded by wrap-around when pad_data."""
  perm = (np.random.default_rng(seed).permutation(num_examples)
          if shuffle else np.arange(num_examples))
  if pad_data:
    per = -(-num_examples // num_shards)
    padded = np.concatenate([perm, perm[:per * num_shards - num_examples]])
    return padded[shard * per:(shard + 1) * per]
  per = -(-num_examples // num_shards)
  return perm[shard * per:min((shard + 1) * per, num_examples)]


class DataLoader:
  """Iterates HostBatches with background prefetch."""

  def __init__(self,
               dataset: CoreNetDataset,
               batch_size: int,
               num_workers: int = 6,
               prefetch_factor: int = 2,
               max_edge_view: Optional[float] = None,
               max_meshes: Optional[int] = None,
               triangle_buckets: Optional[Sequence[int]] = None,
               random_grid_offset: bool = False,
               seed: int = 0,
               drop_last: bool = False,
               pad_partial: bool = False,
               batch_transform=None):
    """batch_transform: optional fn(HostBatch) -> dict of extra step
    inputs, run in the producer thread (e.g. native host-GT grids —
    batching.host_voxelize — overlapping device compute)."""
    self.dataset = dataset
    self.batch_size = batch_size
    self.num_workers = max(1, num_workers)
    self.prefetch_factor = max(1, prefetch_factor)
    self.max_edge_view = max_edge_view
    self.max_meshes = max_meshes
    self.triangle_buckets = triangle_buckets
    self.random_grid_offset = random_grid_offset
    self.rng = np.random.default_rng(seed)
    self.drop_last = drop_last
    self.pad_partial = pad_partial
    self.batch_transform = batch_transform

  def __len__(self):
    n = len(self.dataset)
    if self.drop_last:
      return n // self.batch_size
    return -(-n // self.batch_size)

  def _load_batch(self, indices, pool):
    elements = list(pool.map(lambda i: self.dataset[int(i)], indices))
    valid = np.zeros([self.batch_size], bool)
    valid[:len(elements)] = True
    while len(elements) < self.batch_size:
      elements.append(elements[0])
    offsets = None
    if self.random_grid_offset:
      offsets = self.rng.random((self.batch_size, 3)).astype(np.float32)
    hb = batching.batch(elements, max_edge_view=self.max_edge_view,
                        triangle_buckets=self.triangle_buckets,
                        max_meshes=self.max_meshes, grid_offsets=offsets)
    if self.batch_transform is not None:
      hb.extra.update(self.batch_transform(hb))
    return hb, valid

  def __iter__(self) -> Iterator:
    n = len(self.dataset)
    batch_starts = list(range(0, n, self.batch_size))
    if self.drop_last:
      batch_starts = [s for s in batch_starts if s + self.batch_size <= n]

    q: queue.Queue = queue.Queue(maxsize=self.prefetch_factor)
    sentinel = object()
    # A consumer that abandons the epoch (max_steps exit mid-epoch — the
    # normal exit path of train/pipeline.py) closes the generator; the
    # stop event unblocks the producer so no thread/batch leaks.
    stop = threading.Event()

    def put(item) -> bool:
      while not stop.is_set():
        try:
          q.put(item, timeout=0.1)
          return True
        except queue.Full:
          pass
      return False

    def producer():
      with ThreadPoolExecutor(self.num_workers) as pool:
        try:
          for s in batch_starts:
            if stop.is_set():
              break
            idx = list(range(s, min(s + self.batch_size, n)))
            if not put(self._load_batch(idx, pool)):
              break
        finally:
          put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
      while True:
        item = q.get()
        if item is sentinel:
          break
        yield item
    finally:
      stop.set()
      t.join(timeout=30)
