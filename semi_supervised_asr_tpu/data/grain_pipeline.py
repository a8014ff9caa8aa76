"""grain-backed input pipeline (SURVEY.md §2.2 B1: "grain per-host
pipeline ... labeled + unlabeled streams").

Produces EXACTLY the same deterministic batch stream as
``pipeline.epoch_batches`` (equality-tested), but assembles batches through
``grain.MapDataset`` with threaded read-ahead, so host-side work (audio
decode, padding) overlaps device steps.  Enable with
``data.grain_threads > 0``; the plain in-line pipeline remains the default
(synthetic corpora have trivial host cost).
"""

from __future__ import annotations

import itertools
from typing import Iterator

import grain

from semi_supervised_asr_tpu.config import FrontendConfig
from semi_supervised_asr_tpu.data.bucketing import BucketSpec, plan_epoch
from semi_supervised_asr_tpu.data.pipeline import Batch, assemble_batch


def grain_epoch_batches(
    dataset,
    spec: BucketSpec,
    fcfg: FrontendConfig,
    batch_size: int,
    seed: int,
    epoch: int,
    shard_index: int = 0,
    num_shards: int = 1,
    drop_remainder: bool = True,
    num_threads: int = 4,
    prefetch: int = 8,
    sort_by_length: bool = False,
    start_batch: int = 0,
    row_shard: tuple[int, int, int] | None = None,
) -> Iterator[Batch]:
    """Per-host batch stream for one epoch via grain, with read-ahead.

    ``start_batch`` skips the first N shard-local batches at plan cost
    (exact mid-epoch resume — same contract as pipeline.epoch_batches).
    ``row_shard`` assembles only the host's rows of each global plan
    batch (multi-host mesh path — same contract as pipeline._slice_rows).
    """
    lengths = [
        (dataset.audio_len(i), dataset.token_len(i))
        for i in range(len(dataset))
    ]
    plan, skipped = plan_epoch(lengths, spec, batch_size, seed, epoch,
                               drop_remainder, sort_by_length)
    from semi_supervised_asr_tpu.data.pipeline import _slice_rows, _warn_skipped

    _warn_skipped(skipped, dataset)
    shard_plan = plan[shard_index::num_shards][start_batch:]

    def assemble(item):
        bucket, idxs, n_real = item
        idxs, n_real = _slice_rows(idxs, n_real, row_shard)
        return assemble_batch(dataset, idxs, n_real, bucket, spec, fcfg)

    ds = grain.MapDataset.source(shard_plan).map(assemble)
    it = ds.to_iter_dataset(
        grain.ReadOptions(num_threads=num_threads,
                          prefetch_buffer_size=prefetch)
    )
    yield from it


def grain_repeating_batches(
    dataset,
    spec: BucketSpec,
    fcfg: FrontendConfig,
    batch_size: int,
    seed: int,
    shard_index: int = 0,
    num_shards: int = 1,
    drop_remainder: bool = True,
    start_epoch: int = 0,
    num_threads: int = 4,
    prefetch: int = 8,
    row_shard: tuple[int, int, int] | None = None,
) -> Iterator[Batch]:
    for epoch in itertools.count(start_epoch):
        yield from grain_epoch_batches(
            dataset, spec, fcfg, batch_size, seed, epoch,
            shard_index, num_shards, drop_remainder, num_threads, prefetch,
            row_shard=row_shard,
        )
