"""Per-host batched input pipeline (SURVEY.md §2.2 B1, BASELINE.json:11).

Assembles fixed-shape batches from a dataset + epoch plan:

* audio padded to the bucket's sample count with reflect-tail padding
  (frontend parity — ops/frontend_oracle.pad_for_batch);
* tokens PAD-padded to the token bucket;
* per-host sharding: host ``p`` of ``n`` takes batches ``p, p+n, ...`` of
  the deterministic global plan, so all hosts agree on the epoch without
  communication (grain-style index sharding keyed by jax.process_index());
* ``real`` row mask marks remainder-padding duplicate rows (weight 0 in
  losses/metrics).

Semi-supervised streams (labeled audio+text, unlabeled audio, unlabeled
text) are independent iterators zipped by the solver (SURVEY.md §4.2).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from semi_supervised_asr_tpu.config import FrontendConfig
from semi_supervised_asr_tpu.data.bucketing import BucketSpec, plan_epoch
from semi_supervised_asr_tpu.data.vocab import PAD
from semi_supervised_asr_tpu.ops.frontend_oracle import pad_for_batch


@dataclass
class Batch:
    """One fixed-shape training batch (host numpy; device-put by the step)."""

    audio: np.ndarray          # [B, S] float32 — or int16 PCM-grid
                               # samples when spec.audio_i16 (the step
                               # upcasts *1/32768 on device)
    audio_lens: np.ndarray     # [B] int32
    tokens: np.ndarray         # [B, U] int32 (EOS-terminated, PAD-padded)
    token_lens: np.ndarray     # [B] int32 (incl. EOS)
    real: np.ndarray           # [B] bool — False on remainder-duplicate rows
    bucket: tuple[int, int]    # (frame_bucket, token_bucket)
    uids: list


def assemble_batch(
    dataset,
    idxs: list[int],
    n_real: int,
    bucket: tuple[int, int],
    spec: BucketSpec,
    fcfg: FrontendConfig,
) -> Batch:
    fb, tb = bucket
    s_len = spec.samples_for_frames(fb)
    b = len(idxs)
    # data.audio_i16_transfer: int16 batches halve the H2D bytes, and an
    # int16-native source (ManifestDataset prefer_i16) makes the whole
    # decode->pad->batch chain integer memcpy.  PCM-origin f32 is exactly
    # int/32768 -> *32768 is integral and representable in f32
    # (|x| <= 32767 < 2^24), so rint is an exact inverse and both source
    # dtypes produce the SAME batch; float-origin sources clip+round to
    # the int16 grid (tests/test_i16_transfer.py).
    audio = np.zeros((b, s_len), np.int16 if spec.audio_i16 else np.float32)
    audio_lens = np.zeros((b,), np.int32)
    tokens = np.full((b, tb), PAD, np.int32)
    token_lens = np.zeros((b,), np.int32)
    uids = []
    for r, i in enumerate(idxs):
        utt = dataset[i]
        n = min(len(utt.audio), s_len)
        a = utt.audio[:n]
        if spec.audio_i16:
            if a.dtype != np.int16:
                a = np.clip(a.astype(np.float32), -1.0, 32767.0 / 32768.0)
                a = np.rint(a * 32768.0).astype(np.int16)
        elif a.dtype == np.int16:
            a = a.astype(np.float32) / 32768.0
        else:
            a = a.astype(np.float32)
        audio[r] = pad_for_batch(a, s_len, fcfg)
        audio_lens[r] = n
        u = min(len(utt.tokens), tb)
        tokens[r, :u] = utt.tokens[:u]
        token_lens[r] = u
        uids.append(utt.uid)
    real = np.arange(b) < n_real
    return Batch(audio, audio_lens, tokens, token_lens, real, bucket, uids)



def _slice_rows(
    idxs: list[int], n_real: int, row_shard: tuple[int, int, int] | None
) -> tuple[list[int], int]:
    """Host's rows of a GLOBAL plan batch (multi-host row sharding).

    Under a multi-host mesh every process iterates the SAME global plan
    (identical bucket shapes and launch counts each step — required for
    the processes' SPMD executables to agree) and assembles only the rows
    its devices own on the data axis.  ``row_shard=(r0, r1, n_rows)`` is
    the host's block of the data axis (``mesh.host_data_rows``); the row
    range is computed PER BATCH from the batch's own length, so it works
    under constant-frames batching where B varies by bucket.  Real rows
    lead the batch, so the slice's real count is ``n_real`` clipped into
    the range."""
    if row_shard is None:
        return idxs, n_real
    r0, r1, n_rows = row_shard
    assert len(idxs) % n_rows == 0, (
        f"batch of {len(idxs)} rows does not shard over {n_rows} data-axis "
        "rows — batch sizes must be granule-aligned (make_batch_sizer)"
    )
    per = len(idxs) // n_rows
    lo, hi = r0 * per, r1 * per
    return idxs[lo:hi], max(0, min(n_real, hi) - lo)


_WARNED_DATASETS: set[int] = set()


def _warn_skipped(skipped: list[int], dataset) -> None:
    """No silent caps (SURVEY.md quality rule): utterances longer than the
    largest (frame, token) bucket are SKIPPED, not truncated — say so ONCE
    per dataset per process (eval passes reuse epoch 0, resumes start at
    epoch > 0, so an epoch-based guard would both spam and miss)."""
    if skipped and id(dataset) not in _WARNED_DATASETS:
        _WARNED_DATASETS.add(id(dataset))
        print(
            f"WARNING: {len(skipped)}/{len(dataset)} utterances exceed the "
            "largest bucket and are skipped every epoch — raise "
            "data.frame_buckets/token_buckets to cover them"
        )


def _audio_lengths(dataset) -> list[tuple[int, int]]:
    return [
        (dataset.audio_len(i), dataset.token_len(i))
        for i in range(len(dataset))
    ]


def epoch_batch_count(
    lengths,
    spec: BucketSpec,
    batch_size: int,
    seed: int,
    epoch: int,
    shard_index: int = 0,
    num_shards: int = 1,
    drop_remainder: bool = True,
    sort_by_length: bool = False,
) -> int:
    """Shard-local batches this epoch WOULD yield — plan only, nothing
    assembled.  Exact-resume fast-forward uses this to skip whole epochs
    of an unlabeled stream at metadata cost (SURVEY.md §6 checkpoint row:
    restore 'data-iterator state')."""
    plan, _ = plan_epoch(
        lengths, spec, batch_size, seed, epoch, drop_remainder,
        sort_by_length,
    )
    return len(plan[shard_index::num_shards])


def epoch_batches(
    dataset,
    spec: BucketSpec,
    fcfg: FrontendConfig,
    batch_size: int,
    seed: int,
    epoch: int,
    shard_index: int = 0,
    num_shards: int = 1,
    drop_remainder: bool = True,
    sort_by_length: bool = False,
    start_batch: int = 0,
    row_shard: tuple[int, int, int] | None = None,
) -> Iterator[Batch]:
    """Deterministic per-host batch stream for one epoch.

    ``start_batch``: skip the first N shard-local batches WITHOUT
    assembling them (the plan is metadata; assembly is the audio-decode
    cost) — exact mid-epoch resume fast-forwards here.

    ``row_shard``: assemble only this host's rows of each (global) plan batch —
    the multi-host mesh path (see ``_slice_rows``); assembly/decode cost
    per host scales down with the host's share of the data axis.
    """
    lengths = _audio_lengths(dataset)
    plan, skipped = plan_epoch(
        lengths, spec, batch_size, seed, epoch, drop_remainder,
        sort_by_length,
    )
    _warn_skipped(skipped, dataset)
    for bucket, idxs, n_real in plan[shard_index::num_shards][start_batch:]:
        idxs, n_real = _slice_rows(idxs, n_real, row_shard)
        yield assemble_batch(dataset, idxs, n_real, bucket, spec, fcfg)


def repeating_batches(
    dataset,
    spec: BucketSpec,
    fcfg: FrontendConfig,
    batch_size: int,
    seed: int,
    shard_index: int = 0,
    num_shards: int = 1,
    drop_remainder: bool = True,
    start_epoch: int = 0,
    skip_batches: int = 0,
    row_shard: tuple[int, int, int] | None = None,
) -> Iterator[Batch]:
    """Endless stream: new deterministic shuffle every epoch.

    ``skip_batches``: fast-forward past the first N yields at plan cost
    (no assembly) — resuming a semi-supervised run advances each
    unlabeled stream by the number of steps already taken so the resumed
    trajectory equals the uninterrupted one.
    """
    skip = skip_batches
    lengths = _audio_lengths(dataset) if skip > 0 else None
    for epoch in itertools.count(start_epoch):
        if skip > 0:
            n = epoch_batch_count(
                lengths, spec, batch_size, seed, epoch,
                shard_index, num_shards, drop_remainder,
            )
            if skip >= n:
                skip -= n
                continue
        yielded = False
        for b in epoch_batches(
            dataset, spec, fcfg, batch_size, seed, epoch,
            shard_index, num_shards, drop_remainder,
            start_batch=skip, row_shard=row_shard,
        ):
            yielded = True
            yield b
        if not yielded:
            # skip>0 only reaches here with skip < the epoch's batch
            # count, so a zero-yield epoch means the corpus/bucket/batch
            # config can NEVER produce a batch — raise instead of
            # spinning on empty epoch plans forever
            _raise_empty_epoch(epoch)
        skip = 0


@dataclass
class FeatureBatch:
    """Precomputed-features batch (data.use_feature_store path)."""

    feats: np.ndarray          # [B, T, M] float32 raw log-mel (no CMVN)
    feat_lens: np.ndarray      # [B] int32
    tokens: np.ndarray         # [B, U] int32
    token_lens: np.ndarray     # [B]
    real: np.ndarray           # [B] bool
    bucket: tuple[int, int]
    uids: list


def assemble_feature_batch(
    dataset,
    idxs: list[int],
    n_real: int,
    bucket: tuple[int, int],
) -> FeatureBatch:
    fb, tb = bucket
    b = len(idxs)
    first = dataset[idxs[0]]
    m = first.audio.shape[1]
    feats = np.zeros((b, fb, m), np.float32)
    feat_lens = np.zeros((b,), np.int32)
    tokens = np.full((b, tb), PAD, np.int32)
    token_lens = np.zeros((b,), np.int32)
    uids = []
    for r, i in enumerate(idxs):
        utt = dataset[i]
        t = min(utt.audio.shape[0], fb)
        feats[r, :t] = utt.audio[:t]
        feat_lens[r] = t
        u = min(len(utt.tokens), tb)
        tokens[r, :u] = utt.tokens[:u]
        token_lens[r] = u
        uids.append(utt.uid)
    real = np.arange(b) < n_real
    return FeatureBatch(feats, feat_lens, tokens, token_lens, real, bucket, uids)


def epoch_feature_batches(
    dataset,
    spec: BucketSpec,
    batch_size: int,
    seed: int,
    epoch: int,
    shard_index: int = 0,
    num_shards: int = 1,
    drop_remainder: bool = True,
    sort_by_length: bool = False,
    start_batch: int = 0,
    row_shard: tuple[int, int, int] | None = None,
) -> Iterator[FeatureBatch]:
    """Feature-store variant of epoch_batches: buckets on FRAMES directly."""
    lengths = _feature_lengths(dataset, spec)
    plan, skipped = plan_epoch(
        lengths, spec, batch_size, seed, epoch, drop_remainder,
        sort_by_length,
    )
    _warn_skipped(skipped, dataset)
    for bucket, idxs, n_real in plan[shard_index::num_shards][start_batch:]:
        idxs, n_real = _slice_rows(idxs, n_real, row_shard)
        yield assemble_feature_batch(dataset, idxs, n_real, bucket)


def _feature_lengths(dataset, spec: BucketSpec) -> list[tuple[int, int]]:
    lengths = []
    for i in range(len(dataset)):
        frames, toks = dataset.feat_len(i), dataset.token_len(i)
        # plan_epoch buckets via frames_for_samples(n_samples); invert it so
        # the frame count round-trips exactly: samples = (frames-1)*hop
        lengths.append((spec.samples_for_frames(frames), toks))
    return lengths


def repeating_feature_batches(
    dataset, spec, batch_size, seed,
    shard_index=0, num_shards=1, drop_remainder=True, start_epoch=0,
    skip_batches=0, row_shard=None,
) -> Iterator[FeatureBatch]:
    skip = skip_batches
    lengths = _feature_lengths(dataset, spec) if skip > 0 else None
    for epoch in itertools.count(start_epoch):
        if skip > 0:
            n = epoch_batch_count(
                lengths, spec, batch_size, seed, epoch,
                shard_index, num_shards, drop_remainder,
            )
            if skip >= n:
                skip -= n
                continue
        yielded = False
        for b in epoch_feature_batches(
            dataset, spec, batch_size, seed, epoch,
            shard_index, num_shards, drop_remainder,
            start_batch=skip, row_shard=row_shard,
        ):
            yielded = True
            yield b
        if not yielded:
            _raise_empty_epoch(epoch)
        skip = 0


def _raise_empty_epoch(epoch: int) -> None:
    raise RuntimeError(
        f"epoch {epoch} produced ZERO batches: every utterance exceeds "
        "the bucket grid (data.frame_buckets/token_buckets) and/or fewer "
        "eligible rows than the batch size remain with "
        "data.drop_remainder=true — fix the bucket/batch config for this "
        "corpus"
    )


def text_batches(
    dataset,
    token_bucket: int,
    batch_size: int,
    seed: int,
    shard_index: int = 0,
    num_shards: int = 1,
    skip_batches: int = 0,
    row_shard: tuple[int, int, int] | None = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Endless unlabeled-TEXT stream: (tokens [B, U], real [B]).

    One static token bucket (the largest) so the semi-supervised step
    compiles once per labeled bucket, not per text shape.
    ``skip_batches`` fast-forwards without assembling (exact resume).
    ``row_shard`` selects the host's rows of each global batch
    (see ``_slice_rows``).
    """
    skip = skip_batches
    for epoch in itertools.count():
        rng = np.random.default_rng((seed, epoch, 17))
        order = rng.permutation(len(dataset))
        order = order[shard_index::num_shards]
        if len(order) == 0:
            raise ValueError(
                "text_batches: dataset shard is empty "
                f"(size {len(dataset)}, shard {shard_index}/{num_shards})"
            )
        n_epoch = (len(order) + batch_size - 1) // batch_size
        if skip >= n_epoch:
            skip -= n_epoch
            continue
        # remainder batches carry a real-mask like the audio pipelines —
        # a dataset smaller than batch_size must still yield (else an
        # endless epoch loop would spin forever producing nothing)
        for s in range(skip * batch_size, len(order), batch_size):
            idxs = order[s : s + batch_size]
            tokens = np.full((batch_size, token_bucket), PAD, np.int32)
            real = np.zeros((batch_size,), bool)
            for r, i in enumerate(idxs):
                t = dataset[int(i)].tokens
                u = min(len(t), token_bucket)
                tokens[r, :u] = t[:u]
                real[r] = True
            if row_shard is not None:
                r0, r1, n_rows = row_shard
                per = batch_size // n_rows
                tokens, real = tokens[r0 * per:r1 * per], real[r0 * per:r1 * per]
            yield tokens, real
        skip = 0


def compute_global_cmvn_features(
    dataset, max_utts: int = 256
) -> tuple[np.ndarray, np.ndarray]:
    """Global CMVN from a FeatureDataset (stored log-mel, fp64 accum)."""
    n = min(len(dataset), max_utts)
    count = 0
    s1 = s2 = 0.0
    for i in range(n):
        f = dataset[i].audio.astype(np.float64)  # [T, M] features
        s1 = s1 + f.sum(axis=0)
        s2 = s2 + (f**2).sum(axis=0)
        count += f.shape[0]
    mean = s1 / count
    var = np.maximum(s2 / count - mean**2, 0.0)
    return mean.astype(np.float32), (1.0 / np.sqrt(var + 1e-8)).astype(np.float32)


def compute_global_cmvn(
    dataset, fcfg: FrontendConfig, max_utts: int = 256
) -> tuple[np.ndarray, np.ndarray]:
    """Global CMVN stats from up to ``max_utts`` utterances (host, fp64).

    Reference counterpart: the preprocessing script's corpus CMVN pass
    (SURVEY.md §3 #6); streamed accumulation, one utterance at a time.
    """
    from semi_supervised_asr_tpu.ops import frontend_oracle as oracle

    n = min(len(dataset), max_utts)
    count = 0
    s1 = s2 = 0.0
    for i in range(n):
        a = dataset[i].audio
        # int16-native datasets (prefer_i16) carry unscaled PCM ints
        scale = 32768.0 if a.dtype == np.int16 else 1.0
        lm = oracle.log_mel(a.astype(np.float64) / scale, fcfg)
        s1 = s1 + lm.sum(axis=0)
        s2 = s2 + (lm**2).sum(axis=0)
        count += lm.shape[0]
    mean = s1 / count
    var = np.maximum(s2 / count - mean**2, 0.0)
    return mean.astype(np.float32), (1.0 / np.sqrt(var + 1e-8)).astype(np.float32)
