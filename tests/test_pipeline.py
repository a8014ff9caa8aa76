"""Data pipeline tests: bucket assignment, epoch integrity (no drop/dup),
shard partition, static shapes (SURVEY.md §5.2 bucketing)."""

import numpy as np

from semi_supervised_asr_tpu.config import DataConfig, FrontendConfig
from semi_supervised_asr_tpu.data import vocab as V
from semi_supervised_asr_tpu.data.bucketing import make_bucket_spec, plan_epoch
from semi_supervised_asr_tpu.data.pipeline import (
    compute_global_cmvn,
    epoch_batches,
)
from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset

FCFG = FrontendConfig(spec_augment=False)
DCFG = DataConfig(
    frame_buckets=(96, 200, 400), token_buckets=(8, 16), num_synthetic_utts=64
)


def make_ds(n=64):
    return SyntheticDataset(V.timit_vocab(), DCFG, FCFG, n_utts=n)


class TestBucketSpec:
    def test_rounding_to_time_reduction(self):
        spec = make_bucket_spec(DCFG, FCFG, time_reduction=8)
        assert all(b % 8 == 0 for b in spec.frame_buckets)

    def test_samples_frames_roundtrip(self):
        spec = make_bucket_spec(DCFG, FCFG, 8)
        for fb in spec.frame_buckets:
            assert spec.frames_for_samples(spec.samples_for_frames(fb)) == fb

    def test_assign_too_long_is_none(self):
        spec = make_bucket_spec(DCFG, FCFG, 8)
        huge = spec.samples_for_frames(spec.frame_buckets[-1]) + 10_000
        assert spec.assign(huge, 4) is None
        assert spec.assign(1000, 99) is None


class TestEpochPlan:
    def test_no_drop_no_dup(self):
        spec = make_bucket_spec(DCFG, FCFG, 8)
        ds = make_ds()
        lengths = [(ds.audio_len(i), ds.token_len(i)) for i in range(len(ds))]
        plan, skipped = plan_epoch(lengths, spec, 4, seed=0, epoch=0,
                                   drop_remainder=False)
        seen = [i for (_, idxs, n_real) in plan for i in idxs[:n_real]]
        assert sorted(seen + skipped) == list(range(len(ds)))
        assert len(set(seen)) == len(seen)

    def test_different_epochs_differ(self):
        spec = make_bucket_spec(DCFG, FCFG, 8)
        ds = make_ds()
        lengths = [(ds.audio_len(i), ds.token_len(i)) for i in range(len(ds))]
        p0, _ = plan_epoch(lengths, spec, 4, 0, 0, False)
        p1, _ = plan_epoch(lengths, spec, 4, 0, 1, False)
        assert [b[1] for b in p0] != [b[1] for b in p1]

    def test_deterministic(self):
        spec = make_bucket_spec(DCFG, FCFG, 8)
        ds = make_ds()
        lengths = [(ds.audio_len(i), ds.token_len(i)) for i in range(len(ds))]
        a, _ = plan_epoch(lengths, spec, 4, 7, 3, False)
        b, _ = plan_epoch(lengths, spec, 4, 7, 3, False)
        assert a == b


class TestBatches:
    def test_static_shapes_from_bucket_set(self):
        spec = make_bucket_spec(DCFG, FCFG, 8)
        ds = make_ds()
        shapes = set()
        for batch in epoch_batches(ds, spec, FCFG, 4, 0, 0,
                                   drop_remainder=False):
            assert batch.audio.shape[0] == 4
            fb, tb = batch.bucket
            assert fb in spec.frame_buckets and tb in spec.token_buckets
            assert batch.audio.shape[1] == spec.samples_for_frames(fb)
            assert batch.tokens.shape[1] == tb
            shapes.add(batch.audio.shape + batch.tokens.shape)
            # lengths consistent
            assert np.all(batch.audio_lens <= batch.audio.shape[1])
            assert np.all(batch.token_lens <= tb)
            # every real row ends with EOS at token_lens-1
            for r in range(4):
                if batch.real[r]:
                    assert batch.tokens[r, batch.token_lens[r] - 1] == V.EOS
        assert len(shapes) <= len(spec.frame_buckets) * len(spec.token_buckets)

    def test_sharding_partitions_batches(self):
        spec = make_bucket_spec(DCFG, FCFG, 8)
        ds = make_ds()

        def uids(shard, n):
            out = []
            for b in epoch_batches(ds, spec, FCFG, 4, 0, 0, shard, n, False):
                out.extend(u for u, r in zip(b.uids, b.real) if r)
            return out

        all_uids = uids(0, 1)
        sharded = [uids(s, 4) for s in range(4)]
        flat = [u for s in sharded for u in s]
        assert sorted(flat) == sorted(all_uids)
        for a in range(4):
            for b in range(a + 1, 4):
                assert not (set(sharded[a]) & set(sharded[b]))


class TestCMVN:
    def test_global_stats_shapes(self):
        ds = make_ds(8)
        mean, inv_std = compute_global_cmvn(ds, FCFG, max_utts=8)
        assert mean.shape == (FCFG.n_mels,)
        assert inv_std.shape == (FCFG.n_mels,)
        assert np.all(inv_std > 0)


class TestSynthetic:
    def test_deterministic_utts(self):
        ds = make_ds(4)
        a, b = ds[2], ds[2]
        np.testing.assert_array_equal(a.audio, b.audio)
        np.testing.assert_array_equal(a.tokens, b.tokens)

    def test_length_probes_match(self):
        ds = make_ds(16)
        for i in range(16):
            utt = ds[i]
            assert ds.audio_len(i) == len(utt.audio)
            assert ds.token_len(i) == len(utt.tokens)

    def test_tokens_end_with_eos(self):
        ds = make_ds(4)
        assert ds[0].tokens[-1] == V.EOS


class TestTextBatches:
    def test_small_dataset_still_yields(self):
        """Regression: a dataset smaller than batch_size must yield a
        remainder batch with a real-mask, not spin the epoch loop forever."""
        from semi_supervised_asr_tpu.data.pipeline import text_batches

        ds = make_ds(3)
        stream = text_batches(ds, token_bucket=16, batch_size=8, seed=0)
        tokens, real = next(stream)
        assert tokens.shape == (8, 16)
        assert real.sum() == 3 and not real[3:].any()
        # rows keep flowing across epochs
        for _ in range(5):
            tokens, real = next(stream)
            assert real.sum() == 3

    def test_full_batches_all_real(self):
        from semi_supervised_asr_tpu.data.pipeline import text_batches

        ds = make_ds(16)
        stream = text_batches(ds, token_bucket=16, batch_size=8, seed=0)
        tokens, real = next(stream)
        assert real.all()
        assert (tokens >= 0).all()

    def test_empty_shard_raises(self):
        import pytest

        from semi_supervised_asr_tpu.data.pipeline import text_batches

        ds = make_ds(1)
        stream = text_batches(ds, 16, 4, 0, shard_index=1, num_shards=2)
        with pytest.raises(ValueError, match="empty"):
            next(stream)


class TestSkippedWarning:
    def test_overlong_utts_warned_once(self, capsys):
        from semi_supervised_asr_tpu.data.pipeline import epoch_batches

        ds = make_ds(8)
        tiny = make_bucket_spec(
            DataConfig(frame_buckets=(96,), token_buckets=(4,)), FCFG,
            time_reduction=8,
        )
        list(epoch_batches(ds, tiny, FCFG, 2, seed=0, epoch=0,
                           drop_remainder=False))
        out = capsys.readouterr().out
        assert "exceed the largest bucket" in out
        # only the first epoch warns
        list(epoch_batches(ds, tiny, FCFG, 2, seed=0, epoch=1,
                           drop_remainder=False))
        assert "exceed" not in capsys.readouterr().out


class TestSortaGrad:
    def test_sorted_epoch_is_ascending_and_complete(self):
        from semi_supervised_asr_tpu.data.pipeline import epoch_batches

        ds = make_ds(32)
        spec = make_bucket_spec(DCFG, FCFG, time_reduction=8)
        batches = list(epoch_batches(ds, spec, FCFG, 4, seed=0, epoch=0,
                                     drop_remainder=False,
                                     sort_by_length=True))
        # short buckets first
        fbs = [b.bucket[0] for b in batches]
        assert fbs == sorted(fbs)
        # within a bucket, audio lengths ascend batch over batch
        # coverage identical to the shuffled plan (no sample dropped)
        seen = [u for b in batches for u, r in zip(b.uids, b.real) if r]
        shuffled = list(epoch_batches(ds, spec, FCFG, 4, seed=0, epoch=0,
                                      drop_remainder=False))
        seen_shuf = [u for b in shuffled
                     for u, r in zip(b.uids, b.real) if r]
        assert sorted(seen) == sorted(seen_shuf)
        # ascending within the first bucket's batches
        first_fb = fbs[0]
        lens = [l for b in batches if b.bucket[0] == first_fb
                for l, r in zip(b.audio_lens, b.real) if r]
        assert lens == sorted(lens)

    def test_deterministic(self):
        from semi_supervised_asr_tpu.data.bucketing import plan_epoch

        ds = make_ds(16)
        spec = make_bucket_spec(DCFG, FCFG, time_reduction=8)
        lengths = [(ds.audio_len(i), ds.token_len(i)) for i in range(16)]
        a, _ = plan_epoch(lengths, spec, 4, 0, 0, sort_by_length=True)
        b, _ = plan_epoch(lengths, spec, 4, 0, 0, sort_by_length=True)
        assert a == b


class TestBatchFrames:
    """Constant-frames batching (data.batch_frames): per-bucket batch
    sizes ~batch_frames // frame_bucket, granule-aligned, epoch-complete,
    and row-shardable with bucket-varying B."""

    def test_bucket_batch_size_rounding(self):
        from semi_supervised_asr_tpu.data.bucketing import bucket_batch_size

        # 1000 frames / 200-frame bucket = 5, floored to granule 4
        assert bucket_batch_size((200, 16), 8, 1000, granule=4) == 4
        assert bucket_batch_size((96, 16), 8, 1000, granule=4) == 8
        # never below one granule, even for the largest bucket
        assert bucket_batch_size((400, 16), 8, 100, granule=4) == 4
        # disabled -> fixed batch size
        assert bucket_batch_size((400, 16), 8, 0, granule=4) == 8

    def test_plan_uses_per_bucket_sizes_and_covers_epoch(self):
        from semi_supervised_asr_tpu.data.bucketing import make_batch_sizer

        spec = make_bucket_spec(DCFG, FCFG, 8)
        ds = make_ds()
        lengths = [(ds.audio_len(i), ds.token_len(i)) for i in range(len(ds))]
        sizer = make_batch_sizer(4, 800, granule=2)
        plan, skipped = plan_epoch(lengths, spec, sizer, seed=0, epoch=0,
                                   drop_remainder=False)
        assert any(len(idxs) != 4 for (_, idxs, _) in plan)
        for key, idxs, n_real in plan:
            assert len(idxs) == sizer(key)
            assert len(idxs) % 2 == 0
        seen = [i for (_, idxs, n_real) in plan for i in idxs[:n_real]]
        assert sorted(seen + skipped) == list(range(len(ds)))
        assert len(set(seen)) == len(seen)

    def test_row_slices_tile_with_varying_batch(self):
        from semi_supervised_asr_tpu.data.bucketing import make_batch_sizer

        ds = make_ds(32)
        spec = make_bucket_spec(DCFG, FCFG, time_reduction=8)
        sizer = make_batch_sizer(4, 800, granule=2)
        kw = dict(seed=3, epoch=0, drop_remainder=False)
        full = list(epoch_batches(ds, spec, FCFG, sizer, **kw))
        lo = list(epoch_batches(ds, spec, FCFG, sizer, **kw,
                                row_shard=(0, 1, 2)))
        hi = list(epoch_batches(ds, spec, FCFG, sizer, **kw,
                                row_shard=(1, 2, 2)))
        assert len(full) == len(lo) == len(hi)
        for f, a, b in zip(full, lo, hi):
            assert a.bucket == b.bucket == f.bucket
            assert a.audio.shape[0] == b.audio.shape[0] == f.audio.shape[0] // 2
            np.testing.assert_array_equal(
                np.concatenate([a.audio, b.audio]), f.audio)
            np.testing.assert_array_equal(
                np.concatenate([a.real, b.real]), f.real)
            assert a.uids + b.uids == f.uids


class TestRowSlicing:
    """Multi-host row sharding (pipeline._slice_rows): hosts slicing the
    SAME global plan must tile every batch exactly — same buckets in the
    same order, rows partitioned, real rows preserved (the contract
    solver._stream_shard relies on for cross-process SPMD agreement)."""

    def test_row_slices_tile_the_global_batch(self):
        ds = make_ds(32)
        spec = make_bucket_spec(DCFG, FCFG, time_reduction=8)
        full = list(epoch_batches(ds, spec, FCFG, 4, seed=3, epoch=0,
                                  drop_remainder=False))
        lo = list(epoch_batches(ds, spec, FCFG, 4, seed=3, epoch=0,
                                drop_remainder=False, row_shard=(0, 1, 2)))
        hi = list(epoch_batches(ds, spec, FCFG, 4, seed=3, epoch=0,
                                drop_remainder=False, row_shard=(1, 2, 2)))
        assert len(full) == len(lo) == len(hi)
        for f, a, b in zip(full, lo, hi):
            assert a.bucket == b.bucket == f.bucket
            assert a.audio.shape[0] == b.audio.shape[0] == 2
            np.testing.assert_array_equal(
                np.concatenate([a.audio, b.audio]), f.audio)
            np.testing.assert_array_equal(
                np.concatenate([a.tokens, b.tokens]), f.tokens)
            np.testing.assert_array_equal(
                np.concatenate([a.real, b.real]), f.real)
            assert a.uids + b.uids == f.uids

    def test_text_row_slices_tile(self):
        from semi_supervised_asr_tpu.data.pipeline import text_batches

        ds = make_ds(16)
        full = text_batches(ds, 16, 4, seed=5)
        lo = text_batches(ds, 16, 4, seed=5, row_shard=(0, 1, 2))
        hi = text_batches(ds, 16, 4, seed=5, row_shard=(1, 2, 2))
        for _ in range(6):
            ft, fr = next(full)
            at, ar = next(lo)
            bt, br = next(hi)
            np.testing.assert_array_equal(np.concatenate([at, bt]), ft)
            np.testing.assert_array_equal(np.concatenate([ar, br]), fr)

    def test_host_data_rows_single_process(self):
        import jax
        from semi_supervised_asr_tpu.config import ParallelConfig
        from semi_supervised_asr_tpu.parallel import mesh as MESH

        pcfg = ParallelConfig()
        mesh = MESH.make_mesh(pcfg, jax.devices()[:4])
        r0, r1, n = MESH.host_data_rows(mesh, pcfg)
        # single process owns every data row -> full range
        assert (r0, r1, n) == (0, 4, 4)


class TestValidFramingBuckets:
    """frontend.center=false (VALID framing, the streaming configs):
    bucketed audio must produce EXACTLY the bucket's frame count on
    device — with the centered formula the device saw T = bucket -
    ceil((n_fft-hop)/hop), which breaks the fused Pallas frontend's
    T%8 tiling and the pyramid divisibility on real hardware (found by
    bench --config ls100_transducer_streaming on the chip, r2)."""

    def test_samples_frames_round_trip(self):
        import jax.numpy as jnp

        from semi_supervised_asr_tpu.ops import frontend as F

        for center in (True, False):
            fcfg = FrontendConfig(center=center, cmvn="global",
                                  spec_augment=False)
            dcfg = DataConfig(frame_buckets=(16, 32), token_buckets=(8,))
            spec = make_bucket_spec(dcfg, fcfg, time_reduction=8)
            for fb in spec.frame_buckets:
                s = spec.samples_for_frames(fb)
                assert spec.frames_for_samples(s) == fb, (center, fb)
                feats, flens = F.log_mel_features(
                    jnp.zeros((1, s)), jnp.asarray([s]), fcfg,
                    jnp.zeros(fcfg.n_mels), jnp.ones(fcfg.n_mels),
                )
                assert feats.shape[1] == fb, (center, fb, feats.shape)
                assert int(flens[0]) == fb, (center, fb, int(flens[0]))


class TestEmptyEpochGuard:
    """A config that can never produce a batch must raise, not spin
    forever rebuilding epoch plans (found: a bucket grid that excluded
    13/16 utts + drop_remainder left zero batches per epoch and the
    endless stream looped silently)."""

    def test_repeating_batches_raises(self):
        import pytest

        from semi_supervised_asr_tpu.data.pipeline import repeating_batches

        # every utterance exceeds a 1-frame bucket grid
        dcfg = DataConfig(frame_buckets=(8,), token_buckets=(8,),
                          num_synthetic_utts=8)
        spec = make_bucket_spec(dcfg, FCFG, time_reduction=8)
        ds = SyntheticDataset(V.timit_vocab(), dcfg, FCFG, n_utts=8)
        stream = repeating_batches(ds, spec, FCFG, 4, seed=0)
        with pytest.raises(RuntimeError, match="ZERO batches"):
            next(stream)

    def test_solver_stream_raises(self, tmp_path):
        import pytest

        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.solver import Solver

        cfg = load_config("configs/synthetic_smoke.yaml", [
            # 3-10 tokens x 0.12s = 36-120 frames: nothing fits 16
            "data.num_synthetic_utts=8", "train.batch_size=8",
            "model.enc_hidden=8", "model.enc_layers=2",
            "data.frame_buckets=[16]", "data.token_buckets=[16]",
            "train.total_steps=2", "train.eval_every=0",
            "train.ckpt_every=2", "train.log_every=1",
        ])
        solver = Solver(cfg, tmp_path, use_mesh=False)
        with pytest.raises(RuntimeError, match="ZERO batches"):
            solver.train()
