"""grain pipeline equivalence: identical batches to the in-line pipeline."""

import numpy as np

from semi_supervised_asr_tpu.config import DataConfig, FrontendConfig
from semi_supervised_asr_tpu.data import vocab as V
from semi_supervised_asr_tpu.data.bucketing import make_bucket_spec
from semi_supervised_asr_tpu.data.grain_pipeline import grain_epoch_batches
from semi_supervised_asr_tpu.data.pipeline import epoch_batches
from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset

FCFG = FrontendConfig(spec_augment=False)
DCFG = DataConfig(frame_buckets=(96, 200), token_buckets=(12,),
                  num_synthetic_utts=32)


def test_grain_stream_equals_plain_stream():
    ds = SyntheticDataset(V.timit_vocab(), DCFG, FCFG)
    spec = make_bucket_spec(DCFG, FCFG, 4)
    plain = list(epoch_batches(ds, spec, FCFG, 4, seed=3, epoch=1,
                               drop_remainder=False))
    grained = list(grain_epoch_batches(ds, spec, FCFG, 4, seed=3, epoch=1,
                                       drop_remainder=False, num_threads=3))
    assert len(plain) == len(grained) > 0
    for a, b in zip(plain, grained):
        np.testing.assert_array_equal(a.audio, b.audio)
        np.testing.assert_array_equal(a.tokens, b.tokens)
        np.testing.assert_array_equal(a.real, b.real)
        assert a.uids == b.uids and a.bucket == b.bucket


def test_grain_sharding_partitions():
    ds = SyntheticDataset(V.timit_vocab(), DCFG, FCFG)
    spec = make_bucket_spec(DCFG, FCFG, 4)
    full = [u for b in grain_epoch_batches(ds, spec, FCFG, 4, 0, 0,
                                           drop_remainder=False)
            for u, r in zip(b.uids, b.real) if r]
    parts = []
    for s in range(2):
        parts += [u for b in grain_epoch_batches(
            ds, spec, FCFG, 4, 0, 0, s, 2, drop_remainder=False)
            for u, r in zip(b.uids, b.real) if r]
    assert sorted(parts) == sorted(full)
