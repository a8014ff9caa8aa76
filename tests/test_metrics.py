"""Scoring tests: native C++ edit distance vs python-Levenshtein oracle,
TIMIT fold semantics, WER."""

import Levenshtein
import numpy as np

from semi_supervised_asr_tpu.data import vocab as V
from semi_supervised_asr_tpu.utils import metrics, native_ops


def test_native_builds():
    assert native_ops.native_available(), "C++ edit distance failed to build"


def test_edit_distance_vs_levenshtein_oracle(rng):
    for _ in range(50):
        la, lb = rng.integers(0, 30, 2)
        a = rng.integers(4, 20, la).astype(np.int32)
        b = rng.integers(4, 20, lb).astype(np.int32)
        d, rl = native_ops.batch_edit_distance(
            a.reshape(1, -1) if la else np.zeros((1, 1), np.int32),
            np.asarray([la], np.int32),
            b.reshape(1, -1) if lb else np.zeros((1, 1), np.int32),
            np.asarray([lb], np.int32),
        )
        ref = Levenshtein.distance(
            "".join(chr(x) for x in a), "".join(chr(x) for x in b)
        )
        assert int(d[0]) == ref
        assert int(rl[0]) == lb


def test_numpy_fallback_matches_native(rng):
    a = rng.integers(4, 20, (5, 12)).astype(np.int32)
    b = rng.integers(4, 20, (5, 9)).astype(np.int32)
    al = rng.integers(1, 13, 5).astype(np.int32)
    bl = rng.integers(1, 10, 5).astype(np.int32)
    d1, r1 = native_ops.batch_edit_distance(a, al, b, bl)
    # force fallback
    lib, native_ops._lib, native_ops._build_failed = native_ops._lib, None, True
    try:
        d2, r2 = native_ops.batch_edit_distance(a, al, b, bl)
    finally:
        native_ops._lib, native_ops._build_failed = lib, False
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(r1, r2)


def test_per_fold_semantics():
    v = V.timit_vocab()
    s = v.stoi()
    # hyp 'aa q' vs ref 'ao': after fold both are ['aa'] -> 0 errors
    hyp = np.asarray([[s["aa"], s["q"], V.EOS]], np.int32)
    ref = np.asarray([[s["ao"], V.EOS, V.PAD]], np.int32)
    d, rl = metrics.per_batch(hyp, ref, v)
    assert int(d[0]) == 0 and int(rl[0]) == 1


def test_hyp_lengths_stop_at_eos_or_pad():
    toks = np.asarray([[5, 6, V.EOS, 7], [5, V.PAD, V.PAD, V.PAD], [5, 6, 7, 8]])
    np.testing.assert_array_equal(metrics.hyp_lengths(toks), [2, 1, 4])


def test_wer_strings():
    e, n = metrics.wer_strings("the cat sat", "the cat sat")
    assert (e, n) == (0, 3)
    e, n = metrics.wer_strings("the dog sat", "the cat sat")
    assert (e, n) == (1, 3)
    e, n = metrics.wer_strings("", "a b")
    assert (e, n) == (2, 2)


def test_wer_batch_char_vocab():
    v = V.char_vocab()
    hyp = np.asarray([v.encode_text("hello world") + [V.EOS]])
    ref = np.asarray([v.encode_text("hello word") + [V.EOS]])
    errs, words = metrics.wer_batch(hyp, ref, v)
    assert (errs, words) == (1, 2)


def test_error_rate_accumulator():
    er = metrics.ErrorRate()
    er.update([2, 3], [10, 10])
    assert er.rate == 0.25
