"""Beam search equivalence: jit lattice beam vs pure-Python oracle beam,
and greedy == beam(K=1) (SURVEY.md §5.2, config C3)."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import DecodeConfig, ModelConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD
from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
from semi_supervised_asr_tpu.decode.greedy import greedy_decode_from_enc
from semi_supervised_asr_tpu.decode.python_beam import beam_decode_python
from semi_supervised_asr_tpu.models import seq2seq as M

import pytest

pytestmark = pytest.mark.quick  # core merge-gate subset (pytest.ini)

CFG = ModelConfig(
    n_mels=8, vocab_size=10, enc_hidden=12, enc_layers=1, enc_base_layers=1,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=12, dec_layers=1, embed_dim=8, compute_dtype="float32",
)
MAX_LEN = 8


def setup(seed=0, b=3, t=8):
    params = M.init_model(jax.random.PRNGKey(seed), CFG)
    feats = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, CFG.n_mels))
    lens = jnp.array([t, t - 2, t - 4][:b])
    enc, enc_mask, keys = M.encode(params, feats, lens, CFG)
    return params, enc, enc_mask, keys


def strip(tokens):
    out = []
    for tok in np.asarray(tokens).tolist():
        if tok == PAD:
            continue
        out.append(tok)
        if tok == EOS:
            break
    return out


class TestBeamVsPython:
    def test_matches_python_oracle(self):
        params, enc, enc_mask, keys = setup()
        dcfg = DecodeConfig(beam_size=3, length_penalty=1.0)
        hyps, scores = beam_decode_from_enc(
            params["speller"], CFG, dcfg, enc, enc_mask, keys, MAX_LEN
        )
        for b in range(enc.shape[0]):
            ref_toks, ref_score = beam_decode_python(
                params["speller"], CFG, dcfg,
                enc[b : b + 1], enc_mask[b : b + 1], keys[b : b + 1], MAX_LEN,
            )
            got = strip(hyps[b])
            # Only compare when the oracle hyp finished within MAX_LEN (both
            # sides truncate otherwise and scores are length-dependent).
            assert got == ref_toks, f"utt {b}: {got} != {ref_toks}"
            np.testing.assert_allclose(float(scores[b]), ref_score, rtol=1e-4)

    def test_matches_python_oracle_other_seeds(self):
        for seed in (10, 20):
            params, enc, enc_mask, keys = setup(seed)
            dcfg = DecodeConfig(beam_size=4, length_penalty=0.8)
            hyps, scores = beam_decode_from_enc(
                params["speller"], CFG, dcfg, enc, enc_mask, keys, MAX_LEN
            )
            for b in range(enc.shape[0]):
                ref_toks, ref_score = beam_decode_python(
                    params["speller"], CFG, dcfg,
                    enc[b : b + 1], enc_mask[b : b + 1], keys[b : b + 1],
                    MAX_LEN,
                )
                assert strip(hyps[b]) == ref_toks
                np.testing.assert_allclose(
                    float(scores[b]), ref_score, rtol=1e-4
                )


class TestGreedyIsBeam1:
    def test_greedy_equals_beam_k1(self):
        params, enc, enc_mask, keys = setup(5)
        dcfg = DecodeConfig(beam_size=1, length_penalty=1.0)
        bh, _ = beam_decode_from_enc(
            params["speller"], CFG, dcfg, enc, enc_mask, keys, MAX_LEN
        )
        gh, _ = greedy_decode_from_enc(
            params["speller"], CFG, enc, enc_mask, keys, MAX_LEN
        )
        for b in range(enc.shape[0]):
            assert strip(bh[b]) == strip(gh[b])


class TestGreedy:
    def test_emits_pad_after_eos(self):
        params, enc, enc_mask, keys = setup(7)
        toks, lps = greedy_decode_from_enc(
            params["speller"], CFG, enc, enc_mask, keys, MAX_LEN
        )
        toks = np.asarray(toks)
        for row in toks:
            seen_eos = False
            for tok in row:
                if seen_eos:
                    assert tok == PAD
                if tok == EOS:
                    seen_eos = True

    def test_jit_compiles(self):
        params, enc, enc_mask, keys = setup(8)
        f = jax.jit(
            lambda p, e, m, k: greedy_decode_from_enc(p, CFG, e, m, k, MAX_LEN)
        )
        t1, _ = f(params["speller"], enc, enc_mask, keys)
        t2, _ = f(params["speller"], enc, enc_mask, keys)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


class TestNBest:
    def test_nbest_top1_equals_best_and_sorted(self):
        params, enc, enc_mask, keys = setup(7)
        dcfg = DecodeConfig(beam_size=4, length_penalty=1.0)
        best_hyp, best_score = beam_decode_from_enc(
            params["speller"], CFG, dcfg, enc, enc_mask, keys, MAX_LEN)
        nbest, nscores = beam_decode_from_enc(
            params["speller"], CFG, dcfg, enc, enc_mask, keys, MAX_LEN,
            return_nbest=True)
        assert nbest.shape == (enc.shape[0], 4, MAX_LEN)
        np.testing.assert_array_equal(np.asarray(nbest[:, 0]),
                                      np.asarray(best_hyp))
        np.testing.assert_allclose(np.asarray(nscores[:, 0]),
                                   np.asarray(best_score), rtol=1e-6)
        s = np.asarray(nscores)
        assert (np.diff(s, axis=1) <= 1e-6).all()  # descending
