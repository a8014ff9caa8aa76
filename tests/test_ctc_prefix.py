"""One-pass joint CTC/attention decoding (decode/ctc_prefix.py + the
``decode.ctc_one_pass`` branch of decode/beam.py):

* the cumlogsumexp closed forms must equal BRUTE-FORCE alignment
  enumeration (every prefix mass, exact-sequence mass, repeat-token
  extensions, trailing-pad invariance);
* the jit in-lattice joint beam must equal the Python oracle beam whose
  prefix scores come from an independent textbook per-frame loop;
* at ctc_weight=1 the accumulated one-pass score telescopes to the
  exact CTC forward log-probability of the winning hypothesis.
"""

import dataclasses
import itertools
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import DecodeConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD
from semi_supervised_asr_tpu.decode import ctc_prefix as CP
from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
from semi_supervised_asr_tpu.decode.ctc import ctc_head_logits
from semi_supervised_asr_tpu.decode.python_beam import (
    beam_decode_python, ctc_prefix_oracle,
)

pytestmark = pytest.mark.quick  # core merge-gate subset (pytest.ini)


def _collapse(path):
    out, prev = [], -1
    for s in path:
        if s != prev and s != PAD:
            out.append(s)
        prev = s
    return tuple(out)


def _brute_masses(p):
    """p: [T, V] frame probabilities -> (prefix_mass, exact_mass) dicts."""
    t_frames, v = p.shape
    prefix_mass = defaultdict(float)
    exact = defaultdict(float)
    for path in itertools.product(range(v), repeat=t_frames):
        prob = float(np.prod([p[t, path[t]] for t in range(t_frames)]))
        col = _collapse(path)
        exact[col] += prob
        for ln in range(len(col) + 1):
            prefix_mass[col[:ln]] += prob
    return prefix_mass, exact


class TestClosedFormsVsBruteForce:
    def test_prefix_and_exact_masses(self):
        rng = np.random.default_rng(0)
        t_frames, v = 5, 4
        logits = rng.standard_normal((1, t_frames, v)).astype(np.float32)
        mask = np.ones((1, t_frames), bool)
        logp = np.asarray(
            CP.masked_ctc_logp(jnp.asarray(logits), jnp.asarray(mask))
        )
        prefix_mass, exact = _brute_masses(np.exp(logp[0]))

        gn, gb = CP.prefix_init(jnp.asarray(logp))
        last = jnp.asarray([-1])
        empty = jnp.asarray([True])
        seq = []
        for c in (2, 3, 3):   # includes a repeat extension
            psi, eos = CP.candidate_scores(
                gn, gb, jnp.asarray(logp), last, empty
            )
            for cand in range(1, v):
                np.testing.assert_allclose(
                    float(np.exp(np.asarray(psi)[0, cand])),
                    prefix_mass[tuple(seq + [cand])],
                    rtol=1e-4, err_msg=f"prefix {seq} + {cand}",
                )
            np.testing.assert_allclose(
                float(np.exp(np.asarray(eos)[0])), exact[tuple(seq)],
                rtol=1e-4, atol=1e-9, err_msg=f"exact {seq}",
            )
            # the oracle loop must agree with the closed forms too
            o_psi, o_eos = ctc_prefix_oracle(logp[0], seq)
            np.testing.assert_allclose(
                float(np.asarray(eos)[0]), o_eos, rtol=1e-4, atol=1e-5
            )
            if seq:
                np.testing.assert_allclose(o_psi, prefix_log := np.log(
                    prefix_mass[tuple(seq)]), rtol=1e-4)
            gn, gb = CP.advance(
                gn, gb, jnp.asarray(logp), last, empty, jnp.asarray([c])
            )
            last = jnp.asarray([c])
            empty = jnp.asarray([False])
            seq.append(c)
        _, eos = CP.candidate_scores(gn, gb, jnp.asarray(logp), last, empty)
        np.testing.assert_allclose(
            float(np.exp(np.asarray(eos)[0])), exact[tuple(seq)], rtol=1e-4
        )

    def test_trailing_pads_are_score_neutral(self):
        rng = np.random.default_rng(1)
        t_frames, v = 4, 4
        logits = rng.standard_normal((1, t_frames + 3, v)).astype(np.float32)
        mask = np.zeros((1, t_frames + 3), bool)
        mask[:, :t_frames] = True
        logp_pad = CP.masked_ctc_logp(jnp.asarray(logits), jnp.asarray(mask))
        logp_cut = CP.masked_ctc_logp(
            jnp.asarray(logits[:, :t_frames]),
            jnp.asarray(mask[:, :t_frames]),
        )

        def run(logp):
            gn, gb = CP.prefix_init(logp)
            last, empty = jnp.asarray([-1]), jnp.asarray([True])
            for c in (2, 3):
                gn, gb = CP.advance(gn, gb, logp, last, empty,
                                    jnp.asarray([c]))
                last, empty = jnp.asarray([c]), jnp.asarray([False])
            return CP.candidate_scores(gn, gb, logp, last, empty)

        psi_a, eos_a = run(logp_pad)
        psi_b, eos_b = run(logp_cut)
        # compare in probability space: impossible extensions differ only
        # in HOW impossible (-1e4-order vs -1e30), both exactly exp()==0
        np.testing.assert_allclose(
            np.exp(np.asarray(psi_a)), np.exp(np.asarray(psi_b)),
            rtol=1e-4, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.exp(np.asarray(eos_a)), np.exp(np.asarray(eos_b)), rtol=1e-4
        )


class TestOnePassBeam:
    def _setup(self, seed=0, b=2, t=10):
        from tests.test_beam import CFG as BCFG
        from semi_supervised_asr_tpu.models import seq2seq as M

        cfg = dataclasses.replace(BCFG, ctc_head=True)
        params = M.init_model(jax.random.PRNGKey(seed), cfg)
        feats = jax.random.normal(
            jax.random.PRNGKey(seed + 1), (b, t, cfg.n_mels)
        )
        lens = jnp.asarray([t, t - 2][:b])
        enc, enc_mask, keys = M.encode(params, feats, lens, cfg)
        return cfg, params, enc, enc_mask, keys

    def test_matches_python_oracle(self):
        """In-lattice joint beam == oracle beam driven by the independent
        textbook prefix DP — tokens AND scores, multiple seeds."""
        for seed in range(3):
            cfg, params, enc, enc_mask, keys = self._setup(seed)
            dcfg = DecodeConfig(
                beam_size=3, length_penalty=1.0,
                ctc_weight=0.4, ctc_one_pass=True,
            )
            hyps, scores = beam_decode_from_enc(
                params["speller"], cfg, dcfg, enc, enc_mask, keys, 8,
                ctc_params=params["ctc"],
            )
            ctc_logp = np.asarray(CP.masked_ctc_logp(
                ctc_head_logits(params["ctc"], enc), enc_mask
            ))
            for b in range(enc.shape[0]):
                row = lambda a: a[b : b + 1]
                ref_toks, ref_score = beam_decode_python(
                    params["speller"], cfg, dcfg,
                    enc[b : b + 1], enc_mask[b : b + 1],
                    jax.tree.map(row, keys), 8,
                    ctc_logp=ctc_logp[b : b + 1],
                )
                got = [int(x) for x in np.asarray(hyps[b]) if x != PAD]
                got = got[: got.index(EOS) + 1] if EOS in got else got
                assert got == ref_toks, (seed, b, got, ref_toks)
                np.testing.assert_allclose(
                    float(scores[b]), ref_score, rtol=1e-4
                )

    def test_one_pass_flag_without_weight_is_plain_beam(self):
        cfg, params, enc, enc_mask, keys = self._setup(4)
        plain = beam_decode_from_enc(
            params["speller"], cfg, DecodeConfig(beam_size=3),
            enc, enc_mask, keys, 8,
        )
        flagged = beam_decode_from_enc(
            params["speller"], cfg,
            DecodeConfig(beam_size=3, ctc_one_pass=True),
            enc, enc_mask, keys, 8, ctc_params=params["ctc"],
        )
        np.testing.assert_array_equal(
            np.asarray(plain[0]), np.asarray(flagged[0])
        )
        np.testing.assert_allclose(
            np.asarray(plain[1]), np.asarray(flagged[1]), rtol=1e-6
        )

    def test_weight_one_score_is_exact_ctc_forward(self):
        """w=1: the per-step deltas telescope to the CTC forward logp of
        the winning sequence (cross-checked against optax.ctc_loss)."""
        import optax

        cfg, params, enc, enc_mask, keys = self._setup(5)
        d = DecodeConfig(
            beam_size=2, ctc_weight=1.0, ctc_one_pass=True,
            length_penalty=0.0,
        )
        hyp, score = beam_decode_from_enc(
            params["speller"], cfg, d, enc, enc_mask, keys, 8,
            ctc_params=params["ctc"],
        )
        logits = ctc_head_logits(params["ctc"], enc)
        labels = jnp.where(hyp == EOS, PAD, hyp)
        lp = -optax.ctc_loss(
            logits, 1.0 - enc_mask.astype(jnp.float32),
            labels, (labels == PAD).astype(jnp.float32), blank_id=PAD,
        )
        np.testing.assert_allclose(
            np.asarray(score), np.asarray(lp), rtol=1e-4
        )

    def test_one_pass_changes_selection_vs_attention(self):
        changed = 0
        for seed in range(6):
            cfg, params, enc, enc_mask, keys = self._setup(seed)
            att = beam_decode_from_enc(
                params["speller"], cfg, DecodeConfig(beam_size=4),
                enc, enc_mask, keys, 8,
            )
            joint = beam_decode_from_enc(
                params["speller"], cfg,
                DecodeConfig(beam_size=4, ctc_weight=0.7,
                             ctc_one_pass=True),
                enc, enc_mask, keys, 8, ctc_params=params["ctc"],
            )
            assert np.isfinite(np.asarray(joint[1])).all()
            if not np.array_equal(np.asarray(att[0]), np.asarray(joint[0])):
                changed += 1
        assert changed > 0, "one-pass CTC never changed any selection"
