"""Joint CTC-attention: optax CTC loss vs the torch oracle, greedy CTC
best-path decode, and the fused step with the aux term."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.data.vocab import EOS, PAD
from semi_supervised_asr_tpu.decode.ctc import ctc_greedy_from_enc
from semi_supervised_asr_tpu.objectives import losses as LO


class TestCTCLossParity:
    def test_matches_torch_ctc(self):
        """optax.ctc_loss == torch.nn.functional.ctc_loss (the installed
        torch-cpu is the oracle, SURVEY.md §5.2) on random inputs."""
        import optax
        import torch

        rng = np.random.default_rng(0)
        b, t, v = 3, 12, 8
        logits = rng.standard_normal((b, t, v)).astype(np.float32)
        input_lens = np.asarray([12, 10, 7], np.int32)
        label_lens = np.asarray([4, 3, 2], np.int32)
        labels = np.zeros((b, 5), np.int32)
        for i in range(b):
            labels[i, : label_lens[i]] = rng.integers(1, v,
                                                      label_lens[i])

        logit_pad = (np.arange(t)[None] >= input_lens[:, None]).astype(
            np.float32)
        label_pad = (np.arange(5)[None] >= label_lens[:, None]).astype(
            np.float32)
        got = np.asarray(optax.ctc_loss(
            jnp.asarray(logits), jnp.asarray(logit_pad),
            jnp.asarray(labels), jnp.asarray(label_pad), blank_id=0,
        ))

        logp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
        want = torch.nn.functional.ctc_loss(
            logp.transpose(0, 1), torch.from_numpy(labels),
            torch.from_numpy(input_lens), torch.from_numpy(label_lens),
            blank=0, reduction="none",
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_fake_rows_contribute_nothing(self):
        enc = jnp.asarray(np.random.default_rng(1).standard_normal(
            (2, 6, 4)), jnp.float32)
        mask = jnp.ones((2, 6), bool)
        params = {"w": jnp.asarray(
            np.random.default_rng(2).standard_normal((4, 8)), jnp.float32),
            "b": jnp.zeros((8,))}
        toks = jnp.asarray([[5, 6, EOS, PAD], [PAD, PAD, PAD, PAD]],
                           jnp.int32)
        just_first = jnp.asarray([[5, 6, EOS, PAD]], jnp.int32)
        a = float(LO.ctc_loss(params, enc, mask, toks))
        b = float(LO.ctc_loss(params, enc[:1], mask[:1], just_first))
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestCTCGreedy:
    def _enc_for_path(self, path, v=8):
        """Craft encoder outputs whose CTC-head argmax follows `path`."""
        t = len(path)
        enc = np.zeros((1, t, v), np.float32)
        for i, p in enumerate(path):
            enc[0, i, p] = 5.0
        params = {"w": jnp.eye(v, dtype=jnp.float32),
                  "b": jnp.zeros((v,), jnp.float32)}
        return params, jnp.asarray(enc), jnp.ones((1, t), bool)

    def test_collapse_repeats_and_blanks(self):
        # path: blank a a blank b b b c -> "a b c"
        params, enc, mask = self._enc_for_path([0, 4, 4, 0, 5, 5, 5, 6])
        toks, _ = ctc_greedy_from_enc(params, enc, mask)
        row = np.asarray(toks)[0]
        assert list(row[:4]) == [4, 5, 6, EOS]
        assert (row[4:] == PAD).all()

    def test_repeat_across_blank_survives(self):
        # a blank a -> "a a" (CTC semantics: blank separates repeats)
        params, enc, mask = self._enc_for_path([4, 0, 4])
        toks, _ = ctc_greedy_from_enc(params, enc, mask)
        row = np.asarray(toks)[0]
        assert list(row[:3]) == [4, 4, EOS]

    def test_padding_frames_ignored(self):
        params, enc, mask = self._enc_for_path([4, 5, 6, 6, 6])
        mask = jnp.asarray([[True, True, False, False, False]])
        toks, _ = ctc_greedy_from_enc(params, enc, mask)
        row = np.asarray(toks)[0]
        assert list(row[:3]) == [4, 5, EOS]

    def test_all_blank_gives_empty_hyp(self):
        params, enc, mask = self._enc_for_path([0, 0, 0, 0])
        toks, _ = ctc_greedy_from_enc(params, enc, mask)
        row = np.asarray(toks)[0]
        assert row[0] == EOS


class TestJointTraining:
    def test_step_with_ctc_aux_learns(self):
        from tests.test_train_step import CFG, make_batch
        from semi_supervised_asr_tpu.config import ObjectiveConfig
        from semi_supervised_asr_tpu.training import train_step as TS

        cfg = CFG.replace(
            model=dataclasses.replace(CFG.model, ctc_head=True),
            objective=ObjectiveConfig(
                lambda_ctc=0.3, tf_rate_start=1.0, tf_rate_end=1.0),
        )
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        assert "ctc" in state.params
        step = TS.make_train_step(cfg)
        audio, alens, tokens, real, cmvn = make_batch()
        ctcs = []
        for _ in range(12):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            assert "ctc" in m
            ctcs.append(float(m["ctc"]))
        assert all(np.isfinite(ctcs))
        assert ctcs[-1] < ctcs[0], ctcs  # the aux term itself learns


class TestCTCRescoring:
    def _setup(self, seed=0, b=2, t=10):
        from tests.test_beam import CFG as BCFG

        cfg = dataclasses.replace(BCFG, ctc_head=True)
        from semi_supervised_asr_tpu.models import seq2seq as M

        params = M.init_model(jax.random.PRNGKey(seed), cfg)
        feats = jax.random.normal(jax.random.PRNGKey(seed + 1),
                                  (b, t, cfg.n_mels))
        lens = jnp.asarray([t, t - 2][:b])
        enc, enc_mask, keys = M.encode(params, feats, lens, cfg)
        return cfg, params, enc, enc_mask, keys

    def test_weight_zero_matches_plain_beam(self):
        from semi_supervised_asr_tpu.config import DecodeConfig
        from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc

        cfg, params, enc, enc_mask, keys = self._setup()
        d0 = DecodeConfig(beam_size=3)
        plain = beam_decode_from_enc(
            params["speller"], cfg, d0, enc, enc_mask, keys, 8)
        rescored_w0 = beam_decode_from_enc(
            params["speller"], cfg, d0, enc, enc_mask, keys, 8,
            ctc_params=params["ctc"])  # ctc_weight=0 -> ignored
        np.testing.assert_array_equal(np.asarray(plain[0]),
                                      np.asarray(rescored_w0[0]))
        np.testing.assert_allclose(np.asarray(plain[1]),
                                   np.asarray(rescored_w0[1]), rtol=1e-6)

    def test_rescoring_runs_and_can_change_selection(self):
        """With ctc_weight>0 the pipeline runs, scores are finite, and
        across seeds the CTC term changes at least one selection."""
        from semi_supervised_asr_tpu.config import DecodeConfig
        from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc

        changed = 0
        for seed in range(6):
            cfg, params, enc, enc_mask, keys = self._setup(seed)
            att = beam_decode_from_enc(
                params["speller"], cfg, DecodeConfig(beam_size=4),
                enc, enc_mask, keys, 8)
            joint = beam_decode_from_enc(
                params["speller"], cfg, DecodeConfig(beam_size=4,
                                                     ctc_weight=0.7),
                enc, enc_mask, keys, 8, ctc_params=params["ctc"])
            assert np.isfinite(np.asarray(joint[1])).all()
            if not np.array_equal(np.asarray(att[0]), np.asarray(joint[0])):
                changed += 1
        assert changed > 0, "CTC rescoring never changed any selection"

    def test_ctc_scores_match_external_computation(self):
        """The in-beam CTC total logp equals optax.ctc_loss computed
        outside on the winning hypothesis."""
        import optax

        from semi_supervised_asr_tpu.config import DecodeConfig
        from semi_supervised_asr_tpu.data.vocab import EOS, PAD
        from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc

        cfg, params, enc, enc_mask, keys = self._setup(3)
        d = DecodeConfig(beam_size=1, ctc_weight=1.0, length_penalty=0.0)
        hyp, score = beam_decode_from_enc(
            params["speller"], cfg, d, enc, enc_mask, keys, 8,
            ctc_params=params["ctc"])
        logits = (
            jnp.einsum("bte,ev->btv", enc, params["ctc"]["w"])
            + params["ctc"]["b"]
        )
        labels = jnp.where(hyp == EOS, PAD, hyp)
        lp = -optax.ctc_loss(
            logits, 1.0 - enc_mask.astype(jnp.float32),
            labels, (labels == PAD).astype(jnp.float32), blank_id=PAD)
        # length_penalty 0 -> normalization divides by len**0 == 1
        np.testing.assert_allclose(np.asarray(score), np.asarray(lp),
                                   rtol=1e-4)
