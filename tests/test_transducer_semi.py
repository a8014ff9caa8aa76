"""Transducer semi-supervised objectives (objectives/transducer_semi.py).

The LAS semi-supervised contract, re-checked for the RNN-T family:
* ILM text loss == hand-computed next-label CE with the blank excluded;
* its gradients touch ONLY the label side (predictor + joint pred-path)
  — listener and w_enc get exactly zero;
* pseudo-label: stop-gradient through the teacher (zero teacher grads),
  the confidence filter can mask everything to an exact 0 loss;
* the fused semi step runs end-to-end with both terms and learns;
* MWER/MBR sequence training (objectives/transducer_mwer.py): beam
  n-best + differentiable lattice rescoring + jit risks, warmup-gated;
* CTC-aux stays rejected for the family.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.models import transducer as TD
from semi_supervised_asr_tpu.objectives import transducer_semi as TSEMI
from semi_supervised_asr_tpu.training import train_step as TS

# full-suite only: multi-minute fused-step / jit-heavy tests

MCFG = ModelConfig(
    n_mels=80, vocab_size=16, family="transducer",
    enc_hidden=16, enc_layers=2, enc_base_layers=1,
    pred_hidden=16, pred_layers=1, joint_dim=16, embed_dim=8,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=8, compute_dtype="float32",
)
CFG = Config(
    frontend=FrontendConfig(spec_augment=False, cmvn="global"),
    model=MCFG,
    objective=ObjectiveConfig(
        lambda_text_ae=0.3, lambda_pseudo=0.3, use_ema_teacher=True,
    ),
    train=TrainConfig(learning_rate=3e-3, grad_clip_norm=5.0,
                      batch_size=2),
)


def _text(rows):
    u = max(len(r) for r in rows)
    out = np.zeros((len(rows), u), np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return jnp.asarray(out)


def _feats(rng, b=2, t=24):
    feats = jnp.asarray(rng.standard_normal((b, t, MCFG.n_mels)),
                        jnp.float32)
    lens = jnp.asarray([t, t - 6], jnp.int32)
    return feats, lens


class TestILMTextLoss:
    def test_matches_hand_ce(self):
        params = M.init_model(jax.random.PRNGKey(0), MCFG)
        text = _text([[5, 6, 7, 2], [8, 9, 2, 0]])   # EOS=2, PAD=0
        got = float(TSEMI.ilm_text_loss(params, MCFG, text))

        pred = np.asarray(TD.predictor_train(
            params["predictor"], text, MCFG
        ))                                            # [B, U+1, P]
        j = params["joint"]
        hp = pred @ np.asarray(j["w_pred"]) + np.asarray(j["b"])
        logits = np.tanh(hp) @ np.asarray(j["w_out"]) + np.asarray(
            j["b_out"]
        )
        logits = logits[:, :-1, :]
        logits[..., 0] = -1e30                        # exclude blank
        lse = np.log(np.exp(
            logits - logits.max(-1, keepdims=True)
        ).sum(-1)) + logits.max(-1)
        lp = logits - lse[..., None]
        text_np = np.asarray(text)
        lens = [3, 2]                                 # labels sans EOS
        tot, n = 0.0, 0
        for i, L in enumerate(lens):
            for u in range(L):
                tot -= lp[i, u, text_np[i, u]]
                n += 1
        np.testing.assert_allclose(got, tot / n, rtol=1e-5)

    def test_grads_touch_only_label_side(self):
        params = M.init_model(jax.random.PRNGKey(1), MCFG)
        text = _text([[5, 6, 2], [7, 2, 0]])
        g = jax.grad(
            lambda p: TSEMI.ilm_text_loss(p, MCFG, text)
        )(params)
        assert all(
            float(jnp.abs(x).max()) == 0.0
            for x in jax.tree.leaves(g["listener"])
        )
        assert float(jnp.abs(g["joint"]["w_enc"]).max()) == 0.0
        assert float(jnp.abs(g["joint"]["w_pred"]).max()) > 0.0
        assert float(jnp.abs(g["joint"]["w_out"]).max()) > 0.0
        assert float(jnp.abs(g["predictor"]["embed"]).max()) > 0.0

    def test_pad_beyond_eos_ignored(self):
        params = M.init_model(jax.random.PRNGKey(2), MCFG)
        a = float(TSEMI.ilm_text_loss(params, MCFG,
                                      _text([[5, 6, 2, 0, 0]])))
        b = float(TSEMI.ilm_text_loss(params, MCFG, _text([[5, 6, 2]])))
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestPseudoLabel:
    def _setup(self, seed=0):
        params = M.init_model(jax.random.PRNGKey(seed), MCFG)
        teacher = M.init_model(jax.random.PRNGKey(seed + 100), MCFG)
        rng = np.random.default_rng(seed)
        clean, lens = _feats(rng)
        aug, _ = _feats(rng)
        return params, teacher, clean, aug, lens

    def test_loss_finite_and_student_grads_flow(self):
        params, teacher, clean, aug, lens = self._setup()
        obj = CFG.objective

        def loss(p):
            return TSEMI.pseudo_label_loss(
                p, teacher, MCFG, obj, clean, aug, lens,
                jax.random.PRNGKey(0), max_u=6,
            )

        val, g = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        assert float(jnp.abs(g["joint"]["w_out"]).max()) > 0.0
        assert any(
            float(jnp.abs(x).max()) > 0.0
            for x in jax.tree.leaves(g["listener"])
        )

    def test_teacher_gets_zero_gradient(self):
        params, teacher, clean, aug, lens = self._setup(1)
        obj = CFG.objective
        g = jax.grad(
            lambda tp: TSEMI.pseudo_label_loss(
                params, tp, MCFG, obj, clean, aug, lens,
                jax.random.PRNGKey(0), max_u=6,
            )
        )(teacher)
        assert all(
            float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(g)
        )

    def test_confidence_filter_can_mask_everything(self):
        params, teacher, clean, aug, lens = self._setup(2)
        obj = dc.replace(CFG.objective, pseudo_confidence=0.999999)
        val = TSEMI.pseudo_label_loss(
            params, teacher, MCFG, obj, clean, aug, lens,
            jax.random.PRNGKey(0), max_u=6,
        )
        assert float(val) == 0.0

    def test_row_mask_drops_rows(self):
        params, teacher, clean, aug, lens = self._setup(3)
        obj = CFG.objective
        val = TSEMI.pseudo_label_loss(
            params, teacher, MCFG, obj, clean, aug, lens,
            jax.random.PRNGKey(0), max_u=6,
            row_mask=jnp.zeros((2,), bool),
        )
        assert float(val) == 0.0


class TestFusedSemiStep:
    def _batch(self, seed=0, b=2, s=3040, u=6):
        rng = np.random.default_rng(seed)
        audio = rng.standard_normal((b, s)).astype(np.float32) * 0.1
        alens = np.full((b,), s, np.int32)
        tokens = np.zeros((b, u), np.int32)
        for i in range(b):
            tokens[i, : u - 1] = rng.integers(4, 16, u - 1)
            tokens[i, u - 1] = 2
        real = np.ones((b,), bool)
        cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
        return audio, alens, tokens, real, cmvn

    def test_semi_step_runs_and_learns(self):
        state = TS.init_train_state(CFG, jax.random.PRNGKey(3))
        step = TS.make_train_step(CFG, semi_supervised=True)
        audio, alens, tokens, real, cmvn = self._batch(3)
        ua, ualens, _, ureal, _ = self._batch(4)
        utext = np.asarray([[5, 6, 7, 2, 0, 0], [8, 9, 2, 0, 0, 0]],
                           np.int32)
        utreal = np.ones((2,), bool)
        losses = []
        for _ in range(8):
            state, m = step(
                state, audio, alens, tokens, real,
                ua, ualens, ureal, utext, utreal, *cmvn,
            )
            losses.append(float(m["loss"]))
        for k in ("loss", "nll_per_label", "text_ilm", "pseudo",
                  "pseudo_gate"):
            assert k in m and np.isfinite(float(m[k])), (k, m.get(k))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses

    def test_ctc_aux_still_rejected(self):
        cfg = CFG.replace(
            objective=dc.replace(CFG.objective, lambda_ctc=0.1)
        )
        with pytest.raises(AssertionError, match="lambda_ctc"):
            TS.make_train_step(cfg)


    def test_gspmd_mesh_matches_single_device(self):
        """Semi-supervised transducer step under the 8-virtual-device
        data mesh equals the single-device step — the in-step greedy
        teacher and both semi terms partition over the batch axis."""
        from semi_supervised_asr_tpu.parallel import mesh as MESH

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        audio, alens, tokens, real, cmvn = self._batch(5, b=8)
        ua, ualens, _, ureal, _ = self._batch(6, b=8)
        utext = np.zeros((8, 6), np.int32)
        rng = np.random.default_rng(7)
        for i in range(8):
            utext[i, :3] = rng.integers(4, 16, 3)
            utext[i, 3] = 2
        utreal = np.ones((8,), bool)

        state1 = TS.init_train_state(CFG, jax.random.PRNGKey(9))
        s1, m1 = TS.make_train_step(CFG, semi_supervised=True)(
            state1, audio, alens, tokens, real,
            ua, ualens, ureal, utext, utreal, *cmvn,
        )
        mesh = MESH.make_mesh(CFG.parallel, jax.devices()[:8])
        state2 = TS.init_train_state(CFG, jax.random.PRNGKey(9))
        args = MESH.shard_batch_arrays(
            mesh, CFG.parallel, audio, alens, tokens, real,
            ua, ualens, ureal, utext, utreal,
        )
        s2, m2 = TS.make_train_step(
            CFG, semi_supervised=True, mesh=mesh
        )(state2, *args, *cmvn)
        for k in ("loss", "pseudo", "text_ilm"):
            np.testing.assert_allclose(
                float(m1[k]), float(m2[k]), rtol=1e-5
            )
        for a, b_ in zip(jax.tree.leaves(s1.params),
                         jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4
            )


class TestTransducerMWER:
    """MBR sequence training for RNN-T (objectives/transducer_mwer.py):
    beam n-best + differentiable lattice rescoring + jit edit-distance
    risks, behind the LAS knobs."""

    def test_loss_and_grads(self):
        from semi_supervised_asr_tpu.models import transducer as TD
        from semi_supervised_asr_tpu.objectives import (
            transducer_mwer as TMWER,
        )

        obj = dc.replace(CFG.objective, lambda_mwer=1.0, mwer_beam=3)
        tokens = _text([[5, 6, 7, 2], [8, 9, 2, 0]])
        loss_grad = None

        def loss(p, feats, lens):
            enc, mask = TD.encode(p, feats, lens, MCFG)
            l, risk = TMWER.mwer_loss_from_enc(
                p, MCFG, obj, enc, mask, tokens
            )
            return l, risk

        # a random model's n-best can tie in risk (expected risk is then
        # EXACTLY zero by the variance-reduction baseline — correct, but
        # gradient-free); scan seeds for a risk-diverse n-best
        for seed in range(6):
            params = M.init_model(jax.random.PRNGKey(seed), MCFG)
            rng = np.random.default_rng(seed)
            feats, lens = _feats(rng, t=32)
            (val, risk), g = jax.value_and_grad(
                loss, has_aux=True)(params, feats, lens)
            assert np.isfinite(float(val)) and np.isfinite(float(risk))
            assert float(risk) >= 0.0
            if float(jnp.abs(g["joint"]["w_out"]).max()) > 0.0:
                loss_grad = g
                break
        assert loss_grad is not None, (
            "no seed produced a risk-diverse n-best"
        )
        assert any(
            float(jnp.abs(x).max()) > 0.0
            for x in jax.tree.leaves(loss_grad["listener"])
        )

    def test_train_step_with_mwer(self):
        cfg = CFG.replace(objective=dc.replace(
            ObjectiveConfig(), lambda_mwer=0.3, mwer_beam=2,
        ))
        state = TS.init_train_state(cfg, jax.random.PRNGKey(1))
        step = TS.make_train_step(cfg)
        rng = np.random.default_rng(1)
        audio = rng.standard_normal((2, 3040)).astype(np.float32) * 0.1
        alens = np.full((2,), 3040, np.int32)
        tokens = np.zeros((2, 6), np.int32)
        tokens[:, :5] = rng.integers(4, 16, (2, 5))
        tokens[:, 5] = 2
        real = np.ones((2,), bool)
        cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
        state, m = step(state, audio, alens, tokens, real, *cmvn)
        assert "mwer" in m and "mwer_risk" in m
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["mwer_risk"]))

    def test_warmup_gate(self):
        cfg = CFG.replace(objective=dc.replace(
            ObjectiveConfig(), lambda_mwer=0.3, mwer_beam=2,
            mwer_warmup_steps=5,
        ))
        state = TS.init_train_state(cfg, jax.random.PRNGKey(2))
        step = TS.make_train_step(cfg)
        rng = np.random.default_rng(2)
        audio = rng.standard_normal((2, 3040)).astype(np.float32) * 0.1
        alens = np.full((2,), 3040, np.int32)
        tokens = np.zeros((2, 6), np.int32)
        tokens[:, :5] = rng.integers(4, 16, (2, 5))
        tokens[:, 5] = 2
        real = np.ones((2,), bool)
        cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
        state, m = step(state, audio, alens, tokens, real, *cmvn)
        # step 0 < warmup: the gated branch contributes exactly zero
        assert float(m["mwer"]) == 0.0 and float(m["mwer_risk"]) == 0.0
