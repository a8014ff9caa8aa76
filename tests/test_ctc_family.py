"""CTC family (model.family=ctc): model + fused step + semi + driver.

Covers: init/head shapes, gradient wiring, fused-step overfit with
greedy recovery, grad-accum exactness, LAS-only-objective guards, GSPMD
mesh parity, the pseudo-label term (teacher stop-grad, confidence
filter, semi step learning), and the Solver end-to-end (beam mode
dispatches to the prefix beam).
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.decode.ctc import ctc_greedy_from_enc
from semi_supervised_asr_tpu.models import ctc_model as CM
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.training import train_step as TS

# full-suite only: multi-minute fused-step / jit-heavy integration
# suites (quick keeps the oracle-parity cores; pytest.ini)

MCFG = ModelConfig(
    n_mels=80, vocab_size=20, family="ctc",
    enc_hidden=32, enc_base_layers=1, enc_layers=2,
    attn_dim=8, attn_conv_channels=2, attn_conv_width=5,
    dec_hidden=8, compute_dtype="float32",
)
FCFG = FrontendConfig(spec_augment=False, cmvn="global")


def _cfg(model=MCFG, obj=None, **train_kw):
    return Config(frontend=FCFG, model=model,
                  objective=obj or ObjectiveConfig(),
                  train=TrainConfig(**train_kw))


def _toy_batch(cfg, rng, b=4, f=48, u=6):
    """f=48 frames -> T'=12 after the 4x pyramid: CTC alignment room
    for the 5 labels + possible consecutive repeats."""
    hop = cfg.frontend.hop_length
    s = (f - 1) * hop
    audio = (rng.standard_normal((b, s)) * 0.1).astype(np.float32)
    alens = np.full((b,), s, np.int32)
    tokens = np.zeros((b, u), np.int32)
    tokens[:, : u - 1] = rng.integers(4, cfg.model.vocab_size, (b, u - 1))
    tokens[:, u - 1] = 2  # EOS
    real = np.ones((b,), bool)
    cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
    return audio, alens, tokens, real, cmvn


def _decode_greedy(cfg, params, audio, alens, cmvn):
    feats, flens = TS.featurize(
        cfg, jnp.asarray(audio), jnp.asarray(alens),
        (jnp.asarray(cmvn[0]), jnp.asarray(cmvn[1])), None, False,
    )
    enc, enc_mask = CM.encode(params, feats, flens, cfg.model)
    return np.asarray(ctc_greedy_from_enc(params["ctc"], enc, enc_mask)[0])


class TestModel:
    def test_init_and_encode(self):
        cfg = MCFG
        params = M.init_model(jax.random.PRNGKey(0), cfg)
        assert set(params) == {"listener", "ctc"}
        assert params["ctc"]["w"].shape == (cfg.enc_out_dim, cfg.vocab_size)

    def test_grads_reach_every_leaf(self):
        cfg = _cfg()
        rng = np.random.default_rng(1)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng, b=2)
        params = M.init_model(jax.random.PRNGKey(5), cfg.model)

        def loss_fn(p):
            from semi_supervised_asr_tpu.objectives.losses import (
                ctc_per_utt_nll,
            )

            feats, flens = TS.featurize(
                cfg, jnp.asarray(audio), jnp.asarray(alens),
                (jnp.asarray(cmvn[0]), jnp.asarray(cmvn[1])), None, False,
            )
            enc, enc_mask = CM.encode(p, feats, flens, cfg.model)
            nll, _ = ctc_per_utt_nll(
                p["ctc"], enc, enc_mask, jnp.asarray(tokens)
            )
            return jnp.sum(nll)

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for path, g in flat:
            assert float(jnp.abs(g).max()) > 0.0, (
                f"zero gradient at {jax.tree_util.keystr(path)}"
            )


class TestTraining:
    def test_overfit_through_fused_step(self):
        cfg = _cfg(learning_rate=3e-3)
        rng = np.random.default_rng(0)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng)
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        first = None
        for _ in range(250):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            first = first if first is not None else float(m["loss"])
        assert float(m["loss"]) < first * 0.3, (first, float(m["loss"]))
        assert "nll_per_label" in m

        hyps = _decode_greedy(cfg, state.params, audio, alens, cmvn)
        want = [[int(x) for x in row if x not in (0, 2)] for row in tokens]
        got = [[int(x) for x in row if x not in (0, 2)] for row in hyps]
        agree = sum(g == w for g, w in zip(got, want))
        assert agree >= len(want) - 1, (got, want)

    def test_grad_accum_matches(self):
        cfg = _cfg(learning_rate=1e-3)
        rng = np.random.default_rng(2)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng, b=4)
        res = {}
        for accum in (1, 2):
            c = dc.replace(cfg, train=dc.replace(cfg.train,
                                                 grad_accum=accum))
            state = TS.init_train_state(c, jax.random.PRNGKey(0))
            step = TS.make_train_step(c)
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            res[accum] = jax.tree.map(np.asarray, state.params)
        for a, b_ in zip(jax.tree.leaves(res[1]), jax.tree.leaves(res[2])):
            np.testing.assert_allclose(a, b_, atol=1e-4)

    def test_las_objectives_rejected(self):
        cfg = _cfg()
        for field, msg in [
            ("lambda_ctc", "IS the model"),
            ("lambda_text_ae", "no decoder"),
        ]:
            bad = dc.replace(
                cfg, objective=dc.replace(cfg.objective, **{field: 0.5})
            )
            with pytest.raises(AssertionError, match=msg):
                TS.make_train_step(bad)
        bad = dc.replace(
            cfg, model=dc.replace(cfg.model, lm_fusion="deep")
        )
        with pytest.raises(AssertionError, match="SHALLOW"):
            TS.make_train_step(bad)


class TestMWER:
    def test_expected_risk_falls(self):
        """CE warmup then the MWER term: the n-best expected edit
        distance drops once the gate opens (objectives/ctc_mwer.py)."""
        obj = ObjectiveConfig(lambda_mwer=0.3, mwer_beam=3,
                              mwer_warmup_steps=120)
        cfg = _cfg(obj=obj, learning_rate=3e-3)
        rng = np.random.default_rng(6)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng)
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        first_risk = None
        for i in range(200):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            if i == 120:
                first_risk = float(m["mwer_risk"])
        assert float(m["mwer_risk"]) <= first_risk, (
            first_risk, float(m["mwer_risk"])
        )
        assert np.isfinite(float(m["mwer"]))
        # gated steps really executed zero
        state2 = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        _, m0 = step(state2, audio, alens, tokens, real, *cmvn)
        assert float(m0["mwer"]) == 0.0 and float(m0["mwer_risk"]) == 0.0


class TestSemi:
    def _semi_cfg(self, **obj_kw):
        obj = ObjectiveConfig(lambda_pseudo=1.0, use_ema_teacher=True,
                              **obj_kw)
        return _cfg(obj=obj, learning_rate=2e-3)

    def test_pseudo_grads_student_only(self):
        from semi_supervised_asr_tpu.objectives.ctc_semi import (
            ctc_pseudo_label_loss,
        )

        cfg = self._semi_cfg()
        rng = np.random.default_rng(3)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng, b=2)
        params = M.init_model(jax.random.PRNGKey(1), cfg.model)
        teacher = M.init_model(jax.random.PRNGKey(2), cfg.model)
        feats, flens = TS.featurize(
            cfg, jnp.asarray(audio), jnp.asarray(alens),
            (jnp.asarray(cmvn[0]), jnp.asarray(cmvn[1])), None, False,
        )

        def loss_wrt_teacher(tp):
            return ctc_pseudo_label_loss(
                params, tp, cfg.model, cfg.objective, feats, feats, flens
            )

        tgrads = jax.grad(loss_wrt_teacher)(teacher)
        assert all(
            float(jnp.abs(g).max()) == 0.0 for g in jax.tree.leaves(tgrads)
        ), "pseudo-label gradients leaked into the teacher"

        def loss_wrt_student(p):
            return ctc_pseudo_label_loss(
                p, teacher, cfg.model, cfg.objective, feats, feats, flens
            )

        sgrads = jax.grad(loss_wrt_student)(params)
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree.leaves(sgrads))
        assert total > 0.0

    def test_confidence_filter_can_zero(self):
        from semi_supervised_asr_tpu.objectives.ctc_semi import (
            ctc_pseudo_label_loss,
        )

        cfg = self._semi_cfg(pseudo_confidence=0.999999)
        rng = np.random.default_rng(4)
        audio, alens, _, _, cmvn = _toy_batch(cfg, rng, b=2)
        params = M.init_model(jax.random.PRNGKey(1), cfg.model)
        feats, flens = TS.featurize(
            cfg, jnp.asarray(audio), jnp.asarray(alens),
            (jnp.asarray(cmvn[0]), jnp.asarray(cmvn[1])), None, False,
        )
        loss = ctc_pseudo_label_loss(
            params, params, cfg.model, cfg.objective, feats, feats, flens
        )
        assert float(loss) == 0.0

    def test_semi_step_runs_and_learns(self):
        cfg = self._semi_cfg(pseudo_warmup_steps=0)
        rng = np.random.default_rng(5)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng, b=4)
        ua, ua_lens, _, ua_real, _ = _toy_batch(cfg, rng, b=4)
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg, semi_supervised=True)
        utext = np.zeros((4, 6), np.int32)       # unused by the family
        first = None
        for _ in range(60):
            state, m = step(
                state, audio, alens, tokens, real,
                ua, ua_lens, ua_real, utext, ua_real, *cmvn,
            )
            first = first if first is not None else float(m["loss"])
        assert "pseudo" in m and np.isfinite(float(m["pseudo"]))
        assert float(m["loss"]) < first, (first, float(m["loss"]))


class TestMesh:
    def test_gspmd_mesh_matches_single_device(self):
        from semi_supervised_asr_tpu.parallel import mesh as MESH

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = _cfg(learning_rate=1e-3)
        rng = np.random.default_rng(3)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng, b=8)
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        s1, m1 = TS.make_train_step(cfg)(
            state, audio, alens, tokens, real, *cmvn
        )
        mesh = MESH.make_mesh(cfg.parallel, jax.devices()[:8])
        state2 = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        args = MESH.shard_batch_arrays(
            mesh, cfg.parallel, audio, alens, tokens, real
        )
        s2, m2 = TS.make_train_step(cfg, mesh=mesh)(
            state2, *args, cmvn[0], cmvn[1]
        )
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        for a, b_ in zip(jax.tree.leaves(s1.params),
                         jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4
            )


class TestSolver:
    def test_train_validate_test(self, tmp_path):
        """Solver drives the CTC family end-to-end: train falls, dev
        scores through greedy, --test mode "beam" dispatches to the
        prefix beam (decode/ctc_beam.py)."""
        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.solver import Solver

        cfg = load_config("configs/synthetic_smoke.yaml", [
            "model.family=ctc",
            "train.total_steps=60", "train.eval_every=30",
            "train.ckpt_every=30", "train.log_every=20",
            "data.num_synthetic_utts=8", "train.batch_size=8",
            "decode.beam_size=4",
        ])
        solver = Solver(cfg, str(tmp_path), use_mesh=False)
        solver.train()
        per, records, _ = solver._score_batches(
            solver.bundle.dev, solver.state.params, "beam"
        )
        assert 0.0 <= per <= 1.5 and records
        out = solver.test(mode="greedy", restore_best=False)
        assert np.isfinite(out["per"]) and out["mode"] == "greedy"
