"""Fused train step tests: supervised + semi-supervised variants run,
losses decrease on an overfit batch, metrics finite (configs C1/C4)."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import (
    Config, DataConfig, FrontendConfig, ModelConfig, ObjectiveConfig,
    TrainConfig,
)
from semi_supervised_asr_tpu.training import train_step as TS

import pytest

# quick marks are per-class: oracle-parity/semantics cores stay in the
# quick gate; the multi-minute fused-step suites are full-suite only
# (pytest.ini).

CFG = Config(
    frontend=FrontendConfig(spec_augment=False, cmvn="global"),
    model=ModelConfig(
        n_mels=80, vocab_size=16, enc_hidden=16, enc_layers=2,
        enc_base_layers=1, attn_dim=8, attn_conv_channels=4,
        attn_conv_width=5, dec_hidden=16, dec_layers=1, embed_dim=8,
        compute_dtype="float32",
    ),
    objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
    train=TrainConfig(learning_rate=3e-3, grad_clip_norm=5.0, batch_size=2),
)
SEMI_CFG = CFG.replace(
    objective=ObjectiveConfig(
        lambda_text_ae=0.3, lambda_pseudo=0.3, use_ema_teacher=True,
        tf_rate_start=1.0, tf_rate_end=1.0,
    )
)


def make_batch(seed=0, b=2, s=3040, u=6):
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((b, s)).astype(np.float32) * 0.1
    audio_lens = np.full((b,), s, np.int32)
    tokens = np.full((b, u), 0, np.int32)
    for i in range(b):
        n = u - 1
        tokens[i, :n] = rng.integers(4, 16, n)
        tokens[i, n] = 2  # EOS
    real = np.ones((b,), bool)
    cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
    return audio, audio_lens, tokens, real, cmvn


@pytest.mark.quick
class TestSupervisedStep:
    def test_runs_and_learns(self):
        state = TS.init_train_state(CFG, jax.random.PRNGKey(0))
        step = TS.make_train_step(CFG)
        audio, alens, tokens, real, cmvn = make_batch()
        losses = []
        for _ in range(12):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.8, losses  # overfits a fixed batch
        assert int(state.step) == 12

    def test_metrics_content(self):
        state = TS.init_train_state(CFG, jax.random.PRNGKey(1))
        step = TS.make_train_step(CFG)
        audio, alens, tokens, real, cmvn = make_batch(1)
        _, m = step(state, audio, alens, tokens, real, *cmvn)
        for k in ("loss", "ce", "acc", "grad_norm", "tf_rate", "frames"):
            assert k in m
        assert float(m["grad_norm"]) > 0
        assert int(m["frames"]) == 2 * 3040 // 160

    def test_unreal_rows_no_gradient(self):
        state = TS.init_train_state(CFG, jax.random.PRNGKey(2))
        step = TS.make_train_step(CFG)
        audio, alens, tokens, real, cmvn = make_batch(2)
        # all rows fake -> zero loss contribution -> zero grad norm
        fake = np.zeros_like(real)
        _, m = step(state, audio, alens, tokens, fake, *cmvn)
        assert float(m["loss"]) == 0.0
        assert float(m["grad_norm"]) == 0.0


@pytest.mark.quick
class TestSemiSupervisedStep:
    def test_semi_step_runs(self):
        state = TS.init_train_state(SEMI_CFG, jax.random.PRNGKey(3))
        step = TS.make_train_step(SEMI_CFG, semi_supervised=True)
        audio, alens, tokens, real, cmvn = make_batch(3)
        ua, ualens, _, ureal, _ = make_batch(4)
        utext = np.asarray([[5, 6, 7, 2, 0, 0], [8, 9, 2, 0, 0, 0]], np.int32)
        utreal = np.ones((2,), bool)
        state, m = step(
            state, audio, alens, tokens, real,
            ua, ualens, ureal, utext, utreal, *cmvn,
        )
        for k in ("loss", "ce", "text_ae", "pseudo"):
            assert k in m and np.isfinite(float(m[k])), (k, m.get(k))

    def test_ema_moves_toward_params(self):
        state = TS.init_train_state(SEMI_CFG, jax.random.PRNGKey(4))
        step = TS.make_train_step(SEMI_CFG, semi_supervised=True)
        audio, alens, tokens, real, cmvn = make_batch(5)
        ua, ualens, _, ureal, _ = make_batch(6)
        utext = np.asarray([[5, 6, 2, 0, 0, 0], [7, 8, 2, 0, 0, 0]], np.int32)
        utreal = np.ones((2,), bool)
        # snapshot to host: the step donates the state, deleting old buffers
        p0 = np.asarray(state.params["speller"]["w_out"]).copy()
        e0 = np.asarray(state.ema_params["speller"]["w_out"]).copy()
        np.testing.assert_array_equal(p0, e0)
        for _ in range(3):
            state, _ = step(
                state, audio, alens, tokens, real,
                ua, ualens, ureal, utext, utreal, *cmvn,
            )
        p = np.asarray(state.params["speller"]["w_out"])
        e = np.asarray(state.ema_params["speller"]["w_out"])
        assert not np.allclose(p, e)       # EMA lags params
        d0 = np.abs(e0 - p).mean()
        d1 = np.abs(e - p).mean()
        assert d1 < d0                     # but tracks them


class TestPolyakEMA:
    """train.polyak_decay: EMA maintained every step for eval smoothing
    (decode.use_ema), independent of the pseudo-label teacher."""

    def test_polyak_recursion_exact(self):
        import dataclasses

        cfg = CFG.replace(
            train=dataclasses.replace(CFG.train, polyak_decay=0.5)
        )
        state = TS.init_train_state(cfg, jax.random.PRNGKey(7))
        step = TS.make_train_step(cfg)
        audio, alens, tokens, real, cmvn = make_batch(7)
        expected = np.array(np.asarray(state.params["speller"]["w_out"]))
        for _ in range(3):
            state, _ = step(state, audio, alens, tokens, real, *cmvn)
            p = np.asarray(state.params["speller"]["w_out"])
            expected = 0.5 * expected + 0.5 * p
            np.testing.assert_allclose(
                np.asarray(state.ema_params["speller"]["w_out"]),
                expected, rtol=2e-6, atol=1e-7,
            )

    def test_supervised_without_polyak_keeps_ema_frozen(self):
        state = TS.init_train_state(CFG, jax.random.PRNGKey(8))
        step = TS.make_train_step(CFG)
        audio, alens, tokens, real, cmvn = make_batch(8)
        e0 = np.array(np.asarray(state.ema_params["speller"]["w_out"]))
        for _ in range(2):
            state, _ = step(state, audio, alens, tokens, real, *cmvn)
        np.testing.assert_array_equal(
            np.asarray(state.ema_params["speller"]["w_out"]), e0
        )
        assert not np.allclose(
            np.asarray(state.params["speller"]["w_out"]), e0
        )

    def test_use_ema_solver_guards(self, tmp_path):
        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.solver import Solver

        base = ["data.num_synthetic_utts=8", "train.batch_size=4"]
        with pytest.raises(ValueError, match="use_ema"):
            Solver(load_config("configs/synthetic_smoke.yaml",
                               base + ["decode.use_ema=true"]),
                   tmp_path / "a", use_mesh=False)
        with pytest.raises(ValueError, match="mutually exclusive"):
            Solver(load_config(
                "configs/synthetic_smoke.yaml",
                base + ["decode.use_ema=true", "train.polyak_decay=0.99",
                        "decode.average_ckpts=2"]),
                tmp_path / "b", use_mesh=False)
        s = Solver(load_config(
            "configs/synthetic_smoke.yaml",
            base + ["decode.use_ema=true", "train.polyak_decay=0.99"]),
            tmp_path / "c", use_mesh=False)
        assert s._live_eval_params() is s.state.ema_params


class TestGradAccumulation:
    def test_accum_matches_full_batch(self):
        """With equal token/audio lengths per row (so per-microbatch mean
        normalization equals full-batch mean), grad_accum=2 must produce
        the same update as one full-batch step."""
        audio, alens, tokens, real, cmvn = make_batch(7, b=4)
        import dataclasses
        # SGD: the update is linear in the gradient, so fp summation-order
        # noise stays tiny (Adam's g/sqrt(v) blows it up on ~0 grads).
        cfg_full = CFG.replace(
            train=dataclasses.replace(CFG.train, batch_size=4,
                                      optimizer="sgd"))
        cfg_acc = cfg_full.replace(
            train=dataclasses.replace(cfg_full.train, grad_accum=2))
        s_full = TS.init_train_state(cfg_full, jax.random.PRNGKey(9))
        s_acc = TS.init_train_state(cfg_acc, jax.random.PRNGKey(9))
        step_full = TS.make_train_step(cfg_full)
        step_acc = TS.make_train_step(cfg_acc)
        s_full, m_full = step_full(s_full, audio, alens, tokens, real, *cmvn)
        s_acc, m_acc = step_acc(s_acc, audio, alens, tokens, real, *cmvn)
        np.testing.assert_allclose(
            float(m_acc["loss"]), float(m_full["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s_acc.params),
                        jax.tree.leaves(s_full.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    def test_accum_semi_step_runs(self):
        import dataclasses
        cfg = SEMI_CFG.replace(
            train=dataclasses.replace(SEMI_CFG.train, batch_size=4,
                                      grad_accum=2))
        state = TS.init_train_state(cfg, jax.random.PRNGKey(10))
        step = TS.make_train_step(cfg, semi_supervised=True)
        audio, alens, tokens, real, cmvn = make_batch(11, b=4)
        ua, ualens, _, ureal, _ = make_batch(12, b=4)
        utext = np.asarray([[5, 6, 7, 2, 0, 0]] * 4, np.int32)
        utreal = np.ones((4,), bool)
        state, m = step(
            state, audio, alens, tokens, real,
            ua, ualens, ureal, utext, utreal, *cmvn,
        )
        for k in ("loss", "ce", "text_ae", "pseudo"):
            assert k in m and np.isfinite(float(m[k])), (k, m.get(k))
        assert int(state.step) == 1

    def test_accum_rejects_indivisible_batch(self):
        import dataclasses
        cfg = CFG.replace(
            train=dataclasses.replace(CFG.train, grad_accum=2))
        state = TS.init_train_state(cfg, jax.random.PRNGKey(13))
        step = TS.make_train_step(cfg)
        audio, alens, tokens, real, cmvn = make_batch(14, b=3)
        import pytest

        with pytest.raises(AssertionError, match="grad_accum"):
            step(state, audio, alens, tokens, real, *cmvn)


class TestCheckify:
    def _cfg(self):
        import dataclasses
        return CFG.replace(
            train=dataclasses.replace(CFG.train, checkify_errors="nan,div"))

    def test_clean_step_passes(self):
        cfg = self._cfg()
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        audio, alens, tokens, real, cmvn = make_batch()
        state, m = step(state, audio, alens, tokens, real, *cmvn)
        assert np.isfinite(float(m["loss"]))

    def test_nan_input_raises(self):
        import pytest

        cfg = self._cfg()
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        audio, alens, tokens, real, cmvn = make_batch()
        audio[:, 100:200] = np.nan
        with pytest.raises(Exception, match="nan"):
            step(state, audio, alens, tokens, real, *cmvn)

    def test_rejects_mesh(self):
        import pytest

        from semi_supervised_asr_tpu.parallel import mesh as MESH

        cfg = self._cfg()
        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device")
        m = MESH.make_mesh(cfg.parallel)
        with pytest.raises(AssertionError, match="use_mesh"):
            TS.make_train_step(cfg, mesh=m)


@pytest.mark.quick
class TestFreeze:
    def test_frozen_subtree_never_moves(self):
        import dataclasses
        cfg = CFG.replace(
            train=dataclasses.replace(CFG.train, freeze=("listener",)))
        state = TS.init_train_state(cfg, jax.random.PRNGKey(20))
        step = TS.make_train_step(cfg)
        audio, alens, tokens, real, cmvn = make_batch(20)
        enc0 = jax.tree.map(lambda x: np.asarray(x).copy(),
                            state.params["listener"])
        dec0 = np.asarray(state.params["speller"]["b_out"]).copy()
        for _ in range(3):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
        for a, b in zip(jax.tree.leaves(enc0),
                        jax.tree.leaves(state.params["listener"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(
            dec0, np.asarray(state.params["speller"]["b_out"]))
        assert np.isfinite(float(m["loss"]))


class TestBf16WeightStream:
    """train.bf16_weight_stream: one-time bf16 cast inside the loss.

    fp32 master weights must stay in the state; the step's loss/grads see
    bf16-rounded weights (close to the fp32 step, not bitwise)."""

    def _cfg(self):
        import dataclasses
        return CFG.replace(
            train=dataclasses.replace(CFG.train, bf16_weight_stream=True))

    def test_masters_stay_fp32_and_learns(self):
        cfg = self._cfg()
        state = TS.init_train_state(cfg, jax.random.PRNGKey(30))
        step = TS.make_train_step(cfg)
        audio, alens, tokens, real, cmvn = make_batch(30)
        losses = []
        for _ in range(12):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            losses.append(float(m["loss"]))
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_loss_close_to_fp32_step(self):
        state32 = TS.init_train_state(CFG, jax.random.PRNGKey(31))
        cfg = self._cfg()
        state16 = TS.init_train_state(cfg, jax.random.PRNGKey(31))
        audio, alens, tokens, real, cmvn = make_batch(31)
        _, m32 = TS.make_train_step(CFG)(
            state32, audio, alens, tokens, real, *cmvn)
        _, m16 = TS.make_train_step(cfg)(
            state16, audio, alens, tokens, real, *cmvn)
        l32, l16 = float(m32["loss"]), float(m16["loss"])
        assert abs(l32 - l16) < 0.02 * abs(l32) + 1e-3, (l32, l16)

    def test_semi_step_runs_bf16(self):
        import dataclasses
        cfg = SEMI_CFG.replace(
            train=dataclasses.replace(SEMI_CFG.train,
                                      bf16_weight_stream=True))
        state = TS.init_train_state(cfg, jax.random.PRNGKey(32))
        step = TS.make_train_step(cfg, semi_supervised=True)
        audio, alens, tokens, real, cmvn = make_batch(32)
        ua, ualens, _, ureal, _ = make_batch(33)
        utext = np.asarray([[5, 6, 7, 2, 0, 0], [8, 9, 2, 0, 0, 0]],
                           np.int32)
        utreal = np.ones((2,), bool)
        state, m = step(
            state, audio, alens, tokens, real,
            ua, ualens, ureal, utext, utreal, *cmvn,
        )
        for k in ("loss", "ce", "text_ae", "pseudo"):
            assert k in m and np.isfinite(float(m[k])), (k, m.get(k))
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
