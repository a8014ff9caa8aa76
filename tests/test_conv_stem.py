"""Conv subsampler stem (model.conv_subsample): stride-2 conv blocks
before the LSTMs.

Must preserve the listener's contracts exactly: correct output lengths
(ceil semantics matching the pyramid), exact zeros on pad frames, and —
the property everything downstream relies on — pad-bucket invariance:
the same utterance padded into two different frame buckets produces
bitwise-identical encoder outputs on the valid region.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.models import listener as L
from semi_supervised_asr_tpu.training import train_step as TS

MCFG = ModelConfig(
    n_mels=80, vocab_size=16, enc_hidden=8, enc_layers=2,
    enc_base_layers=1, attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=8, dec_layers=1, embed_dim=8, compute_dtype="float32",
    conv_subsample=2, conv_channels=4,
)


def feats_batch(rng, b=3, t=32, f=80, lens=(32, 17, 9)):
    x = rng.standard_normal((b, t, f)).astype(np.float32)
    lens = np.asarray(lens, np.int32)
    mask = np.arange(t)[None, :] < lens[:, None]
    return x * mask[..., None], lens


class TestConvStem:
    def test_time_reduction_includes_conv(self):
        assert MCFG.time_reduction == 2 ** (2 + 2)
        assert L.output_frames(32, MCFG) == 2

    def test_shapes_and_lengths(self, rng):
        params = L.init_listener(jax.random.PRNGKey(0), MCFG)
        assert len(params["conv"]) == 2
        x, lens = feats_batch(rng)
        enc, enc_lens = L.listener_apply(params, jnp.asarray(x),
                                         jnp.asarray(lens), MCFG)
        assert enc.shape == (3, 32 // 16, 2 * MCFG.enc_hidden)
        # ceil(ceil(len/2)/2) through the stem, then pyramid ceil halvings
        want = lens
        for _ in range(4):
            want = (want + 1) // 2
        np.testing.assert_array_equal(np.asarray(enc_lens), want)

    def test_pad_frames_exact_zero(self, rng):
        params = L.init_listener(jax.random.PRNGKey(0), MCFG)
        x, lens = feats_batch(rng)
        enc, enc_lens = L.listener_apply(params, jnp.asarray(x),
                                         jnp.asarray(lens), MCFG)
        enc = np.asarray(enc)
        for i, l in enumerate(np.asarray(enc_lens)):
            assert np.all(enc[i, l:] == 0.0)

    def test_pad_bucket_invariance(self, rng):
        params = L.init_listener(jax.random.PRNGKey(0), MCFG)
        x, lens = feats_batch(rng, t=32)
        x_big = np.zeros((3, 64, 80), np.float32)
        x_big[:, :32] = x
        enc_a, lens_a = L.listener_apply(params, jnp.asarray(x),
                                         jnp.asarray(lens), MCFG)
        enc_b, lens_b = L.listener_apply(params, jnp.asarray(x_big),
                                         jnp.asarray(lens), MCFG)
        np.testing.assert_array_equal(np.asarray(lens_a), np.asarray(lens_b))
        for i, l in enumerate(np.asarray(lens_a)):
            np.testing.assert_array_equal(
                np.asarray(enc_a)[i, :l], np.asarray(enc_b)[i, :l]
            )

    def test_train_step_and_conv_grads(self):
        cfg = Config(
            frontend=FrontendConfig(spec_augment=False, cmvn="global"),
            model=MCFG,
            objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
            train=TrainConfig(learning_rate=1e-3),
        )
        rng = np.random.default_rng(0)
        # 4960 samples -> 32 frames: divisible by time_reduction 16
        b, s, u = 4, 4960, 6
        audio = rng.standard_normal((b, s)).astype(np.float32) * 0.1
        alens = np.full((b,), s, np.int32)
        tokens = np.zeros((b, u), np.int32)
        tokens[:, : u - 1] = rng.integers(4, 16, (b, u - 1))
        tokens[:, u - 1] = 2
        real = np.ones((b,), bool)
        cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))

        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        w0 = np.asarray(state.params["listener"]["conv"][0]["w"]).copy()
        step = TS.make_train_step(cfg)
        state, m = step(state, audio, alens, tokens, real, *cmvn)
        assert np.isfinite(float(m["loss"]))
        w1 = np.asarray(state.params["listener"]["conv"][0]["w"])
        assert np.any(w1 != w0), "conv stem must receive gradients"

    def test_disabled_stem_matches_old_init(self):
        # conv_subsample=0 keeps the historical param tree and behavior
        cfg0 = dataclasses.replace(MCFG, conv_subsample=0)
        params = L.init_listener(jax.random.PRNGKey(0), cfg0)
        assert "conv" not in params
        assert params["layers"][0]["fwd"]["w_ih"].shape[0] == cfg0.n_mels
