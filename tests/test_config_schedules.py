"""Config system + schedule unit tests."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # core merge-gate subset (pytest.ini)
import yaml

from semi_supervised_asr_tpu.config import (
    Config, ObjectiveConfig, TrainConfig, config_fingerprint,
    config_from_dict, load_config, save_config,
)
from semi_supervised_asr_tpu.training import schedules


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = Config(name="rt")
        p = tmp_path / "c.yaml"
        save_config(cfg, p)
        assert load_config(p) == cfg

    def test_all_shipped_configs_load(self):
        import glob

        for path in glob.glob("configs/*.yaml"):
            cfg = load_config(path)
            assert cfg.name, path

    def test_overrides(self, tmp_path):
        p = tmp_path / "c.yaml"
        save_config(Config(), p)
        cfg = load_config(p, ["train.learning_rate=0.01",
                              "model.enc_hidden=512",
                              "data.frame_buckets=[96, 160]"])
        assert cfg.train.learning_rate == 0.01
        assert cfg.model.enc_hidden == 512
        assert cfg.data.frame_buckets == (96, 160)

    def test_unknown_key_rejected(self):
        with pytest.raises(KeyError, match="TrainConfig.bogus"):
            config_from_dict({"train": {"bogus": 1}})
        with pytest.raises(KeyError, match="unknown config sections"):
            config_from_dict({"nope": {}})

    def test_fingerprint_stable_and_sensitive(self):
        a = config_fingerprint(Config())
        b = config_fingerprint(Config())
        c = config_fingerprint(Config(name="other"))
        assert a == b != c

    def test_derived_properties(self):
        cfg = Config()
        assert cfg.frontend.win_length == 400
        assert cfg.frontend.hop_length == 160
        assert cfg.model.time_reduction == 2 ** cfg.model.enc_layers
        assert cfg.model.enc_out_dim == 2 * cfg.model.enc_hidden


class TestSchedules:
    def test_tf_rate_linear_decay(self):
        obj = ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=0.6,
                              tf_decay_steps=100)
        assert float(schedules.tf_rate_at(0, obj)) == pytest.approx(1.0)
        assert float(schedules.tf_rate_at(50, obj)) == pytest.approx(0.8)
        assert float(schedules.tf_rate_at(100, obj)) == pytest.approx(0.6)
        assert float(schedules.tf_rate_at(500, obj)) == pytest.approx(0.6)

    def test_warmup_cosine(self):
        cfg = TrainConfig(learning_rate=1e-3, lr_schedule="cosine",
                          warmup_steps=10, decay_steps=100)
        sched = schedules.learning_rate_schedule(cfg)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
        assert float(sched(60)) < 1e-3

    def test_noam_inverse_sqrt(self):
        cfg = TrainConfig(learning_rate=2e-3, lr_schedule="noam",
                          warmup_steps=100)
        sched = schedules.learning_rate_schedule(cfg)
        # linear warmup to the peak (= learning_rate) at warmup_steps
        assert float(sched(50)) == pytest.approx(1e-3, rel=1e-4)
        assert float(sched(100)) == pytest.approx(2e-3, rel=1e-4)
        # inverse-sqrt decay past the peak: lr(4*warmup) = peak / 2
        assert float(sched(400)) == pytest.approx(1e-3, rel=1e-4)
        # monotone decay and finite at step 0
        assert float(sched(0)) <= float(sched(1)) < float(sched(100))
        assert float(sched(10000)) < float(sched(400))

    def test_noam_requires_warmup(self):
        with pytest.raises(ValueError):
            schedules.learning_rate_schedule(
                TrainConfig(lr_schedule="noam", warmup_steps=0)
            )

    def test_constant(self):
        sched = schedules.learning_rate_schedule(
            TrainConfig(learning_rate=5e-4, lr_schedule="constant")
        )
        assert float(sched(0)) == float(sched(99999)) == pytest.approx(5e-4)

    def test_unknown_schedule_raises(self):
        with pytest.raises(ValueError):
            schedules.learning_rate_schedule(TrainConfig(lr_schedule="nope"))

    def test_optimizers_construct(self):
        for name in ("adam", "adamw", "sgd"):
            schedules.make_optimizer(TrainConfig(optimizer=name))
        with pytest.raises(ValueError):
            schedules.make_optimizer(TrainConfig(optimizer="nope"))


class TestFreezeClipOrdering:
    def test_frozen_grads_do_not_inflate_clip_norm(self):
        """Freezing must zero gradients BEFORE global-norm clipping: huge
        frozen-subtree grads must not shrink the live params' updates."""
        import dataclasses

        import jax.numpy as jnp
        import numpy as np
        import optax

        from semi_supervised_asr_tpu.config import TrainConfig
        from semi_supervised_asr_tpu.training.schedules import make_optimizer

        cfg = dataclasses.replace(
            TrainConfig(), optimizer="sgd", learning_rate=1.0,
            lr_schedule="constant", grad_clip_norm=1.0,
            freeze=("frozen",),
        )
        opt = make_optimizer(cfg)
        params = {"frozen": jnp.ones(4), "live": jnp.ones(4)}
        st = opt.init(params)
        g_small = jnp.full(4, 0.1)
        up_huge, _ = opt.update(
            {"frozen": jnp.full(4, 1e6), "live": g_small}, st, params)
        up_zero, _ = opt.update(
            {"frozen": jnp.zeros(4), "live": g_small}, st, params)
        np.testing.assert_array_equal(np.asarray(up_huge["frozen"]), 0.0)
        np.testing.assert_allclose(np.asarray(up_huge["live"]),
                                   np.asarray(up_zero["live"]), rtol=1e-6)
