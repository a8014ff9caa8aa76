"""Multi-chip semantics without a cluster (SURVEY.md §5.2-3, config C5):
8 virtual CPU devices stand in for the TPU slice.  Checks:
* mesh construction and batch sharding;
* explicit shard_map psum-gradient == single-device gradient on the
  concatenated batch;
* the GSPMD-sharded fused train step runs and matches the unsharded step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, ParallelConfig,
    TrainConfig,
)
from semi_supervised_asr_tpu.objectives import losses as LO
from semi_supervised_asr_tpu.parallel import dp, mesh as MESH
from semi_supervised_asr_tpu.training import train_step as TS

CFG = Config(
    frontend=FrontendConfig(spec_augment=False, cmvn="global"),
    model=ModelConfig(
        n_mels=80, vocab_size=16, enc_hidden=8, enc_layers=2,
        enc_base_layers=1, attn_dim=8, attn_conv_channels=4,
        attn_conv_width=5, dec_hidden=8, dec_layers=1, embed_dim=8,
        compute_dtype="float32",
    ),
    objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
    train=TrainConfig(learning_rate=1e-3),
    parallel=ParallelConfig(donate_state=False),
)


def make_batch(seed=0, b=8, s=3040, u=6):
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((b, s)).astype(np.float32) * 0.1
    audio_lens = np.full((b,), s, np.int32)
    tokens = np.zeros((b, u), np.int32)
    for i in range(b):
        tokens[i, : u - 1] = rng.integers(4, 16, u - 1)
        tokens[i, u - 1] = 2
    real = np.ones((b,), bool)
    cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
    return audio, audio_lens, tokens, real, cmvn


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return MESH.make_mesh(CFG.parallel)


class TestMesh:
    def test_axes(self, mesh8):
        assert mesh8.axis_names == ("data", "model")
        assert mesh8.devices.shape == (8, 1)

    def test_model_axis_stub(self):
        pcfg = ParallelConfig(model_parallel=2)
        m = MESH.make_mesh(pcfg)
        assert m.devices.shape == (4, 2)

    def test_shard_batch_arrays(self, mesh8):
        audio, alens, *_ = make_batch()
        (da, dl) = MESH.shard_batch_arrays(mesh8, CFG.parallel, audio, alens)
        assert da.sharding.spec == jax.sharding.PartitionSpec("data")
        np.testing.assert_array_equal(np.asarray(da), audio)


class TestPsumGradEqualsSingleDevice:
    def test_grad_allreduce_determinism(self, mesh8):
        params = TS.init_train_state(CFG, jax.random.PRNGKey(0)).params
        audio, alens, tokens, real, cmvn = make_batch()

        # single-device reference: mean CE over the full batch
        def loss_fn(p):
            feats, flens = TS.featurize(CFG, audio, alens, cmvn, None, False)
            loss, _ = LO.supervised_loss(
                p, CFG.model, CFG.objective, feats, flens,
                jnp.asarray(tokens), 1.0, jax.random.PRNGKey(0), train=False,
            )
            return loss

        ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

        fn = dp.make_psum_grad_fn(CFG, mesh8)
        da, dl, dt = MESH.shard_batch_arrays(
            mesh8, CFG.parallel, audio, alens, tokens
        )
        loss, grads = fn(params, da, dl, dt, *cmvn)

        # equal per-shard token counts -> pmean of shard means == global mean
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
            )


class TestShardedTrainStep:
    def test_sharded_step_matches_unsharded(self, mesh8):
        state_a = TS.init_train_state(CFG, jax.random.PRNGKey(1))
        state_b = jax.tree.map(jnp.copy, state_a)
        audio, alens, tokens, real, cmvn = make_batch(1)

        plain = TS.make_train_step(CFG)
        sharded = TS.make_train_step(CFG, mesh=mesh8)

        sa, m_a = plain(state_a, audio, alens, tokens, real, *cmvn)
        da, dl, dt, dr = MESH.shard_batch_arrays(
            mesh8, CFG.parallel, audio, alens, tokens, real
        )
        sb, m_b = sharded(state_b, da, dl, dt, dr, *cmvn)

        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_sharded_step_multiple_steps(self, mesh8):
        state = TS.init_train_state(CFG, jax.random.PRNGKey(2))
        sharded = TS.make_train_step(CFG, mesh=mesh8)
        audio, alens, tokens, real, cmvn = make_batch(2)
        da, dl, dt, dr = MESH.shard_batch_arrays(
            mesh8, CFG.parallel, audio, alens, tokens, real
        )
        losses = []
        for _ in range(5):
            state, m = sharded(state, da, dl, dt, dr, *cmvn)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_transformer_listener_sharded_matches_unsharded(self, mesh8):
        """The transformer listener (ls960_transformer recipe arch) under
        the GSPMD mesh: einsum attention + conv stem + LN must partition
        over the data axis and match the single-device step."""
        import dataclasses as dc

        cfg = CFG.replace(model=dc.replace(
            CFG.model, encoder_arch="transformer", enc_heads=2,
            enc_ff_dim=32, enc_blocks=2, conv_subsample=2, conv_channels=4,
        ))
        state_a = TS.init_train_state(cfg, jax.random.PRNGKey(3))
        state_b = jax.tree.map(jnp.copy, state_a)
        audio, alens, tokens, real, cmvn = make_batch(3)

        plain = TS.make_train_step(cfg)
        sharded = TS.make_train_step(cfg, mesh=mesh8)

        sa, m_a = plain(state_a, audio, alens, tokens, real, *cmvn)
        da, dl, dt, dr = MESH.shard_batch_arrays(
            mesh8, cfg.parallel, audio, alens, tokens, real
        )
        sb, m_b = sharded(state_b, da, dl, dt, dr, *cmvn)
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
        )
        # wider atol than the blstm arm: LN/softmax fp32 reduction-order
        # noise across 8 shards passes through Adam's rsqrt(v)
        # normalization, which amplifies near-zero first-step grads
        for a, b in zip(
            jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
            )


    def test_transformer_speller_sharded_matches_unsharded(self, mesh8):
        """The transformer speller (ls960_aed recipe arch) under the GSPMD
        mesh: the one-parallel-pass causal decoder must partition over the
        data axis and match the single-device step."""
        import dataclasses as dc

        cfg = CFG.replace(model=dc.replace(
            CFG.model, decoder_arch="transformer", dec_hidden=16,
            dec_blocks=2, dec_heads=2, dec_ff_dim=32, dec_max_len=32,
            tie_embedding=True,
        ))
        state_a = TS.init_train_state(cfg, jax.random.PRNGKey(4))
        state_b = jax.tree.map(jnp.copy, state_a)
        audio, alens, tokens, real, cmvn = make_batch(4)

        plain = TS.make_train_step(cfg)
        sharded = TS.make_train_step(cfg, mesh=mesh8)

        sa, m_a = plain(state_a, audio, alens, tokens, real, *cmvn)
        da, dl, dt, dr = MESH.shard_batch_arrays(
            mesh8, cfg.parallel, audio, alens, tokens, real
        )
        sb, m_b = sharded(state_b, da, dl, dt, dr, *cmvn)
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
            )


class TestMeshDecode:
    def test_eval_decode_sharded_matches_single_device(self, tmp_path):
        """Validation/test decode jitted with data-axis shardings (C5)
        produces the same hypotheses as the single-device path."""
        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.solver import Solver

        cfg = load_config("configs/synthetic_smoke.yaml", [
            "data.num_synthetic_utts=16", "train.batch_size=8",
        ])
        s_mesh = Solver(cfg, tmp_path / "m", use_mesh=True)
        s_one = Solver(cfg, tmp_path / "s", use_mesh=False)
        assert s_mesh.mesh is not None
        r_mesh, rec_mesh, _ = s_mesh._score_batches(
            s_mesh.bundle.dev, s_mesh.state.params, "greedy")
        r_one, rec_one, _ = s_one._score_batches(
            s_one.bundle.dev, s_one.state.params, "greedy")
        assert [r["hyp"] for r in rec_mesh] == [r["hyp"] for r in rec_one]
        assert r_mesh == r_one


class TestBatchFramesOnMesh:
    def test_constant_frames_batching_trains_on_mesh(self, tmp_path):
        """data.batch_frames under the 8-device GSPMD mesh: per-bucket
        batch sizes are granule-aligned to the data axis, the sharded
        step compiles per bucket, and training advances with finite
        loss."""
        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.solver import Solver

        cfg = load_config("configs/synthetic_smoke.yaml", [
            "data.num_synthetic_utts=48", "train.batch_size=8",
            "data.batch_frames=4000", "data.drop_remainder=false",
            "train.total_steps=4", "train.eval_every=4",
            "train.ckpt_every=4", "train.log_every=2",
        ])
        s = Solver(cfg, tmp_path / "bf", use_mesh=True)
        assert s.mesh is not None
        sizer = s._train_batch_size()
        assert callable(sizer)
        sizes = {fb: sizer((fb, 12)) for fb in s.spec.frame_buckets}
        # per-bucket sizes vary and each shards over the 8-row data axis
        assert len(set(sizes.values())) > 1
        assert all(v % 8 == 0 for v in sizes.values())
        out = s.train()
        assert np.isfinite(out["dev_error"])
