"""Tensor parallelism over the `model` mesh axis (parallel/tp.py).

On the 8-virtual-CPU-device mesh (conftest), a 4x2 (data x model) layout
must produce the SAME training trajectory as the unsharded single-device
step: vocab-adjacent params (embedding rows, output-projection columns,
CTC head) live sharded over `model`, GSPMD inserts the gathers, and the
numbers don't move beyond float associativity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, ParallelConfig,
    TrainConfig,
)
from semi_supervised_asr_tpu.parallel import mesh as MESH, tp
from semi_supervised_asr_tpu.training import train_step as TS

CFG = Config(
    frontend=FrontendConfig(spec_augment=False, cmvn="global"),
    model=ModelConfig(
        n_mels=80, vocab_size=16, enc_hidden=8, enc_layers=2,
        enc_base_layers=1, attn_dim=8, attn_conv_channels=4,
        attn_conv_width=5, dec_hidden=8, dec_layers=1, embed_dim=8,
        compute_dtype="float32", ctc_head=True,
    ),
    objective=ObjectiveConfig(
        tf_rate_start=1.0, tf_rate_end=1.0, lambda_ctc=0.2,
    ),
    train=TrainConfig(learning_rate=1e-3),
    parallel=ParallelConfig(model_parallel=2, donate_state=False),
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
def mesh42():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return MESH.make_mesh(CFG.parallel)


class TestSpecs:
    def test_vocab_adjacent_params_sharded(self):
        state = TS.init_train_state(CFG, jax.random.PRNGKey(0))
        specs = tp.state_partition_specs(state, CFG.parallel, axis_size=2)
        p = specs.params
        assert p["speller"]["embedding"] == P("model", None)
        assert p["speller"]["w_out"] == P(None, "model")
        assert p["speller"]["b_out"] == P("model")
        assert p["ctc"]["w"] == P(None, "model")
        assert p["ctc"]["b"] == P("model")
        # recurrent weights replicated (deliberate — see tp.py docstring)
        lstm = p["listener"]["layers"][0]["fwd"]
        assert lstm["w_ih"] == P() and lstm["w_hh"] == P()
        # optimizer mirrors the params: adam mu for w_out is sharded too
        flat = jax.tree_util.tree_flatten_with_path(specs.opt_state)[0]
        hits = [
            s for path, s in flat
            if "w_out" in jax.tree_util.keystr(path)
        ]
        assert hits and all(s == P(None, "model") for s in hits)
        assert specs.step == P() and specs.rng == P()

    def test_indivisible_dims_fall_back_to_replication(self):
        import dataclasses
        cfg = CFG.replace(
            model=dataclasses.replace(CFG.model, vocab_size=65)
        )
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        specs = tp.state_partition_specs(state, cfg.parallel, axis_size=2)
        # 65 % 2 != 0: vocab-dim leaves replicate instead of erroring
        assert specs.params["speller"]["embedding"] == P()
        assert specs.params["speller"]["w_out"] == P()
        assert specs.params["speller"]["b_out"] == P()

    def test_state_placement(self, mesh42):
        state = TS.init_train_state(CFG, jax.random.PRNGKey(0))
        state = tp.shard_state(mesh42, CFG.parallel, state)
        assert state.params["speller"]["w_out"].sharding.spec == P(
            None, "model"
        )
        # a sharded leaf's per-device shard is half the columns
        shard = state.params["speller"]["w_out"].addressable_shards[0]
        assert shard.data.shape[1] == CFG.model.vocab_size // 2


class TestTrajectoryEquality:
    def test_tp_matches_single_device(self, mesh42):
        audio, alens, tokens, real, cmvn = make_batch()

        # single-device reference
        ref_state = TS.init_train_state(CFG, jax.random.PRNGKey(0))
        ref_step = TS.make_train_step(CFG)
        # TP run, same init
        tp_state = tp.shard_state(
            mesh42, CFG.parallel,
            TS.init_train_state(CFG, jax.random.PRNGKey(0)),
        )
        tp_step = TS.make_train_step(CFG, mesh=mesh42)

        for i in range(3):
            a, al, t, r, _ = make_batch(seed=i)
            ref_state, ref_m = ref_step(ref_state, a, al, t, r, *cmvn)
            sh = MESH.shard_batch_arrays(mesh42, CFG.parallel, a, al, t, r)
            tp_state, tp_m = tp_step(tp_state, *sh, *cmvn)
            np.testing.assert_allclose(
                float(tp_m["loss"]), float(ref_m["loss"]),
                rtol=2e-4, atol=1e-6,
            )

        ref_leaves = jax.tree_util.tree_flatten_with_path(ref_state.params)[0]
        tp_leaves = jax.tree_util.tree_flatten_with_path(tp_state.params)[0]
        for (pr, lr), (pt, lt) in zip(ref_leaves, tp_leaves):
            assert pr == pt
            np.testing.assert_allclose(
                np.asarray(lt), np.asarray(lr), rtol=5e-4, atol=2e-5,
                err_msg=jax.tree_util.keystr(pr),
            )
        # and the updated state keeps the TP layout (no silent gather)
        assert tp_state.params["speller"]["w_out"].sharding.spec == P(
            None, "model"
        )

    def test_semi_supervised_tp_step_runs(self, mesh42):
        import dataclasses
        cfg = CFG.replace(
            objective=dataclasses.replace(
                CFG.objective, lambda_text_ae=0.3, lambda_pseudo=0.3,
                use_ema_teacher=True,
            )
        )
        state = tp.shard_state(
            mesh42, cfg.parallel,
            TS.init_train_state(cfg, jax.random.PRNGKey(0)),
        )
        step = TS.make_train_step(cfg, semi_supervised=True, mesh=mesh42)
        audio, alens, tokens, real, cmvn = make_batch()
        ua, ual, _, ureal, _ = make_batch(seed=7)
        sh = MESH.shard_batch_arrays(
            mesh42, cfg.parallel, audio, alens, tokens, real,
            ua, ual, ureal, tokens.copy(), real.copy(),
        )
        state, metrics = step(state, *sh, *cmvn)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1


class TestSolverEndToEnd:
    def test_solver_trains_validates_resumes_under_tp(self, tmp_path):
        """The real driver on a 4x2 (data x model) mesh: train steps with
        TP-sharded state, mesh-sharded eval decode on TP params, orbax
        save, and a resume into the TP layout."""
        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.solver import Solver

        overrides = [
            "data.unit=char",              # vocab 32: divisible by mp=2
            "data.num_synthetic_utts=16",
            "parallel.model_parallel=2",
            "train.batch_size=8",
            "train.total_steps=4",
            "train.eval_every=0",
            "train.ckpt_every=4",
            "train.log_every=2",
        ]
        cfg = load_config("configs/synthetic_smoke.yaml", overrides)
        wd = tmp_path / "tp_run"
        solver = Solver(cfg, wd, use_mesh=True)
        assert solver.mesh.devices.shape == (4, 2)
        assert solver.state.params["speller"]["w_out"].sharding.spec == P(
            None, "model"
        )
        solver.train()
        assert int(solver.state.step) == 4
        # updated params keep the TP layout
        assert solver.state.params["speller"]["w_out"].sharding.spec == P(
            None, "model"
        )
        ev = solver.validate()   # sharded eval decode on TP params
        assert 0.0 <= ev["dev_error"] <= 1.5

        # resume restores INTO the TP layout
        solver2 = Solver(cfg, wd, use_mesh=True)
        solver2.train(resume=True)
        assert int(solver2.state.step) == 4
        assert solver2.state.params["speller"]["w_out"].sharding.spec == P(
            None, "model"
        )
        a = np.asarray(solver.state.params["speller"]["w_out"])
        b = np.asarray(solver2.state.params["speller"]["w_out"])
        np.testing.assert_array_equal(a, b)


class TestGuards:
    def test_pallas_backend_rejected(self, mesh42):
        import dataclasses
        cfg = CFG.replace(
            model=dataclasses.replace(CFG.model, lstm_backend="pallas")
        )
        with pytest.raises(AssertionError, match="lstm_backend"):
            TS.make_train_step(cfg, mesh=mesh42)


class TestTransducerTP:
    """TP for the transducer family: predictor/embed rows + joint
    w_out/b_out vocab columns shard over `model`; the 4x2 layout matches
    the single-device trajectory (train_step no longer asserts)."""

    TCFG = CFG.replace(
        model=dataclasses.replace(
            CFG.model, family="transducer", ctc_head=False,
            pred_hidden=8, pred_layers=1, joint_dim=8, embed_dim=8,
        ),
        objective=ObjectiveConfig(),
    )

    def test_specs(self):
        state = TS.init_train_state(self.TCFG, jax.random.PRNGKey(0))
        specs = tp.state_partition_specs(
            state, self.TCFG.parallel, axis_size=2
        )
        p = specs.params
        assert p["predictor"]["embed"] == P("model", None)
        assert p["joint"]["w_out"] == P(None, "model")
        assert p["joint"]["b_out"] == P("model")
        assert p["joint"]["w_enc"] == P()
        assert p["predictor"]["layers"][0]["w_hh"] == P()

    def test_tp_matches_single_device(self, mesh42):
        audio, alens, tokens, real, cmvn = make_batch()
        ref_state = TS.init_train_state(self.TCFG, jax.random.PRNGKey(0))
        ref_step = TS.make_train_step(self.TCFG)
        tp_state = tp.shard_state(
            mesh42, self.TCFG.parallel,
            TS.init_train_state(self.TCFG, jax.random.PRNGKey(0)),
        )
        tp_step = TS.make_train_step(self.TCFG, mesh=mesh42)
        for i in range(2):
            a, al, t, r, _ = make_batch(seed=i)
            ref_state, ref_m = ref_step(ref_state, a, al, t, r, *cmvn)
            sh = MESH.shard_batch_arrays(
                mesh42, self.TCFG.parallel, a, al, t, r
            )
            tp_state, tp_m = tp_step(tp_state, *sh, *cmvn)
            np.testing.assert_allclose(
                float(tp_m["loss"]), float(ref_m["loss"]),
                rtol=2e-4, atol=1e-6,
            )
        ref_leaves = jax.tree_util.tree_flatten_with_path(
            ref_state.params
        )[0]
        tp_leaves = jax.tree_util.tree_flatten_with_path(
            tp_state.params
        )[0]
        for (pr, lr), (pt, lt) in zip(ref_leaves, tp_leaves):
            assert pr == pt
            np.testing.assert_allclose(
                np.asarray(lt), np.asarray(lr), rtol=5e-4, atol=2e-5,
                err_msg=jax.tree_util.keystr(pr),
            )
        assert tp_state.params["joint"]["w_out"].sharding.spec == P(
            None, "model"
        )


class TestTransformerSpellerTP:
    """TP for the transformer speller: the embedding's [V, D] vocab rows
    and the output projection's [D, V] vocab columns shard over `model`
    via the same name-keyed rules; the 4x2 layout matches the
    single-device trajectory (block weights replicate)."""

    ACFG = CFG.replace(
        model=dataclasses.replace(
            CFG.model, decoder_arch="transformer", ctc_head=False,
            dec_hidden=16, dec_blocks=2, dec_heads=2, dec_ff_dim=32,
            dec_max_len=32,
        ),
        objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
    )

    def test_specs(self):
        state = TS.init_train_state(self.ACFG, jax.random.PRNGKey(0))
        specs = tp.state_partition_specs(
            state, self.ACFG.parallel, axis_size=2
        )
        p = specs.params
        assert p["speller"]["embedding"] == P("model", None)
        assert p["speller"]["w_out"] == P(None, "model")
        assert p["speller"]["b_out"] == P("model")
        assert p["speller"]["blocks"][0]["wo"] == P()
        assert p["speller"]["pos"] == P()

    def test_tp_matches_single_device(self, mesh42):
        audio, alens, tokens, real, cmvn = make_batch()
        ref_state = TS.init_train_state(self.ACFG, jax.random.PRNGKey(0))
        ref_step = TS.make_train_step(self.ACFG)
        tp_state = tp.shard_state(
            mesh42, self.ACFG.parallel,
            TS.init_train_state(self.ACFG, jax.random.PRNGKey(0)),
        )
        tp_step = TS.make_train_step(self.ACFG, mesh=mesh42)
        for i in range(2):
            a, al, t, r, _ = make_batch(seed=i)
            ref_state, ref_m = ref_step(ref_state, a, al, t, r, *cmvn)
            sh = MESH.shard_batch_arrays(
                mesh42, self.ACFG.parallel, a, al, t, r
            )
            tp_state, tp_m = tp_step(tp_state, *sh, *cmvn)
            np.testing.assert_allclose(
                float(tp_m["loss"]), float(ref_m["loss"]),
                rtol=2e-4, atol=1e-6,
            )
        ref_leaves = jax.tree_util.tree_flatten_with_path(
            ref_state.params
        )[0]
        tp_leaves = jax.tree_util.tree_flatten_with_path(
            tp_state.params
        )[0]
        for (pr, lr), (pt, lt) in zip(ref_leaves, tp_leaves):
            assert pr == pt
            np.testing.assert_allclose(
                np.asarray(lt), np.asarray(lr), rtol=5e-4, atol=2e-5,
                err_msg=jax.tree_util.keystr(pr),
            )
        assert tp_state.params["speller"]["w_out"].sharding.spec == P(
            None, "model"
        )


class TestCTCTP:
    """TP for the CTC family: the head's [E2, V] vocab columns shard
    over `model` via the same rules the LAS aux head uses; the 4x2
    layout matches the single-device trajectory."""

    CCFG = CFG.replace(
        model=dataclasses.replace(
            CFG.model, family="ctc", ctc_head=False,
        ),
        objective=ObjectiveConfig(),
    )

    def test_specs(self):
        state = TS.init_train_state(self.CCFG, jax.random.PRNGKey(0))
        specs = tp.state_partition_specs(
            state, self.CCFG.parallel, axis_size=2
        )
        p = specs.params
        assert p["ctc"]["w"] == P(None, "model")
        assert p["ctc"]["b"] == P("model")

    def test_tp_matches_single_device(self, mesh42):
        audio, alens, tokens, real, cmvn = make_batch()
        ref_state = TS.init_train_state(self.CCFG, jax.random.PRNGKey(0))
        ref_step = TS.make_train_step(self.CCFG)
        tp_state = tp.shard_state(
            mesh42, self.CCFG.parallel,
            TS.init_train_state(self.CCFG, jax.random.PRNGKey(0)),
        )
        tp_step = TS.make_train_step(self.CCFG, mesh=mesh42)
        for i in range(2):
            a, al, t, r, _ = make_batch(seed=i)
            ref_state, ref_m = ref_step(ref_state, a, al, t, r, *cmvn)
            sh = MESH.shard_batch_arrays(
                mesh42, self.CCFG.parallel, a, al, t, r
            )
            tp_state, tp_m = tp_step(tp_state, *sh, *cmvn)
            np.testing.assert_allclose(
                float(tp_m["loss"]), float(ref_m["loss"]),
                rtol=2e-4, atol=1e-6,
            )
        ref_leaves = jax.tree_util.tree_flatten_with_path(
            ref_state.params
        )[0]
        tp_leaves = jax.tree_util.tree_flatten_with_path(
            tp_state.params
        )[0]
        for (pr, lr), (pt, lt) in zip(ref_leaves, tp_leaves):
            assert pr == pt
            np.testing.assert_allclose(
                np.asarray(lt), np.asarray(lr), rtol=5e-4, atol=2e-5,
                err_msg=jax.tree_util.keystr(pr),
            )
        assert tp_state.params["ctc"]["w"].sharding.spec == P(
            None, "model"
        )
