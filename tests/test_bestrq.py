"""BEST-RQ self-supervised pretraining (objectives/best_rq.py,
training/pretrain.py).

Covers: exact span dilation vs a numpy oracle, target determinism and
numpy-recomputed parity, the frozen quantizer, masked-positions-only CE
(bitwise), pad invariance of the full loss, gradient flow, 8-virtual-
device GSPMD mesh parity, the pretrain->finetune transfer (listener
subtree restored bitwise into every family), and the subprocess CLI
workflow (pretrain -> main --train with train.init_encoder_from).
"""

import dataclasses
import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import load_config
from semi_supervised_asr_tpu.objectives import best_rq as BRQ

quick = pytest.mark.quick


def _cfg(**model_kw):
    cfg = load_config("configs/synthetic_smoke.yaml", [
        "data.num_synthetic_utts=16",
        "data.frame_buckets=[128]",
        "data.token_buckets=[16]",
        "pretrain.codebook_size=32",
        "pretrain.codebook_dim=8",
        "pretrain.mask_prob=0.08",
        "pretrain.mask_span=4",
    ])
    m = dataclasses.replace(
        cfg.model, n_mels=cfg.frontend.n_mels, vocab_size=16,
        enc_hidden=8, enc_layers=2, enc_base_layers=1, **model_kw,
    )
    return cfg.replace(model=m)


def _feats(rng, cfg, b=4, t=64):
    m = cfg.frontend.n_mels
    lens = np.array([t, t - 9, t // 2, 5], np.int32)[:b]
    feats = rng.standard_normal((b, t, m)).astype(np.float32)
    feats *= (np.arange(t)[None, :, None] < lens[:, None, None])
    return jnp.asarray(feats), jnp.asarray(lens)


def _params(cfg, key=0):
    from semi_supervised_asr_tpu.models.seq2seq import _listener_fns

    k_enc, k_head = jax.random.split(jax.random.PRNGKey(key))
    enc_init, _ = _listener_fns(cfg.model)
    return {
        "listener": enc_init(k_enc, cfg.model, jnp.float32),
        "head": BRQ.init_bestrq_head(k_head, cfg.model, cfg.pretrain),
    }


@quick
class TestPieces:
    def test_dilate_spans_exact(self, rng):
        starts = rng.random((3, 40)) < 0.1
        span = 5
        got = np.asarray(BRQ.dilate_spans(jnp.asarray(starts), span))
        want = np.zeros_like(starts)
        for b in range(starts.shape[0]):
            for t in np.flatnonzero(starts[b]):
                want[b, t:t + span] = True
        np.testing.assert_array_equal(got, want)

    def test_sample_mask_respects_lengths(self):
        cfg = _cfg()
        lens = jnp.asarray([64, 20, 1], jnp.int32)
        mask = BRQ.sample_mask(
            jax.random.PRNGKey(0), 3, 64, lens, cfg.pretrain
        )
        m = np.asarray(mask)
        for b, n in enumerate([64, 20, 1]):
            assert not m[b, n:].any(), f"row {b} masks pad frames"

    def test_sample_mask_guarantees_a_span_per_real_row(self):
        """Even a draw with no Bernoulli starts masks >=1 frame per real
        utterance (forced uniform start); pad-only rows stay empty; and
        mask_prob=0 disables masking outright."""
        pcfg = dataclasses.replace(_cfg().pretrain, mask_prob=0.0001)
        lens = jnp.asarray([64, 20, 1, 0], jnp.int32)
        for seed in range(8):
            m = np.asarray(BRQ.sample_mask(
                jax.random.PRNGKey(seed), 4, 64, lens, pcfg
            ))
            for b, n in enumerate([64, 20, 1]):
                assert m[b, :n].any(), f"row {b} seed {seed} unmasked"
            assert not m[3].any(), "pad-only row masked"

        off = dataclasses.replace(pcfg, mask_prob=0.0)
        m = np.asarray(BRQ.sample_mask(
            jax.random.PRNGKey(0), 4, 64, lens, off
        ))
        assert not m.any()

    def test_targets_match_numpy_and_deterministic(self, rng):
        cfg = _cfg()
        feats, _ = _feats(rng, cfg)
        proj, cb = BRQ.make_quantizer(
            cfg.frontend.n_mels, cfg.model.time_reduction, cfg.pretrain
        )
        r = cfg.model.time_reduction
        lab1 = np.asarray(BRQ.bestrq_targets(feats, proj, cb, r))
        lab2 = np.asarray(BRQ.bestrq_targets(feats, proj, cb, r))
        np.testing.assert_array_equal(lab1, lab2)
        f = np.asarray(feats)
        b, t, m = f.shape
        z = f.reshape(b, t // r, r * m) @ proj
        z /= np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8
        want = np.argmax(z @ cb.T, axis=-1)
        np.testing.assert_array_equal(lab1, want)
        assert lab1.shape == (b, t // r)

    def test_quantizer_frozen_and_normalized(self):
        cfg = _cfg()
        p1, c1 = BRQ.make_quantizer(80, 8, cfg.pretrain)
        p2, c2 = BRQ.make_quantizer(80, 8, cfg.pretrain)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_allclose(
            np.linalg.norm(c1, axis=-1), 1.0, atol=1e-6
        )

    def test_ce_counts_masked_positions_only(self, rng):
        logits = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 32, (2, 10)), jnp.int32)
        pos = jnp.asarray(rng.random((2, 10)) < 0.4)
        loss1, m1 = BRQ.prediction_ce(logits, labels, pos)
        flipped = jnp.where(pos, labels, (labels + 7) % 32)
        loss2, m2 = BRQ.prediction_ce(logits, flipped, pos)
        assert float(loss1) == float(loss2)
        assert float(m1["mask_acc"]) == float(m2["mask_acc"])


@quick
class TestLoss:
    def test_pad_invariance(self, rng):
        """Garbage beyond feat_lens changes neither loss nor gradients —
        targets, masking, and the listener all exclude pad frames."""
        cfg = _cfg()
        feats, lens = _feats(rng, cfg)
        params = _params(cfg)
        proj, cb = BRQ.make_quantizer(
            cfg.frontend.n_mels, cfg.model.time_reduction, cfg.pretrain
        )
        real = jnp.ones((feats.shape[0],), bool)
        key = jax.random.PRNGKey(3)

        def run(f):
            return jax.value_and_grad(
                lambda p: BRQ.bestrq_loss(
                    p, cfg.model, cfg.pretrain, f, lens, real, key,
                    proj, cb,
                )[0]
            )(params)

        l1, g1 = run(feats)
        t = feats.shape[1]
        pad = ~(jnp.arange(t)[None, :, None] < lens[:, None, None])
        corrupted = jnp.where(
            pad, jnp.asarray(rng.standard_normal(feats.shape), jnp.float32),
            feats,
        )
        l2, g2 = run(corrupted)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )

    @pytest.mark.parametrize("arch", ["blstm", "transformer"])
    def test_grads_reach_every_leaf(self, rng, arch):
        kw = ({"encoder_arch": arch, "enc_heads": 2, "enc_ff_dim": 16,
               "enc_blocks": 1, "conv_subsample": 1, "conv_channels": 4}
              if arch == "transformer" else {})
        cfg = _cfg(**kw)
        feats, lens = _feats(rng, cfg)
        params = _params(cfg)
        proj, cb = BRQ.make_quantizer(
            cfg.frontend.n_mels, cfg.model.time_reduction, cfg.pretrain
        )
        real = jnp.ones((feats.shape[0],), bool)
        loss, grads = jax.value_and_grad(
            lambda p: BRQ.bestrq_loss(
                p, cfg.model, cfg.pretrain, feats, lens, real,
                jax.random.PRNGKey(1), proj, cb,
            )[0]
        )(params)
        assert np.isfinite(float(loss))
        flat = jax.tree.leaves(
            jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
        )
        assert all(np.isfinite(v) for v in flat)
        assert sum(v > 0 for v in flat) >= len(flat) - 1, (
            "gradient reaches (almost) every leaf"  # head bias may be
            # tied to softmax shift-invariance only through masked rows
        )

    def test_unreal_rows_contribute_nothing(self, rng):
        cfg = _cfg()
        feats, lens = _feats(rng, cfg)
        params = _params(cfg)
        proj, cb = BRQ.make_quantizer(
            cfg.frontend.n_mels, cfg.model.time_reduction, cfg.pretrain
        )
        key = jax.random.PRNGKey(5)
        real = jnp.asarray([True, True, False, False])

        def loss_of(f):
            return BRQ.bestrq_loss(
                params, cfg.model, cfg.pretrain, f, lens, real, key,
                proj, cb,
            )[0]

        l1 = loss_of(feats)
        other = feats.at[2:].set(
            jnp.asarray(rng.standard_normal(feats[2:].shape), jnp.float32)
        )
        l2 = loss_of(other)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


class TestMesh:
    def test_gspmd_mesh_matches_single_device(self, rng):
        from semi_supervised_asr_tpu.parallel import mesh as MESH

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = _cfg()
        feats, lens = _feats(rng, cfg, b=4)
        feats = jnp.tile(feats, (2, 1, 1))
        lens = jnp.tile(lens, (2,))
        real = jnp.ones((8,), bool)
        params = _params(cfg)
        proj, cb = BRQ.make_quantizer(
            cfg.frontend.n_mels, cfg.model.time_reduction, cfg.pretrain
        )
        key = jax.random.PRNGKey(2)

        def loss(p, f, l, r):
            return BRQ.bestrq_loss(
                p, cfg.model, cfg.pretrain, f, l, r, key, proj, cb
            )[0]

        l1, g1 = jax.value_and_grad(loss)(params, feats, lens, real)
        mesh = MESH.make_mesh(cfg.parallel, jax.devices()[:8])
        repl = MESH.replicated(mesh)
        data = MESH.data_sharded(mesh, cfg.parallel)
        f2, l2_, r2 = MESH.shard_batch_arrays(
            mesh, cfg.parallel, np.asarray(feats), np.asarray(lens),
            np.asarray(real),
        )
        lm, gm = jax.jit(
            jax.value_and_grad(loss),
            in_shardings=(repl, data, data, data),
        )(params, f2, l2_, r2)
        np.testing.assert_allclose(float(l1), float(lm), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gm)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )


class TestResume:
    def test_interrupted_resume_trajectory_bitwise(self, tmp_path):
        """Pretrain 4 steps straight vs 2 steps + resume for 2 more —
        identical listener params (one batch per step + fold_in(step)
        PRNG make the fast-forwarded stream exact)."""
        from semi_supervised_asr_tpu.training.pretrain import train_bestrq

        small = [
            "data.num_synthetic_utts=8", "train.batch_size=4",
            "model.enc_hidden=8", "model.enc_layers=2",
            "model.enc_base_layers=1",
            "data.frame_buckets=[128]", "data.token_buckets=[16]",
            "pretrain.codebook_size=16", "pretrain.codebook_dim=4",
            "pretrain.mask_prob=0.1", "pretrain.mask_span=4",
            "pretrain.log_every=1",
        ]
        cfg4 = load_config("configs/synthetic_smoke.yaml",
                           small + ["pretrain.total_steps=4"])
        train_bestrq(cfg4, tmp_path / "straight", use_mesh=False)

        cfg2 = load_config("configs/synthetic_smoke.yaml",
                           small + ["pretrain.total_steps=2"])
        train_bestrq(cfg2, tmp_path / "resumed", use_mesh=False)
        out = train_bestrq(cfg4, tmp_path / "resumed", use_mesh=False)
        assert np.isfinite(out["loss"])

        import orbax.checkpoint as ocp

        from semi_supervised_asr_tpu.training.pretrain import (
            encoder_ckpt_dir,
        )

        cfg_t = load_config("configs/synthetic_smoke.yaml",
                            small + ["pretrain.total_steps=4"])
        from semi_supervised_asr_tpu.training.pretrain import _init_params

        template, _ = _init_params(cfg_t, 16)
        with ocp.StandardCheckpointer() as ckpt:
            a = ckpt.restore(
                encoder_ckpt_dir(tmp_path / "straight"),
                target=jax.tree.map(np.asarray, template["listener"]),
            )
            b = ckpt.restore(
                encoder_ckpt_dir(tmp_path / "resumed"),
                target=jax.tree.map(np.asarray, template["listener"]),
            )
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_ckpt_every_writes_resume_state(self, tmp_path):
        from semi_supervised_asr_tpu.training.pretrain import train_bestrq

        cfg = load_config("configs/synthetic_smoke.yaml", [
            "data.num_synthetic_utts=8", "train.batch_size=4",
            "model.enc_hidden=8", "model.enc_layers=2",
            "model.enc_base_layers=1",
            "data.frame_buckets=[128]", "data.token_buckets=[16]",
            "pretrain.codebook_size=16", "pretrain.codebook_dim=4",
            "pretrain.total_steps=3", "pretrain.ckpt_every=2",
            "pretrain.log_every=1",
        ])
        train_bestrq(cfg, tmp_path, use_mesh=False)
        assert (tmp_path / "train_ckpt").exists()


class TestTransfer:
    @pytest.mark.parametrize("family", ["las", "transducer", "ctc"])
    def test_listener_restored_bitwise_into_family(self, tmp_path, family):
        from semi_supervised_asr_tpu.training.pretrain import train_bestrq
        from semi_supervised_asr_tpu.training.solver import Solver

        small = [
            "data.num_synthetic_utts=8", "train.batch_size=4",
            "model.enc_hidden=8", "model.enc_layers=2",
            "model.enc_base_layers=1",
            "data.frame_buckets=[128]", "data.token_buckets=[16]",
            "pretrain.codebook_size=16", "pretrain.codebook_dim=4",
            "pretrain.total_steps=2", "pretrain.log_every=1",
        ]
        cfg = load_config("configs/synthetic_smoke.yaml", small)
        out = train_bestrq(cfg, tmp_path / "brq", use_mesh=False)
        assert np.isfinite(out["loss"])

        fam_over = {"las": [], "transducer": [
            "model.family=transducer", "model.pred_hidden=8",
            "model.joint_dim=8",
        ], "ctc": ["model.family=ctc"]}[family]
        ft_cfg = load_config("configs/synthetic_smoke.yaml", small + [
            f"train.init_encoder_from={tmp_path / 'brq'}",
            "train.total_steps=1", "train.eval_every=0",
            "train.ckpt_every=1", "train.log_every=1", *fam_over,
        ])
        solver = Solver(ft_cfg, tmp_path / f"ft_{family}", use_mesh=False)
        import orbax.checkpoint as ocp

        from semi_supervised_asr_tpu.training.pretrain import (
            encoder_ckpt_dir,
        )

        with ocp.StandardCheckpointer() as ckpt:
            saved = ckpt.restore(
                encoder_ckpt_dir(tmp_path / "brq"),
                target=jax.tree.map(
                    np.asarray, solver.state.params["listener"]
                ),
            )
        for a, b in zip(jax.tree.leaves(solver.state.params["listener"]),
                        jax.tree.leaves(saved)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dim_mismatch_rejected(self, tmp_path):
        from semi_supervised_asr_tpu.training.pretrain import train_bestrq
        from semi_supervised_asr_tpu.training.solver import Solver

        small = [
            "data.num_synthetic_utts=8", "train.batch_size=4",
            "model.enc_hidden=8", "model.enc_layers=2",
            "model.enc_base_layers=1",
            "data.frame_buckets=[128]", "data.token_buckets=[16]",
            "pretrain.codebook_size=16", "pretrain.codebook_dim=4",
            "pretrain.total_steps=1", "pretrain.log_every=1",
        ]
        cfg = load_config("configs/synthetic_smoke.yaml", small)
        train_bestrq(cfg, tmp_path / "brq", use_mesh=False)
        bad = load_config("configs/synthetic_smoke.yaml", small + [
            f"train.init_encoder_from={tmp_path / 'brq'}",
            "model.enc_base_layers=2",   # different leaf count
            "train.total_steps=1",
        ])
        with pytest.raises(AssertionError, match="leaves"):
            Solver(bad, tmp_path / "ft", use_mesh=False)


class TestCLI:
    def test_pretrain_then_finetune_workflow(self, tmp_path):
        """The documented two-stage workflow through the public CLIs."""
        # batch 8: the subprocess inherits the suite's 8-virtual-device
        # XLA_FLAGS, and both drivers auto-mesh whenever >1 device is
        # visible — so this also exercises the mesh'd pretrain step
        env_overrides = [
            "data.num_synthetic_utts=16", "train.batch_size=8",
            "model.enc_hidden=8", "model.enc_layers=2",
            "model.enc_base_layers=1",
            "data.frame_buckets=[128]", "data.token_buckets=[16]",
        ]
        repo = Path(__file__).resolve().parent.parent
        r1 = subprocess.run(
            [sys.executable, "-m",
             "semi_supervised_asr_tpu.training.pretrain",
             "--config", "configs/synthetic_smoke.yaml",
             "--workdir", str(tmp_path / "brq"), "--platform", "cpu",
             *env_overrides,
             "pretrain.total_steps=2", "pretrain.log_every=1",
             "pretrain.codebook_size=16", "pretrain.codebook_dim=4"],
            capture_output=True, text=True, cwd=repo, timeout=600,
        )
        assert r1.returncode == 0, r1.stderr[-3000:]
        result = json.loads(r1.stdout.strip().splitlines()[-1])
        assert np.isfinite(result["loss"])
        meta = json.loads((tmp_path / "brq" / "meta.json").read_text())
        assert meta["encoder_arch"] == "blstm"

        # stage 2 pins ONE device: what it tests is the encoder restore
        # (mesh'd training is test_parallel's job), and compiling the
        # full fused train step over the inherited 8-virtual-device mesh
        # blows the subprocess budget on a 1-core host
        env2 = dict(
            os.environ,
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        r2 = subprocess.run(
            [sys.executable, "-m", "semi_supervised_asr_tpu.main",
             "--config", "configs/synthetic_smoke.yaml", "--train",
             "--workdir", str(tmp_path / "ft"), "--platform", "cpu",
             *env_overrides,
             f"train.init_encoder_from={tmp_path / 'brq'}",
             "train.total_steps=2", "train.eval_every=0",
             "train.ckpt_every=2", "train.log_every=1"],
            capture_output=True, text=True, cwd=repo, timeout=1080,
            env=env2,
        )
        assert r2.returncode == 0, r2.stderr[-3000:]
