"""Transducer family (model.family=transducer): model + decode + driver.

Covers: joint/predictor shapes, gradient wiring, fused-step overfit on
the synthetic corpus, batched-greedy equality with a per-utterance
oracle loop, Solver validate/test through the same driver surfaces the
LAS family uses, and the guards on LAS-only objectives.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.decode.transducer_greedy import (
    transducer_greedy_from_enc,
)
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.models import transducer as TD
from semi_supervised_asr_tpu.training import train_step as TS

# full-suite only: multi-minute fused-step / jit-heavy integration
# suites (quick keeps the oracle-parity cores; pytest.ini)

MCFG = ModelConfig(
    n_mels=80, vocab_size=20, family="transducer",
    enc_hidden=32, enc_base_layers=1, enc_layers=2,
    pred_hidden=32, pred_layers=1, joint_dim=32, embed_dim=16,
    attn_dim=8, attn_conv_channels=2, attn_conv_width=5,
    dec_hidden=8, compute_dtype="float32",
)
FCFG = FrontendConfig(spec_augment=False, cmvn="global")


def _cfg(model=MCFG, **train_kw):
    return Config(frontend=FCFG, model=model, objective=ObjectiveConfig(),
                  train=TrainConfig(**train_kw))


def _toy_batch(cfg, rng, b=4, f=24, u=6):
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


class TestModel:
    def test_shapes(self):
        cfg = MCFG
        params = M.init_model(jax.random.PRNGKey(0), cfg)
        assert set(params) == {"listener", "predictor", "joint"}
        b, t, u = 2, 8, 5
        enc = jnp.zeros((b, t, cfg.enc_out_dim))
        labels = jnp.zeros((b, u), jnp.int32)
        pred = TD.predictor_train(params["predictor"], labels, cfg)
        assert pred.shape == (b, u + 1, cfg.pred_hidden)
        logits = TD.joint_logits(params["joint"], enc, pred, cfg)
        assert logits.shape == (b, t, u + 1, cfg.vocab_size)

    def test_grads_reach_every_leaf(self):
        cfg = _cfg()
        rng = np.random.default_rng(1)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng, b=2)
        params = M.init_model(jax.random.PRNGKey(5), cfg.model)

        def loss_fn(p):
            from semi_supervised_asr_tpu.objectives.transducer_loss import (
                transducer_loss,
            )

            feats, flens = TS.featurize(
                cfg, jnp.asarray(audio), jnp.asarray(alens),
                (jnp.asarray(cmvn[0]), jnp.asarray(cmvn[1])), None, False,
            )
            enc, enc_mask = TD.encode(p, feats, flens, cfg.model)
            toks = jnp.asarray(tokens)
            label_lens = jnp.sum(toks != 0, axis=1) - 1
            pred = TD.predictor_train(p["predictor"], toks, cfg.model)
            logits = TD.joint_logits(p["joint"], enc, pred, cfg.model)
            return transducer_loss(
                logits, jnp.sum(enc_mask, 1), toks,
                label_lens.astype(jnp.int32),
            )[0]

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for path, g in flat:
            assert float(jnp.abs(g).max()) > 0.0, (
                f"zero gradient at {jax.tree_util.keystr(path)}"
            )


class TestGreedy:
    def _oracle_greedy(self, params, cfg, enc_b, t_len, max_u,
                       max_symbols=4):
        """Per-utterance Python loop — same policy as the batched scan."""
        pred, state = TD.predictor_step(
            params["predictor"], jnp.array([1], jnp.int32),
            TD.predictor_init_state(cfg, 1), cfg,
        )
        out = []
        for t in range(t_len):
            for _ in range(max_symbols):
                logits = TD.joint_row(
                    params["joint"], enc_b[None, t], pred, cfg
                )
                tok = int(jnp.argmax(logits, -1)[0])
                if tok == 0 or len(out) >= max_u:
                    break
                out.append(tok)
                pred, state = TD.predictor_step(
                    params["predictor"], jnp.array([tok], jnp.int32),
                    state, cfg,
                )
        return out

    def test_matches_oracle(self):
        cfg = MCFG
        params = M.init_model(jax.random.PRNGKey(3), cfg)
        rng = np.random.default_rng(0)
        b, t = 5, 9
        enc = jnp.asarray(
            rng.standard_normal((b, t, cfg.enc_out_dim)), jnp.float32
        )
        lens = np.array([9, 7, 5, 9, 1])
        mask = jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]
        max_u = 12
        hyps, scores = jax.jit(
            transducer_greedy_from_enc, static_argnums=(1, 4)
        )(params, cfg, enc, mask, max_u)
        hyps = np.asarray(hyps)
        assert np.isfinite(np.asarray(scores)).all()
        for i in range(b):
            want = self._oracle_greedy(params, cfg, enc[i], int(lens[i]),
                                       max_u)
            got = [int(x) for x in hyps[i] if x != 0]
            assert got == want, (i, got, want)


class TestTraining:
    def test_overfit_through_fused_step(self):
        cfg = _cfg(learning_rate=3e-3)
        rng = np.random.default_rng(0)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng)
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        first = None
        for _ in range(200):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            first = first if first is not None else float(m["loss"])
        assert float(m["loss"]) < first * 0.3, (first, float(m["loss"]))
        assert "nll_per_label" in m

        # greedy decode recovers the training transcripts (sans EOS)
        feats, flens = TS.featurize(
            cfg, jnp.asarray(audio), jnp.asarray(alens),
            (jnp.asarray(cmvn[0]), jnp.asarray(cmvn[1])), None, False,
        )
        enc, enc_mask = TD.encode(state.params, feats, flens, cfg.model)
        hyps, _ = transducer_greedy_from_enc(
            state.params, cfg.model, enc, enc_mask, tokens.shape[1]
        )
        hyps = np.asarray(hyps)
        want = [[int(x) for x in row if x not in (0, 2)] for row in tokens]
        got = [[int(x) for x in row if x != 0] for row in hyps]
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
        # fp32 reduction-order differences in the lattice scan get
        # Adam-amplified; measured max diff ~3e-5 at lr 1e-3
        for a, b_ in zip(jax.tree.leaves(res[1]), jax.tree.leaves(res[2])):
            np.testing.assert_allclose(a, b_, atol=1e-4)

    def test_las_objectives_rejected(self):
        """MWER and the semi terms are transducer-supported now
        (objectives/transducer_{mwer,semi}.py); the remaining LAS-only
        pieces — the CTC aux head and deep/cold LM fusion — must still
        be refused."""
        cfg = _cfg()
        bad = dc.replace(
            cfg, objective=dc.replace(cfg.objective, lambda_ctc=0.5)
        )
        with pytest.raises(AssertionError, match="lambda_ctc"):
            TS.make_train_step(bad)
        bad = dc.replace(
            cfg, model=dc.replace(cfg.model, lm_fusion="deep")
        )
        with pytest.raises(AssertionError, match="no LM fusion"):
            TS.make_train_step(bad)


class TestMesh:
    def test_gspmd_mesh_matches_single_device(self):
        """Transducer step under the 8-virtual-device data mesh equals
        the single-device step (lattice scan + joint grid partition)."""
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
        """Solver drives the transducer end-to-end: train falls, dev
        scores through the alignment-synchronous beam (mode "beam"
        dispatches to decode/transducer_beam.py)."""
        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.solver import Solver

        cfg = load_config("configs/synthetic_smoke.yaml", [
            "model.family=transducer",
            "model.pred_hidden=64", "model.joint_dim=64",
            "model.embed_dim=32",
            "train.total_steps=30", "train.eval_every=15",
            "train.ckpt_every=15", "train.log_every=10",
            "data.num_synthetic_utts=8", "train.batch_size=8",
        ])
        solver = Solver(cfg, str(tmp_path), use_mesh=False)
        solver.train()
        per, records, _ = solver._score_batches(
            solver.bundle.dev, solver.state.params, "beam"
        )
        assert 0.0 <= per <= 1.5
        assert records


@pytest.fixture(scope="module")
def trained_td(tmp_path_factory):
    """Tiny trained transducer Solver for artifact/transcribe parity
    (no quality gate — parity tests only need a deterministic model)."""
    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.training.solver import Solver

    wd = tmp_path_factory.mktemp("td_train")
    cfg = load_config("configs/synthetic_smoke.yaml", [
        "model.family=transducer",
        "model.pred_hidden=64", "model.joint_dim=64", "model.embed_dim=32",
        "data.num_synthetic_utts=8", "train.batch_size=4",
        "train.total_steps=4", "train.eval_every=0", "train.ckpt_every=4",
        "train.log_every=2", "decode.beam_size=3",
    ])
    solver = Solver(cfg, wd, use_mesh=False)
    solver.train()
    return solver, wd


class TestServingSurfaces:
    def test_export_beam_artifact_matches_live(self, trained_td, tmp_path):
        from semi_supervised_asr_tpu import export as EX

        solver, _ = trained_td
        params = dict(solver.state.params)
        params["__cmvn_mean"], params["__cmvn_std"] = solver.cmvn
        frames, batch = 96, 4
        blob = EX.export_decode(solver.cfg, dict(params), batch, frames,
                                mode="beam")
        path = tmp_path / "td_beam.shlo"
        path.write_bytes(blob)

        s = (frames - 1) * solver.cfg.frontend.hop_length
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal((batch, s)) * 0.1).astype(np.float32)
        lens = np.full((batch,), s, np.int32)
        live = EX.build_decode_fn(solver.cfg, dict(params), "beam")
        want_toks, want_scores = jax.jit(live)(audio, lens)
        got_toks, got_scores = EX.run_artifact(path, audio, lens)
        np.testing.assert_array_equal(np.asarray(got_toks),
                                      np.asarray(want_toks))
        np.testing.assert_allclose(np.asarray(got_scores),
                                   np.asarray(want_scores), rtol=1e-5)

    def test_transcribe_beam_and_nbest(self, trained_td, tmp_path):
        from semi_supervised_asr_tpu.transcribe import transcribe
        from tests.test_transcribe import write_utt_wavs

        solver, _ = trained_td
        paths, _ = write_utt_wavs(solver, tmp_path, n=3)
        results = transcribe(solver, paths, "beam", nbest=3)
        assert len(results) == 3
        for r in results:
            assert "nbest" in r and len(r["nbest"]) == 3
            sc = [c["score"] for c in r["nbest"]]
            assert sc == sorted(sc, reverse=True)
            assert r["text"] == r["nbest"][0]["text"]

    def test_transcribe_rejects_ctc_mode(self, trained_td):
        from semi_supervised_asr_tpu.transcribe import transcribe

        solver, _ = trained_td
        with pytest.raises(SystemExit, match="LAS-only"):
            transcribe(solver, [], "ctc")


class TestEmissionTimestamps:
    """track_frames: emission-frame tracking in the greedy scan
    (transcribe --timestamps) must not perturb the decode."""

    def _decode_inputs(self, seed=0, b=3, t=12):
        cfg = MCFG
        params = M.init_model(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        enc = jnp.asarray(
            rng.standard_normal((b, t, cfg.enc_out_dim)).astype(np.float32)
        )
        lens = np.array([t, t - 4, 1][:b], np.int32)
        mask = jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]
        return params, cfg, enc, mask, lens

    def test_tracked_decode_bitwise_equals_untracked(self):
        params, cfg, enc, mask, _ = self._decode_inputs()
        toks, score = jax.jit(
            lambda p, e, m: transducer_greedy_from_enc(
                p, cfg, e, m, 8, max_symbols=2)
        )(params, enc, mask)
        toks2, score2, frames = jax.jit(
            lambda p, e, m: transducer_greedy_from_enc(
                p, cfg, e, m, 8, max_symbols=2, track_frames=True)
        )(params, enc, mask)
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
        np.testing.assert_array_equal(np.asarray(score), np.asarray(score2))
        assert frames.shape == toks.shape

    def test_frames_monotonic_and_in_range(self):
        params, cfg, enc, mask, lens = self._decode_inputs(seed=3)
        toks, _, frames = transducer_greedy_from_enc(
            params, cfg, enc, mask, 8, max_symbols=2, track_frames=True)
        toks, frames = np.asarray(toks), np.asarray(frames)
        from semi_supervised_asr_tpu.utils.metrics import hyp_lengths

        n = hyp_lengths(toks)
        for r in range(toks.shape[0]):
            f = frames[r, : n[r]]
            assert np.all(f >= 0) and np.all(f < lens[r])
            assert np.all(np.diff(f) >= 0)       # multi-emit frames tie
            assert np.all(frames[r, n[r]:] == -1)

    def test_track_frames_demands_six_tuple_carry(self):
        """Streaming track_frames IS supported (commit 1798ad7) via the
        6-tuple carry from transducer_greedy_init(track_frames=True); a
        legacy 5-tuple carry must be rejected, not silently mis-unpacked."""
        params, cfg, enc, mask, _ = self._decode_inputs()
        from semi_supervised_asr_tpu.decode.transducer_greedy import (
            transducer_greedy_init,
        )

        carry5 = transducer_greedy_init(params, cfg, 3, 8)
        with pytest.raises(AssertionError, match="6-tuple"):
            transducer_greedy_from_enc(
                params, cfg, enc, mask, 8, carry=carry5, track_frames=True)
        # and the 6-tuple carry streams: same decode, tracked.
        carry6 = transducer_greedy_init(params, cfg, 3, 8, track_frames=True)
        toks, _, carry_out = transducer_greedy_from_enc(
            params, cfg, enc, mask, 8, carry=carry6, track_frames=True,
            return_carry=True)
        assert len(carry_out) == 6
        assert np.asarray(carry_out[5]).shape == np.asarray(toks).shape

    def test_transcribe_timestamps_greedy_only(self, trained_td, tmp_path):
        from semi_supervised_asr_tpu.transcribe import transcribe
        from tests.test_transcribe import write_utt_wavs

        solver, _ = trained_td
        paths, _ = write_utt_wavs(solver, tmp_path, n=2)
        with pytest.raises(SystemExit, match="greedy"):
            transcribe(solver, paths, "beam", timestamps=True)
        results = transcribe(solver, paths, "greedy", timestamps=True)
        spf = (solver.cfg.frontend.hop_length
               * solver.cfg.model.time_reduction
               / solver.cfg.frontend.sample_rate)
        for r in results:
            assert "tokens" in r
            assert len(r["tokens"]) == len(r["text"].split())
            prev = -1.0
            for t in r["tokens"]:
                assert set(t) == {"t", "start_s", "end_s"}
                assert t["end_s"] == round(t["start_s"] + spf, 3)
                assert t["start_s"] >= prev    # emission times tie-able
                prev = t["start_s"]

    def test_align_fn_rejected_for_transducer(self, trained_td):
        solver, _ = trained_td
        with pytest.raises(ValueError, match="greedy decode"):
            solver._align_fn()
