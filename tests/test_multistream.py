"""Batched multi-stream streaming (decode/streaming.MultiStreamTranscriber).

The contract: ``n_streams`` concurrent utterances stepped by ONE jit
chunk call per pump round decode token- and score-identically to a
batch-1 ``StreamingTranscriber`` fed the same audio (which is itself
proven equal to the offline decode in test_streaming_decode.py) — under
interleaved uneven feeds, staggered open/finalize lifecycles, slot
reuse, and with padded-inactive rows asserted bitwise isolated.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.decode.streaming import (
    MultiStreamTranscriber, StreamingTranscriber,
)
from semi_supervised_asr_tpu.models import seq2seq as M

# full-suite only: multi-minute jit-heavy tests

FCFG = FrontendConfig(center=False, cmvn="global", spec_augment=False)
TDCFG = ModelConfig(
    n_mels=80, vocab_size=16, family="transducer",
    enc_hidden=16, enc_layers=2, enc_base_layers=1,
    enc_bidirectional=False, conv_subsample=0,
    pred_hidden=16, pred_layers=1, joint_dim=16, embed_dim=8,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=8, compute_dtype="float32",
)
CTCCFG = dc.replace(TDCFG, family="ctc")
CMVN = (np.zeros(80, np.float32), np.ones(80, np.float32))
MAX_U = 12


def _cfg(m):
    return Config(frontend=FCFG, model=m, objective=ObjectiveConfig(),
                  train=TrainConfig())


def _utts(n, seed=0, base_frames=30):
    """n random utterances of assorted lengths (full chunks + partial
    remainders of different sizes)."""
    rng = np.random.default_rng(seed)
    hop, n_fft = FCFG.hop_length, FCFG.n_fft
    return [
        (rng.standard_normal(
            (base_frames + 7 * i) * hop + n_fft + 13 * i
        ) * 0.5).astype(np.float32)
        for i in range(n)
    ]


def _single(params, cfg, audio, piece, **kw):
    st = StreamingTranscriber(params, cfg, CMVN, MAX_U, **kw)
    for s in range(0, len(audio), piece):
        st.feed(audio[s: s + piece])
    return st.finalize()


class TestParity:
    @pytest.mark.parametrize("mcfg,beam", [
        (CTCCFG, 1), (CTCCFG, 3), (TDCFG, 1), (TDCFG, 3),
    ])
    def test_interleaved_streams_match_single(self, mcfg, beam):
        """3 concurrent streams, round-robin uneven feeds, one shared
        carry pytree — each equals its own batch-1 transcriber."""
        cfg = _cfg(mcfg)
        params = M.init_model(jax.random.PRNGKey(0), mcfg)
        utts = _utts(3, seed=beam)
        want = [_single(params, cfg, a, 999, beam_size=beam)
                for a in utts]

        ms = MultiStreamTranscriber(params, cfg, CMVN, MAX_U, 3,
                                    beam_size=beam)
        sids = [ms.open() for _ in range(3)]
        # interleave feeds in different piece sizes per stream
        cursors = [0, 0, 0]
        pieces = [700, 1111, 433]
        while any(c < len(a) for c, a in zip(cursors, utts)):
            for i, (sid, a) in enumerate(zip(sids, utts)):
                if cursors[i] < len(a):
                    ms.feed(sid, a[cursors[i]: cursors[i] + pieces[i]])
                    cursors[i] += pieces[i]
            ms.pump()
        got = [ms.finalize(sid) for sid in sids]
        for (wt, ws), (gt, gs) in zip(want, got):
            assert gt == wt
            assert gs == pytest.approx(ws, abs=1e-4)

    def test_staggered_lifecycle_and_slot_reuse(self):
        """Open B after A has consumed chunks; finalize A while B
        continues; reuse A's slot for C — all three match batch-1."""
        cfg = _cfg(CTCCFG)
        params = M.init_model(jax.random.PRNGKey(1), CTCCFG)
        a, b, c = _utts(3, seed=7)
        want = [_single(params, cfg, x, 999) for x in (a, b, c)]

        ms = MultiStreamTranscriber(params, cfg, CMVN, MAX_U, 2)
        sa = ms.open()
        ms.feed(sa, a[: len(a) // 2])
        ms.pump()                      # A advances alone
        sb = ms.open()                 # B starts mid-A (staggered pos)
        ms.feed(sb, b[: len(b) // 3])
        ms.feed(sa, a[len(a) // 2:])
        ms.pump()
        got_a = ms.finalize(sa)        # A ends while B is live
        sc = ms.open()                 # C reuses A's slot
        assert sc == sa
        ms.feed(sc, c)
        ms.feed(sb, b[len(b) // 3:])
        ms.pump()
        got_b, got_c = ms.finalize(sb), ms.finalize(sc)
        for (wt, ws), (gt, gs) in zip(want, (got_a, got_b, got_c)):
            assert gt == wt
            assert gs == pytest.approx(ws, abs=1e-4)

    def test_conformer_streams_at_different_positions(self):
        """Chunk-causal conformer slots at DIFFERENT absolute frames in
        one batch (per-row RoPE position + cache-valid masks)."""
        mcfg = dc.replace(
            TDCFG, encoder_arch="conformer", enc_attn_chunk=4,
            enc_attn_left_chunks=2, enc_blocks=2, enc_heads=4,
            enc_ff_dim=32, conformer_conv_width=5,
            conv_subsample=0, enc_bidirectional=True,
        )
        cfg = _cfg(mcfg)
        params = M.init_model(jax.random.PRNGKey(2), mcfg)
        a, b = _utts(2, seed=3, base_frames=40)
        want = [_single(params, cfg, x, 999) for x in (a, b)]

        ms = MultiStreamTranscriber(params, cfg, CMVN, MAX_U, 2)
        sa = ms.open()
        ms.feed(sa, a[: 2 * ms.chunk_frames * FCFG.hop_length])
        ms.pump()                      # A is 2 chunks in ...
        sb = ms.open()                 # ... when B opens at pos 0
        ms.feed(sa, a[2 * ms.chunk_frames * FCFG.hop_length:])
        ms.feed(sb, b)
        ms.pump()
        got = [ms.finalize(sa), ms.finalize(sb)]
        for (wt, ws), (gt, gs) in zip(want, got):
            assert gt == wt
            assert gs == pytest.approx(ws, abs=1e-4)


class TestIsolation:
    def test_inactive_rows_bitwise_untouched(self):
        """A pump that advances only stream A leaves B's carry rows
        BITWISE identical (the padded-inactive where-mask contract)."""
        cfg = _cfg(CTCCFG)
        params = M.init_model(jax.random.PRNGKey(3), CTCCFG)
        a, b = _utts(2, seed=5)
        ms = MultiStreamTranscriber(params, cfg, CMVN, MAX_U, 2)
        sa, sb = ms.open(), ms.open()
        ms.feed(sb, b)
        ms.pump()
        before = jax.tree.leaves(ms._state)
        ms.feed(sa, a)                 # only A has fresh audio
        ms.pump()
        after = jax.tree.leaves(ms._state)
        for x, y in zip(before, after):
            np.testing.assert_array_equal(
                np.asarray(x)[1], np.asarray(y)[1]
            )

    @pytest.mark.parametrize("mcfg,layers", [(CTCCFG, 2), (TDCFG, 1)])
    def test_beam_lm_fusion_multistream(self, mcfg, layers):
        """LM-fusion state rows live at DIM 1 of the beam carry
        ([L, S*K, H] LSTM h/c — models/lm.py), so the slot merge must
        mask each leaf along its OWN stream axis; a leading-axis-only
        merge either shape-errors or silently mixes streams' LM state
        (found by review — this pins the fix).  layers==n_streams is
        the adversarial coincidence the old merge could mask wrong."""
        from semi_supervised_asr_tpu.models import lm as LMM

        cfg = _cfg(mcfg)
        params = M.init_model(jax.random.PRNGKey(6), mcfg)
        lm_params = LMM.init_lm(
            jax.random.PRNGKey(7), mcfg.vocab_size, embed_dim=8,
            hidden=8, layers=layers,
        )
        kw = dict(beam_size=3, lm_params=lm_params,
                  lm_step_fn=LMM.lm_step, lm_weight=0.4)
        utts = _utts(2, seed=11)
        want = [_single(params, cfg, a, 999, **kw) for a in utts]
        ms = MultiStreamTranscriber(params, cfg, CMVN, MAX_U, 2, **kw)
        sa, sb = ms.open(), ms.open()
        ms.feed(sa, utts[0][: len(utts[0]) // 2])
        ms.pump()                      # A ahead of B: staggered LM rows
        ms.feed(sb, utts[1])
        ms.feed(sa, utts[0][len(utts[0]) // 2:])
        ms.pump()
        got = [ms.finalize(sa), ms.finalize(sb)]
        for (wt, ws), (gt, gs) in zip(want, got):
            assert gt == wt
            assert gs == pytest.approx(ws, abs=1e-4)

    def test_biased_greedy_multistream(self):
        """The bias automaton slots ride the multi-stream carries."""
        from semi_supervised_asr_tpu.decode.biasing import (
            build_bias_trie,
        )
        cfg = _cfg(CTCCFG)
        params = M.init_model(jax.random.PRNGKey(4), CTCCFG)
        a, b = _utts(2, seed=9)
        trie = build_bias_trie([(3, 5), (5, 7, 4)], CTCCFG.vocab_size,
                               4.0)
        want = [_single(params, cfg, x, 999, bias=trie)
                for x in (a, b)]
        ms = MultiStreamTranscriber(params, cfg, CMVN, MAX_U, 2,
                                    bias=trie)
        sa, sb = ms.open(), ms.open()
        ms.feed(sa, a)
        ms.feed(sb, b)
        ms.pump()
        got = [ms.finalize(sa), ms.finalize(sb)]
        for (wt, ws), (gt, gs) in zip(want, got):
            assert gt == wt
            assert gs == pytest.approx(ws, abs=1e-4)


class TestCLI:
    def test_streams_flag_matches_single_stream(self, tmp_path):
        """transcribe --streaming --streams 3 over three files produces
        byte-identical records to three --streams 1 runs (the public
        serving-capacity surface)."""
        import json
        import subprocess
        import sys

        from scipy.io import wavfile

        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.solver import Solver

        ovr = [
            "model.family=ctc", "model.enc_bidirectional=false",
            "frontend.center=false", "model.lstm_backend=xla",
            "data.num_synthetic_utts=8", "train.batch_size=4",
            "train.total_steps=4", "train.eval_every=0",
            "train.ckpt_every=4", "train.log_every=2",
        ]
        wd = tmp_path / "wd"
        cfg = load_config("configs/synthetic_smoke.yaml", ovr)
        solver = Solver(cfg, wd, use_mesh=False)
        solver.train()
        wavs = []
        for i in range(3):
            utt = solver.bundle.train[i]
            wav = tmp_path / f"u{i}.wav"
            wavfile.write(
                wav, cfg.frontend.sample_rate,
                np.clip(utt.audio * 32767, -32768,
                        32767).astype(np.int16),
            )
            wavs.append(str(wav))

        def run(extra, files):
            out = subprocess.run(
                [sys.executable, "-m",
                 "semi_supervised_asr_tpu.transcribe",
                 "--config", "configs/synthetic_smoke.yaml",
                 "--load-dir", str(wd), "--platform", "cpu",
                 "--beam", "1", "--streaming",
                 "--stream-chunk-ms", "200", *extra, *files, *ovr],
                capture_output=True, text=True,
            )
            assert out.returncode == 0, out.stderr[-2000:]
            return [json.loads(ln)
                    for ln in out.stdout.strip().splitlines()
                    if ln.startswith("{")]

        multi = run(["--streams", "3"], wavs)
        singles = [run([], [w])[0] for w in wavs]
        assert len(multi) == 3
        for m, s in zip(multi, singles):
            assert m["audio"] == s["audio"]
            assert m["text"] == s["text"], (m, s)
            assert m["streaming"] is True
            # scores agree to fp tolerance only: the batch-3 XLA
            # compilation reduces in a different order than batch-1
            assert m["score"] == pytest.approx(s["score"], abs=1e-3)


class TestGuards:
    def test_slot_exhaustion_and_closed_sid(self):
        cfg = _cfg(CTCCFG)
        params = M.init_model(jax.random.PRNGKey(5), CTCCFG)
        ms = MultiStreamTranscriber(params, cfg, CMVN, MAX_U, 1)
        sid = ms.open()
        with pytest.raises(ValueError, match="slots are in use"):
            ms.open()
        ms.feed(sid, _utts(1)[0])
        ms.pump()
        ms.finalize(sid)
        with pytest.raises(ValueError, match="not open"):
            ms.feed(sid, np.zeros(10, np.float32))
        sid2 = ms.open()               # freed slot leases again
        assert sid2 == sid
