"""Chunk-causal streaming conformer (model.enc_attn_chunk).

The WeNet-U2 / streaming conformer-transducer configuration: offline
training/eval runs the conformer with a static chunk attention mask and
a causal depthwise conv, and per-chunk streaming inference
(conformer_listener_apply_stream) computes the SAME function with a
fixed per-block KV / conv cache.  Claims pinned here:

* the chunk visibility mask is exactly the U2 rule (full attention
  inside a chunk + enc_attn_left_chunks past chunks, nothing ahead);
* a perturbation in a later chunk cannot change earlier chunks' outputs
  (bitwise) — the causality the streaming cache relies on;
* streaming == offline to fp32 ulp scale (the conv/FF/LN chains are
  bitwise; attention differs only in softmax/matmul reduction order),
  including cache rolling past the left-context window and the padded
  final partial chunk;
* StreamingTranscriber end-to-end (transducer greedy + beam, CTC
  greedy): streamed tokens == full-utterance decode tokens for
  arbitrary audio piece sizes;
* guards: the knob is conformer-only, streaming requires a bounded
  left context, flash attention cannot express the chunk mask.

Reference counterpart: none — the reference is an offline BLSTM LAS
stack (SURVEY.md §3 #8); TPU-first capability extension.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.decode.streaming import StreamingTranscriber
from semi_supervised_asr_tpu.models import conformer_listener as CL
from semi_supervised_asr_tpu.models import seq2seq as M

# full-suite only: jit-heavy streaming integration (quick keeps the
# oracle-parity cores; pytest.ini)

MCFG = ModelConfig(
    n_mels=16, vocab_size=10, encoder_arch="conformer",
    enc_hidden=16, enc_heads=4, enc_ff_dim=32, enc_blocks=2,
    conformer_conv_width=5, conv_subsample=0,
    enc_attn_chunk=4, enc_attn_left_chunks=2,
    compute_dtype="float32",
)


def _apply(cfg, params, feats, lens):
    f = jax.jit(lambda p, x, l: CL.conformer_listener_apply(p, x, l, cfg))
    enc, out_lens = f(params, jnp.asarray(feats), jnp.asarray(lens))
    return np.asarray(enc), np.asarray(out_lens)


def _stream(cfg, params, feats, n_valid, rope_cap=64):
    """Feed [1, T, F] features chunk by chunk -> concatenated enc rows."""
    rope = CL.conformer_rope_table(cfg, rope_cap)
    st = CL.conformer_stream_init(cfg, 1)
    step = jax.jit(
        lambda p, x, s: CL.conformer_listener_apply_stream(
            p, x, cfg, s, rope)
    )
    fstep = jax.jit(
        lambda p, x, s, fl: CL.conformer_listener_apply_stream(
            p, x, cfg, s, rope, frame_lens=fl)
    )
    c = cfg.enc_attn_chunk
    outs = []
    full = n_valid // c
    for i in range(full):
        o, st = step(params, jnp.asarray(feats[:, i * c:(i + 1) * c]), st)
        outs.append(np.asarray(o))
    rem = n_valid - full * c
    if rem:
        pad = np.zeros((1, c, feats.shape[2]), np.float32)
        pad[:, :rem] = feats[:, full * c: full * c + rem]
        o, st = fstep(params, jnp.asarray(pad), st, jnp.array([rem]))
        outs.append(np.asarray(o)[:, :rem])
    return np.concatenate(outs, axis=1)


class TestChunkMask:
    def test_u2_visibility_rule(self):
        m = CL._chunk_mask(6, 2, 1)
        # chunks {0,1},{2,3},{4,5}; query sees own chunk + 1 left chunk
        exp = np.array([
            [1, 1, 0, 0, 0, 0],
            [1, 1, 0, 0, 0, 0],
            [1, 1, 1, 1, 0, 0],
            [1, 1, 1, 1, 0, 0],
            [0, 0, 1, 1, 1, 1],
            [0, 0, 1, 1, 1, 1],
        ], bool)
        assert np.array_equal(m, exp)

    def test_unlimited_left(self):
        m = CL._chunk_mask(6, 2, -1)
        c = np.arange(6) // 2
        assert np.array_equal(m, c[None, :] <= c[:, None])


class TestOfflineChunked:
    def test_future_chunk_cannot_change_past(self):
        params = CL.init_conformer_listener(jax.random.PRNGKey(0), MCFG)
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((1, 20, 16)).astype(np.float32)
        enc, _ = _apply(MCFG, params, feats, [20])
        feats2 = feats.copy()
        feats2[:, 12:16] += 1.0          # perturb chunk 3 only
        enc2, _ = _apply(MCFG, params, feats2, [20])
        assert np.array_equal(enc2[:, :12], enc[:, :12]), (
            "a future chunk changed past outputs — chunk causality broken"
        )
        assert not np.allclose(enc2[:, 12:16], enc[:, 12:16])

    def test_pad_invariance(self):
        params = CL.init_conformer_listener(jax.random.PRNGKey(0), MCFG)
        rng = np.random.default_rng(1)
        feats = np.zeros((1, 24, 16), np.float32)
        feats[:, :18] = rng.standard_normal((1, 18, 16)).astype(np.float32)
        enc24, _ = _apply(MCFG, params, feats, [18])
        enc20, _ = _apply(MCFG, params, feats[:, :20], [18])
        np.testing.assert_array_equal(enc24[:, :18], enc20[:, :18])
        assert np.all(enc24[:, 18:] == 0.0), "pad frames must be exact zeros"

    def test_grads_flow_through_chunked_path(self):
        params = CL.init_conformer_listener(jax.random.PRNGKey(0), MCFG)
        rng = np.random.default_rng(2)
        feats = jnp.asarray(
            rng.standard_normal((1, 8, 16)).astype(np.float32))

        def loss(p):
            enc, _ = CL.conformer_listener_apply(
                p, feats, jnp.array([8]), MCFG)
            return jnp.sum(enc ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(x)) for x in leaves)
        assert any(np.any(x != 0) for x in leaves)


class TestStreamParity:
    def test_stream_matches_offline(self):
        """Cache rolling (5 chunks > left window 2) + padded final
        partial chunk + offline pad frames beyond the valid region."""
        params = CL.init_conformer_listener(jax.random.PRNGKey(0), MCFG)
        rng = np.random.default_rng(0)
        n_valid, t_bucket = 18, 24
        feats = np.zeros((1, t_bucket, 16), np.float32)
        feats[:, :n_valid] = rng.standard_normal(
            (1, n_valid, 16)).astype(np.float32)
        enc_off, _ = _apply(MCFG, params, feats, [n_valid])
        enc_st = _stream(MCFG, params, feats, n_valid)
        scale = np.abs(enc_off[:, :n_valid]).max()
        d = np.abs(enc_off[:, :n_valid] - enc_st).max()
        assert d <= 1e-5 * max(scale, 1.0), (d, scale)

    def test_stream_matches_offline_with_conv_stem(self):
        """conv_subsample > 0: the CAUSAL stem streams with a 2-frame
        carry per block — feature chunks are enc_attn_chunk * 2**N
        frames; covers the partial final chunk's ceil-divided lens."""
        cfg = dc.replace(MCFG, conv_subsample=2, conv_channels=4)
        params = CL.init_conformer_listener(jax.random.PRNGKey(2), cfg)
        rng = np.random.default_rng(3)
        c_feat = cfg.enc_attn_chunk * 4
        n_valid, t_bucket = 70, 80       # 5 chunks, final partial
        feats = np.zeros((1, t_bucket, 16), np.float32)
        feats[:, :n_valid] = rng.standard_normal(
            (1, n_valid, 16)).astype(np.float32)
        enc_off, lens_off = _apply(cfg, params, feats, [n_valid])
        n_enc = int(lens_off[0])
        rope = CL.conformer_rope_table(cfg, 64)
        st = CL.conformer_stream_init(cfg, 1)
        step = jax.jit(lambda p, x, s: CL.conformer_listener_apply_stream(
            p, x, cfg, s, rope))
        fstep = jax.jit(
            lambda p, x, s, fl: CL.conformer_listener_apply_stream(
                p, x, cfg, s, rope, frame_lens=fl))
        outs = []
        full = n_valid // c_feat
        for c in range(full):
            o, st = step(
                params,
                jnp.asarray(feats[:, c * c_feat:(c + 1) * c_feat]), st)
            outs.append(np.asarray(o))
        rem = n_valid - full * c_feat
        pad = np.zeros((1, c_feat, 16), np.float32)
        pad[:, :rem] = feats[:, full * c_feat: full * c_feat + rem]
        o, st = fstep(params, jnp.asarray(pad), st, jnp.array([rem]))
        v = rem
        for _ in range(cfg.conv_subsample):
            v = (v + 1) // 2
        outs.append(np.asarray(o)[:, :v])
        enc_st = np.concatenate(outs, axis=1)
        assert enc_st.shape[1] == n_enc
        d = np.abs(enc_off[:, :n_enc] - enc_st).max()
        assert d <= 1e-5, d

    def test_left_zero_and_wide_left(self):
        for left in (0, 4):
            cfg = dc.replace(MCFG, enc_attn_left_chunks=left)
            params = CL.init_conformer_listener(jax.random.PRNGKey(1), cfg)
            rng = np.random.default_rng(left)
            feats = rng.standard_normal((1, 16, 16)).astype(np.float32)
            enc_off, _ = _apply(cfg, params, feats, [16])
            enc_st = _stream(cfg, params, feats, 16)
            d = np.abs(enc_off - enc_st).max()
            assert d <= 1e-5, (left, d)


FCFG_E2E = FrontendConfig(center=False, cmvn="global", spec_augment=False)
MCFG_E2E = dc.replace(
    MCFG, n_mels=80, family="transducer",
    pred_hidden=16, pred_layers=1, joint_dim=16, embed_dim=8,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5, dec_hidden=8,
    enc_attn_left_chunks=1,
)
CFG_E2E = Config(frontend=FCFG_E2E, model=MCFG_E2E,
                 objective=ObjectiveConfig(), train=TrainConfig())
CMVN = (np.zeros(80, np.float32), np.ones(80, np.float32))
MAX_U = 12


def _full_decode(params, audio, family="transducer", beam_size=1,
                 model_cfg=None):
    from semi_supervised_asr_tpu.ops import frontend as F

    f, m = CFG_E2E.frontend, (model_cfg or MCFG_E2E)
    if family == "ctc":
        m = dc.replace(m, family="ctc")
    hop, n_fft = f.hop_length, f.n_fft
    n_frames = 1 + (len(audio) - n_fft) // hop
    # offline reference pads to the chunk grid like any bucketed batch
    # (in FEATURE frames: enc_attn_chunk encoder frames x the stem rate)
    c = m.enc_attn_chunk * m.time_reduction
    pad_frames = -(-n_frames // c) * c
    need = (pad_frames - 1) * hop + n_fft
    padded = np.zeros((need,), np.float32)
    padded[: len(audio)] = audio
    feats, flens = F.log_mel_features(
        jnp.asarray(padded)[None], jnp.asarray([len(audio)]), f,
        jnp.asarray(CMVN[0]), jnp.asarray(CMVN[1]),
    )
    if family == "ctc":
        from semi_supervised_asr_tpu.models import ctc_model as C
        from semi_supervised_asr_tpu.decode.ctc import ctc_greedy_from_enc

        enc, mask = C.encode(params, feats, flens, m)
        toks, score = ctc_greedy_from_enc(params["ctc"], enc, mask)
        return ([int(x) for x in np.asarray(toks)[0] if x not in (0, 2)],
                float(score[0]))
    from semi_supervised_asr_tpu.models import transducer as TD

    enc, mask = TD.encode(params, feats, flens, m)
    if beam_size > 1:
        from semi_supervised_asr_tpu.decode.transducer_beam import (
            transducer_beam_from_enc,
        )

        toks, score = transducer_beam_from_enc(
            params, m, enc, mask, MAX_U, beam_size=beam_size)
        count = int((np.asarray(toks)[0] != 0).sum())
        return ([int(x) for x in np.asarray(toks)[0][:count]],
                float(score[0]))
    from semi_supervised_asr_tpu.decode.transducer_greedy import (
        transducer_greedy_from_enc,
    )

    toks, score = transducer_greedy_from_enc(params, m, enc, mask, MAX_U)
    count = int((np.asarray(toks)[0] != 0).sum())
    return ([int(x) for x in np.asarray(toks)[0][:count]],
            float(score[0]))


def _audio(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n,)) * 0.1).astype(np.float32)


class TestEndToEnd:
    def test_streaming_greedy_matches_full(self):
        params = M.init_model(jax.random.PRNGKey(3), MCFG_E2E)
        audio = _audio()
        ref_toks, _ = _full_decode(params, audio)
        for piece in (997, len(audio)):
            st = StreamingTranscriber(params, CFG_E2E, CMVN, MAX_U)
            for s in range(0, len(audio), piece):
                st.feed(audio[s: s + piece])
            toks, _ = st.finalize()
            assert toks == ref_toks, (piece, toks, ref_toks)

    def test_streaming_greedy_with_conv_stem_matches_full(self):
        """End-to-end with the causal stem (4x frame-rate reduction) —
        the production streaming-conformer configuration."""
        m = dc.replace(MCFG_E2E, conv_subsample=2, conv_channels=4)
        cfg = dc.replace(CFG_E2E, model=m)
        params = M.init_model(jax.random.PRNGKey(6), m)
        audio = _audio(seed=6, n=9000)
        ref_toks, _ = _full_decode(params, audio, model_cfg=m)
        st = StreamingTranscriber(params, cfg, CMVN, MAX_U)
        for s in range(0, len(audio), 1777):
            st.feed(audio[s: s + 1777])
        toks, _ = st.finalize()
        assert toks == ref_toks

    def test_streaming_beam_matches_full(self):
        params = M.init_model(jax.random.PRNGKey(4), MCFG_E2E)
        audio = _audio(seed=4)
        ref_toks, ref_score = _full_decode(params, audio, beam_size=2)
        st = StreamingTranscriber(
            params, CFG_E2E, CMVN, MAX_U, beam_size=2)
        st.feed(audio)
        toks, score = st.finalize()
        assert toks == ref_toks
        assert abs(score - ref_score) < 1e-4

    def test_streaming_ctc_greedy_matches_full(self):
        cfg = dc.replace(CFG_E2E, model=dc.replace(MCFG_E2E, family="ctc"))
        params = M.init_model(jax.random.PRNGKey(5), cfg.model)
        audio = _audio(seed=5)
        ref_toks, _ = _full_decode(params, audio, family="ctc")
        st = StreamingTranscriber(params, cfg, CMVN, MAX_U)
        for s in range(0, len(audio), 1501):
            st.feed(audio[s: s + 1501])
        toks, _ = st.finalize()
        assert toks == ref_toks


class TestGuards:
    def test_chunk_knob_is_conformer_only(self):
        cfg = dc.replace(MCFG, encoder_arch="transformer")
        with pytest.raises(AssertionError, match="conformer-only"):
            M._listener_fns(cfg)

    def test_streaming_needs_bounded_left_context(self):
        m = dc.replace(MCFG_E2E, enc_attn_left_chunks=-1)
        cfg = dc.replace(CFG_E2E, model=m)
        params = M.init_model(jax.random.PRNGKey(0), m)
        with pytest.raises(AssertionError, match="left"):
            StreamingTranscriber(params, cfg, CMVN, MAX_U)

    def test_chunk_mask_rejects_flash_backend(self):
        cfg = dc.replace(MCFG, attn_backend="flash")
        params = CL.init_conformer_listener(jax.random.PRNGKey(0), cfg)
        feats = jnp.zeros((1, 8, 16), jnp.float32)
        with pytest.raises(AssertionError, match="flash"):
            CL.conformer_listener_apply(params, feats, jnp.array([8]), cfg)

    def test_blstm_streaming_still_rejects_conv_stem(self):
        # the blstm path's SAME-padded stem reads 1 future frame per
        # block — only the conformer's causal stem streams
        m = dc.replace(
            MCFG_E2E, encoder_arch="blstm", enc_bidirectional=False,
            enc_attn_chunk=0, enc_attn_left_chunks=-1,
            conv_subsample=1, conv_channels=4,
            enc_layers=1, enc_base_layers=1,
        )
        cfg = dc.replace(CFG_E2E, model=m)
        params = M.init_model(jax.random.PRNGKey(0), m)
        with pytest.raises(AssertionError, match="conv_subsample"):
            StreamingTranscriber(params, cfg, CMVN, MAX_U)

    def test_stream_chunk_size_pinned_to_attn_chunk(self):
        params = M.init_model(jax.random.PRNGKey(0), MCFG_E2E)
        with pytest.raises(AssertionError, match="enc_attn_chunk"):
            StreamingTranscriber(
                params, CFG_E2E, CMVN, MAX_U,
                chunk_frames=2 * MCFG_E2E.enc_attn_chunk,
            )
