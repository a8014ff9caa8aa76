"""Listener: pyramidal BiLSTM encoder (Chan et al. 2015, arXiv:1508.01211).

Reference counterpart: the pBLSTM `Encoder` (SURVEY.md §3 #8).  TPU-native
realization: an optional conv subsampler stem (``conv_subsample`` stride-2
3x3 conv blocks — MXU work that halves the scan length per block), then
``enc_base_layers`` full-rate BiLSTMs, then ``enc_layers`` pyramid stages,
each a reshape time-fold (T -> T/2, feature dim doubles) then a BiLSTM.
Total time reduction 2**(enc_layers + conv_subsample); buckets must be
divisible by it (enforced by the data pipeline).

Outputs are float32 [B, T', 2*enc_hidden] with exact zeros on pad frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.ops import recurrent as R


def conv_stem_dims(cfg: ModelConfig) -> int:
    """Feature dim the LSTM stack sees after the conv stem's reshape."""
    f = cfg.n_mels
    for _ in range(cfg.conv_subsample):
        f = (f + 1) // 2
    return f * cfg.conv_channels


def conv_stem_init(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32):
    """Stride-2 3x3 conv-stem params (shared by the transformer and
    conformer listeners; the blstm listener keeps its historical key
    derivation so seeded inits stay reproducible)."""
    glorot = jax.nn.initializers.glorot_uniform()
    ck = jax.random.split(key, cfg.conv_subsample)
    out: list = []
    c_in = 1
    for i in range(cfg.conv_subsample):
        out.append({
            "w": glorot(ck[i], (3, 3, c_in, cfg.conv_channels), dtype),
            "b": jnp.zeros((cfg.conv_channels,), dtype),
        })
        c_in = cfg.conv_channels
    return out


def init_listener(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32):
    n = cfg.enc_base_layers + cfg.enc_layers + cfg.conv_subsample
    keys = jax.random.split(key, max(n, 2))
    params: dict = {"layers": []}
    in_dim = cfg.n_mels
    if cfg.conv_subsample > 0:
        # ESPnet-style Conv2dSubsampling stem: stride-2 3x3 convs over
        # (time, freq); each halves the length the scans must walk
        glorot = jax.nn.initializers.glorot_uniform()
        params["conv"] = []
        c_in = 1
        for i in range(cfg.conv_subsample):
            params["conv"].append({
                "w": glorot(
                    keys[cfg.enc_base_layers + cfg.enc_layers + i],
                    (3, 3, c_in, cfg.conv_channels), dtype,
                ),
                "b": jnp.zeros((cfg.conv_channels,), dtype),
            })
            c_in = cfg.conv_channels
        in_dim = conv_stem_dims(cfg)
    # streaming variant: forward-only cells, enc_out_dim = enc_hidden
    cell_init = (R.bilstm_init if cfg.enc_bidirectional
                 else R.lstm_init)
    out_dim = cfg.enc_out_dim
    for i in range(cfg.enc_base_layers):
        params["layers"].append(
            cell_init(keys[i], in_dim, cfg.enc_hidden, dtype)
        )
        in_dim = out_dim
    for j in range(cfg.enc_layers):
        k = keys[cfg.enc_base_layers + j]
        # pyramid fold doubles the feature dim before the (Bi)LSTM
        params["layers"].append(
            cell_init(k, 2 * in_dim, cfg.enc_hidden, dtype)
        )
        in_dim = out_dim
    return params


def _freq_same_pad(f: int) -> tuple[int, int]:
    """XLA SAME padding for the stem's kernel-3 / stride-2 freq axis."""
    out = -(-f // 2)
    tot = max((out - 1) * 2 + 3 - f, 0)
    return (tot // 2, tot - tot // 2)


def conv_stem_apply(
    conv_params: list,
    x: jax.Array,          # [B, T, F] zero on pad frames
    lens: jax.Array,       # [B]
    cfg: ModelConfig,
    causal: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """-> ([B, ceil(T/2^N), F'*C], new lens).  Pad frames stay exact zeros
    (re-masked after every block: bias+relu would otherwise bleed into the
    pad region and break pad-invariance of the downstream scans).

    ``causal`` (the chunk-causal conformer, ``model.enc_attn_chunk``):
    the TIME axis pads (2, 0) instead of SAME's (0, 1) so output frame
    t' reads inputs [2t'-2, 2t'] — no lookahead, and the stem streams
    with a 2-frame carry per block (``conv_stem_stream``).  Output
    length and the (lens+1)//2 valid-count are unchanged; the freq axis
    keeps its exact SAME padding."""
    compute = jnp.dtype(cfg.compute_dtype)
    h = x[..., None]                               # [B, T, F, 1]
    for p in conv_params:
        # conv runs in compute dtype end-to-end (preferred_element_type
        # would make the transposed conv in the VJP mix dtypes); the MXU
        # accumulates in fp32 internally, the upcast happens at the bias
        pad = ([(2, 0), _freq_same_pad(h.shape[2])] if causal
               else "SAME")
        h = jax.lax.conv_general_dilated(
            h.astype(compute), p["w"].astype(compute),
            window_strides=(2, 2), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32) + p["b"].astype(jnp.float32)
        h = jax.nn.relu(h)
        lens = (lens + 1) // 2
        mask = (jnp.arange(h.shape[1])[None, :] < lens[:, None])
        h = jnp.where(mask[:, :, None, None], h, 0.0)
    b, t = h.shape[:2]
    return h.reshape(b, t, -1), lens


def conv_stem_stream_init(cfg: ModelConfig, b: int) -> tuple:
    """Zero carries for the CAUSAL stem: per block the last 2 input
    frames at that block's rate (== the causal left padding on chunk 1).
    Freq/channel dims follow the block tower."""
    compute = jnp.dtype(cfg.compute_dtype)
    carries = []
    f, c_in = cfg.n_mels, 1
    for _ in range(cfg.conv_subsample):
        carries.append(jnp.zeros((b, 2, f, c_in), compute))
        f = (f + 1) // 2
        c_in = cfg.conv_channels
    return tuple(carries)


def conv_stem_stream(
    conv_params: list,
    x: jax.Array,          # [B, Tc, F], Tc % 2^N == 0, zeros on pads
    cfg: ModelConfig,
    carry: tuple,          # conv_stem_stream_init / previous chunk
    lens: jax.Array | None = None,   # [B], FINAL partial chunk only
) -> tuple[jax.Array, tuple, jax.Array | None]:
    """One chunk of the causal stem -> ([B, Tc/2^N, F'*C], new carry,
    new lens).  Exactly ``conv_stem_apply(..., causal=True)`` resumed:
    each block convolves (carry ++ chunk) with no time padding — the
    carried 2 frames ARE the causal left context (zeros on chunk 1 ==
    the offline left padding) — so per-chunk outputs are bitwise the
    offline outputs.  Pad re-masking mirrors the offline path on the
    final partial chunk."""
    compute = jnp.dtype(cfg.compute_dtype)
    h = x[..., None]
    new_carry = []
    for i, p in enumerate(conv_params):
        hc = h.astype(compute)
        hp = jnp.concatenate([carry[i].astype(compute), hc], axis=1)
        new_carry.append(
            jax.lax.slice_in_dim(
                hp, hp.shape[1] - 2, hp.shape[1], axis=1
            ).astype(carry[i].dtype)
        )
        h = jax.lax.conv_general_dilated(
            hp, p["w"].astype(compute),
            window_strides=(2, 2),
            padding=[(0, 0), _freq_same_pad(h.shape[2])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32) + p["b"].astype(jnp.float32)
        h = jax.nn.relu(h)
        if lens is not None:
            lens = (lens + 1) // 2
            mask = (jnp.arange(h.shape[1])[None, :] < lens[:, None])
            h = jnp.where(mask[:, :, None, None], h, 0.0)
    b, t = h.shape[:2]
    return h.reshape(b, t, -1), tuple(new_carry), lens


def listener_apply(
    params: dict,
    feats: jax.Array,          # [B, T, n_mels]
    feat_lens: jax.Array,      # [B]
    cfg: ModelConfig,
    train: bool = False,
    dropout_rng: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """-> (enc [B, T/2**L, 2H], enc_lens [B])."""
    compute = jnp.dtype(cfg.compute_dtype)
    x = feats.astype(jnp.float32)
    lens = feat_lens

    def maybe_dropout(h, i):
        if train and cfg.enc_dropout > 0.0 and dropout_rng is not None:
            k = jax.random.fold_in(dropout_rng, i)
            keep = 1.0 - cfg.enc_dropout
            m = jax.random.bernoulli(k, keep, h.shape)
            return jnp.where(m, h / keep, 0.0)
        return h

    if cfg.lstm_backend == "pallas":
        from semi_supervised_asr_tpu.ops.pallas_lstm import (
            bilstm_pallas, lstm_pallas,
        )

        if cfg.enc_bidirectional:
            def run_bilstm(p, h, l):
                return bilstm_pallas(p, h, l, compute,
                                     block_t=cfg.lstm_block_t,
                                     fuse_directions=cfg.fuse_bilstm)
        else:
            def run_bilstm(p, h, l):
                return lstm_pallas(p, h, l, False, compute,
                                   block_t=cfg.lstm_block_t)
    elif cfg.enc_bidirectional:
        def run_bilstm(p, h, l):
            return R.bilstm(p, h, l, compute, cfg.fuse_bilstm,
                            cfg.scan_unroll)
    else:
        def run_bilstm(p, h, l):
            return R.lstm(p, h, l, False, compute,
                          unroll=cfg.scan_unroll)

    if cfg.conv_subsample > 0:
        x, lens = conv_stem_apply(params["conv"], x, lens, cfg)

    li = 0
    for i in range(cfg.enc_base_layers):
        x = run_bilstm(params["layers"][li], x, lens)
        x = maybe_dropout(x, li)
        li += 1
    for _ in range(cfg.enc_layers):
        x, lens = R.pyramid_fold(x, lens)
        x = run_bilstm(params["layers"][li], x, lens)
        x = maybe_dropout(x, li)
        li += 1
    return x, lens


def listener_stream_init(cfg: ModelConfig, b: int) -> tuple:
    """Zero LSTM carries for chunked streaming (enc_bidirectional=false):
    ((h, c) per layer), the state ``listener_apply_stream`` resumes from."""
    assert not cfg.enc_bidirectional, "streaming needs a causal listener"
    z = jnp.zeros((b, cfg.enc_hidden), jnp.float32)
    n = cfg.enc_base_layers + cfg.enc_layers
    return tuple((z, z) for _ in range(n))


def listener_apply_stream(
    params: dict,
    feats: jax.Array,          # [B, Tc, n_mels], Tc % time_reduction == 0
    cfg: ModelConfig,
    state: tuple,              # from listener_stream_init / previous chunk
    frame_lens: jax.Array | None = None,   # last-chunk remainder lengths
) -> tuple[jax.Array, tuple]:
    """One streaming chunk -> (enc [B, Tc/red, H], new state).

    Chunk-exactness contract (tests/test_streaming_decode.py): feeding an
    utterance in any chunking whose pieces are ``time_reduction``-aligned
    reproduces the full-utterance ``listener_apply`` outputs — the scans
    resume from the carried (h, c) and the pyramid folds stay aligned
    because every chunk folds to whole output frames.  ``frame_lens``
    handles the final partial chunk exactly like the batch path's length
    masking (invalid steps pass the carry through and emit zeros).
    """
    assert not cfg.enc_bidirectional, "streaming needs a causal listener"
    assert cfg.conv_subsample == 0, (
        "streaming chunk path supports conv_subsample=0 (the conv stem "
        "spans chunk boundaries)"
    )
    compute = jnp.dtype(cfg.compute_dtype)
    x = feats.astype(jnp.float32)
    lens = frame_lens
    new_state = []
    li = 0
    for _ in range(cfg.enc_base_layers):
        h0, c0 = state[li]
        x, st = R.lstm(params["layers"][li], x, lens, False, compute,
                       h0=h0, c0=c0, return_state=True)
        new_state.append(st)
        li += 1
    for _ in range(cfg.enc_layers):
        x, lens = R.pyramid_fold(x, lens)
        h0, c0 = state[li]
        x, st = R.lstm(params["layers"][li], x, lens, False, compute,
                       h0=h0, c0=c0, return_state=True)
        new_state.append(st)
        li += 1
    return x, tuple(new_state)


def output_frames(t_in: int, cfg: ModelConfig) -> int:
    assert t_in % cfg.time_reduction == 0, (
        f"bucket length {t_in} not divisible by time reduction "
        f"{cfg.time_reduction}"
    )
    return t_in // cfg.time_reduction
