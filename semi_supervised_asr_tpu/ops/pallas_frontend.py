"""Fused Pallas post-FFT frontend kernel (config C2, BASELINE.json:8).

The FFT stays in XLA (a TPU Pallas FFT is not worth it — SURVEY.md §8.1);
everything after it fuses into ONE kernel pass over VMEM tiles:

    power spectrum -> mel matmul (MXU) -> log -> global CMVN ->
    pad-frame zeroing -> SpecAugment band masks (VPU)

so the [B, T, 257] power spectrogram is read from HBM exactly once and the
[B, T, 80] features are written exactly once — no intermediate [B, T, M]
round-trips for log/CMVN/masking (the unfused path leaves that to XLA
fusion; this kernel makes it structural).

SpecAugment band parameters are sampled OUTSIDE the kernel with the same
``frontend.sample_specaug_params`` used by the unfused path, so fused and
unfused outputs are parity-testable (tests/test_pallas_frontend.py); they
enter via scalar prefetch and become iota-comparison masks in-kernel.

Tiling: F=257 pads to 384 (3x128 lanes), M=80 pads to 128; the time axis
tiles at the largest multiple-of-8 divisor <= 256.  fp32 throughout (the
mel matmul is tiny next to the LSTM stack; precision wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semi_supervised_asr_tpu.config import FrontendConfig
from semi_supervised_asr_tpu.ops import frontend as F
from semi_supervised_asr_tpu.ops import kernel_mesh as KM


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _time_tile(t: int) -> int:
    for cand in range(min(t, 256), 0, -8):
        if t % cand == 0 and cand % 8 == 0:
            return cand
    raise ValueError(f"T={t} must be a multiple of 8 (bucketing guarantees)")


def _kernel(
    lens_ref, fs_ref, fw_ref, ts_ref, tw_ref,          # scalar prefetch
    pspec_ref, fb_ref, mean_ref, istd_ref,             # VMEM inputs
    out_ref,                                           # VMEM output
    *, t_tile: int, m_pad: int, log_floor: float,
    n_freq_masks: int, n_time_masks: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)

    x = pspec_ref[0]                                    # [T_TILE, F_pad]
    mel = jnp.dot(x, fb_ref[:], preferred_element_type=jnp.float32)
    x = jnp.log(jnp.maximum(mel, log_floor))
    x = (x - mean_ref[0][None, :]) * istd_ref[0][None, :]

    col = jax.lax.broadcasted_iota(jnp.int32, (t_tile, m_pad), 1)
    row = (
        jax.lax.broadcasted_iota(jnp.int32, (t_tile, m_pad), 0) + t * t_tile
    )
    keep = row < lens_ref[b]
    for i in range(n_freq_masks):
        fs, fw = fs_ref[b, i], fw_ref[b, i]
        keep &= ~((col >= fs) & (col < fs + fw))
    for i in range(n_time_masks):
        ts, tw = ts_ref[b, i], tw_ref[b, i]
        keep &= ~((row >= ts) & (row < ts + tw))
    out_ref[0] = jnp.where(keep, x, 0.0)


@functools.lru_cache(maxsize=8)
def _padded_fb(cfg: FrontendConfig, f_pad: int, m_pad: int) -> np.ndarray:
    _, fb = F._constants(cfg)
    out = np.zeros((f_pad, m_pad), np.float32)
    out[: fb.shape[0], : fb.shape[1]] = fb
    return out


def fused_post_fft(
    pspec: jax.Array,            # [B, T, F] power spectrum (float32)
    feat_lens: jax.Array,        # [B] int32 valid frames
    cfg: FrontendConfig,
    cmvn_mean: jax.Array,        # [M]
    cmvn_inv_std: jax.Array,     # [M]
    specaug: tuple[jax.Array, jax.Array, jax.Array, jax.Array] | None,
    interpret: bool = False,
) -> jax.Array:
    """-> [B, T, n_mels] features; specaug=None disables masking.

    Under an active ``kernel_mesh`` (data-parallel jit), wraps itself in
    ``shard_map`` over the batch axis — pallas_call has no GSPMD
    partitioning rule, so without this each device would compute the FULL
    global batch (ops/kernel_mesh.py).  SpecAugment band parameters are
    sampled globally by the caller and shard with the batch, so fused ==
    unfused parity holds per shard.  No differentiable inputs pass
    through here (the frontend is upstream of every parameter), so the
    wrap is gradient-inert and safe under any mesh layout incl. TP.
    """
    ctx = KM.active()
    if ctx is not None:
        mesh, axis = ctx
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def body(ps, fl, mean, istd, sa):
            with KM.kernel_mesh(None):
                return fused_post_fft(ps, fl, cfg, mean, istd, sa, interpret)

        sa_spec = None if specaug is None else (P(axis),) * 4
        sharded = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(), sa_spec),
            out_specs=P(axis), check_vma=False,
        )
        return sharded(pspec, feat_lens, cmvn_mean, cmvn_inv_std, specaug)

    b, t, f = pspec.shape
    m = cfg.n_mels
    f_pad = _round_up(f, 128)
    m_pad = _round_up(m, 128)
    t_tile = _time_tile(t)

    fb = jnp.asarray(_padded_fb(cfg, f_pad, m_pad))
    pspec_p = jnp.pad(pspec, ((0, 0), (0, 0), (0, f_pad - f)))
    mean_p = jnp.pad(
        cmvn_mean.astype(jnp.float32).reshape(1, -1),
        ((0, 0), (0, m_pad - m)),
    )
    istd_p = jnp.pad(
        cmvn_inv_std.astype(jnp.float32).reshape(1, -1),
        ((0, 0), (0, m_pad - m)),
    )

    if specaug is None:
        n_f, n_t = 0, 0
        zeros = jnp.zeros((b, 1), jnp.int32)
        fs = fw = ts = tw = zeros
    else:
        fs, fw, ts, tw = (x.astype(jnp.int32) for x in specaug)
        n_f, n_t = fs.shape[1], ts.shape[1]

    kernel = functools.partial(
        _kernel, t_tile=t_tile, m_pad=m_pad,
        log_floor=float(cfg.log_floor),
        n_freq_masks=n_f, n_time_masks=n_t,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, t // t_tile),
        in_specs=[
            pl.BlockSpec(
                (1, t_tile, f_pad), lambda i, j, *_: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (f_pad, m_pad), lambda i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, m_pad), lambda i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, m_pad), lambda i, j, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, m_pad), lambda i, j, *_: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, m_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * f_pad * m_pad,
            bytes_accessed=4 * b * t * (f_pad + m_pad) + 4 * f_pad * m_pad,
            transcendentals=b * t * m_pad,
        ),
    )(
        feat_lens.astype(jnp.int32), fs, fw, ts, tw,
        pspec_p, fb, mean_p, istd_p,
    )
    return out[:, :, :m]


def fused_log_mel_features(
    audio: jax.Array,
    sample_lens: jax.Array,
    cfg: FrontendConfig,
    cmvn_mean: jax.Array,
    cmvn_inv_std: jax.Array,
    rng: jax.Array | None = None,
    augment: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Full fused frontend: raw audio -> (features, frame lengths).

    Framing + rfft ride XLA; the post-FFT chain is the Pallas kernel.
    Requires global CMVN (utterance CMVN needs a cross-tile stats pass —
    the unfused path handles that mode).
    """
    assert cfg.cmvn == "global", "fused frontend supports global CMVN only"
    pspec = F.power_spectrogram(audio, cfg)
    lens = jnp.minimum(F.frame_lengths(sample_lens, cfg), pspec.shape[1])
    specaug = None
    if augment and cfg.spec_augment and rng is not None:
        specaug = F.sample_specaug_params(
            rng, audio.shape[0], cfg.n_mels, lens, cfg
        )
    feats = fused_post_fft(
        pspec, lens, cfg, cmvn_mean, cmvn_inv_std, specaug, interpret
    )
    return feats, lens
