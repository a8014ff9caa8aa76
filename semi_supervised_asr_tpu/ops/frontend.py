"""Batched JAX/XLA audio frontend: STFT -> mel -> log -> CMVN (-> SpecAugment).

TPU-native counterpart of the reference's offline feature extraction
(SURVEY.md §4.4): raw audio streams to the device and features are computed
in the training step, so they never round-trip through host memory
(BASELINE.json:8 "fused audio frontend ... emitting HBM-resident bucketed
feature batches").

Design notes (all shapes static per bucket, jit-stable):
* framing via ``lax.conv_general_dilated_patches`` — compiles to an
  efficient strided window read, no gather;
* rfft stays in XLA (``jnp.fft.rfft``) — Pallas FFT is not worth it
  (SURVEY.md §8.1); the post-FFT chain (power -> mel -> log -> CMVN ->
  SpecAugment) is fused by XLA here and by a Pallas kernel in
  ``pallas_frontend.py``;
* the mel matmul rides the MXU: [B*T, F] @ [F, M] in one batched contraction.

Parity: tests/test_frontend.py checks every stage against the float64 numpy
oracle in ``frontend_oracle.py`` to <=1e-5 relative error ("bitwise-close",
BASELINE.json:8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from semi_supervised_asr_tpu.config import FrontendConfig
from semi_supervised_asr_tpu.ops import frontend_oracle as oracle


@functools.lru_cache(maxsize=8)
def _constants(cfg: FrontendConfig):
    """Precomputed (window[n_fft], mel_fb[F, M]) as float32 numpy arrays."""
    window = oracle.padded_window(cfg).astype(np.float32)
    fb = oracle.mel_filterbank(
        cfg.n_mels, cfg.n_fft, cfg.sample_rate, cfg.fmin, cfg.fmax_hz,
        cfg.mel_scale,
    ).astype(np.float32)
    return window, fb


def frame_lengths(sample_lengths: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """Valid frame count per utterance given sample lengths."""
    if cfg.center:
        return 1 + sample_lengths // cfg.hop_length
    return 1 + (sample_lengths - cfg.n_fft) // cfg.hop_length


def frames_for_samples(n_samples: int, cfg: FrontendConfig) -> int:
    return int(oracle.num_frames(n_samples, cfg))


def _frame(audio: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """[B, S] -> [B, T, n_fft] windowed frames."""
    if cfg.preemphasis > 0.0:
        audio = jnp.concatenate(
            [audio[:, :1], audio[:, 1:] - cfg.preemphasis * audio[:, :-1]],
            axis=1,
        )
    if cfg.center:
        pad = cfg.n_fft // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    # conv patches: [B, C=1, S] -> [B, n_fft, T]
    patches = lax.conv_general_dilated_patches(
        audio[:, None, :],
        filter_shape=(cfg.n_fft,),
        window_strides=(cfg.hop_length,),
        padding="VALID",
    )
    return jnp.transpose(patches, (0, 2, 1))  # [B, T, n_fft]


@functools.lru_cache(maxsize=4)
def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis as two [n_fft, n_fft//2+1] fp32 matmul operands.

    On TPU, XLA's FFT runs on the VPU and dominates the frontend (~6.3ms
    of a 25.6ms fused step at b128/T400); the same transform as two MXU
    matmuls costs <1ms (frontend.fft_backend: "matmul").
    """
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def power_spectrogram(audio: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """[B, S] -> [B, T, n_fft//2 + 1] power spectrum (float32)."""
    window, _ = _constants(cfg)
    frames = _frame(audio.astype(jnp.float32), cfg) * jnp.asarray(window)
    if cfg.fft_backend == "matmul":
        cos, sin = _dft_matrices(cfg.n_fft)
        basis = jnp.asarray(np.concatenate([cos, sin], axis=1))
        # one [B*T, n_fft] x [n_fft, 2*(n_fft/2+1)] pass over the frames
        # (HBM-bound part), then square-add the re/im halves.  HIGHEST
        # precision: TPU's default bf16 matmul gives ~40% power error;
        # multi-pass fp32 matches rfft to ~4e-5 and still beats it 2x+
        reim = jnp.einsum("btn,nk->btk", frames, basis,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        k = cfg.n_fft // 2 + 1
        return reim[..., :k] ** 2 + reim[..., k:] ** 2
    if cfg.fft_backend != "xla":
        raise ValueError(f"unknown fft_backend {cfg.fft_backend!r} "
                         "(expected 'xla' or 'matmul')")
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def log_mel_from_power(pspec: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """[B, T, F] power -> [B, T, M] log-mel. The mel matmul is MXU work."""
    _, fb = _constants(cfg)
    mel = jnp.einsum(
        "btf,fm->btm", pspec, jnp.asarray(fb),
        preferred_element_type=jnp.float32,
    )
    return jnp.log(jnp.maximum(mel, cfg.log_floor))


def utterance_cmvn(
    feats: jax.Array, feat_lens: jax.Array, eps: float = 1e-8
) -> jax.Array:
    """Per-utterance mean/var normalization over valid frames only."""
    t = feats.shape[1]
    mask = (jnp.arange(t)[None, :] < feat_lens[:, None]).astype(feats.dtype)
    denom = jnp.maximum(feat_lens.astype(feats.dtype), 1.0)[:, None]
    mean = jnp.sum(feats * mask[..., None], axis=1) / denom
    sq = jnp.sum((feats**2) * mask[..., None], axis=1) / denom
    var = jnp.maximum(sq - mean**2, 0.0)
    out = (feats - mean[:, None, :]) * lax.rsqrt(var + eps)[:, None, :]
    return out * mask[..., None]


def apply_global_cmvn(
    feats: jax.Array, mean: jax.Array, inv_std: jax.Array
) -> jax.Array:
    return (feats - mean) * inv_std


def log_mel_features(
    audio: jax.Array,
    sample_lens: jax.Array,
    cfg: FrontendConfig,
    cmvn_mean: jax.Array | None = None,
    cmvn_inv_std: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Full unfused frontend: [B, S] audio -> ([B, T, M] feats, [B] lens).

    Padding frames are zeroed after normalization so downstream masking
    (attention, CE) sees exactly-zero features on pads.
    """
    pspec = power_spectrogram(audio, cfg)
    feats = log_mel_from_power(pspec, cfg)
    lens = jnp.minimum(frame_lengths(sample_lens, cfg), feats.shape[1])
    if cfg.cmvn == "utterance":
        feats = utterance_cmvn(feats, lens)
    elif cfg.cmvn == "global":
        assert cmvn_mean is not None and cmvn_inv_std is not None, (
            "global CMVN requires precomputed stats"
        )
        feats = apply_global_cmvn(feats, cmvn_mean, cmvn_inv_std)
        mask = jnp.arange(feats.shape[1])[None, :] < lens[:, None]
        feats = feats * mask[..., None].astype(feats.dtype)
    else:
        mask = jnp.arange(feats.shape[1])[None, :] < lens[:, None]
        feats = feats * mask[..., None].astype(feats.dtype)
    return feats, lens


# ---------------------------------------------------------------------------
# SpecAugment (Park et al. 2019, arXiv:1904.08779) under jax PRNG.
# ---------------------------------------------------------------------------

def sample_specaug_params(
    key: jax.Array,
    batch: int,
    n_mels: int,
    feat_lens: jax.Array,
    cfg: FrontendConfig,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample mask band parameters (shared by the unfused and fused paths,
    so the Pallas kernel is bit-parity-testable against this module).

    -> (fstarts [B,mF], fwidths [B,mF], tstarts [B,mT], twidths [B,mT]),
    all int32.  Frequency masks: width U[0, F]; time masks: width
    U[0, min(T_param, p*len)], confined to the valid region.
    """
    b, m = batch, n_mels
    kf, kt_w, kt_s = jax.random.split(key, 3)

    fwidths = jax.random.randint(
        jax.random.fold_in(kf, 0), (b, cfg.n_freq_masks), 0,
        min(cfg.freq_mask_param, m) + 1,
    )
    fstarts = (
        jax.random.uniform(jax.random.fold_in(kf, 1), (b, cfg.n_freq_masks))
        * jnp.maximum(m - fwidths, 1)
    ).astype(jnp.int32)

    cap = jnp.minimum(
        jnp.full((b,), cfg.time_mask_param, dtype=jnp.int32),
        (cfg.time_mask_max_ratio * feat_lens.astype(jnp.float32)).astype(
            jnp.int32
        ),
    )
    tw_u = jax.random.uniform(kt_w, (b, cfg.n_time_masks))
    twidths = (tw_u * (cap[:, None].astype(jnp.float32) + 1.0)).astype(
        jnp.int32
    )
    tstarts = (
        jax.random.uniform(kt_s, (b, cfg.n_time_masks))
        * jnp.maximum(feat_lens[:, None] - twidths, 1).astype(jnp.float32)
    ).astype(jnp.int32)
    return fstarts, fwidths, tstarts, twidths


def apply_specaug_masks(
    feats: jax.Array,
    fstarts: jax.Array,
    fwidths: jax.Array,
    tstarts: jax.Array,
    twidths: jax.Array,
    mask_value: float = 0.0,
) -> jax.Array:
    """Build + apply band masks from sampled parameters ([B,T,M] -> same)."""
    b, t, m = feats.shape
    fpos = jnp.arange(m).reshape(1, 1, -1)
    fmask = jnp.any(
        (fpos >= fstarts[..., None]) & (fpos < (fstarts + fwidths)[..., None]),
        axis=1,
    )
    tpos = jnp.arange(t).reshape(1, 1, -1)
    tmask = jnp.any(
        (tpos >= tstarts[..., None]) & (tpos < (tstarts + twidths)[..., None]),
        axis=1,
    )
    masked = jnp.where(fmask[:, None, :], mask_value, feats)
    return jnp.where(tmask[:, :, None], mask_value, masked)


def spec_augment(
    key: jax.Array,
    feats: jax.Array,
    feat_lens: jax.Array,
    cfg: FrontendConfig,
    mask_value: float = 0.0,
) -> jax.Array:
    """Apply SpecAugment to [B, T, M] features (train only)."""
    b, t, m = feats.shape
    params = sample_specaug_params(key, b, m, feat_lens, cfg)
    return apply_specaug_masks(feats, *params, mask_value=mask_value)


def speed_perturb(
    key: jax.Array,
    audio: jax.Array,        # [B, S] float32
    sample_lens: jax.Array,  # [B] int32
    factors: tuple[float, ...],
) -> tuple[jax.Array, jax.Array]:
    """Per-utterance speed perturbation (Ko et al. 2015, Interspeech).

    Resamples each waveform by a factor drawn uniformly from ``factors``
    (linear interpolation — the tempo+pitch "sox speed" convention that
    Kaldi/ESPnet recipes standardized by tripling the corpus offline),
    applied on-device at the waveform level so it composes with both the
    fused-Pallas and unfused frontends.  TPU-shaped: one batched gather +
    lerp over the static [B, S] buffer, no dynamic shapes.

    Per-row slow factors are clamped so the stretched utterance still
    fits the bucket's sample budget (rows at the bucket cap get less
    slowdown rather than a truncated transcript).  A drawn factor of
    exactly 1.0 leaves the row's valid samples exactly unchanged.
    Positions at or beyond the new length are exactly 0 (pad contract).
    """
    if not factors or any(f <= 0.0 for f in factors):
        raise ValueError(f"speed_perturb factors must be positive, "
                         f"got {factors!r}")
    b, s_cap = audio.shape
    f = jnp.asarray(factors, jnp.float32)
    s = f[jax.random.randint(key, (b,), 0, len(factors))]        # [B]
    lens_f = sample_lens.astype(jnp.float32)
    s = jnp.maximum(s, lens_f / s_cap)          # fit the bucket buffer
    new_lens = jnp.minimum(
        jnp.floor(lens_f / jnp.maximum(s, 1e-6)).astype(jnp.int32), s_cap
    )
    pos = jnp.arange(s_cap, dtype=jnp.float32)[None, :] * s[:, None]
    last = jnp.maximum(sample_lens - 1, 0)[:, None]
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, last)
    hi = jnp.minimum(lo + 1, last)
    frac = jnp.clip(pos - lo.astype(jnp.float32), 0.0, 1.0)
    out = (
        jnp.take_along_axis(audio, lo, axis=1) * (1.0 - frac)
        + jnp.take_along_axis(audio, hi, axis=1) * frac
    )
    valid = jnp.arange(s_cap)[None, :] < new_lens[:, None]
    return jnp.where(valid, out, 0.0), new_lens


def noise_augment(
    key: jax.Array,
    audio: jax.Array,        # [B, S] float32 (pads exactly 0)
    sample_lens: jax.Array,  # [B] int32
    prob: float,
    snr_db: tuple[float, float],
    sources: tuple[str, ...],
) -> jax.Array:
    """Per-utterance additive noise at an exactly-realized SNR.

    The waveform-level robustness knob the Kaldi/ESPnet MUSAN recipes
    apply offline, run on-device inside the step (frontend.noise_aug_prob
    / noise_snr_db / noise_sources).  Each row independently draws
    Bernoulli(``prob``) whether to mix, an SNR uniform in ``snr_db``, and
    a source uniform over ``sources``:

    * ``"white"`` — unit Gaussian noise.
    * ``"babble"`` — the mean of up to three OTHER rows of the batch
      (in-batch multi-talker babble; no noise corpus required).  With
      batch size 1 there are no other rows and babble falls back to
      white noise.

    The noise gain is solved in closed form from the row's signal power
    over its valid samples, so the realized SNR equals the drawn SNR
    exactly (up to float eps) — tested, not approximated.  Rows with zero
    signal power (or zero noise power in the valid region) pass through
    unchanged.  Lengths and the frame grid are unchanged and positions at
    or beyond ``sample_lens`` stay exactly 0, so unlike
    :func:`speed_perturb` this composes with the pseudo-label student
    view (clean/augmented views keep one frame grid).  The mixed signal
    is NOT re-clipped to [-1, 1]: augmentation runs in the float domain,
    matching the offline-corpus convention.
    """
    if not 0.0 <= prob <= 1.0:
        raise ValueError(f"noise_aug_prob must be in [0, 1], got {prob}")
    lo_db, hi_db = snr_db
    if hi_db < lo_db:
        raise ValueError(f"noise_snr_db must be (lo, hi) with lo <= hi, "
                         f"got {snr_db!r}")
    unknown = set(sources) - {"white", "babble"}
    if not sources or unknown:
        raise ValueError(f"noise_sources must be a non-empty subset of "
                         f"{{'white', 'babble'}}, got {sources!r}")
    b, s_cap = audio.shape
    k_apply, k_snr, k_src, k_white = jax.random.split(key, 4)
    valid = (jnp.arange(s_cap)[None, :] < sample_lens[:, None]).astype(
        audio.dtype
    )                                                          # [B, S]

    def _white() -> jax.Array:
        return jax.random.normal(k_white, audio.shape, audio.dtype)

    def _babble() -> jax.Array:
        shifts = [s for s in (1, 2, 3) if s < b]
        if not shifts:                     # batch of 1: no other rows
            return _white()
        return sum(jnp.roll(audio, s, axis=0) for s in shifts) / len(shifts)

    cands = {"white": _white, "babble": _babble}
    noise = cands[sources[0]]()
    if len(sources) > 1:
        src = jax.random.randint(k_src, (b,), 0, len(sources))  # [B]
        other = cands[sources[1]]()
        noise = jnp.where((src == 1)[:, None], other, noise)

    denom = jnp.maximum(sample_lens, 1).astype(audio.dtype)     # [B]
    p_sig = jnp.sum(jnp.square(audio) * valid, axis=1) / denom
    p_noise = jnp.sum(jnp.square(noise) * valid, axis=1) / denom
    snr = lo_db + jax.random.uniform(k_snr, (b,), audio.dtype) * (
        hi_db - lo_db
    )
    ok = (p_sig > 0.0) & (p_noise > 0.0)
    gain = jnp.sqrt(
        jnp.where(ok, p_sig, 1.0)
        / (jnp.where(ok, p_noise, 1.0) * jnp.power(10.0, snr / 10.0))
    )
    apply = (
        jax.random.uniform(k_apply, (b,), audio.dtype) < prob
    ) & ok                                                      # [B]
    scale = jnp.where(apply, gain, 0.0)[:, None]                # [B, 1]
    return audio + scale * noise * valid


def time_warp(
    key: jax.Array,
    feats: jax.Array,        # [B, T, M]
    feat_lens: jax.Array,    # [B]
    cfg: FrontendConfig,
) -> jax.Array:
    """SpecAugment time warping (Park et al. 2019, the W parameter).

    A random time point w in [W, L-W) is displaced by d in [-W, W]; the
    valid region is piecewise-linearly resampled so w lands at w+d, with
    linear interpolation between frames (endpoints fixed, pads untouched).
    TPU-shaped: one batched gather + lerp, no image-warp library.  Applied
    at the featurize level AFTER CMVN/masks so the fused-Pallas and unfused
    paths stay bit-identical to each other (the masks are random, so
    warp/mask order does not change the augmentation distribution).
    Rows shorter than 2W+2 frames pass through unchanged.
    """
    W = cfg.time_warp_param
    if W <= 0:
        return feats
    b, t, m = feats.shape
    kw, kd = jax.random.split(key)
    L = feat_lens.astype(jnp.float32)                       # [B]
    ok = feat_lens > 2 * W + 1
    w = jnp.floor(
        W + jax.random.uniform(kw, (b,)) * jnp.maximum(L - 2 * W, 1.0)
    )
    d = jnp.round(jax.random.uniform(kd, (b,)) * (2 * W) - W)
    bnd = jnp.clip(w + d, 1.0, jnp.maximum(L - 2.0, 1.0))   # warped center
    tpos = jnp.arange(t, dtype=jnp.float32)[None, :]        # [1, T]
    wb, Lb, bb = w[:, None], L[:, None], bnd[:, None]
    src = jnp.where(
        tpos < bb,
        tpos * (wb / bb),
        wb + (tpos - bb) * ((Lb - 1.0 - wb)
                            / jnp.maximum(Lb - 1.0 - bb, 1.0)),
    )
    src = jnp.clip(src, 0.0, jnp.maximum(Lb - 1.0, 0.0))
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(feat_lens - 1, 0)[:, None])
    frac = (src - lo)[..., None]
    g = (
        jnp.take_along_axis(feats, lo[..., None], axis=1) * (1.0 - frac)
        + jnp.take_along_axis(feats, hi[..., None], axis=1) * frac
    )
    valid = (tpos < Lb) & ok[:, None]
    return jnp.where(valid[..., None], g, feats)
