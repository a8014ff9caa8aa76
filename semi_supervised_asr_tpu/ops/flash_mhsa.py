"""Fused (flash) multi-head self-attention for the attention listeners.

``model.attn_backend: flash`` routes the encoder MHSA through the
jax-shipped Pallas TPU flash-attention kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``) instead of the
materialized ``[B, H, T', T']`` einsum-softmax-einsum path.  Motivation
(DESIGN.md conformer roofline): at the long buckets the score buffers
are the encoder's remaining HBM traffic — flash streams K/V tiles
through VMEM and never writes scores to HBM, fwd or bwd (the op ships
its own custom VJP).

Bridging contracts handled here, so callers stay on the repo's native
layout:

* **Layout**: callers pass ``[B, T, H, D]`` (time-major per head, the
  layout the listeners already produce); the kernel wants
  ``[B, H, T, D]``.
* **Bucket grid vs 128-blocks**: the kernel's grid tiles sequences in
  ``MIN_BLOCK_SIZE`` (=128) steps, while the pyramid/bucket grid
  produces T' ∈ {100, 200, 300, 400, ...}; sequences are zero-padded
  here to the next 128 multiple and un-padded on return.
* **Pad masking == segment ids**: the listeners mask pad KEYS (additive
  -1e9 on scores); the kernel's ``SegmentIds`` attend-iff-equal rule
  reproduces exactly that for valid rows when valid frames get id 1 and
  pad frames id 0 — valid queries attend only valid keys.  Pad QUERY
  rows attend (only) pad keys, so they hold garbage-but-finite values,
  identical in kind to the einsum path, and the listener's final output
  masking zeroes them (pad-invariance contract, models/listener.py).
* **Numerics**: the kernel's q@k and alpha@v contractions run on the
  MXU in bf16 regardless of input dtype (measured on-chip: fp32 inputs
  differ from the fp32 einsum reference by ~4.5e-3 — bf16-epsilon
  scale — while bf16 inputs match the bf16 einsum within bf16 noise).
  The shipped recipes run ``compute_dtype: bfloat16``, where the two
  backends are numerically interchangeable; under fp32 compute the
  flash path trades matmul precision for memory — keep ``xla`` there
  if fp32-exact attention matters.
* **Off-TPU fallback**: Pallas TPU kernels do not run on CPU; off-TPU
  this module computes the same masked attention with the einsum path
  so ``attn_backend: flash`` configs stay testable on CPU (mirrors
  ops/pallas_lstm.py's fallback policy; parity of the two paths is
  asserted on-chip — see tests/test_flash_mhsa.py and DESIGN.md).

No reference counterpart: the reference's attention is the decoder's
location-aware attention over short encoder sequences (SURVEY.md §3
#9); encoder self-attention exists only in this build's capability
extensions (transformer/conformer listeners).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


_LANE = 128  # flash_attention MIN_BLOCK_SIZE: sequence tiling quantum


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=1)
def _kernel():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    return fa


def _pad_len(t: int) -> int:
    return (t + _LANE - 1) // _LANE * _LANE


def mhsa_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, key_mask: jax.Array,
    *, sm_scale: float, compute,
) -> jax.Array:
    """The einsum path: scores -> mask pad keys -> fp32 softmax -> ctx.

    Semantics twin of the flash path below (and the off-TPU fallback);
    identical to the listeners' inline attention math.
    """
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(compute), k.astype(compute)
    ).astype(jnp.float32) * sm_scale
    scores = jnp.where(key_mask[:, None, None, :], scores, -1e9)
    alpha = jax.nn.softmax(scores, axis=-1).astype(compute)
    return jnp.einsum("bhqk,bkhd->bqhd", alpha, v.astype(compute))


def mhsa(
    q: jax.Array, k: jax.Array, v: jax.Array, key_mask: jax.Array,
    *, sm_scale: float, compute,
) -> jax.Array:
    """Masked MHSA via the Pallas flash kernel (TPU) or the einsum
    fallback (elsewhere).

    Args:
      q, k, v: ``[B, T, H, D]`` (any float dtype; cast to ``compute``).
      key_mask: ``[B, T]`` bool, True on valid frames.
      sm_scale: softmax scale (callers pass ``1/sqrt(D)``).
      compute: matmul dtype (the listeners' ``compute_dtype``).

    Returns ``[B, T, H, D]`` in ``compute`` dtype.  Pad rows are
    garbage-but-finite (as in the einsum path) — callers mask outputs.
    """
    if not _on_tpu():
        return mhsa_reference(q, k, v, key_mask, sm_scale=sm_scale,
                              compute=compute)
    fa = _kernel()
    b, t, h, d = q.shape
    tp = _pad_len(t)
    pad = [(0, 0), (0, tp - t), (0, 0), (0, 0)]

    def prep(x):
        x = jnp.pad(x.astype(compute), pad)
        return x.transpose(0, 2, 1, 3)          # [B, H, Tp, D]

    # valid -> 1, pad -> 0: attend-iff-equal == pad-key masking for
    # valid rows; padded tail (False) joins the pad segment.
    seg = jnp.pad(key_mask, [(0, 0), (0, tp - t)]).astype(jnp.int32)
    segment_ids = fa.SegmentIds(q=seg, kv=seg)
    ctx = fa.flash_attention(
        prep(q), prep(k), prep(v), segment_ids=segment_ids,
        causal=False, sm_scale=sm_scale,
    )
    return ctx.transpose(0, 2, 1, 3)[:, :t]
