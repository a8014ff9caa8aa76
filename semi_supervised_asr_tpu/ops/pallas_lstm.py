"""Pallas LSTM scan kernel: the encoder's hot loop as a hand-written kernel.

Why: at production shapes the recurrent matmul is ~0.3us of MXU work per
step but the XLA while-loop spends ~13us/step (measured, v5-lite, B=128
H=256) — the encoder is OVERHEAD-bound, not FLOP-bound.  This kernel runs
the whole time loop as ONE ``pallas_call`` with a grid over T:

* the per-step ``gates_x`` tile streams HBM->VMEM through the Pallas grid
  pipeline (auto double-buffered);
* the (h, c) carry lives in VMEM scratch, persisting across sequential
  grid steps — no HBM round-trip per step;
* the recurrent matmul hits the MXU in ``compute_dtype``; gate math is
  fp32 VPU work;
* variable-length masking keeps the pass-through semantics of
  ``ops/recurrent.lstm`` exactly (valid enters as float 0/1 rows).

The backward pass is a second Pallas kernel walking the grid in REVERSE
(index_map t -> T-1-t) with (dh, dc) carried in scratch, producing
``dgates``; the weight/bias/input gradients are then single large MXU
contractions OUTSIDE the kernel (dW = hprev^T dgates), where XLA is already
optimal.  Exposed via ``jax.custom_vjp``.

Used by the listener when ``ModelConfig.lstm_backend == "pallas"``
(pure-XLA scan remains the default and the parity oracle;
tests/test_pallas_lstm.py checks fwd AND grad equality).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(gx_ref, w_ref, v_ref, hout_ref, hprev_ref, cprev_ref,
                acts_ref, h_s, c_s, *, compute_dtype):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    h = h_s[:]
    c = c_s[:]
    hidden = h.shape[-1]
    gates = gx_ref[0] + jnp.dot(
        h.astype(compute_dtype), w_ref[:].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    v = v_ref[0, 0][:, None]                    # [B, 1] float 0/1
    # residuals for the backward kernel: PRE-update carries + activations
    hprev_ref[0] = h
    cprev_ref[0] = c
    acts_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)

    h2 = v * h_new + (1.0 - v) * h
    c2 = v * c_new + (1.0 - v) * c
    h_s[:] = h2
    c_s[:] = c2
    hout_ref[0] = v * h_new


def _bwd_kernel(w_ref, v_ref, acts_ref, cprev_ref, dhout_ref,
                dgx_ref, dh_s, dc_s, *, compute_dtype):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    dh = dh_s[:]
    dc = dc_s[:]
    acts = acts_ref[0]
    hidden = dh.shape[-1]
    i = acts[:, :hidden]
    f = acts[:, hidden : 2 * hidden]
    g = acts[:, 2 * hidden : 3 * hidden]
    o = acts[:, 3 * hidden :]
    cprev = cprev_ref[0]
    v = v_ref[0, 0][:, None]

    c_new = f * cprev + i * g
    tanh_c = jnp.tanh(c_new)
    dh_new = v * (dh + dhout_ref[0])
    do = dh_new * tanh_c
    dc_new = dh_new * o * (1.0 - tanh_c * tanh_c) + v * dc

    dgi = dc_new * g * i * (1.0 - i)
    dgf = dc_new * cprev * f * (1.0 - f)
    dgg = dc_new * i * (1.0 - g * g)
    dgo = do * o * (1.0 - o)
    dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)
    dgx_ref[0] = dgates

    dh_s[:] = (1.0 - v) * dh + jnp.dot(
        dgates.astype(compute_dtype), w_ref[:].T.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    dc_s[:] = (1.0 - v) * dc + dc_new * f


def _supported(b: int, hidden: int) -> bool:
    return b % 8 == 0 and hidden % 128 == 0


def _fwd_call(gates_x, w_hh, valid, compute_dtype):
    t, b, h4 = gates_x.shape
    hidden = h4 // 4
    kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
    grid = (t,)
    in_specs = [
            pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, b, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    shapes = [
        jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),  # h_out
        jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),  # hprev
        jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),  # cprev
        jax.ShapeDtypeStruct((t, b, h4), jnp.float32),      # acts
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=shapes,
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=_interpret(),
    )(gates_x, w_hh, valid[:, None, :])


def _bwd_call(w_hh, valid, acts, cprev, dhout, compute_dtype):
    t, b, h4 = acts.shape
    hidden = h4 // 4
    kernel = functools.partial(_bwd_kernel, compute_dtype=compute_dtype)
    rev = lambda i: (t - 1 - i, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, b), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, h4), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, hidden), rev, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, b, h4), rev, memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((t, b, h4), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=_interpret(),
    )(w_hh, valid[:, None, :], acts, cprev, dhout)[0]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_scan_pallas(gates_x, w_hh, valid, compute_dtype=jnp.float32):
    """[T, B, 4H] pre-projected gates + [H, 4H] w_hh + [T, B] float valid
    -> masked hidden sequence [T, B, H] (time-major)."""
    h_out, _, _, _ = _fwd_call(gates_x, w_hh, valid, compute_dtype)
    return h_out


def _vjp_fwd(gates_x, w_hh, valid, compute_dtype):
    h_out, hprev, cprev, acts = _fwd_call(gates_x, w_hh, valid, compute_dtype)
    return h_out, (w_hh, valid, acts, cprev, hprev)


def _vjp_bwd(compute_dtype, res, dhout):
    w_hh, valid, acts, cprev, hprev = res
    dgates = _bwd_call(w_hh, valid, acts, cprev, dhout, compute_dtype)
    # weight gradient: one large MXU contraction outside the kernel
    dw = jnp.einsum(
        "tbh,tbg->hg", hprev, dgates, preferred_element_type=jnp.float32
    )
    dvalid = jnp.zeros_like(valid)
    return dgates, dw, dvalid


lstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def lstm_pallas(
    params: dict,
    x: jax.Array,
    lengths: jax.Array | None = None,
    reverse: bool = False,
    compute_dtype=jnp.float32,
    allow_interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.recurrent.lstm backed by the Pallas scan kernel.

    Falls back to the XLA scan when shapes miss the tiling constraints
    (B % 8, H % 128) or when not on TPU (interpret mode is orders of
    magnitude slower than the XLA scan — parity tests opt in with
    ``allow_interpret=True``).
    """
    from semi_supervised_asr_tpu.ops import recurrent as R

    b, t, _ = x.shape
    hidden = params["w_hh"].shape[0]
    if not _supported(b, hidden) or (_interpret() and not allow_interpret):
        return R.lstm(params, x, lengths, reverse, compute_dtype)

    gates_x = (
        jnp.einsum(
            "bti,ih->bth", x.astype(compute_dtype),
            params["w_ih"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b"].astype(jnp.float32)
    ).transpose(1, 0, 2)
    if lengths is None:
        valid = jnp.ones((t, b), jnp.float32)
    else:
        valid = (
            jnp.arange(t)[:, None] < lengths[None, :]
        ).astype(jnp.float32)
    if reverse:
        gates_x = jnp.flip(gates_x, axis=0)
        valid = jnp.flip(valid, axis=0)
    ys = lstm_scan_pallas(gates_x, params["w_hh"], valid, compute_dtype)
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return ys.transpose(1, 0, 2)


def bilstm_pallas(
    params: dict,
    x: jax.Array,
    lengths: jax.Array | None = None,
    compute_dtype=jnp.float32,
    allow_interpret: bool = False,
) -> jax.Array:
    fwd = lstm_pallas(params["fwd"], x, lengths, False, compute_dtype,
                      allow_interpret)
    bwd = lstm_pallas(params["bwd"], x, lengths, True, compute_dtype,
                      allow_interpret)
    return jnp.concatenate([fwd, bwd], axis=-1)
