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

from semi_supervised_asr_tpu.ops import kernel_mesh as KM


def _fwd_kernel(gx_ref, w_ref, v_ref, hout_ref, hprev_ref, cprev_ref,
                acts_ref, h_s, c_s, *, compute_dtype, block_t):
    """One grid step = ``block_t`` timesteps, statically unrolled.

    Measured (v5-lite, b128/H256): block_t 1/2/4 are all ~equal — the
    scan is latency-bound on the serial h->h dependency, not on grid
    iteration overhead — and block_t=8 exceeds the 16MB VMEM scoped
    limit.  The knob stays (other shapes may differ); default 1."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    h = h_s[:]
    c = c_s[:]
    hidden = h.shape[-1]
    w = w_ref[:].astype(compute_dtype)
    for k in range(block_t):
        gates = gx_ref[k] + jnp.dot(
            h.astype(compute_dtype), w,
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)

        v = v_ref[k, 0][:, None]                # [B, 1] float 0/1
        # residuals for the backward kernel: PRE-update carries + acts
        hprev_ref[k] = h
        cprev_ref[k] = c
        acts_ref[k] = jnp.concatenate([i, f, g, o], axis=-1)

        h = v * h_new + (1.0 - v) * h
        c = v * c_new + (1.0 - v) * c
        hout_ref[k] = v * h_new
    h_s[:] = h
    c_s[:] = c


def _bwd_kernel(w_ref, v_ref, acts_ref, cprev_ref, dhout_ref,
                dgx_ref, dh_s, dc_s, *, compute_dtype, block_t):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    dh = dh_s[:]
    dc = dc_s[:]
    hidden = dh.shape[-1]
    wt = w_ref[:].T.astype(compute_dtype)
    for k in reversed(range(block_t)):
        acts = acts_ref[k]
        i = acts[:, :hidden]
        f = acts[:, hidden : 2 * hidden]
        g = acts[:, 2 * hidden : 3 * hidden]
        o = acts[:, 3 * hidden :]
        cprev = cprev_ref[k]
        v = v_ref[k, 0][:, None]

        c_new = f * cprev + i * g
        tanh_c = jnp.tanh(c_new)
        dh_new = v * (dh + dhout_ref[k])
        do = dh_new * tanh_c
        dc_new = dh_new * o * (1.0 - tanh_c * tanh_c) + v * dc

        dgi = dc_new * g * i * (1.0 - i)
        dgf = dc_new * cprev * f * (1.0 - f)
        dgg = dc_new * i * (1.0 - g * g)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)
        dgx_ref[k] = dgates

        dh = (1.0 - v) * dh + jnp.dot(
            dgates.astype(compute_dtype), wt,
            preferred_element_type=jnp.float32,
        )
        dc = (1.0 - v) * dc + dc_new * f
    dh_s[:] = dh
    dc_s[:] = dc


def _fwd_kernel_bidir(gx_ref, w_ref, v_ref, hout_ref, hprev_ref, cprev_ref,
                      acts_ref, h_s, c_s, *, compute_dtype, block_t, b):
    """Direction-batched forward: rows [0:b] = forward direction, rows
    [b:2b] = backward direction on time-flipped inputs, each with its own
    recurrent weights (w_ref[0]/w_ref[1]).

    Why: the per-direction kernels run SEQUENTIALLY on the single TPU
    compute stream, so a BiLSTM layer pays a 2T-step serial chain; fusing
    both directions into one grid makes it T steps of two independent
    half-row matmuls that pipeline within each step."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    h = h_s[:]
    c = c_s[:]
    hidden = h.shape[-1]
    w1 = w_ref[0].astype(compute_dtype)
    w2 = w_ref[1].astype(compute_dtype)
    for k in range(block_t):
        g1 = jnp.dot(h[:b].astype(compute_dtype), w1,
                     preferred_element_type=jnp.float32)
        g2 = jnp.dot(h[b:].astype(compute_dtype), w2,
                     preferred_element_type=jnp.float32)
        gates = gx_ref[k] + jnp.concatenate([g1, g2], axis=0)
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)

        v = v_ref[k, 0][:, None]
        hprev_ref[k] = h
        cprev_ref[k] = c
        acts_ref[k] = jnp.concatenate([i, f, g, o], axis=-1)

        h = v * h_new + (1.0 - v) * h
        c = v * c_new + (1.0 - v) * c
        hout_ref[k] = v * h_new
    h_s[:] = h
    c_s[:] = c


def _bwd_kernel_bidir(w_ref, v_ref, acts_ref, cprev_ref, dhout_ref,
                      dgx_ref, dh_s, dc_s, *, compute_dtype, block_t, b):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    dh = dh_s[:]
    dc = dc_s[:]
    hidden = dh.shape[-1]
    w1t = w_ref[0].T.astype(compute_dtype)
    w2t = w_ref[1].T.astype(compute_dtype)
    for k in reversed(range(block_t)):
        acts = acts_ref[k]
        i = acts[:, :hidden]
        f = acts[:, hidden : 2 * hidden]
        g = acts[:, 2 * hidden : 3 * hidden]
        o = acts[:, 3 * hidden :]
        cprev = cprev_ref[k]
        v = v_ref[k, 0][:, None]

        c_new = f * cprev + i * g
        tanh_c = jnp.tanh(c_new)
        dh_new = v * (dh + dhout_ref[k])
        do = dh_new * tanh_c
        dc_new = dh_new * o * (1.0 - tanh_c * tanh_c) + v * dc

        dgi = dc_new * g * i * (1.0 - i)
        dgf = dc_new * cprev * f * (1.0 - f)
        dgg = dc_new * i * (1.0 - g * g)
        dgo = do * o * (1.0 - o)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)
        dgx_ref[k] = dgates

        d1 = jnp.dot(dgates[:b].astype(compute_dtype), w1t,
                     preferred_element_type=jnp.float32)
        d2 = jnp.dot(dgates[b:].astype(compute_dtype), w2t,
                     preferred_element_type=jnp.float32)
        dh = (1.0 - v) * dh + jnp.concatenate([d1, d2], axis=0)
        dc = (1.0 - v) * dc + dc_new * f
    dh_s[:] = dh
    dc_s[:] = dc


def _supported(b: int, hidden: int) -> bool:
    return b % 8 == 0 and hidden % 128 == 0


def _pad_t(x, block_t):
    """Pad the leading (time) axis to a multiple of block_t with zeros —
    zero `valid` makes padded steps exact pass-throughs."""
    t = x.shape[0]
    pad = (-t) % block_t
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _fwd_call(gates_x, w_hh, valid, compute_dtype, block_t):
    t = gates_x.shape[0]
    gates_x = _pad_t(gates_x, block_t)
    valid = _pad_t(valid, block_t)
    tp, b, h4 = gates_x.shape
    hidden = h4 // 4
    kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype,
                               block_t=block_t)
    k = block_t
    grid = (tp // k,)
    in_specs = [
            pl.BlockSpec((k, b, h4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((k, b, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b, h4), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    shapes = [
        jax.ShapeDtypeStruct((tp, b, hidden), jnp.float32),  # h_out
        jax.ShapeDtypeStruct((tp, b, hidden), jnp.float32),  # hprev
        jax.ShapeDtypeStruct((tp, b, hidden), jnp.float32),  # cprev
        jax.ShapeDtypeStruct((tp, b, h4), jnp.float32),      # acts
    ]
    h_out, hprev, cprev, acts = pl.pallas_call(
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
    return h_out[:t], hprev[:t], cprev[:t], acts[:t]


def _bwd_call(w_hh, valid, acts, cprev, dhout, compute_dtype, block_t):
    t = acts.shape[0]
    valid = _pad_t(valid, block_t)
    acts = _pad_t(acts, block_t)
    cprev = _pad_t(cprev, block_t)
    dhout = _pad_t(dhout, block_t)
    tp, b, h4 = acts.shape
    hidden = h4 // 4
    kernel = functools.partial(_bwd_kernel, compute_dtype=compute_dtype,
                               block_t=block_t)
    k = block_t
    nb = tp // k
    rev = lambda i: (nb - 1 - i, 0, 0)  # noqa: E731  (block units)
    in_specs = [
        pl.BlockSpec((hidden, h4), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, 1, b), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b, h4), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b, hidden), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b, hidden), rev, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((k, b, h4), rev, memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((tp, b, h4), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((b, hidden), jnp.float32),
            pltpu.VMEM((b, hidden), jnp.float32),
        ],
        interpret=_interpret(),
    )(w_hh, valid[:, None, :], acts, cprev, dhout)[0]
    return out[:t]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fallback(b: int, hidden: int, allow_interpret: bool) -> bool:
    """True -> use the XLA scan instead of the kernel."""
    return not _supported(b, hidden) or (
        _interpret() and not (allow_interpret or KM.interpret_forced())
    )


def _shard_map_batch(body, mesh, axis, *args):
    """Run ``body`` per data-shard: batch (axis 0 of every array arg)
    split over ``axis``, params pytree replicated.  See ops/kernel_mesh.py
    for why pallas_call needs this under a GSPMD mesh."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    specs = tuple(P() if isinstance(a, dict) else P(axis) for a in args)
    return shard_map(
        body, mesh=mesh, in_specs=specs, out_specs=P(axis),
        check_vma=False,
    )(*args)


def _fwd_call_bidir(gates_x, w_hh2, valid, compute_dtype, block_t):
    """gates_x [T, 2B, 4H] (rows split fwd/bwd), w_hh2 [2, H, 4H]."""
    t = gates_x.shape[0]
    gates_x = _pad_t(gates_x, block_t)
    valid = _pad_t(valid, block_t)
    tp, b2, h4 = gates_x.shape
    b = b2 // 2
    hidden = h4 // 4
    kernel = functools.partial(_fwd_kernel_bidir,
                               compute_dtype=compute_dtype,
                               block_t=block_t, b=b)
    k = block_t
    in_specs = [
        pl.BlockSpec((k, b2, h4), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, hidden, h4), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, 1, b2), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((k, b2, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b2, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b2, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b2, h4), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    shapes = [
        jax.ShapeDtypeStruct((tp, b2, hidden), jnp.float32),
        jax.ShapeDtypeStruct((tp, b2, hidden), jnp.float32),
        jax.ShapeDtypeStruct((tp, b2, hidden), jnp.float32),
        jax.ShapeDtypeStruct((tp, b2, h4), jnp.float32),
    ]
    h_out, hprev, cprev, acts = pl.pallas_call(
        kernel,
        grid=(tp // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=shapes,
        scratch_shapes=[
            pltpu.VMEM((b2, hidden), jnp.float32),
            pltpu.VMEM((b2, hidden), jnp.float32),
        ],
        interpret=_interpret(),
    )(gates_x, w_hh2, valid[:, None, :])
    return h_out[:t], hprev[:t], cprev[:t], acts[:t]


def _bwd_call_bidir(w_hh2, valid, acts, cprev, dhout, compute_dtype,
                    block_t):
    t = acts.shape[0]
    valid = _pad_t(valid, block_t)
    acts = _pad_t(acts, block_t)
    cprev = _pad_t(cprev, block_t)
    dhout = _pad_t(dhout, block_t)
    tp, b2, h4 = acts.shape
    b = b2 // 2
    hidden = h4 // 4
    kernel = functools.partial(_bwd_kernel_bidir,
                               compute_dtype=compute_dtype,
                               block_t=block_t, b=b)
    k = block_t
    nb = tp // k
    rev = lambda i: (nb - 1 - i, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((2, hidden, h4), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, 1, b2), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b2, h4), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b2, hidden), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((k, b2, hidden), rev, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((k, b2, h4), rev, memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((tp, b2, h4), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((b2, hidden), jnp.float32),
            pltpu.VMEM((b2, hidden), jnp.float32),
        ],
        interpret=_interpret(),
    )(w_hh2, valid[:, None, :], acts, cprev, dhout)[0]
    return out[:t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_scan_pallas_bidir(gates_x, w_hh2, valid, compute_dtype=jnp.float32,
                           block_t=1):
    """Direction-batched scan: [T, 2B, 4H] stacked fwd/bwd gates (bwd half
    time-flipped by the caller), [2, H, 4H] weights, [T, 2B] valid ->
    [T, 2B, H] hidden states (bwd half still time-flipped)."""
    h_out, _, _, _ = _fwd_call_bidir(gates_x, w_hh2, valid, compute_dtype,
                                     block_t)
    return h_out


def _vjp_fwd_bidir(gates_x, w_hh2, valid, compute_dtype, block_t):
    h_out, hprev, cprev, acts = _fwd_call_bidir(
        gates_x, w_hh2, valid, compute_dtype, block_t
    )
    return h_out, (w_hh2, valid, acts, cprev, hprev)


def _vjp_bwd_bidir(compute_dtype, block_t, res, dhout):
    w_hh2, valid, acts, cprev, hprev = res
    dgates = _bwd_call_bidir(w_hh2, valid, acts, cprev, dhout,
                             compute_dtype, block_t)
    b = hprev.shape[1] // 2
    dw = jnp.stack([
        jnp.einsum("tbh,tbg->hg", hprev[:, :b], dgates[:, :b],
                   preferred_element_type=jnp.float32),
        jnp.einsum("tbh,tbg->hg", hprev[:, b:], dgates[:, b:],
                   preferred_element_type=jnp.float32),
    ])
    return dgates, dw, jnp.zeros_like(valid)


lstm_scan_pallas_bidir.defvjp(_vjp_fwd_bidir, _vjp_bwd_bidir)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_scan_pallas(gates_x, w_hh, valid, compute_dtype=jnp.float32,
                     block_t=1):
    """[T, B, 4H] pre-projected gates + [H, 4H] w_hh + [T, B] float valid
    -> masked hidden sequence [T, B, H] (time-major).

    ``block_t``: timesteps per grid step (statically unrolled in-kernel);
    T is zero-padded to a multiple (padded steps are exact pass-throughs).
    """
    h_out, _, _, _ = _fwd_call(gates_x, w_hh, valid, compute_dtype, block_t)
    return h_out


def _vjp_fwd(gates_x, w_hh, valid, compute_dtype, block_t):
    h_out, hprev, cprev, acts = _fwd_call(
        gates_x, w_hh, valid, compute_dtype, block_t
    )
    return h_out, (w_hh, valid, acts, cprev, hprev)


def _vjp_bwd(compute_dtype, block_t, res, dhout):
    w_hh, valid, acts, cprev, hprev = res
    dgates = _bwd_call(w_hh, valid, acts, cprev, dhout, compute_dtype,
                       block_t)
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
    block_t: int = 1,
) -> jax.Array:
    """Drop-in for ops.recurrent.lstm backed by the Pallas scan kernel.

    Falls back to the XLA scan when shapes miss the tiling constraints
    (B % 8, H % 128) or when not on TPU (interpret mode is orders of
    magnitude slower than the XLA scan — parity tests opt in with
    ``allow_interpret=True`` or SSASR_PALLAS_INTERPRET=1).

    Under an active ``kernel_mesh`` (data-parallel train/decode jit) the
    whole op runs inside ``shard_map`` over the batch axis so each device
    invokes the kernel on its own shard — tiling constraints apply to the
    PER-SHARD batch.
    """
    from semi_supervised_asr_tpu.ops import recurrent as R

    ctx = KM.active()
    if ctx is not None:
        mesh, axis = ctx
        if lengths is None:
            lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)

        def body(p, xx, ll):
            with KM.kernel_mesh(None):
                return lstm_pallas(p, xx, ll, reverse, compute_dtype,
                                   allow_interpret, block_t)

        return _shard_map_batch(body, mesh, axis, params, x, lengths)

    b, t, _ = x.shape
    hidden = params["w_hh"].shape[0]
    if _fallback(b, hidden, allow_interpret):
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
    ys = lstm_scan_pallas(gates_x, params["w_hh"], valid, compute_dtype,
                          max(int(block_t), 1))
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return ys.transpose(1, 0, 2)


def bilstm_pallas(
    params: dict,
    x: jax.Array,
    lengths: jax.Array | None = None,
    compute_dtype=jnp.float32,
    allow_interpret: bool = False,
    block_t: int = 1,
    fuse_directions: bool = False,
) -> jax.Array:
    """BiLSTM via the Pallas scan.

    ``fuse_directions``: run both directions in ONE kernel (rows stacked,
    per-direction weights) — the per-direction kernels otherwise serialize
    on the single TPU compute stream, costing a 2T serial chain per layer
    instead of T.  Exact same results either way (parity-tested).

    Under an active ``kernel_mesh``, wraps itself in ``shard_map`` over
    the batch axis BEFORE the direction stacking, so the fused variant's
    fwd/bwd row split stays per-shard-correct (sharding the stacked 2B
    rows globally would hand some devices only one direction's rows).
    """
    ctx = KM.active()
    if ctx is not None:
        mesh, axis = ctx
        if lengths is None:
            lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)

        def body(p, xx, ll):
            with KM.kernel_mesh(None):
                return bilstm_pallas(p, xx, ll, compute_dtype,
                                     allow_interpret, block_t,
                                     fuse_directions)

        return _shard_map_batch(body, mesh, axis, params, x, lengths)

    if not fuse_directions:
        fwd = lstm_pallas(params["fwd"], x, lengths, False, compute_dtype,
                          allow_interpret, block_t)
        bwd = lstm_pallas(params["bwd"], x, lengths, True, compute_dtype,
                          allow_interpret, block_t)
        return jnp.concatenate([fwd, bwd], axis=-1)

    from semi_supervised_asr_tpu.ops import recurrent as R

    b, t, _ = x.shape
    hidden = params["fwd"]["w_hh"].shape[0]
    if _fallback(b, hidden, allow_interpret):
        return R.bilstm(params, x, lengths, compute_dtype)

    def gx(p):
        return (
            jnp.einsum(
                "bti,ih->bth", x.astype(compute_dtype),
                p["w_ih"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + p["b"].astype(jnp.float32)
        ).transpose(1, 0, 2)                       # [T, B, 4H]

    if lengths is None:
        valid = jnp.ones((t, b), jnp.float32)
    else:
        valid = (
            jnp.arange(t)[:, None] < lengths[None, :]
        ).astype(jnp.float32)
    gx_f = gx(params["fwd"])
    gx_b = jnp.flip(gx(params["bwd"]), axis=0)
    gates = jnp.concatenate([gx_f, gx_b], axis=1)  # [T, 2B, 4H]
    valid2 = jnp.concatenate([valid, jnp.flip(valid, axis=0)], axis=1)
    w2 = jnp.stack([params["fwd"]["w_hh"], params["bwd"]["w_hh"]])
    ys = lstm_scan_pallas_bidir(gates, w2, valid2, compute_dtype,
                                max(int(block_t), 1))
    fwd = ys[:, :b].transpose(1, 0, 2)
    bwd = jnp.flip(ys[:, b:], axis=0).transpose(1, 0, 2)
    return jnp.concatenate([fwd, bwd], axis=-1)
