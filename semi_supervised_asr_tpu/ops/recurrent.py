"""TPU-native LSTM primitives: fused-gate scan, BiLSTM, pyramid fold.

The reference's listener/speller run on cuDNN LSTM kernels (SURVEY.md §3 #8).
The TPU equivalent is a ``lax.scan`` whose per-step work is one [B,H]x[H,4H]
matmul: the input projection for ALL timesteps is hoisted out of the scan as
a single [B*T, I]x[I,4H] MXU matmul (the classic TPU RNN trick — the scan
then only carries the recurrent matmul, SURVEY.md §8.3 risk 3).

Conventions (match torch.nn.LSTM so the installed torch-cpu is the parity
oracle, tests/test_recurrent.py):
* gate order i, f, g, o in the packed 4H axis;
* weights stored transposed vs torch: w_ih [I, 4H], w_hh [H, 4H];
* a single bias b [4H] (torch's b_ih + b_hh summed).

Variable lengths: padded steps pass the carry through unchanged and emit
zero outputs, so a reverse-direction scan over a right-padded sequence is
exactly the LSTM over the reversed valid region (SURVEY.md §8.3 risk 1).

Numerics: gate matmuls run in ``compute_dtype`` (bf16 on TPU for MXU rate);
the (h, c) carry stays float32.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def lstm_init(key: jax.Array, in_dim: int, hidden: int, dtype=jnp.float32):
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, the torch.nn.LSTM default."""
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / math.sqrt(hidden)
    u = partial(jax.random.uniform, minval=-bound, maxval=bound, dtype=dtype)
    return {
        "w_ih": u(k1, (in_dim, 4 * hidden)),
        "w_hh": u(k2, (hidden, 4 * hidden)),
        "b": u(k3, (4 * hidden,)),
    }


def lstm_cell_step(
    carry: tuple[jax.Array, jax.Array],
    gates_x: jax.Array,
    w_hh: jax.Array,
    compute_dtype=jnp.float32,
):
    """One LSTM step. carry=(h,c) float32 [B,H]; gates_x=[B,4H] precomputed.

    Returns ((h', c'), h').  Gate math in float32 (VPU work); the recurrent
    matmul in ``compute_dtype``.
    """
    h, c = carry
    hidden = h.shape[-1]
    gates = gates_x + jnp.dot(
        h.astype(compute_dtype),
        w_hh.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    i, f, g, o = (
        gates[..., :hidden],
        gates[..., hidden : 2 * hidden],
        gates[..., 2 * hidden : 3 * hidden],
        gates[..., 3 * hidden :],
    )
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return (h_new, c_new), h_new


def lstm_single_step(
    params: dict,
    x: jax.Array,
    h: jax.Array,
    c: jax.Array,
    compute_dtype=jnp.float32,
    gate_pert: jax.Array | None = None,
):
    """One full LSTM step with input projection (decoder-side cells).

    x [B, I], h/c [B, H] float32 -> (h', c').  Unlike :func:`lstm`, the
    input projection cannot be hoisted because x depends on the previous
    decode step.

    ``gate_pert`` [B, 4H]: additive perturbation on the pre-activation
    gates — the stacked-dW speller backward's injection site (zeros in
    the primal; its cotangent IS d(gates), models/speller.py).
    """
    gates_x = (
        jnp.dot(
            x.astype(compute_dtype),
            params["w_ih"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b"].astype(jnp.float32)
    )
    if gate_pert is not None:
        gates_x = gates_x + gate_pert
    (h2, c2), _ = lstm_cell_step((h, c), gates_x, params["w_hh"], compute_dtype)
    return h2, c2


def lstm(
    params: dict,
    x: jax.Array,
    lengths: jax.Array | None = None,
    reverse: bool = False,
    compute_dtype=jnp.float32,
    h0: jax.Array | None = None,
    c0: jax.Array | None = None,
    unroll: int = 1,
    return_state: bool = False,
) -> jax.Array:
    """Unidirectional LSTM over [B, T, I] -> [B, T, H] (float32 outputs).

    The input projection for all T steps is one batched MXU matmul; the
    scan is time-major and only does the [B,H]x[H,4H] recurrent matmul.
    """
    b, t, _ = x.shape
    hidden = params["w_hh"].shape[0]
    # Hoisted input projection: [B,T,I] @ [I,4H] on the MXU.
    gates_x = (
        jnp.einsum(
            "bti,ih->bth",
            x.astype(compute_dtype),
            params["w_ih"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b"].astype(jnp.float32)
    )
    gates_x = jnp.transpose(gates_x, (1, 0, 2))  # time-major [T,B,4H]

    if lengths is None:
        valid = jnp.ones((t, b), dtype=bool)
    else:
        valid = (jnp.arange(t)[:, None] < lengths[None, :])  # [T,B]

    h = jnp.zeros((b, hidden), jnp.float32) if h0 is None else h0
    c = jnp.zeros((b, hidden), jnp.float32) if c0 is None else c0
    w_hh = params["w_hh"]

    def step(carry, inp):
        gx, v = inp
        new_carry, out = lstm_cell_step(carry, gx, w_hh, compute_dtype)
        v = v[:, None]
        h_keep = jnp.where(v, new_carry[0], carry[0])
        c_keep = jnp.where(v, new_carry[1], carry[1])
        out = jnp.where(v, out, 0.0)
        return (h_keep, c_keep), out

    final, ys = lax.scan(
        step, (h, c), (gates_x, valid), reverse=reverse, unroll=unroll
    )
    ys = jnp.transpose(ys, (1, 0, 2))  # [B, T, H]
    if return_state:
        # final (h, c) — the carry a later chunk resumes from (streaming;
        # invalid steps passed the carry through, so it is the state at
        # each row's last valid frame)
        return ys, final
    return ys


def bilstm_init(key: jax.Array, in_dim: int, hidden: int, dtype=jnp.float32):
    kf, kb = jax.random.split(key)
    return {
        "fwd": lstm_init(kf, in_dim, hidden, dtype),
        "bwd": lstm_init(kb, in_dim, hidden, dtype),
    }


def bilstm(
    params: dict,
    x: jax.Array,
    lengths: jax.Array | None = None,
    compute_dtype=jnp.float32,
    fused: bool = False,
    unroll: int = 1,
) -> jax.Array:
    """Bidirectional LSTM: concat(fwd, bwd) -> [B, T, 2H].

    Two execution strategies, identical semantics (both torch-parity
    tested; with right-padded inputs, invalid steps pass the carry
    through and emit zeros, so the backward direction starts at each
    utterance's last valid frame = torch packed-sequence BiLSTM):

    * ``fused=False`` (default): two independent scans.  Measured FASTER
      at large batch (b128/T400 step 39.6ms vs 43.4ms fused on v5-lite) —
      XLA overlaps the two scans well and the plain [B,H]x[H,4H] matmul
      tiles better than the direction-batched one.
    * ``fused=True``: ONE direction-batched scan (backward input flipped
      and stacked on a leading axis; each step one [2,B,H]x[2,H,4H]
      einsum).  Measured slightly faster at small batch (b32: +2%),
      where the sequential chain is latency-bound.

    Select per config via ``ModelConfig.fuse_bilstm``.
    """
    if not fused:
        fwd = lstm(params["fwd"], x, lengths, False, compute_dtype,
                   unroll=unroll)
        bwd = lstm(params["bwd"], x, lengths, True, compute_dtype,
                   unroll=unroll)
        return jnp.concatenate([fwd, bwd], axis=-1)
    b, t, _ = x.shape
    hidden = params["fwd"]["w_hh"].shape[0]
    xc = x.astype(compute_dtype)

    def proj(p):
        return (
            jnp.einsum(
                "bti,ih->bth", xc, p["w_ih"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + p["b"].astype(jnp.float32)
        ).transpose(1, 0, 2)  # time-major [T,B,4H]

    gx_f = proj(params["fwd"])
    gx_b = jnp.flip(proj(params["bwd"]), axis=0)
    gx = jnp.stack([gx_f, gx_b], axis=1)          # [T, 2, B, 4H]

    if lengths is None:
        valid = jnp.ones((t, 2, b), bool)
    else:
        v = jnp.arange(t)[:, None] < lengths[None, :]   # [T, B]
        valid = jnp.stack([v, jnp.flip(v, axis=0)], axis=1)

    w_hh = jnp.stack(
        [params["fwd"]["w_hh"], params["bwd"]["w_hh"]]
    )  # [2, H, 4H]

    h0 = jnp.zeros((2, b, hidden), jnp.float32)
    c0 = jnp.zeros((2, b, hidden), jnp.float32)

    def step(carry, inp):
        h, c = carry
        gx_t, v_t = inp
        gates = gx_t + jnp.einsum(
            "dbh,dhg->dbg",
            h.astype(compute_dtype),
            w_hh.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        vm = v_t[..., None]
        h_keep = jnp.where(vm, h_new, h)
        c_keep = jnp.where(vm, c_new, c)
        return (h_keep, c_keep), jnp.where(vm, h_new, 0.0)

    _, ys = lax.scan(step, (h0, c0), (gx, valid), unroll=unroll)  # [T,2,B,H]
    fwd = ys[:, 0].transpose(1, 0, 2)               # [B, T, H]
    bwd = jnp.flip(ys[:, 1], axis=0).transpose(1, 0, 2)
    return jnp.concatenate([fwd, bwd], axis=-1)


def pyramid_fold(
    x: jax.Array, lengths: jax.Array | None
) -> tuple[jax.Array, jax.Array | None]:
    """LAS pyramid reduction: concat adjacent frame pairs, halving time.

    [B, T, H] -> [B, T//2, 2H] (T must be even — buckets are chosen
    divisible by 2**enc_layers, SURVEY.md §8.3 risk 1).  New lengths are
    ceil(len/2): an odd tail frame pairs with one zero pad frame.
    """
    b, t, h = x.shape
    assert t % 2 == 0, f"pyramid_fold needs even T, got {t}"
    folded = x.reshape(b, t // 2, 2 * h)
    if lengths is None:
        return folded, None
    return folded, (lengths + 1) // 2
