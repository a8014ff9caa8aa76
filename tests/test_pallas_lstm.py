"""Pallas LSTM scan kernel parity: forward AND gradients vs the XLA scan
(interpret mode on CPU; the compiled path is exercised on TPU by bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.ops import pallas_lstm as PL
from semi_supervised_asr_tpu.ops import recurrent as R

B, T, I, H = 8, 12, 16, 128  # meets tiling constraints (B%8, H%128)


def make(seed=0):
    kp, kx = jax.random.split(jax.random.PRNGKey(seed))
    params = R.lstm_init(kp, I, H)
    x = jax.random.normal(kx, (B, T, I), jnp.float32)
    lens = jnp.asarray([T, T - 3, T - 5, 2, T, T - 1, 4, T], jnp.int32)
    return params, x, lens


class TestForwardParity:
    def test_full_length(self):
        params, x, _ = make()
        a = np.asarray(R.lstm(params, x))
        b = np.asarray(PL.lstm_pallas(params, x, allow_interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_variable_length(self):
        params, x, lens = make(1)
        a = np.asarray(R.lstm(params, x, lens))
        b = np.asarray(PL.lstm_pallas(params, x, lens, allow_interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_reverse(self):
        params, x, lens = make(2)
        a = np.asarray(R.lstm(params, x, lens, reverse=True))
        b = np.asarray(PL.lstm_pallas(params, x, lens, reverse=True, allow_interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_bilstm(self):
        kp, kx = jax.random.split(jax.random.PRNGKey(3))
        params = R.bilstm_init(kp, I, H)
        x = jax.random.normal(kx, (B, T, I), jnp.float32)
        lens = jnp.asarray([T, 5, 9, 2, T, 7, 4, T], jnp.int32)
        a = np.asarray(R.bilstm(params, x, lens))
        b = np.asarray(PL.bilstm_pallas(params, x, lens, allow_interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_fallback_small_shapes(self):
        kp, kx = jax.random.split(jax.random.PRNGKey(4))
        params = R.lstm_init(kp, 5, 12)  # H=12 not tileable -> XLA fallback
        x = jax.random.normal(kx, (3, 7, 5), jnp.float32)
        a = np.asarray(R.lstm(params, x))
        b = np.asarray(PL.lstm_pallas(params, x, allow_interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestGradParity:
    def _grads(self, fn, params, x, lens):
        def loss(p, xx):
            y = fn(p, xx, lens)
            # weighted sum exercises all positions
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
            return jnp.sum(y * jnp.sin(w * 0.01))

        g = jax.grad(loss, argnums=(0, 1))(params, x)
        return jax.tree.leaves(g[0]) + [g[1]]

    def test_grads_match_xla(self):
        params, x, lens = make(5)
        ga = self._grads(R.lstm, params, x, lens)
        gb = self._grads(
            lambda p, xx, l: PL.lstm_pallas(p, xx, l, allow_interpret=True),
            params, x, lens,
        )
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            )

    def test_grads_match_reverse(self):
        params, x, lens = make(6)

        def fn_r(fn):
            return lambda p, xx, l: fn(p, xx, l, reverse=True)

        def fn_rp(fn):
            return lambda p, xx, l: fn(p, xx, l, reverse=True,
                                       allow_interpret=True)

        ga = self._grads(fn_r(R.lstm), params, x, lens)
        gb = self._grads(fn_rp(PL.lstm_pallas), params, x, lens)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            )

    def test_grads_full_length(self):
        params, x, _ = make(7)
        lens = None
        ga = self._grads(R.lstm, params, x, lens)
        gb = self._grads(
            lambda p, xx, l: PL.lstm_pallas(p, xx, l, allow_interpret=True),
            params, x, lens,
        )
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            )


class TestTimeBlocking:
    """block_t > 1 unrolls several timesteps per grid step; T is padded to
    a multiple with zero-valid pass-through steps — results must be
    IDENTICAL for every block size."""

    def test_forward_all_block_sizes(self):
        params, x, lens = make(3)
        ref = np.asarray(R.lstm(params, x, lens))
        for bt in (1, 2, 3, 5, 7, 12, 16):
            got = np.asarray(PL.lstm_pallas(
                params, x, lens, allow_interpret=True, block_t=bt))
            np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_grads_with_padding_block(self):
        params, x, lens = make(4)

        def loss(fn):
            def f(p, xx):
                y = fn(p, xx)
                return jnp.sum(y * y)
            return jax.grad(f, argnums=(0, 1))(params, x)

        g_ref = loss(lambda p, xx: R.lstm(p, xx, lens))
        g_blk = loss(lambda p, xx: PL.lstm_pallas(
            p, xx, lens, allow_interpret=True, block_t=5))  # 12 -> pad 15
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_blk)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


class TestFusedDirections:
    """Direction-batched kernel (fuse_directions): both directions in one
    grid — results must EQUAL the two-kernel path and the XLA oracle."""

    def _bilstm_params(self, seed=0):
        kf, kb = jax.random.split(jax.random.PRNGKey(seed))
        return {"fwd": R.lstm_init(kf, I, H), "bwd": R.lstm_init(kb, I, H)}

    def test_forward_matches_oracle(self):
        params = self._bilstm_params()
        _, x, lens = make(5)
        ref = np.asarray(R.bilstm(params, x, lens))
        for bt in (1, 4, 5):
            got = np.asarray(PL.bilstm_pallas(
                params, x, lens, allow_interpret=True,
                fuse_directions=True, block_t=bt))
            np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_matches_two_kernel_path(self):
        params = self._bilstm_params(1)
        _, x, lens = make(6)
        a = np.asarray(PL.bilstm_pallas(params, x, lens,
                                        allow_interpret=True))
        b = np.asarray(PL.bilstm_pallas(params, x, lens,
                                        allow_interpret=True,
                                        fuse_directions=True))
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)

    def test_grads_match_oracle(self):
        params = self._bilstm_params(2)
        _, x, lens = make(7)

        def loss(fn):
            def f(p, xx):
                y = fn(p, xx)
                return jnp.sum(y * jnp.cos(y))
            return jax.grad(f, argnums=(0, 1))(params, x)

        g_ref = loss(lambda p, xx: R.bilstm(p, xx, lens))
        g_fus = loss(lambda p, xx: PL.bilstm_pallas(
            p, xx, lens, allow_interpret=True, fuse_directions=True,
            block_t=3))
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
