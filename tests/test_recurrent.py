"""LSTM scan parity vs torch.nn.LSTM (the installed CPU torch is the oracle,
SURVEY.md §5.2: "LSTM cell/scan vs torch 2.13-cpu nn.LSTM (same weights)").
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semi_supervised_asr_tpu.ops import recurrent as R


def torch_lstm_ref(params, x, reverse=False):
    """Run torch.nn.LSTM with our packed weights; returns [B,T,H] numpy."""
    i_dim, h4 = params["w_ih"].shape
    hidden = h4 // 4
    m = torch.nn.LSTM(i_dim, hidden, batch_first=True, bidirectional=False)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["w_ih"]).T))
        m.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["w_hh"]).T))
        m.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["b"])))
        m.bias_hh_l0.zero_()
        xt = torch.from_numpy(np.asarray(x))
        if reverse:
            xt = torch.flip(xt, dims=[1])
        out, _ = m(xt)
        if reverse:
            out = torch.flip(out, dims=[1])
    return out.numpy()


def make(key, b=3, t=7, i=5, h=4):
    kp, kx = jax.random.split(jax.random.PRNGKey(key))
    params = R.lstm_init(kp, i, h)
    x = jax.random.normal(kx, (b, t, i), jnp.float32)
    return params, x


class TestLSTMParity:
    def test_forward_matches_torch(self):
        params, x = make(0)
        got = np.asarray(R.lstm(params, x))
        ref = torch_lstm_ref(params, x)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_reverse_matches_torch(self):
        params, x = make(1)
        got = np.asarray(R.lstm(params, x, reverse=True))
        ref = torch_lstm_ref(params, x, reverse=True)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_variable_length_forward(self):
        params, x = make(2, b=3, t=10)
        lens = jnp.array([10, 6, 3])
        got = np.asarray(R.lstm(params, x, lengths=lens))
        # each row equals running the LSTM on the truncated sequence
        for b, L in enumerate([10, 6, 3]):
            ref = torch_lstm_ref(params, np.asarray(x[b : b + 1, :L]))
            np.testing.assert_allclose(got[b, :L], ref[0], rtol=1e-5, atol=1e-6)
            assert np.all(got[b, L:] == 0.0)

    def test_variable_length_reverse(self):
        params, x = make(3, b=2, t=8)
        lens = jnp.array([8, 5])
        got = np.asarray(R.lstm(params, x, lengths=lens, reverse=True))
        for b, L in enumerate([8, 5]):
            ref = torch_lstm_ref(params, np.asarray(x[b : b + 1, :L]), reverse=True)
            np.testing.assert_allclose(got[b, :L], ref[0], rtol=1e-5, atol=1e-6)
            assert np.all(got[b, L:] == 0.0)

    def test_bilstm_matches_torch_bidirectional(self):
        kp, kx = jax.random.split(jax.random.PRNGKey(4))
        i, h, b, t = 6, 5, 2, 9
        params = R.bilstm_init(kp, i, h)
        x = jax.random.normal(kx, (b, t, i), jnp.float32)
        got = np.asarray(R.bilstm(params, x))
        m = torch.nn.LSTM(i, h, batch_first=True, bidirectional=True)
        with torch.no_grad():
            m.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["fwd"]["w_ih"]).T))
            m.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["fwd"]["w_hh"]).T))
            m.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["fwd"]["b"])))
            m.bias_hh_l0.zero_()
            m.weight_ih_l0_reverse.copy_(
                torch.from_numpy(np.asarray(params["bwd"]["w_ih"]).T)
            )
            m.weight_hh_l0_reverse.copy_(
                torch.from_numpy(np.asarray(params["bwd"]["w_hh"]).T)
            )
            m.bias_ih_l0_reverse.copy_(torch.from_numpy(np.asarray(params["bwd"]["b"])))
            m.bias_hh_l0_reverse.zero_()
            ref = m(torch.from_numpy(np.asarray(x)))[0].numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_fused_bilstm_matches_two_scan(self):
        kp, kx = jax.random.split(jax.random.PRNGKey(6))
        params = R.bilstm_init(kp, 5, 4)
        x = jax.random.normal(kx, (3, 9, 5), jnp.float32)
        lens = jnp.array([9, 6, 2])
        a = np.asarray(R.bilstm(params, x, lens, fused=False))
        b = np.asarray(R.bilstm(params, x, lens, fused=True))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_grad_flows(self):
        params, x = make(5)

        def loss(p):
            return jnp.sum(R.lstm(p, x) ** 2)

        g = jax.grad(loss)(params)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))
        assert any(np.any(np.asarray(v) != 0) for v in jax.tree.leaves(g))


class TestPyramid:
    def test_fold_shapes_and_values(self):
        x = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
        folded, lens = R.pyramid_fold(x, jnp.array([6, 3]))
        assert folded.shape == (2, 3, 6)
        np.testing.assert_array_equal(
            np.asarray(folded[0, 0]), np.asarray(x[0, :2].reshape(-1))
        )
        np.testing.assert_array_equal(np.asarray(lens), [3, 2])

    def test_fold_requires_even(self):
        import pytest

        with pytest.raises(AssertionError):
            R.pyramid_fold(jnp.zeros((1, 5, 2)), None)
