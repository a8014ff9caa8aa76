"""Transducer loss (objectives/transducer_loss.py) vs a numpy oracle.

The oracle is the textbook [T, U+1] log-space DP with explicit Python
loops (Graves 2012 eq. alpha recursion) — slow, obviously correct.  The
jit anti-diagonal scan must match it to fp32 tolerance on random
lattices, variable lengths, degenerate shapes (U=0, T=1), and its
gradient must match finite differences.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.objectives.transducer_loss import (
    transducer_loss,
)

# quick marks are per-class: oracle-parity/semantics cores stay in the
# quick gate; the multi-minute fused-step suites are full-suite only
# (pytest.ini).


def oracle_nll(logits, t_len, labels, u_len, blank=0):
    """-log P(labels | enc) for ONE utterance, explicit-loop DP."""
    lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(logits, jnp.float64), -1)
    )
    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            terms = []
            if t > 0:
                terms.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                terms.append(alpha[t, u - 1] + lp[t, u - 1, labels[u - 1]])
            if terms and not (t == 0 and u == 0):
                alpha[t, u] = np.logaddexp.reduce(terms)
    return -(alpha[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])


def _random_case(rng, b=3, t=6, u=4, v=7):
    logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32) * 2.0
    enc_lens = rng.integers(1, t + 1, b).astype(np.int32)
    enc_lens[0] = t
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    label_lens = rng.integers(0, u + 1, b).astype(np.int32)
    label_lens[0] = u
    return logits, enc_lens, labels, label_lens


@pytest.mark.quick
class TestOracleParity:
    def test_matches_oracle_random(self):
        rng = np.random.default_rng(0)
        logits, enc_lens, labels, label_lens = _random_case(rng)
        mean, nll = jax.jit(transducer_loss)(
            jnp.asarray(logits), jnp.asarray(enc_lens),
            jnp.asarray(labels), jnp.asarray(label_lens),
        )
        for i in range(len(enc_lens)):
            want = oracle_nll(
                logits[i], int(enc_lens[i]), labels[i], int(label_lens[i])
            )
            np.testing.assert_allclose(
                float(nll[i]), want, rtol=1e-5, atol=1e-5
            )
        np.testing.assert_allclose(
            float(mean), float(np.asarray(nll).mean()), rtol=1e-6
        )

    def test_degenerate_shapes(self):
        """U_b=0 (blank-only path) and T_b=1 (all emits at one frame)."""
        rng = np.random.default_rng(1)
        b, t, u, v = 2, 5, 3, 6
        logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
        enc_lens = np.array([t, 1], np.int32)
        labels = rng.integers(1, v, (b, u)).astype(np.int32)
        label_lens = np.array([0, u], np.int32)
        _, nll = transducer_loss(
            jnp.asarray(logits), jnp.asarray(enc_lens),
            jnp.asarray(labels), jnp.asarray(label_lens),
        )
        for i in range(b):
            want = oracle_nll(
                logits[i], int(enc_lens[i]), labels[i], int(label_lens[i])
            )
            np.testing.assert_allclose(
                float(nll[i]), want, rtol=1e-5, atol=1e-5
            )

    def test_real_mask_zero_weight(self):
        rng = np.random.default_rng(2)
        logits, enc_lens, labels, label_lens = _random_case(rng)
        real = np.array([True, True, False])
        mean, nll = transducer_loss(
            jnp.asarray(logits), jnp.asarray(enc_lens),
            jnp.asarray(labels), jnp.asarray(label_lens),
            real=jnp.asarray(real),
        )
        np.testing.assert_allclose(
            float(mean), float(np.asarray(nll)[:2].mean()), rtol=1e-6
        )

    def test_padding_does_not_leak(self):
        """Growing the T/U padding must not change any real row's nll."""
        rng = np.random.default_rng(3)
        logits, enc_lens, labels, label_lens = _random_case(rng)
        _, nll1 = transducer_loss(
            jnp.asarray(logits), jnp.asarray(enc_lens),
            jnp.asarray(labels), jnp.asarray(label_lens),
        )
        b, t, u1, v = logits.shape
        big = np.concatenate(
            [logits,
             rng.standard_normal((b, 4, u1, v)).astype(np.float32)], axis=1
        )
        big = np.concatenate(
            [big, rng.standard_normal((b, t + 4, 2, v)).astype(np.float32)],
            axis=2,
        )
        labels_big = np.concatenate(
            [labels, rng.integers(1, v, (b, 2)).astype(np.int32)], axis=1
        )
        _, nll2 = transducer_loss(
            jnp.asarray(big), jnp.asarray(enc_lens),
            jnp.asarray(labels_big), jnp.asarray(label_lens),
        )
        np.testing.assert_allclose(
            np.asarray(nll1), np.asarray(nll2), rtol=1e-5, atol=1e-5
        )


@pytest.mark.quick
class TestGradient:
    def test_finite_difference(self):
        rng = np.random.default_rng(4)
        logits, enc_lens, labels, label_lens = _random_case(
            rng, b=2, t=4, u=3, v=5
        )

        def f(x):
            return transducer_loss(
                x, jnp.asarray(enc_lens), jnp.asarray(labels),
                jnp.asarray(label_lens),
            )[0]

        g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
        eps = 1e-3
        # spot-check 20 random coordinates with central differences
        idx = [tuple(rng.integers(0, s) for s in logits.shape)
               for _ in range(20)]
        for ix in idx:
            xp = logits.copy(); xp[ix] += eps
            xm = logits.copy(); xm[ix] -= eps
            fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) \
                / (2 * eps)
            np.testing.assert_allclose(g[ix], fd, rtol=2e-2, atol=2e-3)

    def test_grad_zero_on_padding(self):
        """d(loss)/d(logits) must be exactly zero beyond (T_b, U_b)."""
        rng = np.random.default_rng(5)
        logits, enc_lens, labels, label_lens = _random_case(rng)

        def f(x):
            return transducer_loss(
                x, jnp.asarray(enc_lens), jnp.asarray(labels),
                jnp.asarray(label_lens),
            )[0]

        g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
        for i in range(len(enc_lens)):
            tb, ub = int(enc_lens[i]), int(label_lens[i])
            if tb < g.shape[1]:
                assert np.abs(g[i, tb:]).max() == 0.0
            if ub + 1 < g.shape[2]:
                assert np.abs(g[i, :, ub + 1:]).max() == 0.0


class TestChunkedLatticeTerms:
    """models/transducer.joint_lattice_terms: the chunked large-vocab
    path must equal the full-grid path — loss values AND gradients wrt
    enc/pred/joint params — for dividing and non-dividing chunk sizes."""

    def _setup(self, seed=0, b=2, t=7, u=4):
        from semi_supervised_asr_tpu.config import ModelConfig
        from semi_supervised_asr_tpu.models import seq2seq as M

        cfg = ModelConfig(
            n_mels=20, vocab_size=12, family="transducer",
            enc_hidden=8, enc_layers=1, pred_hidden=8, pred_layers=1,
            joint_dim=8, embed_dim=8, attn_dim=8, attn_conv_channels=2,
            attn_conv_width=5, dec_hidden=8, compute_dtype="float32",
        )
        params = M.init_model(jax.random.PRNGKey(seed), cfg)
        rng = np.random.default_rng(seed)
        enc = jnp.asarray(
            rng.standard_normal((b, t, cfg.enc_out_dim)), jnp.float32
        )
        pred = jnp.asarray(
            rng.standard_normal((b, u + 1, cfg.pred_hidden)), jnp.float32
        )
        labels = jnp.asarray(
            rng.integers(1, cfg.vocab_size, (b, u)), jnp.int32
        )
        enc_lens = jnp.asarray([t, t - 3], jnp.int32)
        label_lens = jnp.asarray([u, u - 2], jnp.int32)
        return cfg, params, enc, pred, labels, enc_lens, label_lens

    @pytest.mark.parametrize("chunk", [1, 3, 7, 16])
    def test_matches_full_grid(self, chunk):
        from semi_supervised_asr_tpu.models import transducer as TD
        from semi_supervised_asr_tpu.objectives.transducer_loss import (
            transducer_loss_from_parts,
        )

        (cfg, params, enc, pred, labels, enc_lens,
         label_lens) = self._setup()

        def full(j, enc, pred):
            logits = TD.joint_logits(j, enc, pred, cfg)
            return transducer_loss(
                logits, enc_lens, labels, label_lens
            )[0]

        def chunked(j, enc, pred):
            bl, em = TD.joint_lattice_terms(
                j, enc, pred, labels, cfg, chunk_frames=chunk
            )
            return transducer_loss_from_parts(
                bl, em, enc_lens, label_lens
            )[0]

        j = params["joint"]
        v1, g1 = jax.value_and_grad(full, argnums=(0, 1, 2))(j, enc, pred)
        v2, g2 = jax.value_and_grad(chunked, argnums=(0, 1, 2))(
            j, enc, pred
        )
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )

    def test_fused_step_parity(self):
        """model.joint_chunk_frames=4 produces the same first-step loss
        and updated params as the full-grid step."""
        import dataclasses as dc

        from semi_supervised_asr_tpu.config import (
            Config, FrontendConfig, ModelConfig, ObjectiveConfig,
            TrainConfig,
        )
        from semi_supervised_asr_tpu.training import train_step as TS

        mcfg = ModelConfig(
            n_mels=80, vocab_size=16, family="transducer",
            enc_hidden=16, enc_layers=2, enc_base_layers=1,
            pred_hidden=16, pred_layers=1, joint_dim=16, embed_dim=8,
            attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
            dec_hidden=8, compute_dtype="float32",
        )
        cfg = Config(
            frontend=FrontendConfig(spec_augment=False, cmvn="global"),
            model=mcfg, objective=ObjectiveConfig(),
            train=TrainConfig(learning_rate=3e-3, grad_clip_norm=5.0,
                              batch_size=2),
        )
        rng = np.random.default_rng(0)
        audio = rng.standard_normal((2, 3040)).astype(np.float32) * 0.1
        alens = np.full((2,), 3040, np.int32)
        tokens = np.zeros((2, 6), np.int32)
        tokens[:, :5] = rng.integers(4, 16, (2, 5))
        tokens[:, 5] = 2
        real = np.ones((2,), bool)
        cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))

        outs = []
        for chunk in (0, 4):
            c = cfg.replace(model=dc.replace(
                mcfg, joint_chunk_frames=chunk
            ))
            state = TS.init_train_state(c, jax.random.PRNGKey(0))
            state, m = TS.make_train_step(c)(
                state, audio, alens, tokens, real, *cmvn
            )
            outs.append((float(m["loss"]), state.params))
        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
        for a, b_ in zip(jax.tree.leaves(outs[0][1]),
                         jax.tree.leaves(outs[1][1])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )
