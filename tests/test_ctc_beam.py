"""CTC prefix beam search (decode/ctc_beam.py): exactness + oracle.

Three layers of evidence:

1. **Brute force**: with K >= the number of reachable prefixes the jit
   beam must return the EXACT argmax labeling under the CTC marginal
   (all alignments pooled) — checked against optax.ctc_loss-scored
   enumeration of every labeling, scores included.
2. **Pure-Python dict oracle** (Hannun et al. 2014) at practical K:
   token-and-score equality of the pruned search, incl. LM fusion.
3. **Semantics**: beam strictly dominates best-path greedy when the
   marginal argmax differs from the best single path (the classic
   two-alignments-one-labeling case).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.decode.ctc_beam import ctc_beam_from_enc

# quick marks are per-class: oracle-parity/semantics cores stay in the
# quick gate; the multi-minute fused-step suites are full-suite only
# (pytest.ini).

PAD, EOS = 0, 2
NEG_INF = -1e30


def _head_identity(v):
    return {"w": jnp.eye(v, dtype=jnp.float32),
            "b": jnp.zeros((v,), jnp.float32)}


def _marginal_nll(logits_row, labels):
    """-log p(labels | logits) via optax (independent DP oracle)."""
    import optax

    t, v = logits_row.shape
    if len(labels) == 0:
        lp = jax.nn.log_softmax(jnp.asarray(logits_row), -1)
        return -float(jnp.sum(lp[:, PAD]))
    lab = np.zeros((1, max(len(labels), 1)), np.int32)
    lab[0, : len(labels)] = labels
    pad = (lab == 0).astype(np.float32)
    nll = optax.ctc_loss(
        jnp.asarray(logits_row)[None], jnp.zeros((1, t), jnp.float32),
        jnp.asarray(lab), jnp.asarray(pad), blank_id=PAD,
    )
    return float(nll[0])


def _strip(row):
    return [int(x) for x in row if x != PAD]


class TestExactness:
    def test_unpruned_beam_is_exact_marginal_decoding(self, rng):
        """K >= #reachable prefixes -> every labeling's beam score is the
        true CTC log-marginal and the best is the true argmax."""
        b, t, v = 2, 4, 4                    # labels {1, 2, 3}
        n_prefixes = 1 + 3 + 9 + 27 + 81     # lengths 0..4
        logits = rng.standard_normal((b, t, v)).astype(np.float32) * 2.0
        mask = jnp.ones((b, t), bool)
        toks, scores = jax.jit(
            ctc_beam_from_enc, static_argnums=(3, 4)
        )(_head_identity(v), jnp.asarray(logits), mask, t,
          beam_size=n_prefixes)

        import itertools

        for i in range(b):
            cands = [[]]
            for ln in range(1, t + 1):
                cands += [list(c) for c in
                          itertools.product([1, 2, 3], repeat=ln)]
            best, best_lp = None, -np.inf
            for c in cands:
                lp = -_marginal_nll(logits[i], c)
                if lp > best_lp:
                    best, best_lp = c, lp
            assert _strip(toks[i]) == best, (i, _strip(toks[i]), best)
            np.testing.assert_allclose(float(scores[i]), best_lp,
                                       rtol=1e-4, atol=1e-4)

    def test_nbest_scores_match_marginals(self, rng):
        """Every returned hypothesis's score IS its labeling's marginal."""
        b, t, v = 1, 4, 4
        logits = rng.standard_normal((b, t, v)).astype(np.float32) * 2.0
        mask = jnp.ones((b, t), bool)
        toks, scores = ctc_beam_from_enc(
            _head_identity(v), jnp.asarray(logits), mask, t,
            beam_size=121, return_nbest=True,
        )
        for j in range(10):                  # top 10 suffice
            lab = _strip(toks[0, j])
            np.testing.assert_allclose(
                float(scores[0, j]), -_marginal_nll(logits[0], lab),
                rtol=1e-4, atol=1e-4,
            )

    def test_marginal_beats_best_path(self):
        """The textbook case: two alignments of one labeling outweigh the
        single best path — greedy picks the path, the beam the marginal."""
        # frame probs: p(a)=0.4, p(blank)=0.6 per frame, 2 frames.
        # best path = blank,blank (0.36) -> greedy emits [] ; labeling "a"
        # has mass a·a + a·b + b·a = 0.16+0.24+0.24 = 0.64 > 0.36.
        v = 4
        a = 3
        lp = np.full((1, 2, v), -20.0, np.float32)
        lp[0, :, PAD] = np.log(0.6)
        lp[0, :, a] = np.log(0.4)
        mask = jnp.ones((1, 2), bool)
        toks, scores = ctc_beam_from_enc(
            _head_identity(v), jnp.asarray(lp), mask, 2, beam_size=16,
        )
        assert _strip(toks[0]) == [a]
        np.testing.assert_allclose(
            float(scores[0]), np.log(0.4 * 0.4 + 2 * 0.4 * 0.6),
            rtol=1e-3,
        )


def oracle_prefix_beam(logp, k, lm_lp_fn=None, lm_weight=0.0):
    """Hannun et al. 2014 dict prefix beam over one utterance.

    ``logp``: [T, V] log-softmax frame posteriors.  ``lm_lp_fn(prefix)``
    -> [V] log P_lm(. | prefix).  Returns (best labeling, total score)
    where total = log p_ctc(prefix) + lm_weight * log p_lm(prefix).
    """
    def lae(a, b):
        if a == -np.inf:
            return b
        if b == -np.inf:
            return a
        m = max(a, b)
        return m + np.log1p(np.exp(min(a, b) - m))

    beam = {(): (0.0, -np.inf, 0.0)}          # prefix -> (pb, pnb, lm)
    t_len, v = logp.shape
    for t in range(t_len):
        nxt = {}

        def add(prefix, pb, pnb, lm):
            opb, opnb, _ = nxt.get(prefix, (-np.inf, -np.inf, 0.0))
            nxt[prefix] = (lae(opb, pb), lae(opnb, pnb), lm)

        for prefix, (pb, pnb, lm) in beam.items():
            tot = lae(pb, pnb)
            add(prefix, tot + logp[t, PAD], -np.inf, lm)      # blank
            if prefix:
                add(prefix, -np.inf, pnb + logp[t, prefix[-1]], lm)
            lmv = (lm_lp_fn(prefix) if lm_lp_fn is not None
                   and lm_weight > 0.0 else None)
            for c in range(1, v):
                base = pb if prefix and c == prefix[-1] else tot
                new_lm = lm + (float(lmv[c]) if lmv is not None else 0.0)
                add(prefix + (c,), -np.inf, base + logp[t, c], new_lm)
        scored = sorted(
            nxt.items(),
            key=lambda kv: lae(kv[1][0], kv[1][1]) + lm_weight * kv[1][2],
            reverse=True,
        )
        beam = dict(scored[:k])
    best, (pb, pnb, lm) = max(
        beam.items(),
        key=lambda kv: lae(kv[1][0], kv[1][1]) + lm_weight * kv[1][2],
    )
    return list(best), lae(pb, pnb) + lm_weight * lm


@pytest.mark.quick
class TestOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_pruned_beam_matches_dict_oracle(self, seed):
        rng = np.random.default_rng(seed)
        b, t, v, k = 3, 6, 6, 4
        logits = rng.standard_normal((b, t, v)).astype(np.float32) * 1.5
        lens = np.array([6, 4, 6])
        mask = jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]
        toks, scores = ctc_beam_from_enc(
            _head_identity(v), jnp.asarray(logits), mask, t, beam_size=k,
        )
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        for i in range(b):
            want, want_score = oracle_prefix_beam(logp[i, : lens[i]], k)
            assert _strip(toks[i]) == want, (i, _strip(toks[i]), want)
            np.testing.assert_allclose(float(scores[i]), want_score,
                                       rtol=1e-4, atol=1e-4)

    def test_lm_fusion_matches_dict_oracle(self):
        from semi_supervised_asr_tpu.models import lm as LMM

        rng = np.random.default_rng(7)
        b, t, v, k, w = 2, 5, 6, 4, 0.5
        logits = rng.standard_normal((b, t, v)).astype(np.float32) * 1.5
        mask = jnp.ones((b, t), bool)
        lm_params = LMM.init_lm(jax.random.PRNGKey(3), v, embed_dim=8,
                                hidden=16, layers=1)
        toks, scores = ctc_beam_from_enc(
            _head_identity(v), jnp.asarray(logits), mask, t, beam_size=k,
            lm_params=lm_params, lm_step_fn=LMM.lm_step, lm_weight=w,
        )

        def lm_lp_fn(prefix):
            state = LMM.lm_step(lm_params, None, None, init_batch=1)[0]
            state, logit = LMM.lm_step(
                lm_params, state, jnp.array([1], jnp.int32)   # SOS
            )
            for c in prefix:
                state, logit = LMM.lm_step(
                    lm_params, state, jnp.array([c], jnp.int32)
                )
            return np.asarray(
                jax.nn.log_softmax(logit.astype(jnp.float32), -1)
            )[0]

        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        for i in range(b):
            want, want_score = oracle_prefix_beam(
                logp[i], k, lm_lp_fn=lm_lp_fn, lm_weight=w
            )
            assert _strip(toks[i]) == want, (i, _strip(toks[i]), want)
            np.testing.assert_allclose(float(scores[i]), want_score,
                                       rtol=1e-4, atol=1e-4)

    def test_transformer_lm_fusion_runs_and_matches(self):
        from semi_supervised_asr_tpu.models import lm as LMM

        rng = np.random.default_rng(9)
        b, t, v, k, w = 1, 4, 5, 3, 0.4
        logits = rng.standard_normal((b, t, v)).astype(np.float32) * 1.5
        mask = jnp.ones((b, t), bool)
        lm_params = LMM.init_transformer_lm(
            jax.random.PRNGKey(5), v, d_model=16, heads=2, d_ff=32,
            layers=1, max_len=16,
        )
        toks, scores = ctc_beam_from_enc(
            _head_identity(v), jnp.asarray(logits), mask, t, beam_size=k,
            lm_params=lm_params, lm_step_fn=LMM.lm_step, lm_weight=w,
        )

        def lm_lp_fn(prefix):
            state = LMM.lm_step(lm_params, None, None, init_batch=1)[0]
            state, logit = LMM.lm_step(
                lm_params, state, jnp.array([1], jnp.int32)
            )
            for c in prefix:
                state, logit = LMM.lm_step(
                    lm_params, state, jnp.array([c], jnp.int32)
                )
            return np.asarray(
                jax.nn.log_softmax(logit.astype(jnp.float32), -1)
            )[0]

        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        want, want_score = oracle_prefix_beam(
            logp[0], k, lm_lp_fn=lm_lp_fn, lm_weight=w
        )
        assert _strip(toks[0]) == want
        np.testing.assert_allclose(float(scores[0]), want_score,
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.quick
class TestInterface:
    def test_padded_frames_ignored(self, rng):
        v = 5
        logits = rng.standard_normal((1, 6, v)).astype(np.float32)
        full = ctc_beam_from_enc(
            _head_identity(v), jnp.asarray(logits[:, :4]),
            jnp.ones((1, 4), bool), 6, beam_size=3,
        )
        padded = ctc_beam_from_enc(
            _head_identity(v), jnp.asarray(logits),
            jnp.arange(6)[None, :] < 4, 6, beam_size=3,
        )
        assert _strip(full[0][0]) == _strip(padded[0][0])
        np.testing.assert_allclose(float(full[1][0]), float(padded[1][0]),
                                   rtol=1e-6)

    def test_nbest_sorted_distinct(self, rng):
        v, k = 6, 5
        logits = rng.standard_normal((2, 7, v)).astype(np.float32) * 1.5
        toks, scores = ctc_beam_from_enc(
            _head_identity(v), jnp.asarray(logits), jnp.ones((2, 7), bool),
            7, beam_size=k, return_nbest=True,
        )
        s = np.asarray(scores)
        assert (np.diff(s, axis=1) <= 1e-6).all()
        for i in range(2):
            live = [tuple(_strip(toks[i, j])) for j in range(k)
                    if s[i, j] > NEG_INF / 2]
            assert len(live) == len(set(live)), live
