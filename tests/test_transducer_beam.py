"""Transducer beam search (decode/transducer_beam.py).

* K=1 must equal the greedy decode exactly (same policy by construction
  — proven here on random models, tokens AND scores);
* K>1 must match a per-utterance Python oracle that replays the same
  alignment-synchronous policy with explicit hypothesis lists;
* statistically the beam must dominate greedy (a per-utterance "never
  worse" bound is NOT a theorem for pruned beams — the greedy alignment
  can be evicted mid-search; one such case is pinned below, verified
  against the oracle).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.decode.transducer_beam import (
    transducer_beam_from_enc,
)
from semi_supervised_asr_tpu.decode.transducer_greedy import (
    transducer_greedy_from_enc,
)
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.models import transducer as TD

pytestmark = pytest.mark.quick

CFG = ModelConfig(
    n_mels=20, vocab_size=11, family="transducer",
    enc_hidden=8, enc_layers=1, pred_hidden=8, pred_layers=1,
    joint_dim=8, embed_dim=8, attn_dim=8, attn_conv_channels=2,
    attn_conv_width=5, dec_hidden=8, compute_dtype="float32",
)


def _enc_batch(rng, b=4, t=7):
    enc = jnp.asarray(
        rng.standard_normal((b, t, CFG.enc_out_dim)) * 1.5, jnp.float32
    )
    lens = rng.integers(1, t + 1, b)
    lens[0] = t
    mask = jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]
    return enc, mask, lens


def _oracle_beam(params, cfg, enc_b, t_len, max_u, k, max_symbols=4,
                 blank=0, lm_params=None, lm_weight=0.0,
                 ilm_weight=0.0):
    """Explicit-list replay of the vectorized policy for ONE utterance."""
    from semi_supervised_asr_tpu.models import lm as LMM
    from semi_supervised_asr_tpu.objectives.transducer_semi import (
        ilm_logits,
    )

    pred, state = TD.predictor_step(
        params["predictor"], jnp.array([1], jnp.int32),
        TD.predictor_init_state(cfg, 1), cfg,
    )
    h0 = {"score": 0.0, "pred": pred, "state": state, "toks": [],
          "can_emit": True}
    if lm_params is not None:
        lm_state = LMM.lm_step(lm_params, None, None, init_batch=1)[0]
        lm_state, lm_logits = LMM.lm_step(
            lm_params, lm_state, jnp.array([1], jnp.int32)
        )
        h0["lm_state"] = lm_state
        h0["lm_lp"] = np.asarray(
            jax.nn.log_softmax(lm_logits.astype(jnp.float32), -1)
        )[0]
    hyps = [h0] + [dict(h0, score=-1e30) for _ in range(k - 1)]
    v = cfg.vocab_size
    for t in range(t_len):
        for h in hyps:
            h["can_emit"] = True
        for _ in range(max_symbols):
            cands = []
            for i, h in enumerate(hyps):          # freeze candidates
                lp = np.asarray(jax.nn.log_softmax(TD.joint_row(
                    params["joint"], enc_b[None, t], h["pred"], cfg
                ), -1))[0]
                h["_lp"] = lp
                s = h["score"] + lp[blank] if h["can_emit"] else h["score"]
                cands.append((s, i, None))
            for i, h in enumerate(hyps):          # emit candidates
                if not h["can_emit"] or len(h["toks"]) >= max_u:
                    continue
                if ilm_weight > 0.0:
                    il = np.array(ilm_logits(
                        params["joint"], h["pred"][:, None, :]
                    ))[0, 0]
                    il[blank] = -1e30
                    ilm_lp = il - np.log(np.exp(il - il.max()).sum()) \
                        - il.max()
                for tok in range(v):
                    if tok == blank:
                        continue
                    s = h["score"] + h["_lp"][tok]
                    if lm_params is not None:
                        s += lm_weight * float(h["lm_lp"][tok])
                    if ilm_weight > 0.0:
                        s -= ilm_weight * float(ilm_lp[tok])
                    cands.append((s, i, tok))
            # stable top-k: score desc, pool order (freeze block first,
            # then emits by (hyp, token)) mirrors lax.top_k tie-breaking
            cands.sort(key=lambda c: -c[0])
            new = []
            for s, i, tok in cands[:k]:
                src = hyps[i]
                if tok is None:
                    new.append(dict(src, score=s, toks=list(src["toks"]),
                                    can_emit=False))
                else:
                    pred, state = TD.predictor_step(
                        params["predictor"], jnp.array([tok], jnp.int32),
                        src["state"], cfg,
                    )
                    nh = dict(src, score=s, pred=pred, state=state,
                              toks=src["toks"] + [tok], can_emit=True)
                    if lm_params is not None:
                        lm_state, lm_logits = LMM.lm_step(
                            lm_params, src["lm_state"],
                            jnp.array([tok], jnp.int32),
                        )
                        nh["lm_state"] = lm_state
                        nh["lm_lp"] = np.asarray(jax.nn.log_softmax(
                            lm_logits.astype(jnp.float32), -1
                        ))[0]
                    new.append(nh)
            hyps = new
        for h in hyps:                            # frame-exit blank
            if h["can_emit"] and h["score"] > -1e29:
                lp = np.asarray(jax.nn.log_softmax(TD.joint_row(
                    params["joint"], enc_b[None, t], h["pred"], cfg
                ), -1))[0]
                h["score"] += float(lp[blank])
    best = max(hyps, key=lambda h: h["score"])
    return best["toks"], best["score"]


class TestBeam:
    def test_k1_equals_greedy(self):
        params = M.init_model(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(0)
        enc, mask, _ = _enc_batch(rng)
        g_toks, g_sc = transducer_greedy_from_enc(
            params, CFG, enc, mask, 10
        )
        b_toks, b_sc = transducer_beam_from_enc(
            params, CFG, enc, mask, 10, beam_size=1
        )
        np.testing.assert_array_equal(np.asarray(g_toks),
                                      np.asarray(b_toks))
        np.testing.assert_allclose(np.asarray(g_sc), np.asarray(b_sc),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_matches_oracle(self, seed):
        params = M.init_model(jax.random.PRNGKey(seed), CFG)
        rng = np.random.default_rng(seed)
        enc, mask, lens = _enc_batch(rng, b=3, t=5)
        max_u, k = 8, 3
        toks, scores = jax.jit(
            transducer_beam_from_enc, static_argnums=(1, 4, 5)
        )(params, CFG, enc, mask, max_u, k)
        toks = np.asarray(toks)
        for i in range(enc.shape[0]):
            want_toks, want_sc = _oracle_beam(
                params, CFG, enc[i], int(lens[i]), max_u, k
            )
            got = [int(x) for x in toks[i] if x != 0]
            assert got == want_toks, (i, got, want_toks)
            np.testing.assert_allclose(float(scores[i]), want_sc,
                                       rtol=1e-4, atol=1e-4)

    def test_lm_fusion_matches_oracle(self):
        """Shallow fusion: emit candidates carry lm_weight * LM log-prob,
        per-hypothesis LSTM LM state reorders with the beam."""
        from semi_supervised_asr_tpu.models import lm as LMM

        params = M.init_model(jax.random.PRNGKey(4), CFG)
        lm_params = LMM.init_lm(
            jax.random.PRNGKey(5), CFG.vocab_size, embed_dim=8,
            hidden=8, layers=1,
        )
        rng = np.random.default_rng(4)
        enc, mask, lens = _enc_batch(rng, b=3, t=5)
        max_u, k, w = 8, 3, 0.4
        toks, scores = transducer_beam_from_enc(
            params, CFG, enc, mask, max_u, beam_size=k,
            lm_params=lm_params, lm_step_fn=LMM.lm_step, lm_weight=w,
        )
        toks = np.asarray(toks)
        for i in range(enc.shape[0]):
            want_toks, want_sc = _oracle_beam(
                params, CFG, enc[i], int(lens[i]), max_u, k,
                lm_params=lm_params, lm_weight=w,
            )
            got = [int(x) for x in toks[i] if x != 0]
            assert got == want_toks, (i, got, want_toks)
            np.testing.assert_allclose(float(scores[i]), want_sc,
                                       rtol=1e-4, atol=1e-4)

    def test_transformer_lm_fusion_matches_oracle(self):
        """Per-row KV-cache positions (models/lm.py): hypotheses at
        different emission depths keep independent LM prefixes."""
        from semi_supervised_asr_tpu.models import lm as LMM

        params = M.init_model(jax.random.PRNGKey(6), CFG)
        lm_params = LMM.init_transformer_lm(
            jax.random.PRNGKey(7), CFG.vocab_size, d_model=8, heads=2,
            d_ff=8, layers=1, max_len=16,
        )
        rng = np.random.default_rng(6)
        enc, mask, lens = _enc_batch(rng, b=2, t=4)
        max_u, k, w = 6, 3, 0.4
        toks, scores = transducer_beam_from_enc(
            params, CFG, enc, mask, max_u, beam_size=k,
            lm_params=lm_params, lm_step_fn=LMM.lm_step, lm_weight=w,
        )
        toks = np.asarray(toks)
        for i in range(enc.shape[0]):
            want_toks, want_sc = _oracle_beam(
                params, CFG, enc[i], int(lens[i]), max_u, k,
                lm_params=lm_params, lm_weight=w,
            )
            got = [int(x) for x in toks[i] if x != 0]
            assert got == want_toks, (i, got, want_toks)
            np.testing.assert_allclose(float(scores[i]), want_sc,
                                       rtol=1e-4, atol=1e-4)

    def test_ilm_subtraction_matches_oracle(self):
        """HAT density-ratio fusion: external LM added, internal LM
        subtracted on label emissions only."""
        from semi_supervised_asr_tpu.models import lm as LMM

        params = M.init_model(jax.random.PRNGKey(8), CFG)
        lm_params = LMM.init_lm(
            jax.random.PRNGKey(9), CFG.vocab_size, embed_dim=8,
            hidden=8, layers=1,
        )
        rng = np.random.default_rng(8)
        enc, mask, lens = _enc_batch(rng, b=2, t=4)
        max_u, k, w, iw = 6, 3, 0.4, 0.25
        toks, scores = transducer_beam_from_enc(
            params, CFG, enc, mask, max_u, beam_size=k,
            lm_params=lm_params, lm_step_fn=LMM.lm_step, lm_weight=w,
            ilm_weight=iw,
        )
        toks = np.asarray(toks)
        for i in range(enc.shape[0]):
            want_toks, want_sc = _oracle_beam(
                params, CFG, enc[i], int(lens[i]), max_u, k,
                lm_params=lm_params, lm_weight=w, ilm_weight=iw,
            )
            got = [int(x) for x in toks[i] if x != 0]
            assert got == want_toks, (i, got, want_toks)
            np.testing.assert_allclose(float(scores[i]), want_sc,
                                       rtol=1e-4, atol=1e-4)

    def test_transformer_lm_fusion_rejects_overdeep_cache(self):
        from semi_supervised_asr_tpu.models import lm as LMM

        params = M.init_model(jax.random.PRNGKey(0), CFG)
        lm_params = LMM.init_transformer_lm(
            jax.random.PRNGKey(0), CFG.vocab_size, d_model=8, heads=2,
            d_ff=8, layers=1, max_len=4,
        )
        rng = np.random.default_rng(0)
        enc, mask, _ = _enc_batch(rng, b=2, t=3)
        with pytest.raises(AssertionError, match="lm.max_len"):
            transducer_beam_from_enc(
                params, CFG, enc, mask, 8, beam_size=2,
                lm_params=lm_params, lm_step_fn=LMM.lm_step,
                lm_weight=0.3,
            )

    def test_nbest_sorted_and_consistent(self):
        params = M.init_model(jax.random.PRNGKey(2), CFG)
        rng = np.random.default_rng(2)
        enc, mask, _ = _enc_batch(rng, b=3, t=5)
        b_toks, b_sc = transducer_beam_from_enc(
            params, CFG, enc, mask, 8, beam_size=3
        )
        n_toks, n_sc = transducer_beam_from_enc(
            params, CFG, enc, mask, 8, beam_size=3, return_nbest=True
        )
        n_sc = np.asarray(n_sc)
        assert n_sc.shape == (3, 3) and np.asarray(n_toks).shape == (3, 3, 8)
        assert (np.diff(n_sc, axis=1) <= 1e-6).all()       # sorted desc
        np.testing.assert_array_equal(np.asarray(b_toks),
                                      np.asarray(n_toks)[:, 0])
        np.testing.assert_allclose(np.asarray(b_sc), n_sc[:, 0],
                                   rtol=1e-6, atol=1e-6)

    def test_beam_statistically_dominates_greedy(self):
        """Pruned beams carry no per-row guarantee vs greedy (seed 10,
        row 0 here is a verified eviction: beam -28.66 < greedy -27.21,
        bitwise-equal to the oracle beam) — but across rows the beam
        must win on aggregate and on a clear majority."""
        diffs = []
        for seed in range(4):
            params = M.init_model(jax.random.PRNGKey(seed + 10), CFG)
            rng = np.random.default_rng(seed)
            enc, mask, _ = _enc_batch(rng, b=4, t=6)
            _, g_sc = transducer_greedy_from_enc(params, CFG, enc, mask, 8)
            _, b_sc = transducer_beam_from_enc(
                params, CFG, enc, mask, 8, beam_size=4
            )
            diffs.extend((np.asarray(b_sc) - np.asarray(g_sc)).tolist())
        diffs = np.asarray(diffs)
        assert diffs.mean() > 0.0, diffs
        assert (diffs >= -1e-5).mean() >= 0.75, diffs
