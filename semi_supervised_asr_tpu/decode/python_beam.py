"""Slow, obviously-correct Python beam search — the test oracle for beam.py.

Mirrors the reference's per-utterance Python loop shape (SURVEY.md §4.3):
one utterance at a time, a list of hypotheses, per-hypothesis decoder calls.
Used ONLY in tests (tests/test_beam.py: "jit beam vs a slow pure-Python beam
on identical tiny model — identical hypotheses and scores").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import DecodeConfig, ModelConfig
from semi_supervised_asr_tpu.data.vocab import EOS, SOS
from semi_supervised_asr_tpu.models import speller as S


@dataclasses.dataclass
class Hyp:
    tokens: list
    score: float
    state: dict          # decoder state with batch dim 1
    done: bool
    bias_node: int = 0   # contextual-biasing trie node (root = 0)

    @property
    def length(self) -> int:
        return len(self.tokens)


def ctc_prefix_oracle(logp: np.ndarray, y: list) -> tuple[float, float]:
    """Textbook per-frame CTC prefix dynamic program (independent of the
    vectorized decode/ctc_prefix.py closed forms) -> (psi, eos):

    * ``psi``: log-mass of alignments whose collapse STARTS WITH ``y``
      (``y`` completes by the last frame; anything may follow);
    * ``eos``: log-mass of alignments collapsing to EXACTLY ``y``.

    ``logp`` is [T, V] with blank at index 0 (pad frames already rewritten
    to emit blank).  O(|y|·T) Python loops — oracle use only."""
    neg = -1.0e30
    t_frames = logp.shape[0]

    def lse(a, b):
        return float(np.logaddexp(a, b))

    # empty prefix
    gn = [neg] * t_frames
    gb = []
    run = 0.0
    for t in range(t_frames):
        run += float(logp[t, 0])
        gb.append(run)
    psi = 0.0  # log P(empty prefix) = 0
    last = -1
    for c in y:
        gn_new, gb_new = [neg] * t_frames, [neg] * t_frames
        psi_c = neg
        for t in range(t_frames):
            gb_prev = gb[t - 1] if t else (0.0 if last == -1 else neg)
            gn_prev = gn[t - 1] if t else neg
            phi = gb_prev if c == last else lse(gb_prev, gn_prev)
            gn_new[t] = float(logp[t, c]) + (
                lse(phi, gn_new[t - 1]) if t else phi
            )
            gb_new[t] = float(logp[t, 0]) + (
                lse(gb_new[t - 1], gn_new[t - 1]) if t else neg
            )
            psi_c = lse(psi_c, phi + float(logp[t, c]))
        gn, gb, psi, last = gn_new, gb_new, psi_c, c
    eos = lse(gn[-1], gb[-1])
    return psi, eos


def beam_decode_python(
    speller_params: dict,
    cfg: ModelConfig,
    dcfg: DecodeConfig,
    enc: np.ndarray,       # [1, T, enc_out] — single utterance
    enc_mask: np.ndarray,  # [1, T]
    keys: np.ndarray,      # [1, T, A]
    max_len: int,
    ctc_logp: np.ndarray | None = None,   # [1, T, V] masked_ctc_logp output
    bias=None,                            # biasing.BiasTrie (host walk here)
) -> tuple[list, float]:
    """-> (token list incl. EOS, normalized score) for ONE utterance.

    ``ctc_logp`` + ``dcfg.ctc_weight`` > 0 + ``dcfg.ctc_one_pass``: joint
    one-pass scoring — every candidate mixes ``w·Δ`` of the textbook
    :func:`ctc_prefix_oracle` score (all V candidates expanded, no
    attention pre-pruning, so this is the exact-search oracle for
    decode/beam.py's in-lattice version)."""
    enc = jnp.asarray(enc)
    enc_mask = jnp.asarray(enc_mask)
    keys = jax.tree.map(jnp.asarray, keys)
    k = dcfg.beam_size
    joint = (
        ctc_logp is not None and dcfg.ctc_weight > 0.0 and dcfg.ctc_one_pass
    )
    w = dcfg.ctc_weight

    if bias is not None:
        bias_nxt = np.asarray(bias.next_node)
        bias_ret = np.asarray(bias.retract)
        bias_gain_tab = np.asarray(bias.gain)

    def bias_step(node: int, tok: int) -> tuple[float, int]:
        """Per-hypothesis host automaton walk mirroring
        biasing.bias_delta / bias_advance -> (score delta, next node).
        Fail links are baked into next_node (Aho–Corasick closure)."""
        nn = int(bias_nxt[node, tok])
        return float(bias_gain_tab[nn]) - float(bias_ret[node]), nn

    state0 = S.init_state(1, enc.shape[1], cfg, enc_mask,
                          max_steps=max_len)
    beams = [Hyp(tokens=[], score=0.0, state=state0, done=False)]

    for _ in range(max_len):
        candidates = []
        for hyp in beams:
            if hyp.done:
                candidates.append(hyp)  # frozen: carries over unchanged
                continue
            prev = hyp.tokens[-1] if hyp.tokens else SOS
            state, logits, _ = S.speller_step(
                speller_params, cfg, hyp.state,
                jnp.asarray([prev], jnp.int32), keys, enc, enc_mask,
            )
            logp = np.asarray(
                jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            )[0]
            if joint:
                expand = range(1, logp.shape[-1])
                psi_parent, eos_parent = ctc_prefix_oracle(
                    ctc_logp[0], hyp.tokens
                )
            elif bias is not None:
                # biasing re-ranks candidates AFTER the acoustic score —
                # expand all V so the oracle's pruning matches the jit
                # beam's top-k over the biased totals
                expand = range(1, logp.shape[-1])
            else:
                expand = (int(t) for t in np.argsort(-logp)[: k + 1])
            for tok in expand:
                tok = int(tok)
                if tok == 0:  # PAD never expands a live hyp
                    continue
                gain = float(logp[tok])
                if joint:
                    if tok == EOS:
                        delta = eos_parent - psi_parent
                    else:
                        psi_c, _ = ctc_prefix_oracle(
                            ctc_logp[0], hyp.tokens + [tok]
                        )
                        delta = psi_c - psi_parent
                    gain = (1.0 - w) * gain + w * delta
                new_node = hyp.bias_node
                if bias is not None:
                    bias_gain, adv_node = bias_step(hyp.bias_node, tok)
                    gain += bias_gain
                    if tok != EOS:
                        new_node = adv_node
                candidates.append(
                    Hyp(
                        tokens=hyp.tokens + [tok],
                        score=hyp.score + gain,
                        state=state,
                        done=(tok == EOS),
                        bias_node=new_node,
                    )
                )
        candidates.sort(key=lambda h: -h.score)
        beams = candidates[:k]
        if all(h.done for h in beams):
            break

    if bias is not None:
        # mirror the jit beam: step-capped rows never paid the EOS-column
        # retraction — neutralize their pending bonus before ranking
        for h in beams:
            if not h.done:
                h.score -= float(bias_ret[h.bias_node])

    def norm(h: Hyp) -> float:
        return h.score / max(h.length, 1) ** dcfg.length_penalty

    finished = [h for h in beams if h.done] or beams
    best = max(finished, key=norm)
    return best.tokens, norm(best)
