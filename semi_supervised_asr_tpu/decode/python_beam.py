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

    @property
    def length(self) -> int:
        return len(self.tokens)


def beam_decode_python(
    speller_params: dict,
    cfg: ModelConfig,
    dcfg: DecodeConfig,
    enc: np.ndarray,       # [1, T, enc_out] — single utterance
    enc_mask: np.ndarray,  # [1, T]
    keys: np.ndarray,      # [1, T, A]
    max_len: int,
) -> tuple[list, float]:
    """-> (token list incl. EOS, normalized score) for ONE utterance."""
    enc = jnp.asarray(enc)
    enc_mask = jnp.asarray(enc_mask)
    keys = jax.tree.map(jnp.asarray, keys)
    k = dcfg.beam_size

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
            for tok in np.argsort(-logp)[: k + 1]:
                tok = int(tok)
                if tok == 0:  # PAD never expands a live hyp
                    continue
                candidates.append(
                    Hyp(
                        tokens=hyp.tokens + [tok],
                        score=hyp.score + float(logp[tok]),
                        state=state,
                        done=(tok == EOS),
                    )
                )
        candidates.sort(key=lambda h: -h.score)
        beams = candidates[:k]
        if all(h.done for h in beams):
            break

    def norm(h: Hyp) -> float:
        return h.score / max(h.length, 1) ** dcfg.length_penalty

    finished = [h for h in beams if h.done] or beams
    best = max(finished, key=norm)
    return best.tokens, norm(best)
