"""Synthetic speech corpus with a learnable audio<->token mapping.

No real corpora exist in this image (SURVEY.md §8.3 risk 6), so every
acceptance gate has a synthetic variant: each vocabulary token is assigned a
unique two-tone signature, an utterance's audio is the concatenation of its
tokens' signatures (plus noise), and the transcript is the token sequence.
A seq2seq model can drive this to ~0 PER by attending to the tone segments —
the C1 overfit gate (BASELINE.json:7) runs on exactly this.

Deterministic under (seed, index): safe to re-generate identically across
hosts and epochs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from semi_supervised_asr_tpu.config import DataConfig, FrontendConfig
from semi_supervised_asr_tpu.data.vocab import SPECIALS, EOS, Vocab


@dataclass(frozen=True)
class Utterance:
    uid: str
    audio: np.ndarray          # float32 [S]
    tokens: np.ndarray         # int32 [U] — gold ids WITHOUT sos, WITH eos
    text: str


def _token_signature(
    token_id: int, n_samples: int, sample_rate: int
) -> np.ndarray:
    """Deterministic two-tone signature for a token id."""
    rng = np.random.default_rng(1000 + token_id)
    f1 = rng.uniform(200.0, 3800.0)
    f2 = rng.uniform(200.0, 3800.0)
    t = np.arange(n_samples) / sample_rate
    env = np.hanning(n_samples)
    return (0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)) * env


@functools.lru_cache(maxsize=8)
def grammar_successors(vocab_size: int, branching: int) -> np.ndarray:
    """[V, branching] allowed-successor table of the sparse Markov grammar.

    Deterministic in (vocab_size, branching) only — labeled, unlabeled,
    and dev streams all speak the SAME language regardless of their
    per-stream seeds (that is the point: structure shared across streams
    is what semi-supervised terms can exploit).  Cached: rebuilding the
    table per utterance is V rng.choice calls (ADVICE r1); callers must
    not mutate the returned array."""
    rng = np.random.default_rng((97, vocab_size, branching))
    content = np.arange(len(SPECIALS), vocab_size)
    return np.stack([
        rng.choice(content, size=branching, replace=False)
        for _ in range(vocab_size)
    ])


def _sample_tokens(
    rng: np.random.Generator, vocab_size: int, n_tok: int, branching: int
) -> np.ndarray:
    if branching <= 0:
        return rng.integers(len(SPECIALS), vocab_size, n_tok).astype(np.int32)
    succ = grammar_successors(vocab_size, branching)
    ids = np.empty(n_tok, np.int32)
    ids[0] = rng.integers(len(SPECIALS), vocab_size)
    for i in range(1, n_tok):
        ids[i] = succ[ids[i - 1], rng.integers(branching)]
    return ids


def make_utterance(
    index: int,
    vocab: Vocab,
    cfg: DataConfig,
    fcfg: FrontendConfig,
    min_tokens: int = 3,
    max_tokens: int = 10,
    token_dur_s: float = 0.12,
    noise: float = 0.01,
) -> Utterance:
    rng = np.random.default_rng((cfg.synthetic_seed, index))
    n_tok = int(rng.integers(min_tokens, max_tokens + 1))
    content_ids = _sample_tokens(
        rng, vocab.size, n_tok, cfg.synthetic_grammar
    )
    seg = int(token_dur_s * fcfg.sample_rate)
    audio = np.concatenate(
        [_token_signature(int(i), seg, fcfg.sample_rate) for i in content_ids]
    )
    audio = audio + noise * rng.standard_normal(len(audio))
    tokens = np.concatenate([content_ids, [EOS]]).astype(np.int32)
    text = " ".join(vocab.tokens[i] for i in content_ids)
    return Utterance(
        uid=f"synth-{cfg.synthetic_seed}-{index}",
        audio=audio.astype(np.float32),
        tokens=tokens,
        text=text,
    )


class SyntheticDataset:
    """In-memory synthetic corpus; the `Dataset` of the build (L1/B1)."""

    def __init__(
        self,
        vocab: Vocab,
        cfg: DataConfig,
        fcfg: FrontendConfig,
        n_utts: int | None = None,
        labeled: bool = True,
        **utt_kwargs,
    ):
        self.vocab = vocab
        self.cfg = cfg
        self.fcfg = fcfg
        self.labeled = labeled
        self.n = n_utts if n_utts is not None else cfg.num_synthetic_utts
        self._kw = utt_kwargs

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int) -> Utterance:
        if not 0 <= i < self.n:
            raise IndexError(i)
        return make_utterance(i, self.vocab, self.cfg, self.fcfg, **self._kw)

    def audio_len(self, i: int) -> int:
        """Cheap length probe without generating audio (for bucketing)."""
        rng = np.random.default_rng((self.cfg.synthetic_seed, i))
        n_tok = int(rng.integers(self._kw.get("min_tokens", 3),
                                 self._kw.get("max_tokens", 10) + 1))
        seg = int(self._kw.get("token_dur_s", 0.12) * self.fcfg.sample_rate)
        return n_tok * seg

    def token_len(self, i: int) -> int:
        rng = np.random.default_rng((self.cfg.synthetic_seed, i))
        n_tok = int(rng.integers(self._kw.get("min_tokens", 3),
                                 self._kw.get("max_tokens", 10) + 1))
        return n_tok + 1  # + EOS
