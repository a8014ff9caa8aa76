"""Contextual biasing (hotword / phrase boosting) for beam decoding.

Shallow-fusion biasing in the style of Zhao et al. 2019 ("Shallow-Fusion
End-to-End Contextual Biasing", Interspeech): a user-supplied phrase list
(contact names, command words, rare entities) earns a per-token log-prob
bonus whenever a hypothesis extends a prefix of some phrase, with FAILURE
RETRACTION — a hypothesis that falls off the phrase trie before completing
a phrase gives back every bonus granted on the partial match.  Partial
matches are therefore score-neutral in the final ranking: only completed
phrases keep their boost, but the transient bonus keeps their prefixes
alive through the beam's top-k, which is the entire point (the beam would
otherwise prune a rare word's first tokens before the acoustics can
finish the case).

TPU-first shape: the phrase set compiles ON THE HOST into two dense
arrays, and the per-step device work is pure gathers + ``where`` — no
dynamic shapes, no per-hypothesis Python:

* ``next_node [N, V] int32`` — trie arcs (``-1`` = no arc).  Node 0 is
  the root (the "not inside any phrase" state).
* ``retract  [N] float32`` — the PENDING bonus at each node: everything
  granted since the last completed-phrase boundary on its path (0 at the
  root and at every phrase-end node).  A failure pays ``-retract[state]``.

Each hypothesis carries ONE extra ``int32`` lattice leaf (its trie node)
that gather-reorders with the surviving beams exactly like decoder state.

Matching semantics (documented limitation): ONE active prefix per
hypothesis.  On a miss the matcher retracts, then restarts at the root
with the failing token (so ``aab`` still matches phrase ``ab``) — it does
NOT follow Aho–Corasick suffix links, so a phrase hiding inside the tail
of a longer failed match (e.g. phrase ``bac`` inside tokens ``a b a c``
while matching phrase ``aba``) is missed.  That is the standard
shallow-biasing trade (the reference scheme has the same behavior) and
keeps the device step two gathers.

Phrase-end nodes COMMIT: their pending drops to 0, so a later failure
keeps the completed phrase's bonus, and a longer phrase sharing the
prefix keeps matching through the boundary (``new york`` and
``new york city`` coexist; completing the former commits its bonus even
when the latter then fails).

EOS / end of utterance: a hypothesis still mid-phrase retracts its
pending bonus when it finishes (the EOS column of :func:`bias_delta`
and the caller's final-score correction for frame-synchronous beams).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.data.vocab import EOS, PAD, SOS


class BiasTrie(NamedTuple):
    """Device-side compiled phrase set (a pytree — passes through jit)."""

    next_node: jax.Array   # [N, V] int32, -1 = no arc
    retract: jax.Array     # [N] float32, pending (retractable) bonus
    bonus: jax.Array       # [] float32, per-matched-token score bonus


def build_bias_trie(
    phrases: Sequence[Sequence[int]], vocab_size: int, bonus: float
) -> BiasTrie:
    """Compile token-id phrases into the dense trie arrays (host side).

    Empty phrases are dropped; duplicates collapse into one path.  Phrase
    tokens must be real labels — PAD/SOS/EOS inside a phrase is an error
    (they are alignment/control symbols, never emitted by a beam as
    labels).
    """
    clean: list[tuple[int, ...]] = []
    for p in phrases:
        p = tuple(int(t) for t in p)
        if not p:
            continue
        for t in p:
            if t in (PAD, SOS, EOS) or not (0 <= t < vocab_size):
                raise ValueError(
                    f"bias phrase token {t} is not a decodable label "
                    f"(vocab_size={vocab_size}, specials "
                    f"PAD={PAD}/SOS={SOS}/EOS={EOS})"
                )
        if p not in clean:
            clean.append(p)
    if not clean:
        raise ValueError("bias phrase list is empty after filtering")

    nodes: list[dict[int, int]] = [{}]     # arcs per node
    is_end: list[bool] = [False]
    depth_since_end: list[int] = [0]       # pending tokens at this node
    for p in clean:
        cur = 0
        for t in p:
            if t not in nodes[cur]:
                nodes[cur][t] = len(nodes)
                nodes.append({})
                is_end.append(False)
                depth_since_end.append(depth_since_end[cur] + 1)
            cur = nodes[cur][t]
        is_end[cur] = True
        depth_since_end[cur] = 0
    # a node inserted BEFORE a shorter phrase later marked its ancestor as
    # an end keeps a stale pending count — recompute with a BFS pass
    order = [0]
    for n in order:
        for t, child in nodes[n].items():
            depth_since_end[child] = (
                0 if is_end[child] else depth_since_end[n] + 1
            )
            order.append(child)

    n_nodes = len(nodes)
    nxt = np.full((n_nodes, vocab_size), -1, np.int32)
    for n, arcs in enumerate(nodes):
        for t, child in arcs.items():
            nxt[n, t] = child
    retract = np.asarray(depth_since_end, np.float32) * float(bonus)
    return BiasTrie(
        next_node=jnp.asarray(nxt),
        retract=jnp.asarray(retract),
        bonus=jnp.asarray(float(bonus), jnp.float32),
    )


def load_bias_phrases(path: str, vocab) -> list[list[int]]:
    """Read a phrase file (one phrase per line, blank/# lines skipped)
    and encode each line with the run's vocab/BPE tokenizer."""
    out: list[list[int]] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            out.append(vocab.encode_text(line, add_sos_eos=False))
    return out


def bias_delta(trie: BiasTrie, states: jax.Array) -> jax.Array:
    """Per-candidate score adjustments for every next token.

    ``states [R] int32`` -> ``delta [R, V] float32`` where column ``y``
    is the bias term a hypothesis in ``states[r]`` earns by emitting
    ``y``: ``+bonus`` while staying on the trie, or retraction of the
    pending bonus (plus a possible root restart with ``y``) on a miss.
    Columns with no root arc (PAD/SOS/EOS included, since phrases never
    contain them) fall through to plain ``-retract`` — exactly the
    end-of-hypothesis semantics the EOS column needs.
    """
    nxt = trie.next_node[states]                       # [R, V]
    root_restart = jnp.where(
        trie.next_node[0] >= 0, trie.bonus, 0.0
    )                                                  # [V]
    miss = -trie.retract[states][:, None] + root_restart[None, :]
    return jnp.where(nxt >= 0, trie.bonus, miss)


def bias_advance(
    trie: BiasTrie, states: jax.Array, toks: jax.Array
) -> jax.Array:
    """Next trie node after emitting ``toks [R]`` from ``states [R]``:
    follow the arc, else restart at the root with the token, else root."""
    nxt = trie.next_node[states, toks]
    restart = trie.next_node[0][toks]
    return jnp.where(nxt >= 0, nxt, jnp.where(restart >= 0, restart, 0))


def bias_pending(trie: BiasTrie, states: jax.Array) -> jax.Array:
    """Pending (not yet committed) bonus of each state — what a
    frame-synchronous beam subtracts from final ranking scores so
    incomplete matches stay score-neutral."""
    return trie.retract[states]
