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

TPU-first shape: the phrase set compiles ON THE HOST into dense arrays,
and the per-step device work is pure gathers + arithmetic — no dynamic
shapes, no per-hypothesis Python:

* ``next_node [N, V] int32`` — the AHO–CORASICK-CLOSED transition
  function: suffix (fail) links are resolved at build time, so every
  (state, token) entry is a real state (root ``0`` = "no live match").
  A failed longer match falls to the longest suffix of the emitted
  tokens that is still a phrase prefix — a phrase hiding in the tail of
  a failed match (e.g. ``bac`` completing inside ``a b a c`` while
  ``aba`` was being matched) is caught, not missed.
* ``retract  [N] float32`` — the PENDING (retractable) bonus at each
  state: ``bonus`` × (tokens since the last completed-phrase boundary
  inside the state's match window); 0 at the root and at every state
  where a phrase completes (including via a suffix: state ``abc`` with
  phrase ``bc`` is committed).
* ``gain [N] float32`` — the score entering a state is worth:
  ``bonus × (retract-depth(parent) + 1)`` for any non-root state
  (the newly matched token plus whatever pending the new window calls
  for), 0 for the root.  The per-candidate step delta is then just
  ``gain[next_node[s, y]] - retract[s]`` — two gathers.

Each hypothesis carries ONE extra ``int32`` lattice leaf (its automaton
state) that gather-reorders with the surviving beams exactly like
decoder state.

Accounting semantics (state-potential scheme): on every transition the
delta is ``gain[s'] - retract[s]``; a hypothesis's accumulated bias
therefore always equals (committed total) + ``retract[state]``, and the
final ranking subtracts ``retract[state]`` so incomplete matches are
score-neutral.  On-trie steps come out to exactly ``+bonus``; a fall to
the root retracts the full pending.  One documented subtlety of any
per-STATE potential: when a failed match's kept suffix overlaps tokens
already committed by an earlier completion (phrases ``aab`` + ``ba``
against ``a a b a``), the shared token is re-granted as pending of the
new window — completing the second phrase then counts it toward both
(union-of-occurrences semantics would count it once), and failing
retracts it again.  Exact per-token occurrence accounting would need
per-PATH history, which no O(1)-state scheme (including the reference
WFST constructions) carries.

Phrase-end states COMMIT: their pending drops to 0, so a later failure
keeps the completed phrase's bonus, and a longer phrase sharing the
prefix keeps matching through the boundary (``new york`` and
``new york city`` coexist; completing the former commits its bonus even
when the latter then fails).  The commit is WINDOW-scoped, a second
documented deviation from per-occurrence accounting: a completion —
including one reached via a suffix — zeroes the pending of the WHOLE
match window, so tokens that preceded the completed phrase inside the
window are kept too.  With phrases ``{abc, b}`` against emitted
``a b x``, reaching state ``ab`` completes ``b`` (suffix) and commits
both pending tokens; the later miss on ``x`` retracts nothing, so the
``a`` keeps its bonus although no completed phrase contains it.
Retaining per-token retractability past a commit would need the same
per-path history as the overlap case below — the window commit is the
state-potential scheme's price, biased toward keeping (never enlarging
retraction of) prefixes of phrases the user asked to boost.

EOS / end of utterance: a hypothesis still mid-phrase retracts its
pending bonus when it finishes (the EOS column of :func:`bias_delta`
and the caller's final-score correction for frame-synchronous beams).

Memory: ``next_node`` is dense ``[N, V]`` — N trie nodes × vocab. For
hotword lists (tens..hundreds of short phrases) against char/BPE vocabs
this is a few hundred KB; a huge phrase list against a large vocab pays
N·V·4 bytes on device (a CSR layout would trade that for an extra
binary-search per step — not worth it at hotword scale).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.data.vocab import EOS, PAD, SOS


class BiasTrie(NamedTuple):
    """Device-side compiled phrase set (a pytree — passes through jit)."""

    next_node: jax.Array   # [N, V] int32, Aho–Corasick-closed (no -1s)
    retract: jax.Array     # [N] float32, pending (retractable) bonus
    gain: jax.Array        # [N] float32, score granted on ENTERING a state
    bonus: jax.Array       # [] float32, per-matched-token score bonus


def build_bias_trie(
    phrases: Sequence[Sequence[int]], vocab_size: int, bonus: float
) -> BiasTrie:
    """Compile token-id phrases into the dense automaton arrays (host).

    Empty phrases are dropped; duplicates collapse into one path.  Phrase
    tokens must be real labels — PAD/SOS/EOS inside a phrase is an error
    (they are alignment/control symbols, never emitted by a beam as
    labels).
    """
    clean: list[tuple[int, ...]] = []
    seen: set[tuple[int, ...]] = set()
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
        if p not in seen:
            seen.add(p)
            clean.append(p)
    if not clean:
        raise ValueError("bias phrase list is empty after filtering")

    # ---- trie ----
    nodes: list[dict[int, int]] = [{}]     # arcs per node
    is_end: list[bool] = [False]
    parent: list[int] = [0]
    for p in clean:
        cur = 0
        for t in p:
            if t not in nodes[cur]:
                nodes[cur][t] = len(nodes)
                nodes.append({})
                is_end.append(False)
                parent.append(cur)
            cur = nodes[cur][t]
        is_end[cur] = True

    # ---- BFS: fail links, suffix-closed phrase ends, pending depths ----
    n_nodes = len(nodes)
    fail = [0] * n_nodes
    out_closed = [False] * n_nodes          # a phrase ends AT this state
    pend = [0] * n_nodes                    # uncommitted tokens at state
    order = [0]
    for s in order:
        for t, child in nodes[s].items():
            if s == 0:
                fail[child] = 0
            else:
                f = fail[s]
                while f != 0 and t not in nodes[f]:
                    f = fail[f]
                fail[child] = nodes[f].get(t, 0)
            out_closed[child] = is_end[child] or out_closed[fail[child]]
            pend[child] = 0 if out_closed[child] else pend[s] + 1
            order.append(child)

    # ---- dense closed transitions (goto ∘ fail resolved at build) ----
    nxt = np.zeros((n_nodes, vocab_size), np.int32)
    for t, child in nodes[0].items():
        nxt[0, t] = child
    for s in order[1:]:
        nxt[s] = nxt[fail[s]]
        for t, child in nodes[s].items():
            nxt[s, t] = child

    retract = np.asarray(pend, np.float32) * float(bonus)
    gain = np.zeros(n_nodes, np.float32)
    for s in order[1:]:
        gain[s] = (pend[parent[s]] + 1) * float(bonus)
    return BiasTrie(
        next_node=jnp.asarray(nxt),
        retract=jnp.asarray(retract),
        gain=jnp.asarray(gain),
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
    ``y``: ``gain[next_node[s, y]] - retract[s]`` — ``+bonus`` while the
    match extends, the appropriate retraction (and possible suffix /
    root restart credit) on a miss.  Columns that fall to the root
    (PAD/SOS/EOS included, since phrases never contain them) come out to
    plain ``-retract`` — exactly the end-of-hypothesis semantics the
    EOS column needs.
    """
    nxt = trie.next_node[states]                       # [R, V]
    return trie.gain[nxt] - trie.retract[states][:, None]


def bias_advance(
    trie: BiasTrie, states: jax.Array, toks: jax.Array
) -> jax.Array:
    """Next automaton state after emitting ``toks [R]`` from
    ``states [R]`` (fail links are baked into ``next_node``)."""
    return trie.next_node[states, toks]


def bias_pending(trie: BiasTrie, states: jax.Array) -> jax.Array:
    """Pending (not yet committed) bonus of each state — what a
    frame-synchronous beam subtracts from final ranking scores so
    incomplete matches stay score-neutral."""
    return trie.retract[states]
