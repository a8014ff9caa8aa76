"""CTC Viterbi forced alignment (ops/ctc_align.py) vs brute-force and
numpy-DP oracles, plus batching/masking/infeasibility behavior."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.data.vocab import PAD
from semi_supervised_asr_tpu.ops.ctc_align import ctc_viterbi_align

BLANK = PAD


def _states(tokens):
    """Blank-interleaved state labels for a token sequence."""
    out = [BLANK]
    for t in tokens:
        out += [t, BLANK]
    return out


def _enum_oracle(logp, tokens):
    """Exhaustive best path over the CTC state graph (tiny T/U only).

    -> (per-token (start, end) list, best score) or (None, -inf)."""
    t_len = logp.shape[0]
    labels = _states(tokens)
    s_cap = len(labels)
    best, best_path = -np.inf, None
    for path in itertools.product(range(s_cap), repeat=t_len):
        if path[0] not in (0, 1 if s_cap > 1 else 0):
            continue
        if path[-1] not in (s_cap - 1, s_cap - 2 if s_cap > 1 else s_cap - 1):
            continue
        ok = True
        for a, b in zip(path, path[1:]):
            d = b - a
            if d not in (0, 1, 2):
                ok = False
                break
            if d == 2 and (b % 2 == 0 or labels[b] == labels[b - 2]):
                ok = False
                break
        if not ok:
            continue
        score = sum(logp[i, labels[s]] for i, s in enumerate(path))
        if score > best:
            best, best_path = score, path
    if best_path is None:
        return None, -np.inf
    spans = []
    for u in range(len(tokens)):
        s = 2 * u + 1
        occ = [i for i, st in enumerate(best_path) if st == s]
        spans.append((occ[0], occ[-1]))
    return spans, best


def _dp_oracle(logp, tokens):
    """Independent numpy Viterbi (forward max + backtrace)."""
    t_len = logp.shape[0]
    labels = _states(tokens)
    s_cap = len(labels)
    alpha = np.full(s_cap, -np.inf)
    alpha[0] = logp[0, labels[0]]
    if s_cap > 1:
        alpha[1] = logp[0, labels[1]]
    bp = np.zeros((t_len, s_cap), np.int64)
    for t in range(1, t_len):
        new = np.full(s_cap, -np.inf)
        for s in range(s_cap):
            cands = [alpha[s]]
            if s >= 1:
                cands.append(alpha[s - 1])
            if s >= 2 and s % 2 == 1 and labels[s] != labels[s - 2]:
                cands.append(alpha[s - 2])
            k = int(np.argmax(cands))
            new[s] = cands[k] + logp[t, labels[s]]
            bp[t, s] = k
        alpha = new
    ends = [s_cap - 1] + ([s_cap - 2] if s_cap > 1 else [])
    end = ends[int(np.argmax([alpha[e] for e in ends]))]
    best = alpha[end]
    path = [end]
    for t in range(t_len - 1, 0, -1):
        end = end - bp[t, end]
        path.append(end)
    path = path[::-1]
    spans = []
    for u in range(len(tokens)):
        s = 2 * u + 1
        occ = [i for i, st in enumerate(path) if st == s]
        spans.append((occ[0], occ[-1]) if occ else (-1, -1))
    return spans, best


def _run(logp_rows, tok_rows, blank=BLANK):
    """Batch helper: pad rows to common T/U caps and align."""
    b = len(logp_rows)
    t_cap = max(r.shape[0] for r in logp_rows)
    u_cap = max(max((len(t) for t in tok_rows), default=1), 1)
    v = logp_rows[0].shape[1]
    logp = np.full((b, t_cap, v), -20.0, np.float32)
    toks = np.full((b, u_cap), PAD, np.int32)
    flens = np.zeros(b, np.int32)
    tlens = np.zeros(b, np.int32)
    for i, (lp, tk) in enumerate(zip(logp_rows, tok_rows)):
        logp[i, : lp.shape[0]] = lp
        toks[i, : len(tk)] = tk
        flens[i] = lp.shape[0]
        tlens[i] = len(tk)
    return jax.jit(ctc_viterbi_align, static_argnames="blank")(
        jnp.asarray(logp), jnp.asarray(flens), jnp.asarray(toks),
        jnp.asarray(tlens), blank=blank,
    )


def _rand_logp(rng, t_len, v):
    x = rng.standard_normal((t_len, v)).astype(np.float32) * 2.0
    return np.asarray(jax.nn.log_softmax(jnp.asarray(x), axis=-1))


class TestEnumerationOracle:
    @pytest.mark.parametrize("seed", range(4))
    def test_tiny_exhaustive(self, seed):
        rng = np.random.default_rng(seed)
        t_len, v = 5, 6
        tokens = [int(x) for x in rng.integers(2, v, size=2)]
        logp = _rand_logp(rng, t_len, v)
        spans, score = _enum_oracle(logp, tokens)
        starts, ends, lp = _run([logp], [tokens])
        assert np.isclose(float(lp[0]), score, atol=1e-4)
        got = [(int(starts[0, u]), int(ends[0, u]))
               for u in range(len(tokens))]
        assert got == spans

    def test_repeated_token_needs_blank(self):
        # tokens [a, a]: the path must insert a blank between them, so
        # T=2 is infeasible and T=3 aligns a@0, blank@1, a@2
        v = 4
        lp = np.log(np.full((3, v), 1e-3, np.float32))
        lp[0, 2] = lp[2, 2] = np.log(0.9)
        lp[1, BLANK] = np.log(0.9)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), axis=-1))
        starts, ends, logp = _run([lp[:2], lp], [[2, 2], [2, 2]])
        assert not np.isfinite(float(logp[0]))         # T=2: infeasible
        assert np.isfinite(float(logp[1]))
        assert (int(starts[1, 0]), int(ends[1, 0])) == (0, 0)
        assert (int(starts[1, 1]), int(ends[1, 1])) == (2, 2)


class TestDPOracle:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_parity(self, seed):
        rng = np.random.default_rng(100 + seed)
        v = 8
        t_len = int(rng.integers(6, 20))
        n_tok = int(rng.integers(1, min(5, t_len // 2) + 1))
        tokens = [int(x) for x in rng.integers(2, v, size=n_tok)]
        logp = _rand_logp(rng, t_len, v)
        spans, score = _dp_oracle(logp, tokens)
        starts, ends, lp = _run([logp], [tokens])
        assert np.isclose(float(lp[0]), score, atol=1e-4)
        for u, (s, e) in enumerate(spans):
            assert (int(starts[0, u]), int(ends[0, u])) == (s, e)

    def test_batch_rows_match_solo(self):
        rng = np.random.default_rng(7)
        v = 8
        rows = []
        for t_len, n_tok in ((12, 3), (7, 1), (18, 4)):
            tokens = [int(x) for x in rng.integers(2, v, size=n_tok)]
            rows.append((_rand_logp(rng, t_len, v), tokens))
        starts, ends, lp = _run([r[0] for r in rows], [r[1] for r in rows])
        for i, (logp, tokens) in enumerate(rows):
            s1, e1, lp1 = _run([logp], [tokens])
            assert np.isclose(float(lp[i]), float(lp1[0]), atol=1e-4)
            n = len(tokens)
            np.testing.assert_array_equal(
                np.asarray(starts[i, :n]), np.asarray(s1[0, :n])
            )
            np.testing.assert_array_equal(
                np.asarray(ends[i, :n]), np.asarray(e1[0, :n])
            )


class TestProperties:
    def test_spans_tile_monotonically(self):
        rng = np.random.default_rng(3)
        logp = _rand_logp(rng, 30, 10)
        tokens = [2, 5, 2, 7, 9]
        starts, ends, lp = _run([logp], [tokens])
        assert np.isfinite(float(lp[0]))
        prev_end = -1
        for u in range(len(tokens)):
            s, e = int(starts[0, u]), int(ends[0, u])
            assert 0 <= s <= e < 30
            assert s > prev_end
            prev_end = e

    def test_empty_tokens_all_blank(self):
        rng = np.random.default_rng(4)
        logp = _rand_logp(rng, 8, 6)
        starts, ends, lp = _run([logp], [[]])
        expected = float(logp[:, BLANK].sum())
        assert np.isclose(float(lp[0]), expected, atol=1e-4)
        assert int(starts[0, 0]) == -1 and int(ends[0, 0]) == -1

    def test_pad_frames_do_not_matter(self):
        rng = np.random.default_rng(5)
        logp = _rand_logp(rng, 14, 8)
        tokens = [3, 4, 3]
        s1, e1, lp1 = _run([logp], [tokens])
        padded = np.concatenate(
            [logp, rng.standard_normal((6, 8)).astype(np.float32)]
        )
        t_pad = padded.shape[0]
        out = jax.jit(ctc_viterbi_align, static_argnames="blank")(
            jnp.asarray(padded[None]), jnp.asarray([14]),
            jnp.asarray([tokens + [PAD] * 2], np.int32), jnp.asarray([3]),
            blank=BLANK,
        )
        assert np.isclose(float(out[2][0]), float(lp1[0]), atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(out[0][0, :3]), np.asarray(s1[0, :3])
        )
        np.testing.assert_array_equal(
            np.asarray(out[1][0, :3]), np.asarray(e1[0, :3])
        )
        assert t_pad == 20  # sanity: padding actually happened
