"""Exact chunked streaming inference (transducer and CTC families).

The deployment story the causal stack exists for: feed raw audio in
arbitrary pieces, get tokens out incrementally, and the result is THE
SAME computation as the full-utterance decode — not an approximation.
Requirements (asserted): a frame-synchronous family
(``model.family=transducer`` or ``ctc`` — LAS attention reads the full
utterance), a streamable listener (forward-only BLSTM
``model.enc_bidirectional=false`` with ``conv_subsample=0``, or the
chunk-causal conformer ``model.enc_attn_chunk>0`` +
``enc_attn_left_chunks>=0`` — whose CAUSAL stem streams at any
``conv_subsample``),
``frontend.center=false`` (VALID framing: frame t covers samples
[t*hop, t*hop + n_fft) — reflect-padded center framing is inherently
non-causal), ``frontend.cmvn=global`` (per-frame, precomputed stats).

How exactness falls out (tested in tests/test_streaming_decode.py):

* frontend: with VALID framing every feature frame is a pure function of
  its own n_fft-sample window, so chunking the audio with an
  (n_fft - hop)-sample overlap carry reproduces the full-utterance
  frames bit-for-bit;
* listener: forward-only ``lax.scan`` LSTMs resume from carried (h, c)
  (ops/recurrent.lstm ``return_state``); chunks are
  ``time_reduction``-aligned so the pyramid folds produce whole output
  frames per chunk (models/listener.listener_apply_stream); the
  conformer instead carries per-block KV / causal-conv caches
  (models/conformer_listener.conformer_listener_apply_stream) whose
  per-chunk forward is the offline chunk-masked forward (token-exact;
  numerically ulp-scale — see that module's parity contract), with the
  streaming chunk pinned to ``enc_attn_chunk`` frames;
* decode: the frame-synchronous greedy (``beam_size=1``) or the
  alignment-synchronous beam (``beam_size>1``, incl. shallow LM fusion)
  carries its frame-scan state across chunks
  (decode/transducer_greedy.py / transducer_beam.py ``carry``) — the
  concatenated chunk scans ARE the full-utterance scan.  The CTC family
  streams the same way: best-path greedy via decode/ctc.ctc_greedy_stream
  (the collapse's previous-path-id crosses the boundary in the carry)
  and the prefix beam via decode/ctc_beam.py ``carry``.

Host-side Python drives the chunk loop; the per-chunk work is two jit
functions (steady-state chunk + final partial chunk) compiled once for
the configured chunk size.  Latency per emitted frame is bounded by
``chunk_frames`` (default: one pyramid output frame's worth).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import Config
from semi_supervised_asr_tpu.decode.transducer_greedy import (
    transducer_greedy_from_enc, transducer_greedy_init,
)
from semi_supervised_asr_tpu.models import listener as L
from semi_supervised_asr_tpu.ops import frontend as F


def build_stream_fns(
    params: dict,
    cfg: Config,
    cmvn: tuple,
    max_u: int,
    chunk_frames: int | None = None,
    max_symbols: int = 4,
    beam_size: int = 1,
    lm_params: dict | None = None,
    lm_step_fn=None,
    lm_weight: float = 0.0,
    ilm_weight: float = 0.0,
    max_stream_frames: int = 60_000,
    track_frames: bool = False,
    bias=None,
    batch: int = 1,
):
    """The pure computational core of streaming inference, shared by the
    live :class:`StreamingTranscriber` and the serving exporter
    (export.py ``--streaming``) — one definition, so the exported
    artifact IS the live streaming computation.

    -> dict with ``enc_state0`` / ``dec_carry0`` (initial carries;
    ``dec_carry0`` is None for beams, which build their own on chunk 1),
    ``chunk_step(enc_state, dec_carry, audio, frame_base)`` ->
    (enc_state, dec_carry), ``final_step(enc_state, dec_carry, audio,
    n_samples, frame_base)`` -> dec_carry, and the chunk geometry
    (``chunk_frames`` / ``chunk_samples`` / ``conformer``).

    ``batch`` > 1 sizes the carries for ``batch`` INDEPENDENT streams
    (:class:`MultiStreamTranscriber`): ``chunk_step`` then takes audio
    ``[batch, chunk_samples]`` and ``final_step`` per-row ``n_samples
    [batch]``; every carry leaf keeps its leading stream axis, and rows
    never interact (the encoder, frontend, and decode scans are all
    row-wise — the same batch-eval code paths).  ``batch`` == 1 keeps
    the rank-1 single-stream audio signature the export artifacts bake.
    """
    m, f = cfg.model, cfg.frontend
    assert not (track_frames and beam_size > 1), (
        "track_frames (streaming timestamps) is greedy-only — the "
        "beam carries keep no per-token frame slot"
    )
    assert m.family in ("transducer", "ctc"), (
        "streaming decode needs a frame-synchronous family "
        "(transducer or ctc) — LAS attention reads the full utterance"
    )
    assert m.family == "transducer" or ilm_weight == 0.0, (
        "ilm_weight is transducer-only (HAT internal-LM correction)"
    )
    conformer = m.encoder_arch == "conformer"
    if not conformer:
        assert not m.enc_bidirectional, (
            "streaming needs model.enc_bidirectional=false (or the "
            "chunk-causal conformer, model.enc_attn_chunk > 0)"
        )
        assert m.conv_subsample == 0, (
            "blstm streaming needs conv_subsample=0 (the SAME-padded "
            "stem reads ahead; the conformer's chunked stem is causal)"
        )
    assert not f.center, (
        "streaming needs frontend.center=false (reflect-padded "
        "center framing reads future samples)"
    )
    assert f.cmvn == "global", (
        "streaming needs frontend.cmvn=global (utterance CMVN reads "
        "the full utterance)"
    )
    red = m.time_reduction
    if conformer:
        # the conformer's stream step consumes exactly one attention
        # chunk (enc_attn_chunk encoder frames = enc_attn_chunk * red
        # feature frames) — the encoder's latency granule
        from semi_supervised_asr_tpu.models import (
            conformer_listener as CL,
        )
        chunk_frames = chunk_frames or m.enc_attn_chunk * red
        assert chunk_frames == m.enc_attn_chunk * red, (
            "conformer streaming feeds exactly enc_attn_chunk * "
            "2**conv_subsample feature frames per chunk (got "
            f"chunk_frames={chunk_frames}, want "
            f"{m.enc_attn_chunk * red})"
        )
        rope = CL.conformer_rope_table(m, max_stream_frames)
        enc_state0 = CL.conformer_stream_init(m, batch)

        def enc_stream(feats, enc_state, frame_lens=None):
            return CL.conformer_listener_apply_stream(
                params["listener"], feats, m, enc_state, rope,
                frame_lens=frame_lens,
            )
    else:
        chunk_frames = chunk_frames or red
        enc_state0 = L.listener_stream_init(m, batch)

        def enc_stream(feats, enc_state, frame_lens=None):
            return L.listener_apply_stream(
                params["listener"], feats, m, enc_state,
                frame_lens=frame_lens,
            )
    assert chunk_frames % red == 0, (chunk_frames, red)
    chunk_samples = (chunk_frames - 1) * f.hop_length + f.n_fft

    if m.family == "ctc" and beam_size > 1:
        from semi_supervised_asr_tpu.decode.ctc_beam import (
            ctc_beam_from_enc,
        )

        dec_carry0 = None    # the beam builds its own on chunk 1

        def decode_chunk(enc, mask, dec_carry, frame_base):
            _, _, dec_carry = ctc_beam_from_enc(
                params["ctc"], enc, mask, max_u, beam_size=beam_size,
                lm_params=lm_params, lm_step_fn=lm_step_fn,
                lm_weight=lm_weight, bias=bias,
                carry=dec_carry, return_carry=True,
            )
            return dec_carry
    elif m.family == "ctc":
        from semi_supervised_asr_tpu.decode.ctc import (
            ctc_greedy_stream, ctc_greedy_stream_init,
        )

        dec_carry0 = ctc_greedy_stream_init(
            batch, max_u, track_frames=track_frames,
            bias=bias is not None,
        )

        def decode_chunk(enc, mask, dec_carry, frame_base):
            return ctc_greedy_stream(
                params["ctc"], enc, mask, max_u, dec_carry,
                frame_base=frame_base, bias=bias,
            )
    elif beam_size > 1:
        from semi_supervised_asr_tpu.decode.transducer_beam import (
            transducer_beam_from_enc,
        )

        dec_carry0 = None    # the beam builds its own on chunk 1

        def decode_chunk(enc, mask, dec_carry, frame_base):
            _, _, dec_carry = transducer_beam_from_enc(
                params, m, enc, mask, max_u, beam_size=beam_size,
                max_symbols=max_symbols, lm_params=lm_params,
                lm_step_fn=lm_step_fn, lm_weight=lm_weight,
                ilm_weight=ilm_weight, bias=bias,
                carry=dec_carry, return_carry=True,
            )
            return dec_carry
    else:
        dec_carry0 = transducer_greedy_init(
            params, m, batch, max_u, track_frames=track_frames,
            bias=bias is not None,
        )

        def decode_chunk(enc, mask, dec_carry, frame_base):
            out = transducer_greedy_from_enc(
                params, m, enc, mask, max_u,
                max_symbols=max_symbols,
                carry=dec_carry, return_carry=True,
                track_frames=track_frames, frame_base=frame_base,
                bias=bias,
            )
            return out[2]

    mean, inv_std = cmvn

    def chunk_step(enc_state, dec_carry, audio, frame_base):
        a = audio if audio.ndim == 2 else audio[None]
        feats, _ = F.log_mel_features(
            a, jnp.full((a.shape[0],), a.shape[1]), f,
            mean, inv_std,
        )
        feats = feats[:, : chunk_frames]
        enc, enc_state = enc_stream(feats, enc_state)
        mask = jnp.ones((enc.shape[0], enc.shape[1]), bool)
        return enc_state, decode_chunk(enc, mask, dec_carry,
                                       frame_base)

    def final_step(enc_state, dec_carry, audio, n_samples,
                   frame_base):
        a = audio if audio.ndim == 2 else audio[None]
        feats, flens = F.log_mel_features(
            a, jnp.atleast_1d(n_samples), f, mean, inv_std,
        )
        enc, _ = enc_stream(feats, enc_state, frame_lens=flens)
        enc_valid = flens
        if conformer:
            for _ in range(m.conv_subsample):
                enc_valid = (enc_valid + 1) // 2
        else:
            for _ in range(m.enc_layers):
                enc_valid = (enc_valid + 1) // 2
        mask = jnp.arange(enc.shape[1])[None, :] < enc_valid[:, None]
        return decode_chunk(enc, mask, dec_carry, frame_base)

    return {
        "enc_state0": enc_state0,
        "dec_carry0": dec_carry0,
        "chunk_step": chunk_step,
        "final_step": final_step,
        "decode_chunk": decode_chunk,
        "chunk_frames": chunk_frames,
        "chunk_samples": chunk_samples,
        "conformer": conformer,
    }


def _best_hyp(dec_carry, row: int, *, ctc: bool, beam_size: int,
              lm_weight: float, bias) -> tuple[list[int], float]:
    """Best hypothesis of stream ``row`` out of a decode carry — the
    one selection rule (incl. LM-fusion weighting and the biasing
    committed/pending correction) shared by :class:`StreamingTranscriber`
    (row 0) and :class:`MultiStreamTranscriber` (slot rows)."""
    if beam_size > 1:
        if dec_carry is None:
            return [], 0.0
        if ctc:
            toks, count, _, pb, pnb, lm_score = dec_carry[:6]
            scores = np.logaddexp(np.asarray(pb), np.asarray(pnb)) \
                + lm_weight * np.asarray(lm_score)
        else:
            _, _, toks, count, scores = dec_carry[:5]
            scores = np.asarray(scores).copy()
        if bias is not None:
            # committed bias ranks; pending (mid-phrase) retracts —
            # mirrors the offline beams' final-selection correction
            retract = np.asarray(bias.retract)
            if ctc:
                node, bsc = dec_carry[8], dec_carry[9]
                scores = scores + np.asarray(bsc) \
                    - retract[np.asarray(node)]
            else:
                # transducer: bias already rides the carried scores,
                # un-retracted
                scores = scores - retract[np.asarray(dec_carry[7])]
        k = int(np.argmax(np.asarray(scores)[row]))
        out = np.asarray(toks)[row, k][: int(count[row, k])]
        return [int(x) for x in out], float(np.asarray(scores)[row, k])
    if ctc:
        _, out, count, score = dec_carry[:4]
    else:
        _, _, out, count, score = dec_carry[:5]
    score = float(np.asarray(score)[row])
    if bias is not None:
        # greedy biased carries: committed bias ranks, pending
        # (mid-phrase) retracts — same correction as the beams
        retract = np.asarray(bias.retract)
        if ctc:
            node, bsc = dec_carry[-2], dec_carry[-1]
            score += float(np.asarray(bsc)[row]) \
                - float(retract[int(np.asarray(node)[row])])
        else:
            # transducer: bias rides the carried score un-retracted
            node = dec_carry[-1]
            score -= float(retract[int(np.asarray(node)[row])])
    return ([int(x) for x in np.asarray(out[row])[: int(count[row])]],
            score)


class StreamingTranscriber:
    """Incremental decoder over one utterance (batch 1).

    >>> st = StreamingTranscriber(params, cfg, cmvn, max_u=256)
    >>> for piece in audio_pieces:
    ...     st.feed(piece)           # emits into st.tokens as it goes
    >>> tokens, score = st.finalize()
    """

    def __init__(
        self,
        params: dict,
        cfg: Config,
        cmvn: tuple,
        max_u: int,
        chunk_frames: int | None = None,
        max_symbols: int = 4,
        beam_size: int = 1,
        lm_params: dict | None = None,
        lm_step_fn=None,
        lm_weight: float = 0.0,
        ilm_weight: float = 0.0,
        max_stream_frames: int = 60_000,
        track_frames: bool = False,
        bias=None,
    ):
        self._bias = bias
        fns = build_stream_fns(
            params, cfg, cmvn, max_u, chunk_frames, max_symbols,
            beam_size, lm_params, lm_step_fn, lm_weight, ilm_weight,
            max_stream_frames, track_frames, bias,
        )
        self._conformer = fns["conformer"]
        self.chunk_frames = fns["chunk_frames"]
        self.params = params
        self.cfg = cfg
        self.max_u = max_u
        self.max_symbols = max_symbols
        self._hop, self._n_fft = cfg.frontend.hop_length, \
            cfg.frontend.n_fft
        self._chunk_samples = fns["chunk_samples"]
        self.beam_size = beam_size
        self._lm_weight = lm_weight
        self._audio = np.zeros((0,), np.float32)
        self._enc_state = fns["enc_state0"]
        self._dec_carry = fns["dec_carry0"]
        self._chunk_step = jax.jit(fns["chunk_step"])
        self._final_step = jax.jit(fns["final_step"])
        self._track = track_frames
        # absolute encoder frames already consumed — the frame_base fed
        # to the next chunk so tracked emission frames are utterance-
        # absolute (a traced scalar: changing it never recompiles)
        self._enc_frames = 0

    def feed(self, samples: np.ndarray) -> None:
        """Append audio; run every complete chunk that becomes available."""
        self._audio = np.concatenate(
            [self._audio, np.asarray(samples, np.float32)]
        )
        red = self.cfg.model.time_reduction
        while len(self._audio) >= self._chunk_samples:
            chunk = jnp.asarray(self._audio[: self._chunk_samples])
            self._enc_state, self._dec_carry = self._chunk_step(
                self._enc_state, self._dec_carry, chunk,
                jnp.asarray(self._enc_frames, jnp.int32),
            )
            self._enc_frames += self.chunk_frames // red
            # keep the n_fft - hop overlap the next frame window needs
            self._audio = self._audio[self.chunk_frames * self._hop:]

    def _best(self) -> tuple[list[int], float]:
        return _best_hyp(
            self._dec_carry, 0, ctc=self.cfg.model.family == "ctc",
            beam_size=self.beam_size, lm_weight=self._lm_weight,
            bias=self._bias,
        )

    def emission_frames(self) -> list[int]:
        """Absolute encoder-frame index where each emitted token first
        appeared (len == len(tokens)) — streaming timestamps; seconds =
        frame * hop_length * time_reduction / sample_rate.  Needs
        ``track_frames=True`` (greedy only)."""
        assert self._track, "construct with track_frames=True"
        # carry layout: ctc (prev, out, count, score, frames[, node,
        # bias_score]); transducer (pred, state, out, count, score,
        # frames[, node]) — frames sit at a FIXED index, bias slots trail
        ctc = self.cfg.model.family == "ctc"
        count = self._dec_carry[2 if ctc else 3]
        frames = self._dec_carry[4 if ctc else 5]
        return [int(x) for x in np.asarray(frames[0])[: int(count[0])]]

    @property
    def tokens(self) -> list[int]:
        """Best tokens so far.  Greedy (beam_size 1): monotone-growing
        between feeds.  Beam: the leading hypothesis, which may CHANGE
        between feeds — only ``finalize``'s result is stable."""
        return self._best()[0]

    def finalize(self) -> tuple[list[int], float]:
        """Flush the remainder (padded to a reduction-aligned chunk with
        the same length masking the batch path uses) -> (tokens, score)."""
        m = self.cfg.model
        rem = len(self._audio)
        n_frames = (
            1 + (rem - self._n_fft) // self._hop
            if rem >= self._n_fft else 0
        )
        if n_frames > 0:
            # the conformer's stream step is compiled for exactly one
            # attention chunk; the LSTM path only needs pyramid alignment
            red = self.chunk_frames if self._conformer else m.time_reduction
            pad_frames = -(-n_frames // red) * red
            need = (pad_frames - 1) * self._hop + self._n_fft
            audio = np.zeros((need,), np.float32)
            audio[:rem] = self._audio
            self._dec_carry = self._final_step(
                self._enc_state, self._dec_carry, jnp.asarray(audio),
                jnp.asarray(rem, jnp.int32),
                jnp.asarray(self._enc_frames, jnp.int32),
            )
            self._enc_frames += pad_frames // self.cfg.model.time_reduction
        toks, score = self._best()
        self._audio = np.zeros((0,), np.float32)
        return toks, score


class MultiStreamTranscriber:
    """``n_streams`` INDEPENDENT live utterances decoded concurrently by
    ONE jit chunk call per tick — the serving-capacity answer to the
    measured fact that a single stream's per-chunk wall time is
    dispatch-latency-bound and flat in batch at these shapes
    (experiments/README.md): stepping S streams together costs ~the same
    wall time as one, so one chip serves ~S streams instead of 1.

    Slot model: a fixed pool of ``n_streams`` rows in one carry pytree.
    ``open()`` leases a free slot (its row reset to the initial carry),
    ``feed(sid, samples)`` only buffers host-side, ``pump()`` runs one
    batched chunk step per round over every slot with a full chunk
    buffered — PADDED-INACTIVE rows participate in the compute but their
    carries are where-masked back, so rows never interact (asserted
    bitwise in tests) — and ``finalize(sid)`` flushes the remainder
    through the masked final chunk, frees the slot, and returns
    ``(tokens, score)``.  Each stream's result is token- and
    score-identical to a batch-1 :class:`StreamingTranscriber` fed the
    same audio (tested, all four family x greedy/beam combinations).

    Greedy and beam, LM fusion and biasing all work (the carries are the
    single-stream carries with a leading slot axis); ``track_frames``
    streaming timestamps are NOT supported — the tracked frame index
    would need a per-row ``frame_base`` the scan does not carry.

    >>> ms = MultiStreamTranscriber(params, cfg, cmvn, max_u, 8)
    >>> a, b = ms.open(), ms.open()
    >>> ms.feed(a, mic_a); ms.feed(b, mic_b)   # buffer only
    >>> ms.pump()                              # one jit call, both advance
    >>> ms.tokens(a), ms.tokens(b)             # live partials
    >>> ms.finalize(a)                         # -> (tokens, score); slot freed
    """

    def __init__(
        self,
        params: dict,
        cfg: Config,
        cmvn: tuple,
        max_u: int,
        n_streams: int,
        chunk_frames: int | None = None,
        max_symbols: int = 4,
        beam_size: int = 1,
        lm_params: dict | None = None,
        lm_step_fn=None,
        lm_weight: float = 0.0,
        ilm_weight: float = 0.0,
        max_stream_frames: int = 60_000,
        bias=None,
    ):
        assert n_streams >= 1, n_streams
        S = self.n_streams = n_streams
        self._bias = bias
        self.beam_size = beam_size
        self._lm_weight = lm_weight
        self.cfg = cfg
        fns = build_stream_fns(
            params, cfg, cmvn, max_u, chunk_frames, max_symbols,
            beam_size, lm_params, lm_step_fn, lm_weight, ilm_weight,
            max_stream_frames, False, bias, batch=S,
        )
        self.chunk_frames = fns["chunk_frames"]
        self._chunk_samples = fns["chunk_samples"]
        self._hop, self._n_fft = cfg.frontend.hop_length, \
            cfg.frontend.n_fft
        enc_dim = cfg.model.enc_out_dim

        def make_dec0(f, b):
            d = f["dec_carry0"]
            if d is None:
                # beams build their carry on first contact; a
                # zero-frame decode materializes that construction for
                # every slot so the masked merges always have both trees
                d = jax.jit(lambda: f["decode_chunk"](
                    jnp.zeros((b, 0, enc_dim)), jnp.zeros((b, 0), bool),
                    None, 0,
                ))()
            return d

        self._init = (fns["enc_state0"], make_dec0(fns, S))
        self._state = self._init

        # Which axis of each carry leaf is the stream axis?  NOT always
        # the leading one: beam LM-fusion state keeps its rows at dim 1
        # with K hypotheses per stream ([L, S*K, H] LSTM h/c,
        # [L, S*K, T, D] transformer KV, [1, S*K] tpos — models/lm.py).
        # Derive it mechanically by shape-diffing against an (S+1)-slot
        # probe (abstract eval only — nothing runs): the one axis whose
        # size changes is the stream axis, and size // S its per-stream
        # multiplicity.  Survives any future carry-layout change by
        # construction (a leaf without exactly one such axis asserts).
        fns_p = build_stream_fns(
            params, cfg, cmvn, max_u, chunk_frames, max_symbols,
            beam_size, lm_params, lm_step_fn, lm_weight, ilm_weight,
            max_stream_frames, False, bias, batch=S + 1,
        )
        probe = jax.eval_shape(
            lambda: (fns_p["enc_state0"], make_dec0(fns_p, S + 1))
        )

        def _spec(a, b):
            diffs = [i for i, (x, y) in enumerate(zip(a.shape, b.shape))
                     if x != y]
            assert len(diffs) == 1 and a.shape[diffs[0]] % S == 0, (
                "carry leaf needs exactly one stream axis: "
                f"{a.shape} vs probe {b.shape}"
            )
            return diffs[0], a.shape[diffs[0]] // S

        specs = [
            _spec(a, b)
            for a, b in zip(jax.tree.leaves(self._init),
                            jax.tree.leaves(probe))
        ]
        n_enc = len(jax.tree.leaves(fns["enc_state0"]))
        enc_dec_specs, dec_specs = specs, specs[n_enc:]

        def merge(active, new, old, sub_specs):
            # keep a row's new value only where its slot is active,
            # masking along each leaf's OWN stream axis
            out = []
            for (ax, m), n, o in zip(sub_specs, jax.tree.leaves(new),
                                     jax.tree.leaves(old)):
                mask = jnp.repeat(active, m).reshape(
                    (1,) * ax + (S * m,) + (1,) * (n.ndim - ax - 1)
                )
                out.append(jnp.where(mask, n, o))
            return jax.tree.unflatten(jax.tree.structure(old), out)

        def _chunk(state, audio, active):
            enc_state, dec = state
            new = fns["chunk_step"](enc_state, dec, audio, 0)
            return merge(active, new, state, enc_dec_specs)

        def _final(state, audio, n_samples, active):
            enc_state, dec = state
            new_dec = fns["final_step"](enc_state, dec, audio,
                                        n_samples, 0)
            return enc_state, merge(active, new_dec, dec, dec_specs)

        def _reset(state, active):
            return merge(active, self._init, state, enc_dec_specs)

        self._chunk_jit = jax.jit(_chunk)
        self._final_jit = jax.jit(_final)
        self._reset_jit = jax.jit(_reset)
        self._buf: list = [None] * S      # None = slot free
        self._dirty = [False] * S         # row differs from init

    def _check(self, sid: int) -> None:
        if not (0 <= sid < self.n_streams and
                self._buf[sid] is not None):
            raise ValueError(f"stream {sid} is not open")

    def open(self) -> int:
        """Lease a free slot -> stream id (its carry row fresh)."""
        for sid in range(self.n_streams):
            if self._buf[sid] is None:
                if self._dirty[sid]:
                    active = np.zeros((self.n_streams,), bool)
                    active[sid] = True
                    self._state = self._reset_jit(
                        self._state, jnp.asarray(active)
                    )
                    self._dirty[sid] = False
                self._buf[sid] = np.zeros((0,), np.float32)
                return sid
        raise ValueError(
            f"all {self.n_streams} stream slots are in use — finalize "
            "one first (or construct with a larger n_streams)"
        )

    def feed(self, sid: int, samples: np.ndarray) -> None:
        """Buffer audio for ``sid`` (host-side only — no compute until
        :meth:`pump`, so many feeds batch into one device call)."""
        self._check(sid)
        self._buf[sid] = np.concatenate(
            [self._buf[sid], np.asarray(samples, np.float32)]
        )

    def pump(self) -> int:
        """Advance every stream with >= 1 full chunk buffered; one jit
        call per round, rounds until no stream has a full chunk.
        -> number of chunk rounds run."""
        S, rounds = self.n_streams, 0
        consumed = self.chunk_frames * self._hop
        while True:
            ready = [i for i in range(S)
                     if self._buf[i] is not None
                     and len(self._buf[i]) >= self._chunk_samples]
            if not ready:
                return rounds
            audio = np.zeros((S, self._chunk_samples), np.float32)
            active = np.zeros((S,), bool)
            for i in ready:
                audio[i] = self._buf[i][: self._chunk_samples]
                active[i] = True
                self._dirty[i] = True
            self._state = self._chunk_jit(
                self._state, jnp.asarray(audio), jnp.asarray(active)
            )
            for i in ready:
                # keep the n_fft - hop overlap the next window needs
                self._buf[i] = self._buf[i][consumed:]
            rounds += 1

    def tokens(self, sid: int) -> list[int]:
        """Best tokens of ``sid`` so far (see
        :attr:`StreamingTranscriber.tokens` for greedy/beam caveats).
        Call :meth:`pump` first to fold buffered audio in."""
        self._check(sid)
        return _best_hyp(
            self._state[1], sid, ctc=self.cfg.model.family == "ctc",
            beam_size=self.beam_size, lm_weight=self._lm_weight,
            bias=self._bias,
        )[0]

    def finalize(self, sid: int) -> tuple[list[int], float]:
        """Flush ``sid``'s remainder through the masked final chunk,
        free its slot -> (tokens, score).  Other streams are untouched
        (beyond any full chunks :meth:`pump` owes them)."""
        self._check(sid)
        self.pump()
        S = self.n_streams
        rem = len(self._buf[sid])
        n_frames = (
            1 + (rem - self._n_fft) // self._hop
            if rem >= self._n_fft else 0
        )
        if n_frames > 0:
            # one static shape — the full chunk buffer, length-masked —
            # so the final step compiles once for every stream/length
            audio = np.zeros((S, self._chunk_samples), np.float32)
            audio[sid, :rem] = self._buf[sid]
            n_samples = np.zeros((S,), np.int32)
            n_samples[sid] = rem
            active = np.zeros((S,), bool)
            active[sid] = True
            self._state = self._final_jit(
                self._state, jnp.asarray(audio),
                jnp.asarray(n_samples), jnp.asarray(active)
            )
            self._dirty[sid] = True
        out = _best_hyp(
            self._state[1], sid, ctc=self.cfg.model.family == "ctc",
            beam_size=self.beam_size, lm_weight=self._lm_weight,
            bias=self._bias,
        )
        self._buf[sid] = None
        return out


def stream_decode(
    params: dict,
    cfg: Config,
    cmvn: tuple,
    audio: np.ndarray,
    max_u: int,
    chunk_frames: int | None = None,
    piece_samples: int | None = None,
    max_symbols: int = 4,
    beam_size: int = 1,
    lm_params: dict | None = None,
    lm_step_fn=None,
    lm_weight: float = 0.0,
    bias=None,
) -> tuple[list[int], float]:
    """Decode ``audio`` by streaming it in ``piece_samples`` pieces."""
    st = StreamingTranscriber(
        params, cfg, cmvn, max_u, chunk_frames, max_symbols,
        beam_size=beam_size, lm_params=lm_params, lm_step_fn=lm_step_fn,
        lm_weight=lm_weight, bias=bias,
    )
    n = piece_samples or len(audio)
    for s in range(0, len(audio), n):
        st.feed(audio[s: s + n])
    return st.finalize()
