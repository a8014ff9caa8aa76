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
        enc_state0 = CL.conformer_stream_init(m, 1)

        def enc_stream(feats, enc_state, frame_lens=None):
            return CL.conformer_listener_apply_stream(
                params["listener"], feats, m, enc_state, rope,
                frame_lens=frame_lens,
            )
    else:
        chunk_frames = chunk_frames or red
        enc_state0 = L.listener_stream_init(m, 1)

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
            1, max_u, track_frames=track_frames,
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
            params, m, 1, max_u, track_frames=track_frames,
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
        feats, _ = F.log_mel_features(
            audio[None], jnp.asarray([audio.shape[0]]), f,
            mean, inv_std,
        )
        feats = feats[:, : chunk_frames]
        enc, enc_state = enc_stream(feats, enc_state)
        mask = jnp.ones((1, enc.shape[1]), bool)
        return enc_state, decode_chunk(enc, mask, dec_carry,
                                       frame_base)

    def final_step(enc_state, dec_carry, audio, n_samples,
                   frame_base):
        feats, flens = F.log_mel_features(
            audio[None], n_samples[None], f, mean, inv_std,
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
        ctc = self.cfg.model.family == "ctc"
        if self.beam_size > 1:
            if self._dec_carry is None:
                return [], 0.0
            if ctc:
                toks, count, _, pb, pnb, lm_score = self._dec_carry[:6]
                scores = np.logaddexp(np.asarray(pb), np.asarray(pnb)) \
                    + self._lm_weight * np.asarray(lm_score)
            else:
                _, _, toks, count, scores = self._dec_carry[:5]
                scores = np.asarray(scores).copy()
            if self._bias is not None:
                # committed bias ranks; pending (mid-phrase) retracts —
                # mirrors the offline beams' final-selection correction
                retract = np.asarray(self._bias.retract)
                if ctc:
                    node, bsc = self._dec_carry[8], self._dec_carry[9]
                    scores = scores + np.asarray(bsc) \
                        - retract[np.asarray(node)]
                else:
                    # transducer: bias already rides the carried scores,
                    # un-retracted
                    scores = scores - retract[np.asarray(
                        self._dec_carry[7]
                    )]
            k = int(np.argmax(np.asarray(scores)[0]))
            out = np.asarray(toks)[0, k][: int(count[0, k])]
            return [int(x) for x in out], float(np.asarray(scores)[0, k])
        if ctc:
            _, out, count, score = self._dec_carry[:4]
        else:
            _, _, out, count, score = self._dec_carry[:5]
        score = float(np.asarray(score)[0])
        if self._bias is not None:
            # greedy biased carries: committed bias ranks, pending
            # (mid-phrase) retracts — same correction as the beams
            retract = np.asarray(self._bias.retract)
            if ctc:
                node, bsc = self._dec_carry[-2], self._dec_carry[-1]
                score += float(np.asarray(bsc)[0]) \
                    - float(retract[int(np.asarray(node)[0])])
            else:
                # transducer: bias rides the carried score un-retracted
                node = self._dec_carry[-1]
                score -= float(retract[int(np.asarray(node)[0])])
        return ([int(x) for x in np.asarray(out[0])[: int(count[0])]],
                score)

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
