"""Fabricate a LibriSpeech-shaped FLAC corpus at soak scale.

The recipe-scale dress rehearsal (VERDICT r2 next #1) needs a corpus
"large enough not to be memorized": >=20k labeled + >=40k unlabeled
utterances with a realistic length distribution, written as real FLAC
trees that `data/preprocess.py librispeech` and the training pipeline
consume exactly like LibriSpeech (the point is to exercise the REAL
corpus path — native FLAC decode, STREAMINFO length probes, manifest
scans, bucket grid — at scale, not to invent a new data format).

Language: a word-level sparse-Markov grammar over a generated lexicon
(deterministic in --lang-seed so every split speaks the SAME language;
per-split sampling seeds differ).  Transcripts are the word strings;
audio is the per-CHARACTER two-tone signature concatenation the whole
synthetic stack uses (data/synthetic.py), so the acoustics are learnable
but the transcript distribution (~10^20 sentences) cannot be memorized
from 20k samples.  Semi-supervised terms get exactly what they exploit
on real data: unlabeled audio/text drawn from the same language.

Length distribution: log-normal around --mean-secs clipped to
[--min-secs, --max-secs] — matching ls100_semi's 400..1600-frame bucket
grid (4..16 s) with a realistic long tail.

Encoding: the native VERBATIM FLAC encoder (native/flac_encoder.cpp,
~6700x real-time) — the pure-Python fixture encoder would take hours at
this scale.  ~8 GB on disk for the default 61k utterances.

Usage:
  python experiments/soak_corpus.py --root /data/soak_ls \
      --labeled 20000 --unlabeled 40000 --dev 512 --test 512
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from semi_supervised_asr_tpu.data.synthetic import (
    _token_signature,
    hard_utterance_audio,
)
from semi_supervised_asr_tpu.data.vocab import char_vocab
from semi_supervised_asr_tpu.utils.flac import write_flac_verbatim

SR = 16000
CHAR_DUR_S = 0.12          # per-character signature length (synthetic.py)
SEG = int(CHAR_DUR_S * SR)


def build_lexicon(rng: np.random.Generator, n_words: int) -> list[str]:
    """Random pronounceable-ish words, 2-9 chars, unique."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    # Zipf-ish letter weights so words look vaguely natural
    w = 1.0 / (np.arange(26) + 3.0)
    rng.shuffle(w)
    w /= w.sum()
    words: list[str] = []
    seen = set()
    while len(words) < n_words:
        n = int(rng.integers(2, 10))
        word = "".join(rng.choice(letters, n, p=w))
        if word not in seen:
            seen.add(word)
            words.append(word)
    return words


def successor_table(rng: np.random.Generator, n_words: int,
                    branching: int) -> np.ndarray:
    """[W, branching] allowed-successor ids — the sparse Markov grammar
    (same construction as data/synthetic.grammar_successors, word-level)."""
    return np.stack([
        rng.choice(n_words, size=branching, replace=False)
        for _ in range(n_words)
    ])


class SentenceSampler:
    """Walk the word-level Markov grammar until the sentence reaches the
    target character budget (chars drive audio duration)."""

    def __init__(self, rng, lexicon, succ):
        self.rng = rng
        self.lex = lexicon
        self.succ = succ
        self.word_ids = np.arange(len(lexicon))

    def sample(self, target_chars: int) -> str:
        wid = int(self.rng.integers(len(self.lex)))
        words = [self.lex[wid]]
        n = len(words[0])
        while True:
            wid = int(self.succ[wid, self.rng.integers(self.succ.shape[1])])
            w = self.lex[wid]
            # never OVERSHOOT the budget: target_chars encodes the
            # --max-secs cap, and one word past it (~+1.2 s) would push
            # the long tail beyond the training bucket grid
            if n + 1 + len(w) > target_chars:
                break
            words.append(w)
            n += 1 + len(w)
        return " ".join(words)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--labeled", type=int, default=20000)
    p.add_argument("--unlabeled", type=int, default=40000)
    p.add_argument("--dev", type=int, default=512)
    p.add_argument("--test", type=int, default=512)
    p.add_argument("--lang-seed", type=int, default=97)
    p.add_argument("--lexicon", type=int, default=800)
    p.add_argument("--branching", type=int, default=12)
    p.add_argument("--mean-secs", type=float, default=6.0)
    p.add_argument("--min-secs", type=float, default=1.6)
    p.add_argument("--max-secs", type=float, default=15.5)
    p.add_argument("--noise", type=float, default=0.01)
    p.add_argument("--difficulty", type=float, default=0.0,
                   help=">0: hard-mode acoustics with a calibrated "
                        "nonzero error floor (confusable char groups + "
                        "speaker warp + rate jitter + channel tilt + "
                        "SNR; data/synthetic.py hard_params) — the r4 "
                        "deterministic signatures are solved to WER "
                        "0.0000 at soak scale, so quality studies need "
                        "this knob")
    p.add_argument("--utts-per-chapter", type=int, default=200)
    args = p.parse_args()

    lang_rng = np.random.default_rng(args.lang_seed)
    lexicon = build_lexicon(lang_rng, args.lexicon)
    succ = successor_table(lang_rng, args.lexicon, args.branching)
    vocab = char_vocab()
    # cache per-char signatures once (content ids 4..)
    sig = {i: _token_signature(i, SEG, SR).astype(np.float32)
           for i in range(4, vocab.size)}

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    (root / "LANG.json").write_text(json.dumps({
        "lang_seed": args.lang_seed, "lexicon_size": args.lexicon,
        "branching": args.branching, "char_dur_s": CHAR_DUR_S,
        "mean_secs": args.mean_secs, "difficulty": args.difficulty,
    }, indent=1))

    splits = [
        ("train-clean-100", args.labeled, 11),
        ("train-clean-360", args.unlabeled, 22),
        ("dev-clean", args.dev, 33),
        ("test-clean", args.test, 44),
    ]
    t00 = time.time()
    total_secs = 0.0
    touched: set = set()
    for split, n_utts, seed in splits:
        if n_utts <= 0:
            continue
        rng = np.random.default_rng((args.lang_seed, seed))
        sampler = SentenceSampler(rng, lexicon, succ)
        t0 = time.time()
        split_secs = 0.0
        for i in range(n_utts):
            spk = 100 + i // (args.utts_per_chapter * 4)
            chap = 1000 + (i // args.utts_per_chapter) % 4
            d = root / split / str(spk) / str(chap)
            if i % args.utts_per_chapter == 0:
                d.mkdir(parents=True, exist_ok=True)
            # log-normal length with the LS long tail
            dur = float(np.exp(rng.normal(np.log(args.mean_secs), 0.45)))
            dur = min(max(dur, args.min_secs), args.max_secs)
            budget = int(dur / CHAR_DUR_S)
            max_samples = int(args.max_secs * SR)
            while True:
                text = sampler.sample(budget)
                ids = vocab.encode_text(text, add_sos_eos=False)
                if args.difficulty > 0.0:
                    # hard mode: per-utterance speaker/rate/channel
                    # realization + SNR noise (data/synthetic.py) —
                    # sub-streams forked off the split rng so the corpus
                    # stays deterministic in (lang_seed, split)
                    audio = hard_utterance_audio(
                        np.asarray(ids),
                        acoustic_rng=np.random.default_rng(
                            rng.integers(2**63)),
                        dur_rng=np.random.default_rng(rng.integers(2**63)),
                        sample_rate=SR, base_seg=SEG,
                        difficulty=args.difficulty, vocab_size=vocab.size,
                    )
                else:
                    audio = np.concatenate([sig[t] for t in ids])
                    audio = audio + args.noise * rng.standard_normal(
                        len(audio)).astype(np.float32)
                if len(audio) <= max_samples:
                    break
                # rate jitter overshot the --max-secs cap (rare, long
                # tail only): shrink the char budget and resample —
                # NEVER ship an utterance past the bucket grid (the r3
                # soak silently dropped its overshoots)
                budget = int(budget * 0.95) - 1
            pcm = np.clip(audio * 16000.0, -32767, 32767).astype(np.int16)
            uid = f"{spk}-{chap}-{i:06d}"
            write_flac_verbatim(d / f"{uid}.flac", pcm, SR)
            tf = d / f"{spk}-{chap}.trans.txt"
            # truncate on first touch THIS run: append-only would
            # duplicate every line when re-fabricating into the same
            # --root (the FLACs overwrite, the transcripts must too)
            mode = "a" if str(tf) in touched else "w"
            touched.add(str(tf))
            with open(tf, mode) as f:
                f.write(f"{uid} {text.upper()}\n")
            split_secs += len(pcm) / SR
        total_secs += split_secs
        print(f"{split}: {n_utts} utts, {split_secs/3600:.2f} h audio, "
              f"{time.time()-t0:.0f}s wall", flush=True)
    print(json.dumps({
        "root": str(root), "hours_audio": round(total_secs / 3600, 2),
        "wall_s": round(time.time() - t00, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
