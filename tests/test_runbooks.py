"""Full-runbook acceptance on generated mini-corpora (VERDICT r1 #3).

The docs/RECIPES.md workflows executed EXACTLY as a user would — via
subprocess through the public CLIs — against corpus trees fabricated in
the real on-disk formats:

* TIMIT-shaped: NIST SPHERE audio named .WAV + .PHN phone transcripts +
  SA dialect sentences (which preprocess must skip), DR*/speaker dirs;
* LibriSpeech-shaped: FLAC audio (exercising the native C++ decoder) +
  *.trans.txt, speaker/chapter dirs.

Each runbook: preprocess -> train -> --test (error-rate gate on the
train split — the C1 overfit contract) -> then the serving chain on the
TIMIT run: lm_trainer -> decode with shallow fusion -> selftrain ->
transcribe -> export.  Audio is synthesized from per-token tone
signatures (data/synthetic.py) so the mapping is learnable; the gate
threshold is deliberately loose — this test proves the documented
WORKFLOW end-to-end, the tight learning gates live in
tests/test_integration.py.

Marked ``runbook`` (slow, ~6-10 min on this 1-core host); included in
the full merge-gate suite, excluded from `-m quick`.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from semi_supervised_asr_tpu.data.synthetic import _token_signature
from semi_supervised_asr_tpu.data.vocab import char_vocab, timit_vocab
from tests.flac_writer import encode_flac
from tests.test_sphere import write_sphere

pytestmark = pytest.mark.runbook

SR = 16000
SEG = int(0.12 * SR)        # samples per token signature


def run(args, timeout=560):
    r = subprocess.run([sys.executable, "-m"] + args,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"{args[:3]}...\n{r.stdout[-800:]}\n{r.stderr[-2000:]}"
    return r


def _signature_audio(ids, rng):
    audio = np.concatenate([_token_signature(int(i), SEG, SR) for i in ids])
    audio = audio + 0.01 * rng.standard_normal(len(audio))
    return np.clip(audio * 16000.0, -32767, 32767).astype(np.int16)


# --------------------------------------------------------------------- #
# corpus fabrication
# --------------------------------------------------------------------- #

def build_timit_tree(root: Path, n_train=16, n_test=4, seed=0):
    vocab = timit_vocab()
    content = vocab.tokens[4:]          # 61 phones
    rng = np.random.default_rng(seed)

    def write_utt(d, stem, phones):
        ids = vocab.encode_text(" ".join(phones))
        write_sphere(d / f"{stem}.WAV", _signature_audio(ids, rng))
        lines = [f"{k * SEG} {(k + 1) * SEG} {p}"
                 for k, p in enumerate(phones)]
        (d / f"{stem}.PHN").write_text("\n".join(lines) + "\n")

    for split, n in (("TRAIN", n_train), ("TEST", n_test)):
        for i in range(n):
            d = root / split / "DR1" / f"SPK{i % 4}"
            d.mkdir(parents=True, exist_ok=True)
            phones = list(rng.choice(content, int(rng.integers(3, 6))))
            write_utt(d, f"SX{i}", phones)
    # SA dialect-calibration sentence: preprocess must SKIP it in any split
    d = root / "TRAIN" / "DR1" / "SPK0"
    write_utt(d, "SA1", ["aa", "iy"])
    return n_train, n_test


def build_ls_tree(root: Path, n_train=16, n_dev=4, seed=1):
    vocab = char_vocab()
    lexicon = ["ab", "cade", "beef", "dig", "chao"]
    rng = np.random.default_rng(seed)

    def write_split(split, n):
        d = root / split / "101" / "1001"
        d.mkdir(parents=True, exist_ok=True)
        lines = []
        for i in range(n):
            words = rng.choice(lexicon, int(rng.integers(2, 4)))
            text = " ".join(words)
            ids = vocab.encode_text(text)    # chars incl the space token
            uid = f"101-1001-{split[:2]}{i:04d}"
            (d / f"{uid}.flac").write_bytes(
                bytes(encode_flac(_signature_audio(ids, rng)))
            )
            lines.append(f"{uid} {text.upper()}")
        (d / "101-1001.trans.txt").write_text("\n".join(lines) + "\n")

    write_split("train-clean-100", n_train)
    write_split("dev-clean", n_dev)
    return n_train, n_dev


TINY = [
    "model.enc_hidden=32", "model.enc_layers=2", "model.enc_base_layers=1",
    "model.attn_dim=32", "model.attn_conv_channels=4",
    "model.attn_conv_width=11", "model.dec_hidden=64", "model.embed_dim=32",
    "model.compute_dtype=float32", "model.lstm_backend=xla",
    "train.batch_size=8", "train.learning_rate=0.003",
    "train.lr_schedule=constant", "train.warmup_steps=0",
    "train.eval_every=0", "train.log_every=50", "train.ckpt_every=100",
    "data.frame_buckets=[104]", "data.token_buckets=[8]",
    "decode.max_decode_len=8",
]


class TestTimitRunbook:
    def test_full_timit_runbook(self, tmp_path):
        root, out = tmp_path / "TIMIT", tmp_path / "data"
        wd = tmp_path / "runs"
        n_train, n_test = build_timit_tree(root)

        # 1. preprocess (RECIPES.md step 1) — .WAV here is real SPHERE
        run(["semi_supervised_asr_tpu.data.preprocess", "timit",
             "--root", str(root), "--out", str(out)])
        train_man = [json.loads(l) for l in open(out / "train.jsonl")]
        assert len(train_man) == n_train          # SA1 skipped
        assert not any("SA1" in e["uid"] for e in train_man)
        assert (out / "vocab.json").exists()
        assert len([*open(out / "dev.jsonl")]) == n_test

        # 2. train (step 2; tiny dims, 200 steps)
        ov = TINY + [f"data.data_dir={out}", "train.total_steps=200"]
        run(["semi_supervised_asr_tpu.main", "--config",
             "configs/timit.yaml", "--train", "--workdir", str(wd),
             "--platform", "cpu", "--"] + ov)

        # 3. score PER on the TRAIN split (overfit gate, C1)
        r = run(["semi_supervised_asr_tpu.main", "--config",
                 "configs/timit.yaml", "--test", "--load-dir", str(wd),
                 "--platform", "cpu", "--hyp-out", str(wd / "hyps.jsonl"),
                 "--"] + ov + ["data.test_split=train"])
        per = json.loads(r.stdout.strip().splitlines()[-1])["per"]
        assert per <= 0.25, f"train-split PER gate failed: {per}"

        # 4. LM + shallow-fusion decode (RECIPES.md "Language models")
        run(["semi_supervised_asr_tpu.training.lm_trainer", "--config",
             "configs/timit.yaml", "--workdir", str(tmp_path / "lm"),
             "--platform", "cpu", f"data.data_dir={out}",
             "lm.total_steps=40", "lm.log_every=20", "lm.hidden=64",
             "lm.embed_dim=32"])
        r = run(["semi_supervised_asr_tpu.main", "--config",
                 "configs/timit.yaml", "--test", "--load-dir", str(wd),
                 "--platform", "cpu", "--"] + ov + [
                 "data.test_split=train",
                 f"decode.lm_ckpt={tmp_path / 'lm'}",
                 "decode.lm_weight=0.1", "lm.hidden=64", "lm.embed_dim=32"])
        fused = json.loads(r.stdout.strip().splitlines()[-1])
        assert fused["per"] <= 0.5

        # 5. self-training round (RECIPES.md "Offline alternative")
        r = run(["semi_supervised_asr_tpu.selftrain", "--config",
                 "configs/timit.yaml", "--load-dir", str(wd),
                 "--manifest", str(out / "dev.jsonl"),
                 "--out", str(out / "round1.jsonl"), "--beam", "1",
                 "--keep-frac", "0.8", "--platform", "cpu"] + ov)
        st = json.loads(r.stdout.strip().splitlines()[-1])
        assert st["kept"] > 0
        assert (out / "round1.jsonl").exists()

        # 6. label-free transcription of a raw SPHERE file
        wav = next((root / "TRAIN").rglob("SX0.WAV"))
        r = run(["semi_supervised_asr_tpu.transcribe", "--config",
                 "configs/timit.yaml", "--load-dir", str(wd),
                 "--platform", "cpu", "--beam", "2", str(wav)] + ov)
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        assert "text" in rec and rec["audio"].endswith("SX0.WAV")

        # 7. serving export (StableHLO artifact, params baked)
        run(["semi_supervised_asr_tpu.export", "--config",
             "configs/timit.yaml", "--load-dir", str(wd),
             "--out", str(wd / "exp"), "--batch", "2", "--frames", "104",
             "--greedy", "--platform", "cpu"] + ov)
        assert (wd / "exp" / "manifest.json").exists()


class TestLibriSpeechRunbook:
    def test_full_librispeech_runbook(self, tmp_path):
        root, out = tmp_path / "LibriSpeech", tmp_path / "data"
        wd = tmp_path / "runs"
        n_train, n_dev = build_ls_tree(root)

        # 1. preprocess: FLAC through the native C++ decoder; --bpe also
        #    trains a tokenizer from the first split (artifact check only)
        run(["semi_supervised_asr_tpu.data.preprocess", "librispeech",
             "--root", str(root), "--out", str(out), "--bpe", "40"])
        assert len([*open(out / "train-clean-100.jsonl")]) == n_train
        assert len([*open(out / "dev.jsonl")]) == n_dev
        assert (out / "bpe.json").exists()

        # 2. train chars (configs/ls100.yaml surface)
        ov = TINY + [
            f"data.data_dir={out}", "train.total_steps=250",
            "data.frame_buckets=[208]",    # longest utt ~168 frames
            "data.token_buckets=[16]", "decode.max_decode_len=16",
            "frontend.spec_augment=false",
        ]
        run(["semi_supervised_asr_tpu.main", "--config",
             "configs/ls100.yaml", "--train", "--workdir", str(wd),
             "--platform", "cpu", "--"] + ov)

        # 3. CER/WER gate on the train split
        r = run(["semi_supervised_asr_tpu.main", "--config",
                 "configs/ls100.yaml", "--test", "--load-dir", str(wd),
                 "--platform", "cpu", "--"] + ov +
                ["data.test_split=train-clean-100"])
        res = json.loads(r.stdout.strip().splitlines()[-1])
        assert "wer" in res          # word-level WER beside CER for chars
        assert res["cer"] <= 0.35, res


class TestTransducerRunbook:
    def test_streaming_transducer_runbook(self, tmp_path):
        """The RNN-T + streaming workflow exactly as documented
        (docs/RECIPES.md "RNN-T transducer family"): preprocess ->
        train a CAUSAL transducer -> --test (alignment-synchronous
        beam) -> transcribe offline and --streaming (texts must agree:
        the streaming path is exact) -> serving export of the beam."""
        root, out = tmp_path / "LibriSpeech", tmp_path / "data"
        wd = tmp_path / "runs"
        build_ls_tree(root)

        run(["semi_supervised_asr_tpu.data.preprocess", "librispeech",
             "--root", str(root), "--out", str(out)])

        ov = TINY + [
            f"data.data_dir={out}", "train.total_steps=250",
            "data.frame_buckets=[208]", "data.token_buckets=[16]",
            "decode.max_decode_len=16", "frontend.spec_augment=false",
            # the family + the streaming contract
            "model.family=transducer", "model.enc_bidirectional=false",
            "frontend.center=false",
            "model.pred_hidden=64", "model.joint_dim=64",
            "model.embed_dim=32", "decode.beam_size=3",
        ]
        run(["semi_supervised_asr_tpu.main", "--config",
             "configs/ls100.yaml", "--train", "--workdir", str(wd),
             "--platform", "cpu", "--"] + ov)

        # beam-decode CER gate on the train split
        r = run(["semi_supervised_asr_tpu.main", "--config",
                 "configs/ls100.yaml", "--test", "--load-dir", str(wd),
                 "--platform", "cpu", "--"] + ov +
                ["data.test_split=train-clean-100"])
        res = json.loads(r.stdout.strip().splitlines()[-1])
        assert res["mode"] == "beam"
        assert res["cer"] <= 0.5, res

        # offline vs streaming transcribe agree on a real corpus file
        flac = next((root / "train-clean-100").rglob("*.flac"))
        r1 = run(["semi_supervised_asr_tpu.transcribe", "--config",
                  "configs/ls100.yaml", "--load-dir", str(wd),
                  "--platform", "cpu", "--beam", "1", str(flac)] + ov)
        off = json.loads(r1.stdout.strip().splitlines()[-1])
        r2 = run(["semi_supervised_asr_tpu.transcribe", "--config",
                  "configs/ls100.yaml", "--load-dir", str(wd),
                  "--platform", "cpu", "--beam", "1", "--streaming",
                  "--stream-chunk-ms", "250", str(flac)] + ov)
        stream = json.loads(r2.stdout.strip().splitlines()[-1])
        assert stream["streaming"] is True
        assert stream["text"] == off["text"], (stream, off)

        # serving export bakes the transducer beam
        exp = tmp_path / "exp"
        run(["semi_supervised_asr_tpu.export", "--config",
             "configs/ls100.yaml", "--load-dir", str(wd), "--out",
             str(exp), "--batch", "2", "--frames", "208",
             "--platform", "cpu"] + ov)
        man = json.loads((exp / "manifest.json").read_text())
        assert man["artifacts"][0]["mode"] == "beam"


class TestCTCRunbook:
    def test_streaming_ctc_runbook(self, tmp_path):
        """The CTC workflow exactly as documented (docs/RECIPES.md "CTC
        family"): preprocess -> train a CAUSAL CTC model -> --test
        (prefix beam) -> transcribe offline and --streaming (texts must
        agree: the streaming path is exact) -> serving export."""
        root, out = tmp_path / "LibriSpeech", tmp_path / "data"
        wd = tmp_path / "runs"
        build_ls_tree(root)

        run(["semi_supervised_asr_tpu.data.preprocess", "librispeech",
             "--root", str(root), "--out", str(out)])

        ov = TINY + [
            f"data.data_dir={out}", "train.total_steps=250",
            "data.frame_buckets=[208]", "data.token_buckets=[16]",
            "decode.max_decode_len=16", "frontend.spec_augment=false",
            # the family + the streaming contract
            "model.family=ctc", "model.enc_bidirectional=false",
            "frontend.center=false", "decode.beam_size=3",
        ]
        run(["semi_supervised_asr_tpu.main", "--config",
             "configs/ls100_ctc.yaml", "--train", "--workdir", str(wd),
             "--platform", "cpu", "--"] + ov)

        # prefix-beam CER gate on the train split
        r = run(["semi_supervised_asr_tpu.main", "--config",
                 "configs/ls100_ctc.yaml", "--test", "--load-dir", str(wd),
                 "--platform", "cpu", "--"] + ov +
                ["data.test_split=train-clean-100"])
        res = json.loads(r.stdout.strip().splitlines()[-1])
        assert res["mode"] == "beam"
        assert res["cer"] <= 0.5, res

        # offline vs streaming transcribe agree on a real corpus file,
        # greedy AND prefix beam
        flac = next((root / "train-clean-100").rglob("*.flac"))
        for beam in ("1", "3"):
            r1 = run(["semi_supervised_asr_tpu.transcribe", "--config",
                      "configs/ls100_ctc.yaml", "--load-dir", str(wd),
                      "--platform", "cpu", "--beam", beam, str(flac)] + ov)
            off = json.loads(r1.stdout.strip().splitlines()[-1])
            r2 = run(["semi_supervised_asr_tpu.transcribe", "--config",
                      "configs/ls100_ctc.yaml", "--load-dir", str(wd),
                      "--platform", "cpu", "--beam", beam, "--streaming",
                      "--stream-chunk-ms", "250", str(flac)] + ov)
            stream = json.loads(r2.stdout.strip().splitlines()[-1])
            assert stream["streaming"] is True
            assert stream["text"] == off["text"], (beam, stream, off)

        # serving export bakes the prefix beam
        exp = tmp_path / "exp"
        run(["semi_supervised_asr_tpu.export", "--config",
             "configs/ls100_ctc.yaml", "--load-dir", str(wd), "--out",
             str(exp), "--batch", "2", "--frames", "208",
             "--platform", "cpu"] + ov)
        man = json.loads((exp / "manifest.json").read_text())
        assert man["artifacts"][0]["mode"] == "beam"
