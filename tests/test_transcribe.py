"""Transcribe CLI: label-free audio-in -> text-out inference.

Strong correctness check: write the synthetic TRAINING utterances (which
an overfit checkpoint decodes to ~0 PER) out as WAV files and transcribe
them back — the texts must match the ground truth.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from semi_supervised_asr_tpu.config import load_config
from semi_supervised_asr_tpu.training.solver import Solver

CONFIG = "configs/synthetic_smoke.yaml"


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    wd = tmp_path_factory.mktemp("tr_train")
    cfg = load_config(CONFIG, [
        "data.num_synthetic_utts=16", "train.batch_size=8",
        "train.learning_rate=0.003", "train.total_steps=200",
        "train.eval_every=0", "train.ckpt_every=200", "train.log_every=100",
    ])
    solver = Solver(cfg, wd, use_mesh=False)
    solver.train()
    return solver, wd


def write_utt_wavs(solver, out_dir, n=8):
    from scipy.io import wavfile

    paths, texts = [], []
    for i in range(n):
        utt = solver.bundle.train[i]
        data = np.clip(utt.audio * 32767, -32768, 32767).astype(np.int16)
        p = out_dir / f"utt{i}.wav"
        wavfile.write(p, solver.cfg.frontend.sample_rate, data)
        paths.append(p)
        texts.append(utt.text)
    return paths, texts


class TestTranscribe:
    def test_overfit_utts_transcribed_back(self, trained, tmp_path):
        from semi_supervised_asr_tpu.transcribe import transcribe

        solver, _ = trained
        paths, texts = write_utt_wavs(solver, tmp_path)
        results = transcribe(solver, paths, "greedy")
        assert [r["audio"] for r in results] == [str(p) for p in paths]
        matches = sum(r["text"] == t for r, t in zip(results, texts))
        assert matches >= 6, list(zip([r["text"] for r in results], texts))

    def test_flac_input_and_directory(self, trained, tmp_path):
        from tests import flac_writer as fw

        from semi_supervised_asr_tpu.transcribe import collect_files, transcribe

        solver, _ = trained
        utt = solver.bundle.train[0]
        sig = np.clip(utt.audio * 32767, -32768, 32767).astype(np.int64)
        d = tmp_path / "audio"
        d.mkdir()
        (d / "a.flac").write_bytes(fw.encode_flac(sig))
        files = collect_files([str(d)])
        assert len(files) == 1
        results = transcribe(solver, files, "greedy")
        assert results[0]["text"] == utt.text

    def test_cli_end_to_end(self, trained, tmp_path):
        solver, wd = trained
        paths, texts = write_utt_wavs(solver, tmp_path, n=3)
        out = subprocess.run(
            [sys.executable, "-m", "semi_supervised_asr_tpu.transcribe",
             "--config", CONFIG, "--load-dir", str(wd), "--beam", "1",
             "--platform", "cpu", "--out", str(tmp_path / "h.jsonl"),
             *[str(p) for p in paths], "data.num_synthetic_utts=16"],
            capture_output=True, text=True, timeout=560,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
        assert len(lines) == 3
        assert {"audio", "text", "score"} <= set(lines[0])
        saved = [json.loads(l) for l in open(tmp_path / "h.jsonl")]
        assert saved == lines

    def test_overlong_chunked_with_warning(self, trained, tmp_path,
                                           capsys):
        """Files beyond the largest bucket are decoded in chunks and the
        texts joined — full coverage, not truncation."""
        from scipy.io import wavfile

        from semi_supervised_asr_tpu.transcribe import transcribe

        solver, _ = trained
        max_frames = solver.spec.frame_buckets[-1]
        s = solver.spec.samples_for_frames(max_frames) * 3
        rng = np.random.default_rng(0)
        p = tmp_path / "long.wav"
        wavfile.write(p, 16000,
                      (rng.normal(0, 0.05, s) * 32767).astype(np.int16))
        results = transcribe(solver, [p], "greedy")
        assert len(results) == 1  # one record for the whole file
        assert results[0]["chunks"] >= 3
        assert "chunks" in capsys.readouterr().err

    def test_chunked_long_file_covers_all_content(self, trained, tmp_path):
        """Concatenating two training utterances beyond the bucket limit
        must transcribe BOTH texts (the old behavior truncated the tail)."""
        from scipy.io import wavfile

        from semi_supervised_asr_tpu.transcribe import transcribe

        solver, _ = trained
        max_frames = solver.spec.frame_buckets[-1]
        chunk_samples = solver.spec.samples_for_frames(max_frames)
        u0, u1 = solver.bundle.train[0], solver.bundle.train[1]
        a0 = np.zeros(chunk_samples, np.float32)
        a0[: len(u0.audio)] = u0.audio          # chunk 1 = utt0 (padded)
        audio = np.concatenate([a0, u1.audio])  # chunk 2 = utt1
        p = tmp_path / "two.wav"
        wavfile.write(p, 16000,
                      np.clip(audio * 32767, -32768, 32767).astype(np.int16))
        results = transcribe(solver, [p], "greedy")
        assert results[0]["chunks"] == 2
        assert u1.text in results[0]["text"]    # the tail is NOT lost


class TestNBestTranscribe:
    def test_nbest_records(self, trained, tmp_path):
        from semi_supervised_asr_tpu.transcribe import transcribe

        solver, _ = trained
        paths, texts = write_utt_wavs(solver, tmp_path, n=2)
        results = transcribe(solver, paths, "beam", nbest=3)
        for r in results:
            assert len(r["nbest"]) == 3
            assert r["nbest"][0]["text"] == r["text"]
            scores = [c["score"] for c in r["nbest"]]
            assert scores == sorted(scores, reverse=True)


@pytest.fixture(scope="module")
def trained_ctc(tmp_path_factory):
    """Overfit ctc-family checkpoint: hypotheses match the ground truth,
    so forced-alignment timestamps are meaningful."""
    wd = tmp_path_factory.mktemp("tr_ctc")
    cfg = load_config(CONFIG, [
        "model.family=ctc",
        "data.num_synthetic_utts=16", "train.batch_size=8",
        "train.learning_rate=0.003", "train.total_steps=200",
        "train.eval_every=0", "train.ckpt_every=200", "train.log_every=100",
    ])
    solver = Solver(cfg, wd, use_mesh=False)
    solver.train()
    return solver, wd


class TestTimestamps:
    def test_ctc_forced_alignment_times(self, trained_ctc, tmp_path):
        """Synthetic tokens are laid out on a KNOWN time grid
        (token_dur_s per token), so alignment must localize each one
        inside (a tolerance of) its true segment — correctness of the
        times, not just the schema."""
        from semi_supervised_asr_tpu.transcribe import transcribe

        solver, _ = trained_ctc
        paths, texts = write_utt_wavs(solver, tmp_path, n=6)
        results = transcribe(solver, paths, "greedy", timestamps=True)
        dur = 0.12  # data/synthetic.py token_dur_s default
        checked = 0
        for r, text in zip(results, texts):
            if r["text"] != text:
                continue  # only grade timing where the hyp is right
            toks = r["tokens"]
            assert [t["t"] for t in toks] == text.split()
            prev_end = 0.0
            for j, t in enumerate(toks):
                true_mid = (j + 0.5) * dur
                assert t["start_s"] < t["end_s"]
                assert t["start_s"] >= prev_end  # non-overlapping
                # the token's span must cover (or graze) its true middle
                assert t["start_s"] - 0.75 * dur <= true_mid \
                    <= t["end_s"] + 0.75 * dur, (j, t, true_mid)
                prev_end = t["start_s"]
            checked += 1
        assert checked >= 4, f"only {checked} hyps matched"

    def test_las_without_ctc_head_rejects(self, trained, tmp_path):
        from semi_supervised_asr_tpu.transcribe import transcribe

        solver, _ = trained
        paths, _ = write_utt_wavs(solver, tmp_path, n=1)
        with pytest.raises(AssertionError, match="CTC head"):
            transcribe(solver, paths, "greedy", timestamps=True)

    def test_cli_timestamps(self, trained_ctc, tmp_path):
        solver, wd = trained_ctc
        paths, _ = write_utt_wavs(solver, tmp_path, n=2)
        out = subprocess.run(
            [sys.executable, "-m", "semi_supervised_asr_tpu.transcribe",
             "--config", CONFIG, "--load-dir", str(wd), "--beam", "1",
             "--timestamps", "--platform", "cpu",
             *[str(p) for p in paths],
             "data.num_synthetic_utts=16", "model.family=ctc"],
            capture_output=True, text=True, timeout=560,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
        assert len(lines) == 2
        for rec in lines:
            assert "tokens" in rec
            for t in rec["tokens"]:
                assert set(t) == {"t", "start_s", "end_s"}

    def test_streaming_timestamps_greedy_only(self, trained_ctc, tmp_path):
        """Streaming timestamps ARE supported (live-caption times from the
        chunked greedy carries, commit 1798ad7) — but only at beam 1: the
        beam carries keep no frame slot, so --streaming --timestamps with
        --beam >1 must exit with the greedy-only message."""
        solver, wd = trained_ctc
        paths, _ = write_utt_wavs(solver, tmp_path, n=1)
        out = subprocess.run(
            [sys.executable, "-m", "semi_supervised_asr_tpu.transcribe",
             "--config", CONFIG, "--load-dir", str(wd), "--beam", "2",
             "--timestamps", "--streaming", "--platform", "cpu",
             str(paths[0]), "data.num_synthetic_utts=16",
             "model.family=ctc"],
            capture_output=True, text=True, timeout=560,
        )
        assert out.returncode != 0
        assert "greedy-only" in out.stderr


class TestForcedAlignCLI:
    """python -m semi_supervised_asr_tpu.align — reference-text forced
    alignment (corpus tooling on ops/ctc_align.py)."""

    def _manifest(self, solver, tmp_path, n=4):
        paths, texts = write_utt_wavs(solver, tmp_path, n=n)
        man = tmp_path / "man.jsonl"
        with open(man, "w") as f:
            for i, (p, t) in enumerate(zip(paths, texts)):
                f.write(json.dumps(
                    {"uid": f"u{i}", "audio": str(p), "text": t}) + "\n")
        return man, paths, texts

    def test_align_entries_times_on_true_grid(self, trained_ctc, tmp_path):
        from semi_supervised_asr_tpu.align import align_entries
        from semi_supervised_asr_tpu.selftrain import read_manifest

        solver, _ = trained_ctc
        man, _, texts = self._manifest(solver, tmp_path)
        recs = align_entries(solver, read_manifest(man), tmp_path)
        dur = 0.12  # data/synthetic.py token_dur_s default
        for rec, text in zip(recs, texts):
            assert "failed" not in rec, rec
            assert rec["text"] == text
            assert np.isfinite(rec["logp_per_frame"])
            toks = rec["tokens"]
            assert [t["t"] for t in toks] == text.split()
            for j, t in enumerate(toks):
                true_mid = (j + 0.5) * dur
                assert t["start_s"] - 0.75 * dur <= true_mid \
                    <= t["end_s"] + 0.75 * dur, (j, t)

    def test_infeasible_transcript_marked_failed(self, trained_ctc,
                                                 tmp_path):
        from semi_supervised_asr_tpu.align import align_entries

        solver, _ = trained_ctc
        _, paths, texts = self._manifest(solver, tmp_path, n=1)
        # same audio, transcript repeated: more tokens than frames
        entry = {"uid": "x", "audio": str(paths[0]),
                 "text": " ".join([texts[0]] * 6)}
        recs = align_entries(solver, [entry], tmp_path)
        assert "failed" in recs[0]
        assert "tokens" not in recs[0]

    def test_cli_end_to_end(self, trained_ctc, tmp_path):
        solver, wd = trained_ctc
        man, _, _ = self._manifest(solver, tmp_path, n=2)
        out_path = tmp_path / "aligned.jsonl"
        out = subprocess.run(
            [sys.executable, "-m", "semi_supervised_asr_tpu.align",
             "--config", CONFIG, "--load-dir", str(wd),
             "--manifest", str(man), "--out", str(out_path),
             "--platform", "cpu",
             "data.num_synthetic_utts=16", "model.family=ctc"],
            capture_output=True, text=True, timeout=560,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
        assert len(lines) == 2
        for rec in lines:
            assert {"uid", "audio", "text", "tokens",
                    "logp_per_frame"} <= set(rec)
        saved = [json.loads(l) for l in open(out_path)]
        assert saved == lines
