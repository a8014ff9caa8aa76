"""BPE tokenizer: learned merges, rank-greedy encoding, round trips,
Vocab-API compatibility (data/bpe.py)."""

import numpy as np
import pytest

from semi_supervised_asr_tpu.data.bpe import (
    BPEVocab, WORD_MARK, default_bpe, train_bpe,
)
from semi_supervised_asr_tpu.data.vocab import EOS, SOS, SPECIALS, UNK

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and a rat sat",
    "the mat and the cat",
]


@pytest.fixture(scope="module")
def bpe():
    return train_bpe(CORPUS, vocab_size=40)


class TestTraining:
    def test_specials_lead_and_size_bounded(self, bpe):
        assert list(bpe.tokens[:4]) == SPECIALS
        assert bpe.size <= 40
        assert len(bpe.merges) > 0

    def test_frequent_word_becomes_one_piece(self, bpe):
        # "the" and "cat" dominate the corpus -> full-word pieces
        assert WORD_MARK + "the" in bpe.tokens
        assert WORD_MARK + "cat" in bpe.tokens
        assert bpe.encode_word("the") == [WORD_MARK + "the"]

    def test_deterministic(self):
        a = train_bpe(CORPUS, 40)
        b = train_bpe(CORPUS, 40)
        assert a.tokens == b.tokens and a.merges == b.merges

    def test_merge_budget_respected(self):
        small = train_bpe(CORPUS, 20)
        assert small.size <= 20 or not small.merges


class TestEncodeDecode:
    def test_round_trip(self, bpe):
        for text in CORPUS:
            ids = bpe.encode_text(text)
            assert bpe.decode_text(ids) == text
            assert all(i >= len(SPECIALS) for i in ids)  # no UNK in-corpus

    def test_sos_eos(self, bpe):
        ids = bpe.encode_text("the cat", add_sos_eos=True)
        assert ids[0] == SOS and ids[-1] == EOS

    def test_unseen_char_is_unk(self, bpe):
        ids = bpe.encode_text("zebra!")
        assert UNK in ids

    def test_decode_stops_at_eos(self, bpe):
        ids = bpe.encode_text("the cat") + [EOS] + bpe.encode_text("rat")
        assert bpe.decode_text(ids) == "the cat"

    def test_rank_greedy_matches_training_segmentation(self, bpe):
        """Encoding a training word re-applies merges in rank order, so the
        pieces must all exist in the vocab."""
        s = bpe.stoi()
        for w in "the cat sat mat rat ate and on a".split():
            for piece in bpe.encode_word(w):
                assert piece in s, (w, piece)


class TestPersistence:
    def test_save_load_round_trip(self, bpe, tmp_path):
        p = tmp_path / "bpe.json"
        bpe.save(p)
        loaded = BPEVocab.load(p)
        assert loaded.tokens == bpe.tokens
        assert loaded.merges == bpe.merges
        assert loaded.encode_text("the cat") == bpe.encode_text("the cat")

    def test_load_rejects_char_vocab(self, tmp_path):
        from semi_supervised_asr_tpu.data.vocab import char_vocab

        p = tmp_path / "vocab.json"
        char_vocab().save(p)
        with pytest.raises(AssertionError):
            BPEVocab.load(p)


class TestDefaultBPE:
    def test_char_fallback_round_trips(self):
        v = default_bpe()
        assert v.merges == ()
        assert v.decode_text(v.encode_text("hello world")) == "hello world"


class TestRegistryIntegration:
    def test_unit_bpe_builds(self):
        from semi_supervised_asr_tpu.config import Config, DataConfig

        cfg = Config(data=DataConfig(unit="bpe", num_synthetic_utts=4))
        from semi_supervised_asr_tpu.data.registry import build_datasets

        bundle = build_datasets(cfg)
        assert bundle.vocab.unit == "bpe"
        utt = bundle.train[0]
        assert len(utt.tokens) > 0

    def test_trained_bpe_via_config(self, bpe, tmp_path):
        from semi_supervised_asr_tpu.config import Config, DataConfig
        from semi_supervised_asr_tpu.data.registry import build_vocab

        p = tmp_path / "bpe.json"
        bpe.save(p)
        cfg = Config(data=DataConfig(unit="bpe", bpe_path=str(p)))
        v = build_vocab(cfg)
        assert v.tokens == bpe.tokens


class TestPreprocessCLI:
    def test_bpe_flag_writes_model(self, tmp_path):
        from scipy.io import wavfile

        from semi_supervised_asr_tpu.data import preprocess as PP

        d = tmp_path / "train-clean-100" / "1" / "2"
        d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        data = (rng.normal(0, 0.05, 1600) * 32767).astype(np.int16)
        wavfile.write(d / "1-2-0000.wav", 16000, data)
        (d / "1-2.trans.txt").write_text(
            "1-2-0000 THE CAT SAT ON THE MAT AND THE CAT ATE\n")
        out = tmp_path / "out"
        PP.main(["librispeech", "--root", str(tmp_path), "--out", str(out),
                 "--splits", "train-clean-100", "--bpe", "40"])
        v = BPEVocab.load(out / "bpe.json")
        assert v.decode_text(v.encode_text("the cat sat")) == "the cat sat"
