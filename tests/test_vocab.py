import numpy as np

from semi_supervised_asr_tpu.data import vocab as V

import pytest

pytestmark = pytest.mark.quick  # core merge-gate subset (pytest.ini)


def test_specials_fixed():
    v = V.timit_vocab()
    assert v.tokens[:4] == ("<pad>", "<sos>", "<eos>", "<unk>")
    assert (V.PAD, V.SOS, V.EOS, V.UNK) == (0, 1, 2, 3)


def test_timit_inventory():
    v = V.timit_vocab()
    assert v.size == 4 + 61
    assert len(V.TIMIT_39) == 39
    # all 61 phones have a mapping entry ('sil' is an extra identity key)
    assert set(V.TIMIT_61) <= set(V.TIMIT_61_TO_39)


def test_collapse_drops_q_and_folds():
    out = V.collapse_timit_39(["q", "aa", "ao", "pcl", "h#", "ix"])
    assert out == ["aa", "aa", "sil", "sil", "ih"]


def test_encode_decode_roundtrip():
    v = V.timit_vocab()
    ids = v.encode(["aa", "b", "zh"], add_sos_eos=True)
    assert ids[0] == V.SOS and ids[-1] == V.EOS
    assert v.decode(ids) == ["aa", "b", "zh"]


def test_decode_stops_at_eos():
    v = V.char_vocab()
    ids = v.encode_text("ab") + [V.EOS] + v.encode_text("zz")
    assert v.decode_text(ids) == "ab"


def test_char_vocab_roundtrip():
    v = V.char_vocab()
    assert v.decode_text(v.encode_text("hello world")) == "hello world"


def test_39_id_map():
    v = V.timit_vocab()
    table = np.array(V.timit_39_id_map(v))
    assert table.shape == (v.size,)
    assert np.all(table[:4] == -1)                      # specials deleted
    assert table[v.stoi()["q"]] == -1                   # q deleted
    assert table[v.stoi()["aa"]] == table[v.stoi()["ao"]]  # folded
    assert table[v.stoi()["pcl"]] == table[v.stoi()["h#"]]


def test_save_load(tmp_path):
    v = V.timit_vocab()
    p = tmp_path / "vocab.json"
    v.save(p)
    assert V.Vocab.load(p) == v


class TestTimit48Fold:
    def test_48_class_count(self):
        from semi_supervised_asr_tpu.data.vocab import TIMIT_48

        assert len(TIMIT_48) == 48

    def test_folded_vocab_encodes_61_phone_text(self):
        from semi_supervised_asr_tpu.data.vocab import UNK, timit_vocab

        v = timit_vocab(fold48=True)
        assert v.size == 4 + 48
        # closures fold to cl/vcl, h# to sil, q deleted
        ids = v.encode_text("h# pcl bcl q aa h#")
        toks = [v.tokens[i] for i in ids]
        assert toks == ["sil", "cl", "vcl", "aa", "sil"]
        assert UNK not in ids

    def test_39_scoring_map_covers_48_classes(self):
        from semi_supervised_asr_tpu.data.vocab import (
            TIMIT_39, timit_39_id_map, timit_vocab,
        )

        v = timit_vocab(fold48=True)
        table = timit_39_id_map(v)
        assert len(table) == v.size
        # every non-special class maps into the 39 set (none unknown)
        for i, tok in enumerate(v.tokens):
            if i < 4:
                assert table[i] == -1
            else:
                assert 0 <= table[i] < len(TIMIT_39), tok

    def test_61_and_48_training_score_identically_at_39(self):
        """Folding to 48 then to 39 == folding 61 straight to 39."""
        from semi_supervised_asr_tpu.data.vocab import (
            TIMIT_61, timit_39_id_map, timit_vocab,
        )

        v61 = timit_vocab()
        v48 = timit_vocab(fold48=True)
        t61 = timit_39_id_map(v61)
        t48 = timit_39_id_map(v48)
        text = " ".join(TIMIT_61)
        to39_via61 = [t61[i] for i in v61.encode_text(text) if t61[i] >= 0]
        to39_via48 = [t48[i] for i in v48.encode_text(text) if t48[i] >= 0]
        assert to39_via61 == to39_via48

    def test_save_load_keeps_fold(self, tmp_path):
        from semi_supervised_asr_tpu.data.vocab import Vocab, timit_vocab

        v = timit_vocab(fold48=True)
        v.save(tmp_path / "v.json")
        w = Vocab.load(tmp_path / "v.json")
        assert w.fold == v.fold
        assert w.encode_text("pcl q aa") == v.encode_text("pcl q aa")
