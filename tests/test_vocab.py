import numpy as np

from semi_supervised_asr_tpu.data import vocab as V


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
