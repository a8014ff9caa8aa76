from semi_supervised_asr_tpu.data.vocab import Vocab, timit_vocab, char_vocab  # noqa: F401
