"""Synthetic Markov grammar (data.synthetic_grammar): structured token
sequences whose transition table is SHARED across stream seeds — the
property the semi-supervised terms exploit (experiments/structured_semi.py).
"""

import dataclasses

import numpy as np

from semi_supervised_asr_tpu.config import DataConfig, FrontendConfig
from semi_supervised_asr_tpu.data.synthetic import (
    SyntheticDataset, grammar_successors, make_utterance,
)
from semi_supervised_asr_tpu.data.vocab import SPECIALS, timit_vocab


class TestGrammar:
    def setup_method(self):
        self.vocab = timit_vocab()
        self.fcfg = FrontendConfig()

    def test_transitions_are_grammar_consistent(self):
        cfg = DataConfig(synthetic_grammar=3, synthetic_seed=5)
        succ = grammar_successors(self.vocab.size, 3)
        for i in range(20):
            utt = make_utterance(i, self.vocab, cfg, self.fcfg)
            ids = utt.tokens[:-1]  # strip EOS
            for a, b in zip(ids[:-1], ids[1:]):
                assert b in succ[a], (a, b)

    def test_grammar_shared_across_seeds(self):
        # labeled/unlabeled/dev streams use different seeds but must
        # speak the same language
        a = grammar_successors(self.vocab.size, 3)
        b = grammar_successors(self.vocab.size, 3)
        np.testing.assert_array_equal(a, b)

    def test_content_ids_only(self):
        cfg = DataConfig(synthetic_grammar=2, synthetic_seed=9)
        for i in range(10):
            utt = make_utterance(i, self.vocab, cfg, self.fcfg)
            assert np.all(utt.tokens[:-1] >= len(SPECIALS))

    def test_disabled_matches_legacy_iid(self):
        cfg0 = DataConfig(synthetic_grammar=0, synthetic_seed=3)
        utt = make_utterance(0, self.vocab, cfg0, self.fcfg)
        rng = np.random.default_rng((3, 0))
        n_tok = int(rng.integers(3, 11))
        want = rng.integers(len(SPECIALS), self.vocab.size, n_tok)
        np.testing.assert_array_equal(utt.tokens[:-1], want)

    def test_dataset_plumbs_grammar(self):
        cfg = DataConfig(synthetic_grammar=3, synthetic_seed=5)
        ds = SyntheticDataset(self.vocab, cfg, self.fcfg, n_utts=4)
        succ = grammar_successors(self.vocab.size, 3)
        ids = ds[1].tokens[:-1]
        for a, b in zip(ids[:-1], ids[1:]):
            assert b in succ[a]
