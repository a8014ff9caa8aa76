"""Length-cap saturation telemetry (VERDICT r4 weak #4 / next #4).

The r3 soak measured a truncation artifact for 2000 steps: every dev
hypothesis silently ended at the (then-default) ratio cap without EOS
and the frozen CER read as a plateau.  `max_decode_ratio` now defaults
off, but `decode.max_decode_len` caps exactly as silently — these tests
pin the self-reporting added to _score_batches/validate/test: records
carry ``no_eos``, metrics carry ``cap_hit_rate``, and a deliberately
tiny cap must read as saturated, loudly.
"""

from __future__ import annotations

import dataclasses as dc

import pytest

from semi_supervised_asr_tpu.config import load_config
from semi_supervised_asr_tpu.training.solver import Solver

CONFIG = "configs/synthetic_smoke.yaml"


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A briefly-trained smoke model (enough to emit content tokens)."""
    cfg = load_config(CONFIG, [
        "data.num_synthetic_utts=8", "train.batch_size=4",
        "train.total_steps=200", "train.learning_rate=0.003",
        "train.eval_every=0",
        "train.ckpt_every=0", "train.log_every=100",
        "model.enc_hidden=16", "model.dec_hidden=16",
        "model.enc_layers=1", "model.enc_base_layers=1",
    ])
    s = Solver(cfg, tmp_path_factory.mktemp("capwd"), use_mesh=False)
    s.train()
    return s


class TestCapSaturation:
    def test_tiny_cap_reads_saturated(self, trained):
        """max_decode_len=3 on 3-10-token references: hypotheses cannot
        terminate inside the cap — the stats and records must say so."""
        s = trained
        cfg3 = s.cfg.replace(decode=dc.replace(s.cfg.decode,
                                               max_decode_len=3))
        old = s.cfg
        s.cfg = cfg3
        s._decode_fns = {}     # drop compiled fns keyed on the old cap
        try:
            # score the TRAIN set: the overfit-gate model emits the
            # 3-10-token references, so a 3-token budget leaves no room
            # for EOS on any row
            rate, records, _ = s._score_batches(
                s.bundle.train, s.state.params, "greedy"
            )
            stats = s._last_decode_stats
            assert stats["tracked"] and stats["cap"] == 3
            assert stats["n_scored"] == len(records) > 0
            assert stats["cap_hit_rate"] > 0.5, stats
            assert any(r.get("no_eos") for r in records)
            # validate() surfaces the rate into the dev metrics row
            out = s.validate()
            assert "dev_cap_hit_rate" in out
        finally:
            s.cfg = old
            s._decode_fns = {}

    def test_sane_cap_reports_stats_without_flagging_all(self, trained):
        s = trained
        rate, records, _ = s._score_batches(
            s.bundle.dev, s.state.params, "greedy"
        )
        stats = s._last_decode_stats
        assert stats["tracked"]
        assert 0.0 <= stats["cap_hit_rate"] <= 1.0
        assert stats["cap"] == s.cfg.decode.max_decode_len

    def test_warning_emitted_above_threshold(self, trained, caplog):
        import logging

        s = trained
        cfg3 = s.cfg.replace(decode=dc.replace(s.cfg.decode,
                                               max_decode_len=3))
        old = s.cfg
        s.cfg = cfg3
        s._decode_fns = {}
        try:
            with caplog.at_level(logging.WARNING):
                s._score_batches(s.bundle.train, s.state.params, "greedy")
            assert any("LENGTH-CAP SATURATION" in r.message
                       for r in caplog.records), caplog.records
        finally:
            s.cfg = old
            s._decode_fns = {}
