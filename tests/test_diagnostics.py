"""Observability: stage timers and reports."""

import magnify_tpu as mg
import numpy as np

from magnify_tpu import diagnostics
from tests.synth import bead_image


def test_stage_report_accumulates():
    diagnostics.reset_stages()
    xp = mg.beads(data=bead_image((256, 256), [[128, 128]]),
                  min_bead_diameter=16, max_bead_diameter=24, overlap=0,
                  num_iter=1000)
    report = diagnostics.stage_report()
    for stage in ("read", "standardize_format", "flatfield_correct",
                  "stitch", "find_beads", "drop", "restore_format"):
        assert stage in report, report.keys()
        assert report[stage]["calls"] == 1
    assert report["find_beads"]["seconds"] > 0


def test_trace_env_prints(capsys, monkeypatch):
    monkeypatch.setenv("MAGNIFY_TPU_TRACE", "1")
    diagnostics.reset_stages()
    with diagnostics.stage_timer("demo"):
        pass
    out = capsys.readouterr().out
    assert "demo" in out
