"""Script-role CLI tools: log-analyse, syllable prep, TextGrid
(reference: aslp_scripts/log_analyse.sh, aslp_scripts/syllable/,
aslp_scripts/vad/gen_textgrid_according_vad_interval.py)."""

import io
import sys

import numpy as np

from kaldi_aslp_tpu.cli.__main__ import main
from kaldi_aslp_tpu.models.losses import LossReporter
from kaldi_aslp_tpu.vad.textgrid import (
    intervals_to_textgrid,
    parse_interval_file,
)


def test_progress_loss_lines_and_log_analyse(tmp_path, capsys):
    import logging

    class _Capture(logging.Handler):
        def __init__(self):
            super().__init__()
            self.records = []

        def emit(self, record):
            self.records.append(record)

    cap = _Capture()
    logger = logging.getLogger("nnet-loss")
    logger.addHandler(cap)
    logger.setLevel(logging.INFO)
    try:
        rep = LossReporter("ctc", progress_step=100)
        for k in range(6):
            rep.update({"frames": 60.0,
                        "loss_sum": 60.0 * (3.0 - k * 0.4)})
        # updates are lazily drained (device fetches are deferred up to
        # MAX_PENDING batches); reading any aggregate emits the pending
        # ProgressLoss lines, as report() does at epoch end
        rep.frames
    finally:
        logger.removeHandler(cap)
    lines = [r.getMessage() for r in cap.records
             if "ProgressLoss" in r.getMessage()]
    assert len(lines) >= 2
    log = tmp_path / "train.log"
    log.write_text("\n".join("INFO (nnet-loss) " + l for l in lines) + "\n")
    assert main(["aslp-log-analyse", "--sum=100", "--stride=1",
                 str(log)]) == 0
    vals = [float(x) for x in capsys.readouterr().out.split()]
    assert len(vals) == len(lines)
    # losses decrease across progress windows
    assert vals[-1] < vals[0]


def test_mpi_log_analyse(tmp_path, capsys):
    d = tmp_path / "log"
    d.mkdir()
    for w in range(2):
        (d / f"iter1.tr.log.{w}.0").write_text(
            "LOG ProgressLoss[last 1h of 1h]: (xent) %d.5\n" % w)
    assert main(["aslp-mpi-log-analyse", str(d)]) == 0
    vals = [float(x) for x in capsys.readouterr().out.split()]
    assert vals == [0.0, 0.5, 0.0, 1.5]


def test_syllable_cli_chain(tmp_path, capsys, monkeypatch):
    lex = tmp_path / "lexicon.txt"
    lex.write_text("NIHAO n i3 h ao3\nMA1 m a1\nMA2 m a2\n")
    syl_lex = tmp_path / "syllable_lexicon.txt"
    assert main(["aslp-convert-lexicon-to-syllable", str(lex),
                 str(syl_lex)]) == 0
    table_out = capsys.readouterr().out
    assert "ni3 n i3" in table_out
    assert syl_lex.read_text().splitlines()[0] == "NIHAO ni3 hao3"

    counts = tmp_path / "counts.txt"
    counts.write_text("ni3 100\nhao3 100\nma1 90\nma2 3\n")
    assert main(["aslp-bind-syllable", "--thresh=50", str(counts)]) == 0
    bind_lines = capsys.readouterr().out
    assert "ma2 ma1 False" in bind_lines
    bind_info = tmp_path / "bind.info"
    bind_info.write_text("\n".join(
        " ".join(l.split()[:2]) for l in bind_lines.splitlines()) + "\n")

    assert main(["aslp-bind-lexicon", str(bind_info), str(syl_lex)]) == 0
    assert "MA2 ma1" in capsys.readouterr().out

    phones = tmp_path / "phones.txt"
    phones.write_text("n 1\ni3 2\nm 3\na1 4\na2 5\n")
    sylls = tmp_path / "syllables.txt"
    sylls.write_text("ni3 1\nma1 2\n")
    monkeypatch.setattr(sys, "stdin",
                        io.StringIO("utt1 1 1 2 3 5 5\n"))
    assert main(["aslp-ali-to-syllable", str(phones), str(sylls),
                 str(bind_info)]) == 0
    assert capsys.readouterr().out.split() == \
        ["utt1", "1", "1", "1", "2", "2", "2"]


def test_textgrid(tmp_path):
    tg = intervals_to_textgrid([(0, 100), (110, 300), (400, 500)])
    assert 'class = "IntervalTier"' in tg
    # gap 300->400 is >200ms -> an N filler; 100->110 (100ms) is not
    assert tg.count('text = "N"') == 1
    assert 'text = "1"' in tg and 'text = "2"' in tg \
        and 'text = "V"' in tg
    assert parse_interval_file("[0, 100]\n[150, 300]\n") == \
        [(0, 100), (150, 300)]

    seg = tmp_path / "segment.info"
    seg.write_text("[0, 100]\n[150, 300]\n")
    out = tmp_path / "seg.TextGrid"
    assert main(["aslp-gen-textgrid", str(seg), str(out)]) == 0
    assert 'name = "seg"' in out.read_text()
