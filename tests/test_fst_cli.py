"""FST/KWS CLI tests (reference: aslp-kwsbin surface)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.cli.__main__ import main
from kaldi_aslp_tpu.io import matrix_writer


def test_fst_tools(tmp_path, capsys):
    topo = tmp_path / "topo.txt"
    topo.write_text("0 1 1 10 0.5\n1 2 2 20\n2\n")
    out = tmp_path / "f.txt"
    assert main(["aslp-fst-init", str(topo), str(out)]) == 0
    assert main(["aslp-fst-info", str(out)]) == 0
    info = capsys.readouterr().out
    assert "num-states 3" in info and "num-arcs 2" in info
    assert main(["aslp-fst-to-dot", str(out)]) == 0
    dot = capsys.readouterr().out
    assert "digraph" in dot and "1:10/0.5" in dot


def test_kws_score_cli(tmp_path, capsys):
    post = np.full((30, 4), 0.02, np.float32)
    post[:, 0] = 0.9
    post[10:15, :] = 0.02
    post[10:15, 2] = 0.9
    post[15:20, :] = 0.02
    post[15:20, 3] = 0.9
    post /= post.sum(1, keepdims=True)
    ark = tmp_path / "post.ark"
    with matrix_writer(f"ark:{ark}") as w:
        w["utt1"] = post
    assert main(["aslp-kws-score", "--keywords=hello:2,3",
                 "--confidence-threshold=0.3", f"ark:{ark}"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("utt1 hello")
