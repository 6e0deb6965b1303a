"""KWS aux-tool tests (reference: src/aslp-kwsbin/aslp-kws-gen-state-map.cc,
aslp-kws-convert-phone-ali.cc, aslp_scripts/kws/evaluation_roc.py)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.hmm import HmmTopology, TransitionModel
from kaldi_aslp_tpu.tree.build_tree import build_tree
from kaldi_aslp_tpu.tree.cluster import GaussStats
from kaldi_aslp_tpu.kws import (
    convert_phone_ali,
    gen_state_map,
    read_phone_map,
    roc_sweep,
    write_state_map,
)

PHONES = {"sil": 1, "a": 2, "b": 3}


def _setup():
    rng = np.random.RandomState(0)
    stats = {}
    for ph in PHONES.values():
        for pc in range(3):
            frames = rng.randn(50, 2) + 3 * ph + pc
            stats[((0, ph, 0), pc)] = GaussStats.from_frames(frames)
    tree = build_tree(stats, list(PHONES.values()), {p: 3 for p in
                      PHONES.values()}, min_gain=1e9)
    topo = HmmTopology.default(PHONES.values())
    triples = [(p, s, tree.compute((0, p, 0), s))
               for p in PHONES.values() for s in range(3)]
    tm = TransitionModel(topo, triples=triples)
    return tm, tree


def test_gen_state_map():
    tm, tree = _setup()
    sm = gen_state_map(PHONES, [["ab", "a", "b"]], tm, tree)
    # states: 0=<gbg>, 1=sil, then 3 CD states per keyword phone
    assert sm.state_list[0] == "<gbg>"
    assert sm.state_list[1] == "sil"
    assert sm.keyword_states["ab"] == [
        "sil_a_b_s0", "sil_a_b_s1", "sil_a_b_s2",
        "a_b_sil_s0", "a_b_sil_s1", "a_b_sil_s2",
    ]
    assert len(sm.state_list) == 2 + 6
    # every silence tid maps to state 1, keyword tids to >= 2
    for tid in range(1, tm.num_transition_ids + 1):
        ph = tm.tid_to_phone(tid)
        if ph == PHONES["sil"]:
            assert sm.tid_map[tid] == 1
        else:
            assert sm.tid_map[tid] >= 2


def test_gen_state_map_rejects_single_phone():
    tm, tree = _setup()
    with pytest.raises(ValueError):
        gen_state_map(PHONES, [["a", "a"]], tm, tree)


def test_state_map_files_roundtrip(tmp_path):
    tm, tree = _setup()
    sm = gen_state_map(PHONES, [["ab", "a", "b"]], tm, tree)
    write_state_map(sm, str(tmp_path / "tid.map"),
                    str(tmp_path / "states.txt"))
    lines = (tmp_path / "tid.map").read_text().splitlines()
    assert len(lines) == tm.num_transition_ids
    assert lines[0].split()[0] == "1"
    syms = (tmp_path / "states.txt").read_text().splitlines()
    assert syms[0] == "<eps> 0"
    assert syms[1] == "<gbg> 1"


def test_convert_phone_ali(tmp_path):
    path = tmp_path / "phone.map"
    path.write_text("1 1\n2 1\n3 2\n4 2\n")
    lut = read_phone_map(str(path))
    out = convert_phone_ali(lut, np.array([1, 2, 3, 4, 3]))
    np.testing.assert_array_equal(out, [1, 1, 2, 2, 2])
    with pytest.raises(ValueError):
        convert_phone_ali(lut, np.array([9]))
    bad = tmp_path / "bad.map"
    bad.write_text("1 1\n1 2\n")
    with pytest.raises(ValueError):
        read_phone_map(str(bad))


def test_roc_sweep():
    scores = {"u1": 0.9, "u2": 0.8, "u3": 0.2, "u4": 0.1}
    labels = {"u1": 1, "u2": 1, "u3": 0, "u4": 0}
    rows = roc_sweep(scores, labels, stride=0.25)
    # at thresh 0.5: perfect separation
    mid = [r for r in rows if abs(r[0] - 0.5) < 1e-9][0]
    assert mid[1] == 1.0 and mid[2] == 0.0 and mid[3] == 0.0
    # at thresh 0: every negative is a false alarm
    assert rows[0][3] == 1.0
