"""Syllable unit pipeline (reference: aslp_scripts/syllable/)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.decoder.viterbi import PackedGraph
from kaldi_aslp_tpu.decoder.viterbi import ViterbiDecoder
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut
from kaldi_aslp_tpu.fst.lang import Lexicon, make_unigram_grammar, Lang
from kaldi_aslp_tpu.ops.syllable import (
    ali_to_syllable,
    bind_lexicon,
    bind_syllables,
    lexicon_to_syllable,
    phones_to_syllables,
    syllable_counts,
)
from kaldi_aslp_tpu.recipes.syllable import (
    convert_alignments,
    make_syllable_ctc_graph,
    prepare_syllable_units,
)


def test_phones_to_syllables():
    # initial+final pairs merge; finals and SIL stand alone
    assert phones_to_syllables(["n", "i3", "h", "ao3"]) == ["ni3", "hao3"]
    assert phones_to_syllables(["SIL", "a1"]) == ["SIL", "a1"]
    # zh is an initial even though z is too (longest symbol is one
    # token in the phone list, so no ambiguity)
    assert phones_to_syllables(["zh", "ong1", "g", "uo2"]) == \
        ["zhong1", "guo2"]
    with pytest.raises(ValueError):
        phones_to_syllables(["n"])  # dangling initial


def test_lexicon_to_syllable_table():
    rows = [["NIHAO", "n", "i3", "h", "ao3"], ["A", "a1"]]
    syl_rows, table = lexicon_to_syllable(rows)
    assert syl_rows == [["NIHAO", "ni3", "hao3"], ["A", "a1"]]
    assert table == {"a1": "a1", "hao3": "h ao3", "ni3": "n i3"}


def test_bind_syllables_tone_binding():
    counts = {"ma1": 100, "ma2": 10, "ma3": 60, "xx4": 5}
    bind = bind_syllables(counts, thresh=50)
    assert bind["ma1"] == "ma1"
    assert bind["ma3"] == "ma3"
    # low-frequency ma2 binds to the max-count tone variant ma1
    assert bind["ma2"] == "ma1"
    # xx4 has no tone variant above zero besides itself; the reference
    # picks the max-count variant among tones 1..5 — here xx4 itself
    assert bind["xx4"] == "xx4"

    # no variant at all -> left out of the map ("Not bind")
    assert "zz9" not in bind_syllables({"zz9": 1}, thresh=50)

    lex = [["MA", "ma2", "ma3"]]
    assert bind_lexicon(lex, bind) == [["MA", "ma1", "ma3"]]


def test_ali_to_syllable_per_frame():
    # phone ids: 1=n 2=i3 3=SIL
    names = {1: "n", 2: "i3", 3: "SIL"}
    syl_ids = {"ni3": 1, "SIL": 2}
    #        n  n  i3 i3 i3 SIL
    ali = [1, 1, 2, 2, 2, 3]
    out = ali_to_syllable(ali, names, syl_ids, {})
    assert out == [1, 1, 1, 1, 1, 2]
    # consonant run at the end is an error
    with pytest.raises(ValueError):
        ali_to_syllable([3, 1, 1], names, syl_ids, {})
    # binding applies before the table lookup
    out2 = ali_to_syllable([3], names, {"X": 7}, {"SIL": "X"})
    assert out2 == [7]


def test_prepare_syllable_units_end_to_end():
    lex = Lexicon.from_text(
        "NIHAO n i3 h ao3\nMA1 m a1\nMA2 m a2\n<SIL> SIL\n")
    # ma2 appears once (below threshold), ma1 is frequent
    transcripts = [["NIHAO", "MA1"]] * 60 + [["MA2"]]
    units = prepare_syllable_units(lex, transcripts, bind_thresh=50)
    # ma2 bound into ma1 -> units are ni3, hao3, ma1, SIL (+<SIL> word)
    assert units.bind["ma2"] == "ma1"
    assert set(units.syllable_ids) == {"ni3", "hao3", "ma1", "SIL"}
    assert units.num_units == 5  # 4 units + blank
    assert units.lexicon.prons["MA2"] == [["ma1"]]

    # alignment conversion through the bound system
    pid = {"n": 1, "i3": 2, "h": 3, "ao3": 4, "m": 5, "a2": 6, "SIL": 7}
    names = {v: k for k, v in pid.items()}
    alis = {"utt1": [7, 5, 5, 6, 1, 2, 3, 4, 4]}
    out = convert_alignments(units, alis, names)
    s = units.syllable_ids
    assert out["utt1"] == [s["SIL"]] + [s["ma1"]] * 3 + \
        [s["ni3"]] * 2 + [s["hao3"]] * 3


def test_syllable_ctc_decode():
    """Decode synthetic syllable posteriors over the syllable TLG."""
    lex = Lexicon.from_text("NIHAO n i3 h ao3\nMA m a1\n<SIL> SIL\n")
    transcripts = [["NIHAO", "MA"]] * 60
    units = prepare_syllable_units(lex, transcripts, bind_thresh=50)
    lang = Lang.build(units.lexicon)
    G = make_unigram_grammar({"NIHAO": 0.5, "MA": 0.5}, lang.words)
    tlg = make_syllable_ctc_graph(units, G)
    packed = PackedGraph.from_fst(tlg)
    lut = ctc_lut(units.num_units)
    dec = ViterbiDecoder(packed, lut, acoustic_scale=1.0)

    s = units.syllable_ids
    seq = [0, s["ni3"], s["ni3"], 0, s["hao3"], 0, s["ma1"], 0]
    T, V = len(seq), units.num_units
    ll = np.full((T, V), np.log(0.01), np.float32)
    for t, u in enumerate(seq):
        ll[t, u] = np.log(0.9)
    words, ali, score = dec.decode(ll)
    assert [lang.words.sym(w) for w in words] == ["NIHAO", "MA"]
