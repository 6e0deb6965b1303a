"""Kaldi lattice format + determinization tests (reference:
src/lat/kaldi-lattice.{h,cc}, src/lat/determinize-lattice-pruned.h,
src/latbin/lattice-best-path.cc / lattice-scale.cc)."""

import subprocess
import sys
from collections import defaultdict

import numpy as np
import pytest

from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
from kaldi_aslp_tpu.fst.ctc_graph import ctc_lut, make_ctc_decode_graph
from kaldi_aslp_tpu.decoder import (
    CompactLattice,
    PackedGraph,
    StateLattice,
    compact_lattice_best_path,
    determinize_lattice,
    lattice_to_state,
    scale_lattice,
    state_lattice_best_path,
    state_to_lattice,
)
from kaldi_aslp_tpu.decoder.beam import BeamSearchDecoder, CsrGraph
from kaldi_aslp_tpu.decoder.lattice import generate_lattice, \
    lattice_best_path
from kaldi_aslp_tpu.decoder.mbr import minimum_bayes_risk
from kaldi_aslp_tpu.decoder.nbest import lattice_nbest
from kaldi_aslp_tpu.io import (
    compact_lattice_writer,
    lattice_writer,
    sequential_lattice_reader,
)


@pytest.fixture(scope="module")
def decoded():
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.6, "NO": 0.4}, lang.words)
    tlg = make_ctc_decode_graph(lang, G)
    packed = PackedGraph.from_fst(tlg)
    lut = ctc_lut(len(lang.phones))
    y, n = lang.phones.id("Y"), lang.phones.id("N")
    V = len(lang.phones)
    seq = [0, n, n, 0, y, 0]
    ll = np.full((len(seq), V), np.log(0.1 / (V - 1)), np.float32)
    for t, u in enumerate(seq):
        ll[t, u] = np.log(0.9)
    bdec = BeamSearchDecoder(CsrGraph.from_packed(packed), lut,
                             acoustic_scale=1.0, beam=1e9,
                             max_active=64, arc_budget=1024, chunk=8)
    words, ali, score, lat = bdec.decode_lattice(ll, lattice_beam=10.0)
    return dict(lang=lang, words=words, ali=ali, score=score, lat=lat,
                ll=ll, packed=packed, lut=lut)


def test_state_lattice_conversion_roundtrip(decoded):
    slat = lattice_to_state(decoded["lat"])
    w, ali, cost = state_lattice_best_path(slat)
    assert w == decoded["words"]
    assert -cost == pytest.approx(decoded["score"], abs=1e-3)
    lat2 = state_to_lattice(slat)
    w2, cost2 = lattice_best_path(lat2)
    assert w2 == decoded["words"]


@pytest.mark.parametrize("spec", ["ark,t:{}", "ark:{}"])
def test_state_lattice_disk_roundtrip(decoded, tmp_path, spec):
    slat = lattice_to_state(decoded["lat"])
    path = tmp_path / "l.lats"
    with lattice_writer(spec.format(path)) as w:
        w["u1"] = slat
        w["u2"] = slat
    got = dict(sequential_lattice_reader(f"ark:{path}"))
    assert set(got) == {"u1", "u2"}
    for lat in got.values():
        assert isinstance(lat, StateLattice)
        w_, _, c_ = state_lattice_best_path(lat)
        assert w_ == decoded["words"]
        assert -c_ == pytest.approx(decoded["score"], abs=1e-3)


@pytest.mark.parametrize("spec", ["ark,t:{}", "ark:{}"])
def test_compact_lattice_disk_roundtrip(decoded, tmp_path, spec):
    clat = determinize_lattice(decoded["lat"])
    path = tmp_path / "c.lats"
    with compact_lattice_writer(spec.format(path)) as w:
        w["u"] = clat
    got = dict(sequential_lattice_reader(f"ark:{path}"))["u"]
    assert isinstance(got, CompactLattice)
    w_, ali_, c_ = compact_lattice_best_path(got)
    assert w_ == decoded["words"]
    assert list(ali_) == list(decoded["ali"])
    assert -c_ == pytest.approx(decoded["score"], abs=1e-3)


def _word_paths(clat):
    adj = defaultdict(list)
    for a in clat.arcs:
        adj[a.src].append(a)
    out = []

    def rec(s, words, cost):
        if s in clat.finals:
            f = clat.finals[s]
            out.append((tuple(words), cost + f[0] + f[1]))
        for a in adj[s]:
            rec(a.dst, words + ([a.word] if a.word else []),
                cost + a.graph_cost + a.acoustic_cost)

    rec(clat.start, [], 0.0)
    return out


def test_determinize_unique_word_sequences(decoded):
    clat = determinize_lattice(decoded["lat"])
    paths = _word_paths(clat)
    seqs = [p for p, _ in paths]
    assert len(seqs) == len(set(seqs)), "duplicate word sequence"
    # best path cost preserved exactly
    best = min(c for _, c in paths)
    assert -best == pytest.approx(decoded["score"], abs=1e-3)


def test_determinize_keeps_per_sequence_viterbi_cost(decoded):
    """Each surviving word sequence's cost must equal the best cost of
    that sequence in the raw lattice (reference: determinization is
    Viterbi per word sequence)."""
    lat = decoded["lat"]
    # enumerate raw lattice paths
    arcs_from = defaultdict(list)
    for a in lat.arcs:
        arcs_from[(a.t - 1, a.src)].append(a)
    raw_best = {}

    def rec(node, words, cost):
        t, s = node
        if t == lat.num_frames and s in lat.final_costs:
            key = tuple(words)
            c = cost + lat.final_costs[s]
            if c < raw_best.get(key, np.inf):
                raw_best[key] = c
        for a in arcs_from[node]:
            rec((a.t, a.dst), words + list(a.words),
                cost + a.graph_cost + a.acoustic_cost)

    rec((0, lat.start), [], 0.0)
    clat = determinize_lattice(lat)
    for seq, cost in _word_paths(clat):
        assert cost == pytest.approx(raw_best[seq], abs=1e-3), seq


def test_determinize_pruned(decoded):
    full = determinize_lattice(decoded["lat"])
    pruned = determinize_lattice(decoded["lat"], prune=1.0)
    assert len(pruned.arcs) <= len(full.arcs)
    w, _, _ = compact_lattice_best_path(pruned)
    assert w == decoded["words"]


def test_scale_lattice(decoded):
    clat = determinize_lattice(decoded["lat"])
    sc = scale_lattice(clat, lm_scale=2.0, acoustic_scale=0.5)
    a0, s0 = clat.arcs[0], sc.arcs[0]
    assert s0.graph_cost == pytest.approx(2.0 * a0.graph_cost)
    assert s0.acoustic_cost == pytest.approx(0.5 * a0.acoustic_cost)


def test_mbr_and_nbest_from_deserialized(decoded, tmp_path):
    """The downstream consumers must run off a lattice read from disk
    (VERDICT round-1 item 2 'done' criterion)."""
    slat = lattice_to_state(decoded["lat"])
    path = tmp_path / "l.lats"
    with lattice_writer(f"ark:{path}") as w:
        w["u"] = slat
    got = dict(sequential_lattice_reader(f"ark:{path}"))["u"]
    lat = state_to_lattice(got)
    mbr_words, conf, _ = minimum_bayes_risk(lat)
    assert mbr_words == decoded["words"]
    nb = lattice_nbest(lat, n=5)
    assert list(nb[0].words) == decoded["words"]
    assert len(nb) >= 2


def test_lattice_cli_chain(decoded, tmp_path):
    """lattice-copy (bin→text) → lattice-scale → lattice-determinize →
    lattice-best-path."""
    slat = lattice_to_state(decoded["lat"])
    raw = tmp_path / "raw.lats"
    with lattice_writer(f"ark:{raw}") as w:
        w["u"] = slat

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "kaldi_aslp_tpu.cli", *args],
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        return r

    run("lattice-copy", f"ark:{raw}", f"ark,t:{tmp_path}/text.lats")
    assert (tmp_path / "text.lats").read_text().startswith("u \n")
    run("lattice-scale", "--lm-scale=1.0", "--acoustic-scale=1.0",
        f"ark:{tmp_path}/text.lats", f"ark:{tmp_path}/scaled.lats")
    run("lattice-determinize", f"ark:{tmp_path}/scaled.lats",
        f"ark:{tmp_path}/det.lats")
    run("lattice-best-path", f"ark:{tmp_path}/det.lats",
        f"ark,t:{tmp_path}/tra.txt", f"ark,t:{tmp_path}/ali.txt")
    tra = (tmp_path / "tra.txt").read_text().split()
    assert [int(x) for x in tra[1:]] == decoded["words"]
    ali = (tmp_path / "ali.txt").read_text().split()
    assert [int(x) for x in ali[1:]] == list(decoded["ali"])


def test_latgen_faster_mapped_cli(decoded, tmp_path):
    """The hybrid decode binary: HCLG text + tid2pdf + loglikes ark →
    lattices + words (reference: bin/latgen-faster-mapped.cc;
    aslp-latgen-faster-rtf.cc adds per-utt/total RTF lines)."""
    from kaldi_aslp_tpu.io import matrix_writer

    lang = decoded["lang"]
    np.savetxt(tmp_path / "tid2pdf.txt",
               decoded["lut"].reshape(-1, 1), fmt="%d")
    # regenerate the graph text from the fixture's packed form source
    from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
    from kaldi_aslp_tpu.fst.ctc_graph import make_ctc_decode_graph
    lex = Lexicon.from_text("YES Y\nNO N\n<SIL> SIL\n")
    lang2 = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.6, "NO": 0.4}, lang2.words)
    tlg = make_ctc_decode_graph(lang2, G)
    (tmp_path / "HCLG.txt").write_text(tlg.to_text())
    with matrix_writer(f"ark:{tmp_path}/ll.ark") as w:
        w["u1"] = decoded["ll"]

    # in-process so the jit cache from the fixture's decoder is reused
    # (a subprocess would pay a multi-minute cold XLA compile)
    from kaldi_aslp_tpu.cli.lat_tools import latgen_faster_rtf_cli
    rc = latgen_faster_rtf_cli([
        "--acoustic-scale=1.0", "--beam=1e9", "--max-active=64",
        str(tmp_path / "tid2pdf.txt"), str(tmp_path / "HCLG.txt"),
        f"ark:{tmp_path}/ll.ark", f"ark:{tmp_path}/lat.ark",
        f"ark,t:{tmp_path}/words.txt"])
    assert rc == 0
    words = [int(x) for x in
             (tmp_path / "words.txt").read_text().split()[1:]]
    assert words == decoded["words"]
    got = dict(sequential_lattice_reader(f"ark:{tmp_path}/lat.ark"))
    w_, _, _ = state_lattice_best_path(got["u1"])
    assert w_ == decoded["words"]


def test_compact_lattice_lmrescore(decoded):
    """Swap the decode unigram for a biased LM at the lattice level:
    the best path flips to the preferred sequence and costs match
    lm_score_words (reference: latbin/lattice-lmrescore.cc workflow —
    old G at -1, new G at +1)."""
    from kaldi_aslp_tpu.decoder import (compact_lattice_lmrescore,
                                        determinize_lattice)
    from kaldi_aslp_tpu.decoder.nbest import lm_score_words
    from kaldi_aslp_tpu.fst import make_unigram_grammar

    lang = decoded["lang"]
    clat = determinize_lattice(decoded["lat"])
    old_G = make_unigram_grammar({"YES": 0.6, "NO": 0.4}, lang.words)
    # strongly prefer YES: any path with NO gets expensive
    new_G = make_unigram_grammar({"YES": 0.999, "NO": 0.001},
                                 lang.words)
    no_old = compact_lattice_lmrescore(clat, old_G, lm_scale=-1.0)
    rescored = compact_lattice_lmrescore(no_old, new_G, lm_scale=1.0)
    w_old, _, c_old = compact_lattice_best_path(clat)
    w_new, _, c_new = compact_lattice_best_path(rescored)
    yes = lang.words.id("YES")
    no = lang.words.id("NO")
    assert w_old == [no, yes]          # acoustics say NO YES
    assert no not in w_new             # rescored LM forbids NO
    # cost decomposition check: for the winning sequence, total =
    # (acoustic+graph without any G) + new-G score
    base = compact_lattice_lmrescore(clat, old_G, lm_scale=-1.0)
    for seq, cost in _word_paths(
            compact_lattice_lmrescore(base, new_G, 1.0)):
        manual = None
        for s2, c2 in _word_paths(base):
            if s2 == seq:
                manual = c2 + lm_score_words(new_G, list(seq))
        assert manual is not None
        assert cost == pytest.approx(manual, abs=1e-3), seq
