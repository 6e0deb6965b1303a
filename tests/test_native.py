"""Native ark scanner tests: parity with the Python reader + speed
sanity (reference role: src/util/ C++ Table I/O)."""

import time

import numpy as np
import pytest

from kaldi_aslp_tpu.io import matrix_writer, int_vector_writer, \
    vector_writer, sequential_matrix_reader
from kaldi_aslp_tpu.native import FastArkReader, get_lib


def test_native_lib_builds():
    assert get_lib() is not None, "C++ toolchain should be available"


def test_fast_ark_matches_python(tmp_path, rng):
    path = tmp_path / "f.ark"
    mats = {f"utt{i}": rng.randn(50 + i, 40).astype(np.float32)
            for i in range(20)}
    with matrix_writer(f"ark:{path}") as w:
        for k, v in mats.items():
            w[k] = v
    fast = FastArkReader(str(path))
    assert set(fast.keys()) == set(mats)
    for k, v in mats.items():
        np.testing.assert_array_equal(fast[k], v)


def test_fast_ark_int_vectors(tmp_path):
    path = tmp_path / "ali.ark"
    with int_vector_writer(f"ark:{path}") as w:
        w["u1"] = np.array([1, 2, 3], np.int32)
        w["u2"] = np.array([9], np.int32)
    fast = FastArkReader(str(path))
    np.testing.assert_array_equal(fast["u1"], [1, 2, 3])
    np.testing.assert_array_equal(fast["u2"], [9])


def test_fast_ark_vectors(tmp_path):
    path = tmp_path / "v.ark"
    with vector_writer(f"ark:{path}") as w:
        w["s"] = np.array([1.5, -2.5], np.float32)
    fast = FastArkReader(str(path))
    np.testing.assert_array_equal(fast["s"], [1.5, -2.5])


def test_gather_rows(tmp_path, rng):
    path = tmp_path / "g.ark"
    mat = rng.randn(100, 13).astype(np.float32)
    with matrix_writer(f"ark:{path}") as w:
        w["u"] = mat
    fast = FastArkReader(str(path))
    idx = np.array([5, 0, 99, 17])
    got = fast.gather_rows("u", idx)
    np.testing.assert_array_equal(got, mat[idx])


def test_fast_ark_speedup_many_entries(tmp_path, rng):
    """Per-entry overhead: on arks with thousands of small entries
    (alignments) the native scan must clearly beat the Python reader."""
    from kaldi_aslp_tpu.io import sequential_int_vector_reader

    path = tmp_path / "ali.ark"
    with int_vector_writer(f"ark:{path}") as w:
        for i in range(5000):
            w[f"u{i}"] = rng.randint(1, 100, 50).astype(np.int32)
    # warm the page cache
    open(path, "rb").read()

    def time_native():
        t0 = time.perf_counter()
        fast = FastArkReader(str(path))
        total = sum(int(fast[k][0]) for k in fast.keys())
        return time.perf_counter() - t0, total

    def time_python():
        t0 = time.perf_counter()
        total = sum(
            int(v[0]) for _, v in
            sequential_int_vector_reader(f"ark:{path}")
        )
        return time.perf_counter() - t0, total

    # best-of-3 to survive CI load spikes (typical ratio 3-10x)
    t_native, total_native = min(time_native() for _ in range(3))
    t_python, total_py = min(time_python() for _ in range(3))
    assert total_native == total_py
    assert t_native < t_python, (t_native, t_python)


def test_pad_pack_f32_matches_numpy(rng=np.random.RandomState(5)):
    from kaldi_aslp_tpu import native

    feats = [rng.randn(int(rng.randint(3, 9)), 4).astype(np.float32)
             for _ in range(5)]
    T = 10
    packed = native.pad_pack(feats, T, "f32")
    assert packed is not None, "native toolchain should be available"
    out, scale, offset = packed
    assert scale is None and offset is None
    ref = np.zeros((5, T, 4), np.float32)
    for i, f in enumerate(feats):
        ref[i, :len(f)] = f
    np.testing.assert_array_equal(out, ref)


def test_pad_pack_bf16_matches_ml_dtypes(rng=np.random.RandomState(6)):
    import ml_dtypes
    from kaldi_aslp_tpu import native

    feats = [rng.randn(7, 8).astype(np.float32) * 100 for _ in range(3)]
    out, _, _ = native.pad_pack(feats, 8, "bf16")
    assert out.dtype == ml_dtypes.bfloat16
    ref = np.zeros((3, 8, 8), np.float32)
    for i, f in enumerate(feats):
        ref[i, :len(f)] = f
    np.testing.assert_array_equal(out.view(np.uint16),
                                  ref.astype(ml_dtypes.bfloat16)
                                  .view(np.uint16))


def test_pad_pack_int8_matches_transport_contract(
        rng=np.random.RandomState(7)):
    import jax.numpy as jnp
    from kaldi_aslp_tpu import native
    from kaldi_aslp_tpu.data.transport import unpack_feats

    lens = [9, 5, 12]
    feats = [(rng.randn(n, 6) * 3 + rng.randn(6) * 5).astype(np.float32)
             for n in lens]
    T = 12
    out, scale, offset = native.pad_pack(feats, T, "int8")
    assert out.dtype == np.int8 and scale.shape == (6,)
    # stats over REAL frames only
    real = np.concatenate(feats)
    np.testing.assert_allclose(
        scale, np.maximum(real.max(0) - real.min(0), 1e-10) / 254.0,
        rtol=1e-6)
    np.testing.assert_allclose(offset, real.min(0), rtol=1e-6)
    deq = np.asarray(unpack_feats(
        jnp.asarray(out), jnp.asarray(scale), jnp.asarray(offset),
        jnp.asarray(np.asarray(lens, np.int32))))
    for s, n in enumerate(lens):
        err = np.abs(deq[s, :n] - feats[s])
        assert (err <= scale[None, :] * 0.51 + 1e-6).all()
        np.testing.assert_array_equal(deq[s, n:], 0.0)


def test_native_compose_matches_python_exactly():
    """Native fst_compose == Fst._compose_py bit-for-bit (state
    numbering, arc order, weights) on random machines with eps on both
    sides, and on a real L∘G."""
    import jax
    from kaldi_aslp_tpu.fst.fst import Arc, Fst
    from kaldi_aslp_tpu import native

    def rand_fst(rng, S, n_arcs, max_lab, eps_frac=0.3):
        f = Fst()
        for _ in range(S):
            f.add_state()
        f.set_start(0)
        for _ in range(n_arcs):
            s, d = rng.randint(S), rng.randint(S)
            il = 0 if rng.rand() < eps_frac else 1 + rng.randint(max_lab)
            ol = 0 if rng.rand() < eps_frac else 1 + rng.randint(max_lab)
            f.add_arc(s, Arc(il, ol, round(float(rng.rand()), 3), d))
        for s in range(S):
            if rng.rand() < 0.3:
                f.set_final(s, round(float(rng.rand()), 3))
        return f

    rng = np.random.RandomState(0)
    for trial in range(6):
        a = rand_fst(rng, 5 + trial, 24, 4)
        b = rand_fst(rng, 4 + trial, 20, 4)
        b.arc_sort("ilabel")
        nat = native.fst_compose(a, b)
        assert nat is not None
        ref = a._compose_py(b)
        # weights cross the C boundary as float32 (OpenFst's own weight
        # width); %g text form and structure must match exactly
        assert nat.to_text() == ref.to_text(), f"trial {trial}"
        assert nat.start == ref.start
        assert set(nat.finals) == set(ref.finals)
        for s, c in ref.finals.items():
            assert abs(nat.finals[s] - c) < 1e-6


def test_native_compose_on_real_lg():
    from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar
    from kaldi_aslp_tpu import native

    from kaldi_aslp_tpu.fst.lang import make_lexicon_fst
    lex = Lexicon.from_text("YES Y E S\nNO N O\nMAYBE M A Y B\n<SIL> SIL\n")
    lang = Lang.build(lex)
    G = make_unigram_grammar({"YES": 0.5, "NO": 0.3, "MAYBE": 0.2},
                             lang.words)
    L = make_lexicon_fst(lang)
    nat = native.fst_compose(L, G)
    ref = L._compose_py(G)
    assert nat.to_text() == ref.to_text()


def test_native_compose_csr_matches_object_boundary():
    """fst_compose_csr (the array-native boundary used by real-scale
    graph builds) == fst_compose on random machines; same C++ core, so
    this locks the CSR marshalling (reference role:
    src/fstext/table-matcher.h fsttablecompose, at the scale of
    egs/librispeech mkgraph.sh outputs)."""
    from kaldi_aslp_tpu.fst.fst import Arc, Fst
    from kaldi_aslp_tpu import native

    def rand_fst(rng, S, n_arcs, max_lab, eps_frac=0.3):
        f = Fst()
        for _ in range(S):
            f.add_state()
        f.set_start(0)
        for _ in range(n_arcs):
            s, d = rng.randint(S), rng.randint(S)
            il = 0 if rng.rand() < eps_frac else 1 + rng.randint(max_lab)
            ol = 0 if rng.rand() < eps_frac else 1 + rng.randint(max_lab)
            f.add_arc(s, Arc(il, ol, round(float(rng.rand()), 3), d))
        for s in range(S):
            if rng.rand() < 0.3:
                f.set_final(s, round(float(rng.rand()), 3))
        return f

    def to_csr(f, sort_by_il):
        S = f.num_states
        row = np.zeros(S + 1, np.int32)
        il, ol, w, dst = [], [], [], []
        for s, arcs in enumerate(f.arcs):
            if sort_by_il:
                arcs = sorted(arcs, key=lambda a: a.ilabel)
            row[s + 1] = row[s] + len(arcs)
            for a in arcs:
                il.append(a.ilabel)
                ol.append(a.olabel)
                w.append(a.weight)
                dst.append(a.nextstate)
        fin = np.full(S, np.inf, np.float32)
        for s, c in f.finals.items():
            fin[s] = c
        return (row, np.asarray(il, np.int32), np.asarray(ol, np.int32),
                np.asarray(w, np.float32), np.asarray(dst, np.int32), fin)

    rng = np.random.RandomState(7)
    for trial in range(8):
        a = rand_fst(rng, 5 + trial, 24, 4)
        b = rand_fst(rng, 4 + trial, 20, 4)
        ref = native.fst_compose(a, b)
        b.arc_sort("ilabel")
        out = native.fst_compose_csr(to_csr(a, False), a.start,
                                     to_csr(b, True), b.start)
        assert out is not None
        src, il, ol, w, dst, fin, start = out
        g = Fst()
        for _ in range(len(fin)):
            g.add_state()
        if start >= 0:
            g.set_start(int(start))
        for i in range(len(src)):
            g.add_arc(int(src[i]),
                      Arc(int(il[i]), int(ol[i]), float(w[i]),
                          int(dst[i])))
        for s in np.nonzero(np.isfinite(fin))[0]:
            g.set_final(int(s), float(fin[s]))
        assert g.to_text() == ref.to_text(), f"trial {trial}"
