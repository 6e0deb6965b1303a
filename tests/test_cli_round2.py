"""Tests for the round-2 CLI surface: CD-phone stat accumulators,
convert-ali, transducer builders, VAD boundary eval, distributed
trainer workers, and the audio provider client (reference binaries:
src/aslp-bin/aslp-acc-tree-stats-*, aslp-convert-ali.cc,
aslp-make-ctc-transducer.cc, aslp-make-h3-transducer.cc,
src/aslp-vadbin/aslp-eval-vad-boundary.cc,
src/aslp-parallelbin/aslp-nnet-train-*-worker.cc,
src/aslp-onlinebin/aslp-audio-provider-client.cc)."""

import asyncio
import json
import pickle
import threading

import numpy as np
import pytest

from kaldi_aslp_tpu.cli.__main__ import main
from kaldi_aslp_tpu.io import (
    int_vector_writer,
    matrix_writer,
    sequential_int_vector_reader,
)


@pytest.fixture(scope="module")
def mono_system():
    rng = np.random.RandomState(0)
    from kaldi_aslp_tpu.fst import Lang, Lexicon
    from kaldi_aslp_tpu.gmm import MonophoneTrainer, MonoTrainOptions

    lex = Lexicon.from_text("AB a b\nBA b a\nAA a a\n")
    lang = Lang.build(lex)

    def center(ph):
        return {"a": np.array([3.0, 0.0]), "b": np.array([-3.0, 0.0]),
                "SIL": np.array([0.0, 3.0])}[ph]

    feats, texts = {}, {}
    words = ["AB", "BA", "AA"]
    pron = {w: p[0] for w, p in lex.prons.items()}
    for u in range(8):
        ws = [words[rng.randint(3)] for _ in range(2)]
        seq = ["SIL"]
        for w in ws:
            seq.extend(pron[w])
            seq.append("SIL")
        frames = [center(ph) + 0.3 * rng.randn(rng.randint(6, 10), 2)
                  for ph in seq]
        feats[f"u{u}"] = np.concatenate(frames).astype(np.float32)
        texts[f"u{u}"] = ws
    mono = MonophoneTrainer(lang, opts=MonoTrainOptions(
        num_iters=4, totgauss=20, realign_iters="1 2"))
    am, tm = mono.train(feats, texts)
    alis = mono.align(am, feats, texts)
    return lang, tm, feats, alis


def _write_system(tmp_path, mono_system):
    lang, tm, feats, alis = mono_system
    tm_path = tmp_path / "trans.mdl"
    with open(tm_path, "wb") as f:
        pickle.dump(tm, f)
    feats_ark = tmp_path / "feats.ark"
    ali_ark = tmp_path / "ali.ark"
    with matrix_writer(f"ark:{feats_ark}") as fw, \
            int_vector_writer(f"ark:{ali_ark}") as aw:
        for u in sorted(feats):
            fw[u] = feats[u]
            aw[u] = np.asarray(alis[u], np.int32)
    return str(tm_path), str(feats_ark), str(ali_ark)


@pytest.mark.parametrize("tool", [
    "aslp-acc-tree-stats-cd-phone-kmeans",
    "aslp-acc-tree-stats-cd-phone-equal",
    "aslp-acc-tree-stats-cd-phone-viterbi",
    "aslp-acc-tree-stats-phone-mean",
    "aslp-acc-tree-stats-phone-mean-per-frame",
    "aslp-acc-tree-stats-phone-median",
])
def test_acc_tree_stats_cli(tmp_path, mono_system, tool):
    tm_path, feats_ark, ali_ark = _write_system(tmp_path, mono_system)
    stats_out = tmp_path / "stats.pkl"
    assert main([tool, tm_path, f"ark:{feats_ark}", f"ark:{ali_ark}",
                 str(stats_out)]) == 0
    with open(stats_out, "rb") as f:
        stats = pickle.load(f)
    assert len(stats) > 0
    # keys are (phone-window, pdf-class 0)
    window, pc = next(iter(stats))
    assert len(window) == 3 and pc == 0


def test_questions_tree_bind_chain(tmp_path, mono_system):
    tm_path, feats_ark, ali_ark = _write_system(tmp_path, mono_system)
    stats_out = tmp_path / "stats.pkl"
    assert main(["aslp-acc-tree-stats-cd-phone-kmeans", tm_path,
                 f"ark:{feats_ark}", f"ark:{ali_ark}",
                 str(stats_out)]) == 0
    questions = tmp_path / "questions.txt"
    assert main(["aslp-compile-questions-phone", str(stats_out),
                 str(questions)]) == 0
    qs = [line.split() for line in
          questions.read_text().strip().splitlines()]
    assert len(qs) >= 1

    from kaldi_aslp_tpu.tree.cd_phone import build_cd_phone_tree
    with open(stats_out, "rb") as f:
        stats = pickle.load(f)
    phones = sorted({w[1] for w, _ in stats})
    tree = build_cd_phone_tree(stats, phones, num_leaves=6,
                               min_gain=0.0)
    tree_path = tmp_path / "tree.pkl"
    with open(tree_path, "wb") as f:
        pickle.dump(tree, f)
    bind = tmp_path / "bind.txt"
    assert main(["aslp-tree-bind-info", str(tree_path), str(stats_out),
                 str(bind)]) == 0
    lines = bind.read_text().strip().splitlines()
    assert len(lines) == len(stats)
    assert all(len(line.split()) == 4 for line in lines)


def test_convert_ali_cli(tmp_path, mono_system):
    lang, tm, feats, alis = mono_system
    tm_path, feats_ark, ali_ark = _write_system(tmp_path, mono_system)
    out_ark = tmp_path / "conv.ark"
    # old system == new system, monophone target: phone sequence must
    # be preserved
    assert main(["aslp-convert-ali", tm_path, tm_path, "-",
                 f"ark:{ali_ark}", f"ark:{out_ark}"]) == 0
    from kaldi_aslp_tpu.hmm.convert_ali import phone_segments

    got = dict(sequential_int_vector_reader(f"ark:{out_ark}"))
    assert set(got) == set(feats)
    for u in got:
        old_phones = [p for p, _, _ in phone_segments(
            tm, np.asarray(alis[u]))]
        new_phones = [p for p, _, _ in phone_segments(
            tm, np.asarray(got[u]))]
        assert old_phones == new_phones


def test_make_transducers_cli(tmp_path, mono_system):
    lang, tm, _, _ = mono_system
    tm_path = tmp_path / "trans.mdl"
    with open(tm_path, "wb") as f:
        pickle.dump(tm, f)
    # tiny LG: single word arc per phone
    from kaldi_aslp_tpu.fst.fst import Arc, Fst

    lg = Fst()
    s0 = lg.add_state()
    s1 = lg.add_state()
    s2 = lg.add_state()
    lg.set_start(s0)
    lg.add_arc(s0, Arc(1, 1, 0.5, s1))
    lg.add_arc(s1, Arc(2, 0, 0.0, s2))
    lg.set_final(s2, 0.0)
    lg_path = tmp_path / "lg.txt"
    lg_path.write_text(lg.to_text())

    h3_out = tmp_path / "h3.txt"
    assert main(["aslp-make-h3-transducer", str(tm_path), str(lg_path),
                 str(h3_out)]) == 0
    h3 = Fst.from_text(h3_out.read_text())
    assert h3.num_states > lg.num_states  # HMM expansion grows states
    # input labels are transition ids (> 0 on emitting arcs)
    ils = {a.ilabel for s in range(h3.num_states) for a in h3.arcs[s]}
    assert max(ils) > 2  # beyond the phone alphabet

    pmap = tmp_path / "pmap.txt"
    pmap.write_text("1 1\n2 2\n")
    ctc_out = tmp_path / "ctc.txt"
    assert main(["aslp-make-ctc-transducer", str(pmap), str(lg_path),
                 str(ctc_out)]) == 0
    ctc = Fst.from_text(ctc_out.read_text())
    # blank self-loops exist: some state has an arc to itself with the
    # blank unit
    assert any(a.nextstate == s
               for s in range(ctc.num_states) for a in ctc.arcs[s])


def test_boundary_tool():
    from kaldi_aslp_tpu.vad.boundary import BoundaryTool

    label = np.zeros(100, np.int32)
    label[30:70] = 1
    tool = BoundaryTool(10)
    assert tool.add_data(label, label.copy())
    assert tool.start_acc == pytest.approx(1.0)
    assert tool.end_acc == pytest.approx(1.0)

    # hypothesis 5 frames late on the start boundary
    hyp = np.zeros(100, np.int32)
    hyp[35:70] = 1
    tool2 = BoundaryTool(10)
    assert tool2.add_data(label, hyp)
    assert tool2.start_acc < 1.0
    assert tool2.end_acc == pytest.approx(1.0)

    # all-speech labels are rejected (no silence padding)
    tool3 = BoundaryTool(10)
    assert not tool3.add_data(np.ones(50, np.int32),
                              np.ones(50, np.int32))


def test_eval_vad_boundary_cli(tmp_path, capsys):
    label = np.zeros(100, np.int32)
    label[30:70] = 1
    hyp = label.copy()
    hyp[30:34] = 0  # late trigger
    ref_ark = tmp_path / "ref.ark"
    hyp_ark = tmp_path / "hyp.ark"
    with int_vector_writer(f"ark:{ref_ark}") as rw, \
            int_vector_writer(f"ark:{hyp_ark}") as hw:
        rw["u1"] = label
        hw["u1"] = hyp
    assert main(["aslp-eval-vad-boundary", f"ark:{ref_ark}",
                 f"ark:{hyp_ark}"]) == 0
    out = capsys.readouterr().out
    assert "start_boundary_acc" in out
    sacc = float(out.split("start_boundary_acc ")[1].split()[0])
    eacc = float(out.split("end_boundary_acc ")[1].split()[0])
    assert sacc < 1.0 and eacc == pytest.approx(1.0)


@pytest.fixture
def frame_task(tmp_path):
    rng = np.random.RandomState(1)
    w = rng.randn(6, 4)
    feats_path = tmp_path / "feats.ark"
    tgt_path = tmp_path / "targets.ark"
    with matrix_writer(f"ark:{feats_path}") as fw, \
            int_vector_writer(f"ark:{tgt_path}") as tw:
        for u in range(6):
            x = rng.randn(96, 6).astype(np.float32)
            y = (x @ w).argmax(1).astype(np.int32)
            fw[f"u{u}"] = x
            tw[f"u{u}"] = y
    return str(feats_path), str(tgt_path)


def _worker_model(tmp_path):
    proto = tmp_path / "nnet.proto"
    proto.write_text(
        "<AffineTransform> <InputDim> 6 <OutputDim> 16 "
        "<ParamStddev> 0.1\n"
        "<Sigmoid> <InputDim> 16 <OutputDim> 16\n"
        "<AffineTransform> <InputDim> 16 <OutputDim> 4 "
        "<ParamStddev> 0.1\n"
    )
    model = tmp_path / "model.knet"
    assert main(["aslp-nnet-init", str(proto), str(model)]) == 0
    return str(model)


@pytest.mark.parametrize("worker_type,extra", [
    ("bsp", []),
    ("sod", ["--server-optimizer=adam"]),
    ("bmuf", ["--sync-period=512", "--bmuf-momentum=0.5"]),
    ("easgd", ["--sync-period=256", "--alpha=0.5"]),
    ("asgd", ["--sync-period=256"]),
    # momentum accumulates 8 workers' deltas on the server — needs a
    # gentler lr than the sync modes or it overshoots (inherent to
    # async momentum, not a code artifact)
    ("masgd", ["--sync-period=256", "--masgd-momentum=0.5",
               "--learn-rate=0.05"]),
])
def test_nnet_train_worker_cli(tmp_path, frame_task, capsys,
                               worker_type, extra):
    """The worker CLIs train over the 8-device CPU mesh and reduce the
    loss (reference: aslp-nnet-train-frame-worker.cc loop)."""
    feats, targets = frame_task
    model = _worker_model(tmp_path)
    out_model = str(tmp_path / "out.knet")
    cur = model
    for _ in range(3):
        assert main(["aslp-nnet-train-lstm-stream-worker",
                     f"--worker-type={worker_type}",
                     "--learn-rate=0.3", "--minibatch-size=64",
                     *extra,
                     f"ark:{feats}", f"ark:{targets}", cur,
                     out_model]) == 0
        cur = out_model
        capsys.readouterr()
    # CV with the single-device trainer shows improvement over init
    assert main(["aslp-nnet-train-simple", "--cross-validate=true",
                 f"ark:{feats}", f"ark:{targets}", model]) == 0
    loss0 = float(capsys.readouterr().out.split(
        "AvgLoss: ")[1].split()[0])
    assert main(["aslp-nnet-train-simple", "--cross-validate=true",
                 f"ark:{feats}", f"ark:{targets}", out_model]) == 0
    loss1 = float(capsys.readouterr().out.split(
        "AvgLoss: ")[1].split()[0])
    assert loss1 < loss0, (worker_type, loss0, loss1)


def test_nnet_train_server_cli(capsys):
    assert main(["aslp-nnet-train-server"]) == 0
    assert "easgd" in capsys.readouterr().err


def test_audio_provider_client(tmp_path, capsys):
    """Client main against a dummy JSON-line server."""
    from kaldi_aslp_tpu.io import WaveData, write_wave

    rng = np.random.RandomState(0)
    wav_path = tmp_path / "a.wav"
    write_wave(str(wav_path), WaveData(
        16000.0, (100 * rng.randn(1, 16000)).astype(np.float32)))

    received = []
    port_box = {}
    ready = threading.Event()

    async def dummy_server():
        async def handle(reader, writer):
            total = 0
            while True:
                data = await reader.read(4096)
                if not data:
                    break
                total += len(data)
            received.append(total)
            writer.write((json.dumps(
                {"type": "final", "text": "HELLO"}) + "\n").encode())
            await writer.drain()
            writer.close()

        server = await asyncio.start_server(handle, "127.0.0.1", 0)
        port_box["port"] = server.sockets[0].getsockname()[1]
        ready.set()
        async with server:
            await asyncio.sleep(20)

    t = threading.Thread(target=lambda: asyncio.run(dummy_server()),
                         daemon=True)
    t.start()
    assert ready.wait(5)
    assert main(["aslp-audio-provider-client",
                 f"--port={port_box['port']}", str(wav_path)]) == 0
    out = capsys.readouterr().out
    assert "final: HELLO" in out
    assert received and received[0] == 2 * 16000
