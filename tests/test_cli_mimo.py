"""CLI-level MIMO surface (reference:
aslp-nnetbin/aslp-nnet-train-frame-mimo.cc:82-94 — N feature
rspecifiers + M target rspecifiers, counts validated against the net's
arity; aslp-nnetbin/aslp-nnet-forward-mimo.cc:75-79,143-146 — N
feature rspecifiers + one output wspecifier, last head written)."""

import jax
import numpy as np

from kaldi_aslp_tpu.cli.__main__ import main
from kaldi_aslp_tpu.io import (
    int_vector_writer,
    matrix_writer,
    sequential_matrix_reader,
)
from kaldi_aslp_tpu.models import Nnet
from kaldi_aslp_tpu.models.simple import AffineTransform


def _mimo_net(tmp_path):
    """2 inputs (dims 5, 4) concatenated -> shared hidden -> 2 heads
    (xent dim 3, mse dim 2)."""
    net = Nnet(num_inputs=2)
    h = net.add(AffineTransform(9, 8),
                inputs=[("in:0", 0), ("in:1", 5)])
    net.add(AffineTransform(8, 3), inputs=[(h, 0)])
    net.add(AffineTransform(8, 2), inputs=[(h, 0)])
    params = net.init(jax.random.PRNGKey(3))
    path = str(tmp_path / "mimo.knet")
    net.save(path, params)
    return net, params, path


def _write_corpus(tmp_path, rng, n_utts=6, T=20):
    f1 = str(tmp_path / "f1.ark")
    f2 = str(tmp_path / "f2.ark")
    t1 = str(tmp_path / "t1.ark")
    t2 = str(tmp_path / "t2.ark")
    with matrix_writer(f"ark:{f1}") as w1, \
            matrix_writer(f"ark:{f2}") as w2, \
            int_vector_writer(f"ark:{t1}") as wt1, \
            matrix_writer(f"ark:{t2}") as wt2:
        for u in range(n_utts):
            key = f"utt{u}"
            w1[key] = rng.randn(T, 5).astype(np.float32)
            w2[key] = rng.randn(T, 4).astype(np.float32)
            wt1[key] = rng.randint(0, 3, T).astype(np.int32)
            wt2[key] = rng.randn(T, 2).astype(np.float32)
    return f1, f2, t1, t2


def test_forward_mimo_reference_arg_shape(tmp_path, rng):
    net, params, model = _mimo_net(tmp_path)
    f1, f2, _, _ = _write_corpus(tmp_path, rng)
    out = str(tmp_path / "out.ark")
    # the reference's exact arg shape: model feats1 feats2 out
    assert main(["aslp-nnet-forward-mimo", "--no-softmax=true",
                 "--apply-log=false",
                 model, f"ark:{f1}", f"ark:{f2}", f"ark:{out}"]) == 0
    feats1 = dict(sequential_matrix_reader(f"ark:{f1}"))
    feats2 = dict(sequential_matrix_reader(f"ark:{f2}"))
    got = dict(sequential_matrix_reader(f"ark:{out}"))
    assert sorted(got) == sorted(feats1)
    # last head (dim 2) is written, matching the reference semantics
    for utt, mat in got.items():
        assert mat.shape[1] == 2
        ys, _ = net.apply(params, [feats1[utt][None], feats2[utt][None]])
        np.testing.assert_allclose(mat, np.asarray(ys[-1][0]),
                                   rtol=1e-5, atol=1e-5)


def test_forward_mimo_rejects_wrong_arity(tmp_path, rng):
    _, _, model = _mimo_net(tmp_path)
    f1, _, _, _ = _write_corpus(tmp_path, rng, n_utts=1)
    out = str(tmp_path / "out.ark")
    # only one rspecifier for a 2-input net -> non-zero exit
    assert main(["aslp-nnet-forward-mimo", model, f"ark:{f1}",
                 f"ark:{out}"]) != 0


def test_train_frame_mimo(tmp_path, rng, capsys):
    net, params, model = _mimo_net(tmp_path)
    f1, f2, t1, t2 = _write_corpus(tmp_path, rng)
    model_out = str(tmp_path / "mimo_iter1.knet")
    # the reference's exact arg shape: feats1 feats2 tgt1 tgt2 in out
    assert main([
        "aslp-nnet-train-frame-mimo", "--objective-function=xent:mse",
        "--minibatch-size=16", "--learn-rate=0.01",
        f"ark:{f1}", f"ark:{f2}", f"ark:{t1}", f"ark:{t2}",
        model, model_out,
    ]) == 0
    out = capsys.readouterr().out
    assert "[output 0]" in out and "[output 1]" in out
    net2, params2, _ = Nnet.load(model_out)
    # training moved the params
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for (_, a), (_, b) in zip(net.param_list(params),
                                  net2.param_list(params2))
    )
    assert moved


def test_train_frame_mimo_validates_counts(tmp_path, rng):
    _, _, model = _mimo_net(tmp_path)
    f1, f2, t1, t2 = _write_corpus(tmp_path, rng, n_utts=1)
    out = str(tmp_path / "x.knet")
    # missing one target rspecifier
    assert main(["aslp-nnet-train-frame-mimo",
                 "--objective-function=xent:mse",
                 f"ark:{f1}", f"ark:{f2}", f"ark:{t1}",
                 model, out]) != 0
    # objective count mismatch
    assert main(["aslp-nnet-train-frame-mimo",
                 "--objective-function=xent",
                 f"ark:{f1}", f"ark:{f2}", f"ark:{t1}", f"ark:{t2}",
                 model, out]) != 0


def test_train_frame_mimo_cross_validate(tmp_path, rng, capsys):
    _, _, model = _mimo_net(tmp_path)
    f1, f2, t1, t2 = _write_corpus(tmp_path, rng)
    assert main([
        "aslp-nnet-train-frame-mimo", "--cross-validate=true",
        "--objective-function=xent:mse", "--minibatch-size=16",
        f"ark:{f1}", f"ark:{f2}", f"ark:{t1}", f"ark:{t2}", model,
    ]) == 0
    assert "[output 0]" in capsys.readouterr().out
