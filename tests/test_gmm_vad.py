"""Global diag GMM + GMM-based VAD (reference:
gmm-global-init-from-feats.cc, aslp_scripts/vad/run_gmm_vad.sh)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.cli.__main__ import main
from kaldi_aslp_tpu.gmm.global_gmm import (
    GlobalGmm,
    avg_loglike,
    init_from_feats,
)
from kaldi_aslp_tpu.io import (
    int_vector_writer,
    matrix_writer,
    sequential_int_vector_reader,
)
from kaldi_aslp_tpu.vad import GmmVad, VadOptions, train_gmm_vad


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_global_gmm_em_recovers_mixture(rng):
    """EM on a 3-component synthetic mixture: loglike improves and the
    learned means land near the true centers."""
    centers = np.array([[-4.0, 0.0], [0.0, 4.0], [4.0, -2.0]])
    feats = np.concatenate([
        centers[k] + 0.5 * rng.randn(400, 2) for k in range(3)
    ]).astype(np.float32)
    gmm1 = init_from_feats(feats, 3, num_iters=1, seed=1)
    gmm = init_from_feats(feats, 3, num_iters=25, seed=1)
    assert avg_loglike(gmm, feats) >= avg_loglike(gmm1, feats) - 1e-3
    # each true center has a learned mean within 0.3
    for c in centers:
        d = np.linalg.norm(gmm.means - c, axis=1).min()
        assert d < 0.3, (c, gmm.means)
    assert np.isclose(gmm.weights.sum(), 1.0, atol=1e-5)


def test_global_gmm_growth_and_pruning(rng):
    feats = rng.randn(2000, 4).astype(np.float32)
    gmm = init_from_feats(feats, 16, num_iters=10, num_gauss_init=4,
                          seed=0)
    assert 4 <= gmm.num_gauss <= 16
    # vars floored positive
    assert (gmm.vars > 0).all()


def test_gmm_vad_detects_speech_band(rng):
    """Frames from two separated Gaussians: VAD recovers the labels."""
    T = 600
    labels = (np.arange(T) // 100) % 2  # alternating 1s blocks
    sil = rng.randn(T, 8) * 0.5
    speech = rng.randn(T, 8) * 0.7 + 3.0
    feats = np.where(labels[:, None] == 1, speech, sil).astype(np.float32)
    vad = train_gmm_vad(feats, labels, num_gauss=4, num_iters=8,
                        opts=VadOptions(speech_trigger_ms=30,
                                        silence_trigger_ms=30,
                                        lookback_ms=0))
    mask = vad.detect(feats)
    agree = (mask == labels.astype(bool)).mean()
    assert agree > 0.95, agree


def test_gmm_vad_cli_roundtrip(tmp_path, rng):
    sil = (rng.randn(500, 5) * 0.4).astype(np.float32)
    speech = (rng.randn(500, 5) * 0.6 + 2.5).astype(np.float32)
    with matrix_writer(f"ark:{tmp_path}/sil.ark") as w:
        w["s1"] = sil
    with matrix_writer(f"ark:{tmp_path}/speech.ark") as w:
        w["v1"] = speech
    assert main(["gmm-global-init-from-feats", "--num-gauss=4",
                 "--num-iters=6", f"ark:{tmp_path}/sil.ark",
                 f"{tmp_path}/sil.npz"]) == 0
    assert main(["gmm-global-init-from-feats", "--num-gauss=4",
                 "--num-iters=6", f"ark:{tmp_path}/speech.ark",
                 f"{tmp_path}/speech.npz"]) == 0

    test = np.concatenate([sil[:100], speech[:100]])
    with matrix_writer(f"ark:{tmp_path}/test.ark") as w:
        w["t1"] = test
    assert main(["aslp-apply-gmm-vad", "--silence-trigger-ms=30",
                 "--speech-trigger-ms=30", "--lookback-ms=0",
                 f"{tmp_path}/sil.npz", f"{tmp_path}/speech.npz",
                 f"ark:{tmp_path}/test.ark",
                 f"ark:{tmp_path}/mask.ark"]) == 0
    got = dict(sequential_int_vector_reader(f"ark:{tmp_path}/mask.ark"))
    mask = got["t1"]
    assert mask[:90].mean() < 0.1
    assert mask[110:].mean() > 0.9
