"""VAD recipe: synthesize audio, train/evaluate the three detector
families end-to-end, segment + emit TextGrid.

Replaces (reference): the aslp_scripts/vad pipeline —
run_energy_vad.sh, run_gmm_vad.sh (train_diag_gmm.sh per class),
run_dnn_vad.sh (DNN sil/speech posteriors), calc_auc.sh / calc_eer.sh
scoring, and do_vad_segment.sh + gen_textgrid_according_vad_interval.py
for segment inspection.  Runnable: ``python -m
kaldi_aslp_tpu.recipes.vad``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from kaldi_aslp_tpu.feats import Fbank, FrameExtractionOptions
from kaldi_aslp_tpu.models.nnet import Nnet
from kaldi_aslp_tpu.models.simple import AffineTransform, Sigmoid, Softmax
from kaldi_aslp_tpu.train import FrameTrainer, NnetTrainOptions, \
    init_velocity
from kaldi_aslp_tpu.utils.log import get_logger
from kaldi_aslp_tpu.vad import (
    EnergyVad,
    NnetVad,
    VadOptions,
    auc,
    eer,
    intervals_to_textgrid,
    train_gmm_vad,
)

logger = get_logger("vad_recipe")

SAMP_FREQ = 8000.0


def synthesize(num_utts: int, seed: int = 777):
    """Utterances of alternating noise-floor silence and band-limited
    speech-like bursts; returns (waveforms, frame_labels)."""
    rng = np.random.RandomState(seed)
    wavs: List[np.ndarray] = []
    labels: List[np.ndarray] = []
    shift = int(SAMP_FREQ * 0.01)
    for _ in range(num_utts):
        chunks, lab = [], []
        for seg in range(rng.randint(4, 8)):
            dur = 0.2 + 0.4 * rng.rand()
            n = int(dur * SAMP_FREQ)
            t = np.arange(n) / SAMP_FREQ
            if seg % 2 == 1:
                f0 = 120 + 180 * rng.rand()
                sig = np.hanning(n) * sum(
                    (2500 / (k + 1)) * np.sin(
                        2 * np.pi * f0 * (k + 1) * t + rng.rand())
                    for k in range(4))
                is_speech = 1
            else:
                sig = np.zeros(n)
                is_speech = 0
            chunks.append(sig)
            lab.append(np.full(n, is_speech, np.int32))
        wave = np.concatenate(chunks)
        wave = wave + 40 * rng.randn(len(wave))
        frame_lab = np.concatenate(lab)
        # per-frame label: majority over the 25ms window start grid
        n_frames = max(0, (len(wave) - int(SAMP_FREQ * 0.025)) // shift + 1)
        fl = np.array([
            frame_lab[i * shift: i * shift + int(SAMP_FREQ * 0.025)].mean()
            > 0.5
            for i in range(n_frames)
        ], np.int32)
        wavs.append(wave.astype(np.float32))
        labels.append(fl)
    return wavs, labels


def mask_to_intervals(mask: np.ndarray) -> List[Tuple[int, int]]:
    """Speech mask -> [(start_frame, end_frame)] (do_vad_segment.sh
    role, the aslp-apply-nn-vad-segment output format)."""
    mask = np.asarray(mask, bool)
    edges = np.flatnonzero(np.diff(np.concatenate(
        [[0], mask.view(np.int8), [0]])))
    return [(int(edges[i]), int(edges[i + 1]))
            for i in range(0, len(edges), 2)]


def run(root: str = "exp_vad", num_train: int = 24,
        num_test: int = 8) -> Dict[str, float]:
    os.makedirs(root, exist_ok=True)
    train_wavs, train_labels = synthesize(num_train, seed=777)
    test_wavs, test_labels = synthesize(num_test, seed=778)

    fo = FrameExtractionOptions(samp_freq=SAMP_FREQ, dither=0.0)
    fbank = Fbank(frame_opts=fo)

    def featurize(wavs, labels):
        fs, ls = [], []
        for w, l in zip(wavs, labels):
            f = np.asarray(fbank(w))
            n = min(len(f), len(l))
            fs.append(f[:n])
            ls.append(l[:n])
        return fs, ls

    train_f, train_l = featurize(train_wavs, train_labels)
    test_f, test_l = featurize(test_wavs, test_labels)
    tr_feats = np.concatenate(train_f)
    tr_lab = np.concatenate(train_l)
    te_lab = np.concatenate(test_l)
    cmn = tr_feats.mean(axis=0)

    results: Dict[str, float] = {}

    # --- energy VAD (run_energy_vad.sh)
    evad = EnergyVad(VadOptions())
    shift, wlen = int(SAMP_FREQ * 0.01), int(SAMP_FREQ * 0.025)

    def wav_frames(w, n):
        return np.stack([w[i * shift:i * shift + wlen]
                         for i in range(n)])

    e_scores = np.concatenate([
        evad.frame_scores(wav_frames(w, len(l)))
        for w, l in zip(test_wavs, test_l)])
    results["energy_auc"] = auc(e_scores, te_lab)
    results["energy_eer"] = eer(e_scores, te_lab)

    # --- GMM VAD (run_gmm_vad.sh / train_diag_gmm.sh)
    gvad = train_gmm_vad(tr_feats - cmn, tr_lab, num_gauss=16,
                         num_iters=10)
    g_scores = np.concatenate([gvad.frame_scores(f - cmn)
                               for f in test_f])
    results["gmm_auc"] = auc(g_scores, te_lab)
    results["gmm_eer"] = eer(g_scores, te_lab)

    # --- DNN VAD (run_dnn_vad.sh): sil/speech softmax
    dim = tr_feats.shape[1]
    net = Nnet()
    net.add(AffineTransform(dim, 32))
    net.add(Sigmoid(32, 32))
    net.add(AffineTransform(32, 2))
    net.add(Softmax(2, 2))
    import jax
    params = net.init(jax.random.PRNGKey(0))
    velocity = init_velocity(params)
    trainer = FrameTrainer(net, NnetTrainOptions(momentum=0.9),
                           objective="xent")
    rng = np.random.RandomState(0)
    order = rng.permutation(len(tr_feats))
    xs, ys = (tr_feats - cmn)[order], tr_lab[order]
    bs = 256
    n_batch = len(xs) // bs
    for epoch in range(3):
        batches = ((xs[i * bs:(i + 1) * bs], ys[i * bs:(i + 1) * bs])
                   for i in range(n_batch))
        params, velocity, rep = trainer.train_epoch(
            params, velocity, batches, 0.05)
        logger.info("dnn epoch %d %s", epoch + 1,
                    rep.report().replace("\n", " "))
    nvad = NnetVad(VadOptions(sil_pdf_ids="0"))
    import jax.numpy as jnp
    post = np.concatenate([
        np.asarray(net.apply(params, jnp.asarray(f - cmn))[0])
        for f in test_f])
    # score = speech posterior = 1 - sil posterior
    results["dnn_auc"] = auc(post[:, 1], te_lab)
    results["dnn_eer"] = eer(post[:, 1], te_lab)

    # --- segmentation + TextGrid on the first test utterance
    mask = nvad.detect_from_posteriors(
        np.asarray(net.apply(params, jnp.asarray(test_f[0] - cmn))[0]))
    intervals = mask_to_intervals(mask)
    seg_path = os.path.join(root, "segment.info")
    with open(seg_path, "w") as f:
        for s, e in intervals:
            f.write("[%d, %d]\n" % (s, e))
    if intervals:
        tg = intervals_to_textgrid(intervals, tier_name="u0")
        with open(os.path.join(root, "u0.TextGrid"), "w") as f:
            f.write(tg)
    results["num_segments"] = float(len(intervals))

    for k, v in sorted(results.items()):
        logger.info("%s = %.4f", k, v)
    return results


if __name__ == "__main__":
    out = run()
    print("RESULT", out)
