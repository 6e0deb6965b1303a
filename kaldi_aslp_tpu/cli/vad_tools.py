"""VAD / pitch CLI tools (reference: src/aslp-vadbin/ — apply VAD,
aslp-ali-to-sil, aslp-select-frames; src/featbin/compute-kaldi-pitch-feats)."""

from __future__ import annotations

import dataclasses

import numpy as np

from kaldi_aslp_tpu.utils.config import Config, parse_options
from kaldi_aslp_tpu.io import (
    matrix_writer,
    int_vector_writer,
    sequential_int_vector_reader,
    sequential_matrix_reader,
    read_wave,
)
from kaldi_aslp_tpu.io.datadir import read_key_value
from kaldi_aslp_tpu.vad import (
    EnergyVad,
    NnetVad,
    VadOptions,
    ali_to_sil_targets,
    select_frames,
)
from kaldi_aslp_tpu.feats.pitch import (
    PitchOptions,
    compute_pitch,
    postprocess_pitch,
)


def apply_energy_vad(argv):
    opts = VadOptions()
    args = parse_options(
        argv, [opts],
        "aslp-apply-energy-vad scp:wav.scp ark:mask.ark", 2, 2,
    )
    vad = EnergyVad(opts)
    kind, path = args[0].split(":", 1)
    with int_vector_writer(args[1]) as w:
        for utt, wav_path in read_key_value(path).items():
            wav = read_wave(wav_path)
            sr = wav.samp_freq
            win = int(sr * opts.frame_length_ms / 1000)
            n = len(wav.data[0]) // win
            frames = wav.data[0][: n * win].reshape(n, win)
            w[utt] = vad.detect(frames).astype(np.int32)
    return 0


def apply_nnet_vad(argv):
    opts = VadOptions()
    args = parse_options(
        argv, [opts],
        "aslp-apply-nnet-vad post-rspec mask-wspec", 2, 2,
    )
    vad = NnetVad(opts)
    with int_vector_writer(args[1]) as w:
        for utt, post in sequential_matrix_reader(args[0]):
            w[utt] = vad.detect_from_posteriors(
                np.asarray(post)).astype(np.int32)
    return 0


def ali_to_sil(argv):
    @dataclasses.dataclass
    class Flags(Config):
        sil_pdfs: str = "0"

    flags = Flags()
    args = parse_options(
        argv, [flags], "aslp-ali-to-sil ali-rspec targets-wspec", 2, 2
    )
    sil = [int(i) for i in flags.sil_pdfs.split(":")]
    with int_vector_writer(args[1]) as w:
        for utt, ali in sequential_int_vector_reader(args[0]):
            w[utt] = ali_to_sil_targets(ali, sil)
    return 0


def select_frames_cli(argv):
    args = parse_options(
        argv, [],
        "aslp-select-frames feats-rspec mask-rspec feats-wspec", 3, 3,
    )
    from kaldi_aslp_tpu.io import random_access_int_vector_reader

    masks = random_access_int_vector_reader(args[1])
    with matrix_writer(args[2]) as w:
        for utt, feats in sequential_matrix_reader(args[0]):
            if utt not in masks:
                continue
            m = np.asarray(masks[utt])[: len(feats)]
            w[utt] = select_frames(feats[: len(m)], m)
    return 0


def compute_pitch_cli(argv):
    popts = PitchOptions()

    @dataclasses.dataclass
    class Flags(Config):
        post_process: bool = True

    flags = Flags()
    args = parse_options(
        argv, [popts, flags],
        "compute-kaldi-pitch-feats scp:wav.scp ark:pitch.ark", 2, 2,
    )
    kind, path = args[0].split(":", 1)
    with matrix_writer(args[1]) as w:
        for utt, wav_path in read_key_value(path).items():
            wav = read_wave(wav_path)
            popts.samp_freq = wav.samp_freq
            raw = compute_pitch(wav.data[0], popts)
            w[utt] = postprocess_pitch(raw) if flags.post_process else raw
    return 0


def eval_vad_cli(argv):
    """Score VAD decisions against reference sil/speech targets:
    frame accuracy, false-alarm/miss rates, AUC and EER when scores
    are available (reference: aslp-vadbin/aslp-eval-energy-vad.cc,
    aslp-eval-nn-vad.cc, aslp_scripts/vad/calc_auc.sh / calc_eer.sh)."""
    args = parse_options(
        argv, [],
        "aslp-eval-vad hyp-mask-rspec ref-mask-rspec [scores-rspec]",
        2, 3,
    )
    from kaldi_aslp_tpu.io import sequential_int_vector_reader
    from kaldi_aslp_tpu.vad.roc import auc, eer

    refs = dict(sequential_int_vector_reader(args[1]))
    tp = fp = fn = tn = 0
    for utt, hyp in sequential_int_vector_reader(args[0]):
        ref = refs.get(utt)
        if ref is None:
            continue
        n = min(len(hyp), len(ref))
        h = np.asarray(hyp[:n]) > 0
        r = np.asarray(ref[:n]) > 0
        tp += int((h & r).sum())
        fp += int((h & ~r).sum())
        fn += int((~h & r).sum())
        tn += int((~h & ~r).sum())
    total = max(tp + fp + fn + tn, 1)
    print(f"frames {total} accuracy {(tp + tn) / total:.4f} "
          f"false_alarm {fp / max(fp + tn, 1):.4f} "
          f"miss {fn / max(fn + tp, 1):.4f}")
    if len(args) > 2:
        scores_all, labels_all = [], []
        for utt, sc in sequential_matrix_reader(args[2]):
            ref = refs.get(utt)
            if ref is None:
                continue
            s = np.asarray(sc).reshape(-1)
            n = min(len(s), len(ref))
            scores_all.append(s[:n])
            labels_all.append(np.asarray(ref[:n]))
        if scores_all:
            s = np.concatenate(scores_all)
            y = np.concatenate(labels_all)
            print(f"AUC {auc(s, y):.4f} EER {eer(s, y):.4f}")
    return 0


def apply_nnet_vad_segment(argv):
    """NN VAD → speech segments 'utt start_frame end_frame' lines
    (reference: aslp-vadbin/aslp-apply-nn-vad-segment.cc)."""
    opts = VadOptions()
    args = parse_options(
        argv, [opts],
        "aslp-apply-nn-vad-segment post-rspec segments-out.txt", 2, 2,
    )
    vad = NnetVad(opts)
    with open(args[1], "w") as f:
        for utt, post in sequential_matrix_reader(args[0]):
            mask = vad.detect_from_posteriors(np.asarray(post))
            in_seg = False
            start = 0
            for t, m in enumerate(list(mask) + [0]):
                if m and not in_seg:
                    in_seg, start = True, t
                elif not m and in_seg:
                    in_seg = False
                    f.write(f"{utt} {start} {t}\n")
    return 0


def compute_spectrum_feats(argv):
    """Log power spectrogram features (reference:
    aslp-vadbin/aslp-compute-spectrum-feats.cc,
    aslp-vad/feature-spectrum.*)."""
    from kaldi_aslp_tpu.feats import FrameExtractionOptions
    from kaldi_aslp_tpu.feats.plp import Spectrogram
    from kaldi_aslp_tpu.io import matrix_writer

    fo = FrameExtractionOptions()
    args = parse_options(
        argv, [fo],
        "aslp-compute-spectrum-feats scp:wav.scp ark:feats.ark", 2, 2,
    )
    kind, path = args[0].split(":", 1)
    spec = None
    with matrix_writer(args[1]) as w:
        for utt, wav_path in read_key_value(path).items():
            wav = read_wave(wav_path)
            if spec is None:
                fo.samp_freq = wav.samp_freq
                spec = Spectrogram(fo)
            w[utt] = np.asarray(spec(wav.data[0]))
    return 0


@dataclasses.dataclass
class GlobalGmmOptions(Config):
    num_gauss: int = 32
    num_gauss_init: int = 0
    num_iters: int = 20
    num_frames: int = 200000
    min_gaussian_weight: float = 1e-4
    seed: int = 0


def gmm_global_init_from_feats(argv):
    """Train a global diag GMM from features (reference:
    src/gmmbin/gmm-global-init-from-feats.cc, driven by
    aslp_scripts/vad/train_diag_gmm.sh).  Model saved as .npz."""
    from kaldi_aslp_tpu.gmm.global_gmm import init_from_feats

    opts = GlobalGmmOptions()
    args = parse_options(
        argv, [opts],
        "gmm-global-init-from-feats feats-rspec model-out.npz", 2, 2,
    )
    frames = [f for _, f in sequential_matrix_reader(args[0])]
    feats = np.concatenate(frames, axis=0)
    gmm = init_from_feats(
        feats, opts.num_gauss, num_iters=opts.num_iters,
        num_gauss_init=opts.num_gauss_init, num_frames=opts.num_frames,
        min_gaussian_weight=opts.min_gaussian_weight, seed=opts.seed,
    )
    gmm.save(args[1])
    return 0


@dataclasses.dataclass
class GmmVadCliOptions(Config):
    llr_threshold: float = 0.0


def apply_gmm_vad(argv):
    """Classify frames by speech/sil GMM log-likelihood ratio + FSM
    smoothing (reference: aslp_scripts/vad/run_gmm_vad.sh role)."""
    from kaldi_aslp_tpu.gmm.global_gmm import GlobalGmm
    from kaldi_aslp_tpu.vad.gmm_vad import GmmVad

    vopts = VadOptions()
    gopts = GmmVadCliOptions()
    args = parse_options(
        argv, [vopts, gopts],
        "aslp-apply-gmm-vad sil.npz speech.npz feats-rspec mask-wspec",
        4, 4,
    )
    vad = GmmVad(GlobalGmm.load(args[0]), GlobalGmm.load(args[1]),
                 vopts, llr_threshold=gopts.llr_threshold)
    with int_vector_writer(args[3]) as w:
        for utt, feats in sequential_matrix_reader(args[2]):
            w[utt] = vad.detect(feats).astype(np.int32)
    return 0

def eval_vad_boundary_cli(argv):
    """Boundary placement accuracy of VAD decisions (reference:
    aslp-vadbin/aslp-eval-vad-boundary.cc, aslp-eval-nn-vad-boundary.cc
    via aslp-vad/boundary-tool.h)."""
    @dataclasses.dataclass
    class Flags(Config):
        context: int = 10

    flags = Flags()
    args = parse_options(
        argv, [flags],
        "aslp-eval-vad-boundary label-rspec hyp-rspec", 2, 2,
    )
    from kaldi_aslp_tpu.io import random_access_int_vector_reader
    from kaldi_aslp_tpu.vad.boundary import BoundaryTool

    tool = BoundaryTool(flags.context)
    hyps = random_access_int_vector_reader(args[1])
    num_done = num_err = 0
    for utt, label in sequential_int_vector_reader(args[0]):
        if utt not in hyps:
            num_err += 1
            continue
        hyp = np.asarray(hyps[utt])
        n = min(len(label), len(hyp))
        if tool.add_data(np.asarray(label[:n]), hyp[:n]):
            num_done += 1
        else:
            num_err += 1
    print(tool.report())
    print(f"Done {num_done} files; {num_err} with errors.")
    return 0 if num_done > 0 else 1


def eval_gmm_vad_cli(argv):
    """Apply GMM-LLR VAD and score against reference sil/speech targets
    in one pass (reference: aslp-vadbin/aslp-eval-gmm-vad.cc role)."""
    from kaldi_aslp_tpu.gmm.global_gmm import GlobalGmm
    from kaldi_aslp_tpu.io import random_access_int_vector_reader
    from kaldi_aslp_tpu.vad.gmm_vad import GmmVad
    from kaldi_aslp_tpu.vad.roc import auc, eer

    vopts = VadOptions()
    gopts = GmmVadCliOptions()
    args = parse_options(
        argv, [vopts, gopts],
        "aslp-eval-gmm-vad sil.npz speech.npz feats-rspec ref-rspec",
        4, 4,
    )
    vad = GmmVad(GlobalGmm.load(args[0]), GlobalGmm.load(args[1]),
                 vopts, llr_threshold=gopts.llr_threshold)
    refs = random_access_int_vector_reader(args[3])
    tp = fp = fn = tn = 0
    scores_all, labels_all = [], []
    for utt, feats in sequential_matrix_reader(args[2]):
        if utt not in refs:
            continue
        ref = np.asarray(refs[utt])
        hyp = vad.detect(feats)
        n = min(len(hyp), len(ref))
        h = hyp[:n] > 0
        r = ref[:n] > 0
        tp += int((h & r).sum())
        fp += int((h & ~r).sum())
        fn += int((~h & r).sum())
        tn += int((~h & ~r).sum())
        scores_all.append(np.asarray(vad.frame_scores(feats))[:n])
        labels_all.append(ref[:n])
    total = max(tp + fp + fn + tn, 1)
    print(f"frames {total} accuracy {(tp + tn) / total:.4f} "
          f"false_alarm {fp / max(fp + tn, 1):.4f} "
          f"miss {fn / max(fn + tp, 1):.4f}")
    if scores_all:
        s = np.concatenate(scores_all)
        y = np.concatenate(labels_all)
        print(f"AUC {auc(s, y):.4f} EER {eer(s, y):.4f}")
    return 0
