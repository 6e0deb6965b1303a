"""NN CLI tools (reference: src/aslp-nnetbin/ — aslp-nnet-init,
aslp-nnet-info, aslp-nnet-copy, aslp-nnet-dot, aslp-nnet-forward,
aslp-nnet-train-simple, aslp-nnet-train-ctc-streams; src/bin/
ali-to-pdf, ali-to-phones, analyze-counts, compute-wer)."""

from __future__ import annotations

import dataclasses
import sys

import numpy as np
import jax

from kaldi_aslp_tpu.utils.config import Config, parse_options
from kaldi_aslp_tpu.utils.log import get_logger
from kaldi_aslp_tpu.io import (
    int_vector_writer,
    matrix_writer,
    sequential_int_vector_reader,
    sequential_matrix_reader,
    random_access_int_vector_reader,
    vector_writer,
)
from kaldi_aslp_tpu.models import Nnet, LossReporter
from kaldi_aslp_tpu.decoder.decodable import (
    NnetForwardOptions,
    PdfPrior,
    nnet_forward,
)

logger = get_logger("cli")


def nnet_init(argv):
    @dataclasses.dataclass
    class Flags(Config):
        seed: int = 777

    flags = Flags()
    args = parse_options(
        argv, [flags], "aslp-nnet-init proto-file model-out", 2, 2
    )
    with open(args[0]) as f:
        net = Nnet.from_proto(f.read())
    params = net.init(jax.random.PRNGKey(flags.seed))
    net.save(args[1], params)
    logger.info("initialized %d components, %d params",
                net.num_components(), net.num_params(params))
    return 0


def nnet_info(argv):
    args = parse_options(argv, [], "aslp-nnet-info model", 1, 1)
    net, params, _ = Nnet.load(args[0])
    print(net.info(params))
    return 0


def nnet_copy(argv):
    args = parse_options(argv, [], "aslp-nnet-copy in out", 2, 2)
    net, params, states = Nnet.load(args[0])
    net.save(args[1], params, states)
    return 0


def nnet_dot(argv):
    args = parse_options(argv, [], "aslp-nnet-dot model [dot-out]", 1, 2)
    net, _, _ = Nnet.load(args[0])
    dot = net.to_dot()
    if len(args) > 1:
        with open(args[1], "w") as f:
            f.write(dot)
    else:
        print(dot)
    return 0


def nnet_forward_cli(argv):
    opts = NnetForwardOptions()

    @dataclasses.dataclass
    class Flags(Config):
        class_frame_counts: str = ""
        prior_scale: float = 1.0

    flags = Flags()
    args = parse_options(
        argv, [opts, flags],
        "aslp-nnet-forward model feats-rspec loglikes-wspec", 3, 3,
    )
    net, params, _ = Nnet.load(args[0])
    prior = None
    if flags.class_frame_counts:
        counts = np.loadtxt(flags.class_frame_counts)
        prior = PdfPrior(counts, prior_scale=flags.prior_scale)
    with matrix_writer(args[2]) as w:
        for utt, feats in sequential_matrix_reader(args[1]):
            w[utt] = nnet_forward(net, params, feats, opts, prior)
    return 0


def nnet_forward_mimo(argv):
    """MIMO forward (reference: aslp-nnetbin/aslp-nnet-forward-mimo.cc):
    N feature rspecifiers — N validated against the net's input arity
    (:75-79) — plus ONE output wspecifier; per the reference, when the
    net is multi-output only the LAST output head is written
    (:143-146 "If multitask, only write the last task out").  Readers
    advance in lockstep and must agree on keys (:120-125)."""
    opts = NnetForwardOptions()

    @dataclasses.dataclass
    class Flags(Config):
        class_frame_counts: str = ""
        prior_scale: float = 1.0

    flags = Flags()
    args = parse_options(
        argv, [opts, flags],
        "aslp-nnet-forward-mimo model feats-rspec-1 ... feats-rspec-N "
        "out-wspec", 3, 66,
    )
    net, params, _ = Nnet.load(args[0])
    n_in = net.num_inputs
    if len(args) != 1 + n_in + 1:
        print(f"aslp-nnet-forward-mimo: net has {n_in} input(s); "
              f"expected {1 + n_in + 1} args (model + {n_in} feature "
              f"rspecifiers + out-wspec), got {len(args)}",
              file=sys.stderr)
        return 1
    prior = None
    if flags.class_frame_counts:
        counts = np.loadtxt(flags.class_frame_counts)
        prior = PdfPrior(counts, prior_scale=flags.prior_scale)
    import jax.numpy as jnp

    readers = [sequential_matrix_reader(a) for a in args[1:1 + n_in]]
    num_done = 0
    with matrix_writer(args[-1]) as w:
        for items in zip(*readers):
            utt = items[0][0]
            for utti, _ in items[1:]:
                if utti != utt:
                    print(f"aslp-nnet-forward-mimo: key mismatch "
                          f"{utt} vs {utti} — check feature scp order",
                          file=sys.stderr)
                    return 1
            xs = []
            for _, mat in items:
                x = np.asarray(mat, np.float32)
                if opts.time_shift > 0:
                    x = np.concatenate(
                        [x[opts.time_shift:],
                         np.repeat(x[-1:], opts.time_shift, 0)]
                    )
                xs.append(jnp.asarray(x[None]))
            ys, _ = net.apply(params, xs if n_in > 1 else xs[0])
            y = (ys[-1] if isinstance(ys, list) else ys)[0]
            if not opts.no_softmax:
                import jax
                y = jax.nn.log_softmax(y, axis=-1)
            elif opts.apply_log:
                y = jnp.log(jnp.maximum(y, 1e-20))
            if prior is not None:
                y = prior.subtract(y)
            w[utt] = np.asarray(y)
            num_done += 1
    logger.info("forwarded %d utterances", num_done)
    return 0


def ali_to_pdf(argv):
    """Needs the transition model — stored with our GMM systems as
    topology+pdf-map; here the mapping is supplied as a tid→pdf LUT
    file (one int per line)."""
    args = parse_options(
        argv, [], "ali-to-pdf tid-to-pdf.txt ali-rspec pdf-wspec", 3, 3
    )
    lut = np.loadtxt(args[0], dtype=np.int32)
    with int_vector_writer(args[2]) as w:
        for utt, ali in sequential_int_vector_reader(args[1]):
            w[utt] = lut[ali]
    return 0


def ali_minus_one(argv):
    """(reference: aslp-bin/aslp-ali-minus-one.cc) — shift labels so
    blank becomes 0 for CTC."""
    args = parse_options(argv, [],
                         "aslp-ali-minus-one in-rspec out-wspec", 2, 2)
    with int_vector_writer(args[1]) as w:
        for utt, ali in sequential_int_vector_reader(args[0]):
            w[utt] = np.asarray(ali) - 1
    return 0


def analyze_counts(argv):
    @dataclasses.dataclass
    class Flags(Config):
        num_classes: int = 0

    flags = Flags()
    args = parse_options(
        argv, [flags], "analyze-counts ali-rspec counts-out", 2, 2
    )
    counts = np.zeros(max(flags.num_classes, 1), np.float64)
    for utt, ali in sequential_int_vector_reader(args[0]):
        m = int(np.max(ali)) + 1 if len(ali) else 0
        if m > len(counts):
            counts = np.concatenate([counts, np.zeros(m - len(counts))])
        np.add.at(counts, np.asarray(ali), 1.0)
    np.savetxt(args[1], counts[None], fmt="%.1f")
    return 0


def compute_wer(argv):
    @dataclasses.dataclass
    class Flags(Config):
        mode: str = "present"

    flags = Flags()
    args = parse_options(
        argv, [flags], "compute-wer ark:ref.txt ark:hyp.txt", 2, 2
    )
    from kaldi_aslp_tpu.io.datadir import read_key_value
    from kaldi_aslp_tpu.ops.edit_distance import score_utterances

    def load(spec):
        path = spec.split(":", 1)[1]
        return {k: v.split() for k, v in read_key_value(path).items()}

    refs, hyps = load(args[0]), load(args[1])
    if flags.mode == "present":
        refs = {k: v for k, v in refs.items() if k in hyps}
    stats = score_utterances(refs, hyps)
    print(stats.report())
    print(f"%SER {stats.ser:.2f} [ {stats.num_wrong_sentences} / "
          f"{stats.num_sentences} ]")
    return 0


def nnet_convert_to_standard(argv):
    """Graph net → plain-chain net (reference:
    aslp-nnetbin/aslp-nnet-convert-to-standard.cc via Nnet::
    WriteStandard, nnet-nnet.h:143 — drops graph metadata so simple
    chains round-trip without DAG bookkeeping)."""
    args = parse_options(
        argv, [], "aslp-nnet-convert-to-standard in.knet out.knet", 2, 2
    )
    net, params, _states = Nnet.load(args[0])
    new_params = {}
    chain = Nnet()
    for i, node in enumerate(net.nodes):
        want = [("in:0", 0)] if i == 0 else [(i - 1, 0)]
        if [tuple(e) for e in node.inputs] != want:
            print("aslp-nnet-convert-to-standard: net is not a simple "
                  "chain (MIMO/branching graph)", file=sys.stderr)
            return 1
        cid = chain.add(node.comp)
        new_params[str(cid)] = params[str(i)]
    chain.save(args[1], new_params)
    print(f"Converted {len(net.nodes)} components", file=sys.stderr)
    return 0


def nnet_insert(argv):
    """Insert another net's chain components into a net
    (reference: aslp-nnetbin/aslp-nnet-insert.cc:14-49 InsertComponents;
    default position = before the last updatable component, with the
    next affine re-randomized — the pretrain.sh growth step).

    --position < 0 (default) mirrors the reference's --insert-at < 0."""
    @dataclasses.dataclass
    class Flags(Config):
        position: int = -1  # component index to insert before; <0 = last updatable
        randomize_next_component: bool = True
        stddev_factor: float = 0.1
        srand_seed: int = 0

    flags = Flags()
    args = parse_options(
        argv, [flags],
        "aslp-nnet-insert base.knet insert.knet out.knet", 3, 3,
    )
    from kaldi_aslp_tpu.train.pretrain import insert_components

    base, bp, _ = Nnet.load(args[0])
    ins, ip, _ = Nnet.load(args[1])
    import jax

    try:
        out, params = insert_components(
            base, bp, ins, ip,
            insert_at=int(flags.position),
            randomize_next=bool(flags.randomize_next_component),
            stddev_factor=float(flags.stddev_factor),
            key=jax.random.PRNGKey(int(flags.srand_seed)),
        )
    except ValueError as e:
        print(f"aslp-nnet-insert: {e}", file=sys.stderr)
        return 1
    out.save(args[2], params)
    print(f"Inserted {len(ins.nodes)} components", file=sys.stderr)
    return 0


def ali_to_matrix(argv):
    """Alignment → one-hot matrix (reference:
    aslp-bin/aslp-ali-to-matrix.cc)."""
    @dataclasses.dataclass
    class Flags(Config):
        dict_size: int = 0

    flags = Flags()
    args = parse_options(
        argv, [flags],
        "aslp-ali-to-matrix --dict-size=N ali-rspec mat-wspec", 2, 2,
    )
    if flags.dict_size <= 0:
        print("--dict-size required", file=sys.stderr)
        return 1
    from kaldi_aslp_tpu.io import (matrix_writer,
                                   sequential_int_vector_reader)
    n = 0
    with matrix_writer(args[1]) as w:
        for utt, ali in sequential_int_vector_reader(args[0]):
            ali = np.asarray(ali)
            if ali.size and (ali.min() < 0
                             or ali.max() >= flags.dict_size):
                print(f"{utt}: label outside [0, {flags.dict_size})",
                      file=sys.stderr)
                return 1
            m = np.zeros((len(ali), flags.dict_size), np.float32)
            m[np.arange(len(ali)), ali] = 1.0
            w[utt] = m
            n += 1
    print(f"Converted {n} alignments", file=sys.stderr)
    return 0


def matrix_to_txt(argv):
    """Matrix ark → plain text rows (reference:
    aslp-bin/aslp-matrix-to-txt.cc)."""
    args = parse_options(
        argv, [], "aslp-matrix-to-txt mat-rspec out.txt", 2, 2,
    )
    from kaldi_aslp_tpu.io import sequential_matrix_reader
    with open(args[1], "w") as f:
        for utt, mat in sequential_matrix_reader(args[0]):
            f.write(utt + "\n")
            for row in np.asarray(mat):
                f.write(" ".join(f"{v:g}" for v in row) + "\n")
    return 0


def txt_to_matrix(argv):
    """Plain text rows → matrix ark (reference:
    aslp-bin/aslp-txt-to-matrix.cc; blank-line separated blocks whose
    first line is the key)."""
    args = parse_options(
        argv, [], "aslp-txt-to-matrix in.txt mat-wspec", 2, 2,
    )
    from kaldi_aslp_tpu.io import matrix_writer
    with open(args[0]) as f, matrix_writer(args[1]) as w:
        key, rows = None, []
        for line in list(f) + [""]:
            line = line.strip()
            if not line:
                if key is not None and rows:
                    w[key] = np.asarray(rows, np.float32)
                key, rows = None, []
            elif key is None:
                key = line
            else:
                rows.append([float(x) for x in line.split()])
    return 0


def copy_vector_from_matrix(argv):
    """Extract one column of each matrix as a vector ark (reference:
    aslp-bin/aslp-copy-vector-from-matrix.cc)."""
    @dataclasses.dataclass
    class Flags(Config):
        column: int = 0

    flags = Flags()
    args = parse_options(
        argv, [flags],
        "aslp-copy-vector-from-matrix mat-rspec vec-wspec", 2, 2,
    )
    from kaldi_aslp_tpu.io import sequential_matrix_reader, vector_writer
    with vector_writer(args[1]) as w:
        for utt, mat in sequential_matrix_reader(args[0]):
            w[utt] = np.asarray(mat)[:, flags.column]
    return 0


def extract_transition_to_pdf(argv):
    """Dump the tid→pdf map of a transition model pickle as text
    (reference: aslp-bin/aslp-extract-transition-to-pdf.cc)."""
    args = parse_options(
        argv, [],
        "aslp-extract-transition-to-pdf mdl.pkl tid2pdf.txt", 2, 2,
    )
    import pickle
    with open(args[0], "rb") as f:
        tm = pickle.load(f)
    lut = tm.alignment_to_pdfs(np.arange(tm.num_transition_ids + 1))
    np.savetxt(args[1], np.asarray(lut).reshape(-1, 1), fmt="%d")
    return 0


def wav_noise(argv):
    """Additive noise augmentation of wav files (reference:
    aslp-bin/aslp-wav-noise.cc)."""
    @dataclasses.dataclass
    class Flags(Config):
        snr_db: float = 20.0
        seed: int = 777

    flags = Flags()
    args = parse_options(
        argv, [flags], "aslp-wav-noise scp:wav.scp out_dir", 2, 2,
    )
    import os
    from kaldi_aslp_tpu.feats.resample import add_noise
    from kaldi_aslp_tpu.io import WaveData, read_wave, write_wave

    _, path = args[0].split(":", 1)
    os.makedirs(args[1], exist_ok=True)
    rng = np.random.RandomState(flags.seed)
    for line in open(path):
        toks = line.split()
        if len(toks) < 2:
            continue
        utt, wav_path = toks[0], toks[1]
        wav = read_wave(wav_path)
        noise = rng.randn(len(wav.data[0])).astype(np.float32)
        noisy = add_noise(wav.data[0], noise, snr_db=flags.snr_db)
        write_wave(os.path.join(args[1], f"{utt}.wav"),
                   WaveData(wav.samp_freq,
                            noisy[None, :].astype(np.float32)))
    return 0
