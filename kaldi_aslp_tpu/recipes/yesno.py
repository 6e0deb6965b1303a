"""The yesno end-to-end recipe (reference: egs/yesno/s5/run.sh).

Full stage chain on disk artifacts: corpus (synthesized — the openslr
download needs network; reference audio is 8 kHz yes/no Hebrew
recordings, we synthesize tonal stand-ins with the same structure) →
data dir → MFCC ark,scp + CMVN → mono GMM-HMM flat-start training →
unigram graph (the task.arpabo role) → Viterbi decode → WER.

Run: python -m kaldi_aslp_tpu.recipes.yesno [workdir]
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from kaldi_aslp_tpu.io import (
    DataDir,
    WaveData,
    matrix_writer,
    read_wave,
    sequential_matrix_reader,
    write_wave,
)
from kaldi_aslp_tpu.feats import (
    FrameExtractionOptions,
    MelBanksOptions,
    Mfcc,
    acc_cmvn_stats,
    apply_cmvn,
)
from kaldi_aslp_tpu.fst import Lang, Lexicon, make_unigram_grammar, \
    make_decode_graph
from kaldi_aslp_tpu.fst.lang import arpa_to_fst
from kaldi_aslp_tpu.gmm import MonophoneTrainer, MonoTrainOptions, \
    gmm_loglikes
from kaldi_aslp_tpu.decoder import PackedGraph, ViterbiDecoder
from kaldi_aslp_tpu.decoder.beam import BeamSearchDecoder, CsrGraph
from kaldi_aslp_tpu.decoder.compact import lattice_to_state, \
    state_lattice_best_path
from kaldi_aslp_tpu.io.lattice_io import lattice_writer, \
    sequential_lattice_reader
from kaldi_aslp_tpu.ops.edit_distance import score_utterances
from kaldi_aslp_tpu.utils.log import get_logger

logger = get_logger("yesno")

SAMP_FREQ = 8000.0

# the reference task definition, consumed verbatim when present
# (reference: egs/yesno/s5/input/lexicon.txt, task.arpabo)
REF_INPUT_DIR = "/root/reference/egs/yesno/s5/input"
FALLBACK_LEXICON = "<SIL> SIL\nYES Y\nNO N\n"
FALLBACK_ARPA = """\
\\data\\
ngram 1=3

\\1-grams:
-1\tNO
-1\tYES
-99 <s>
-1 </s>

\\end\\
"""


def load_task_inputs():
    """lexicon.txt + task.arpabo, preferring the reference's own files
    (reference: egs/yesno/s5/local/prepare_lm.sh consumes these)."""
    lex_path = os.path.join(REF_INPUT_DIR, "lexicon.txt")
    arpa_path = os.path.join(REF_INPUT_DIR, "task.arpabo")
    lex_text = (open(lex_path).read() if os.path.exists(lex_path)
                else FALLBACK_LEXICON)
    arpa_text = (open(arpa_path).read() if os.path.exists(arpa_path)
                 else FALLBACK_ARPA)
    return lex_text, arpa_text

# word → (fundamental Hz, formant Hz): distinct spectral shapes
WORD_TONES = {"YES": (220.0, 1400.0), "NO": (150.0, 700.0)}


def synthesize_corpus(wav_dir: str, num_utts: int = 60,
                      seed: int = 777):
    """Tonal yes/no utterances with silence gaps, 8 kHz like the
    original corpus."""
    rng = np.random.RandomState(seed)
    os.makedirs(wav_dir, exist_ok=True)
    texts: Dict[str, str] = {}
    for u in range(num_utts):
        words = ["YES" if rng.rand() < 0.5 else "NO" for _ in range(8)]
        key = "_".join("1" if w == "YES" else "0" for w in words)
        chunks = [np.zeros(int(0.25 * SAMP_FREQ))]
        for w in words:
            f0, f1 = WORD_TONES[w]
            dur = 0.25 + 0.1 * rng.rand()
            t = np.arange(int(dur * SAMP_FREQ)) / SAMP_FREQ
            env = np.hanning(len(t))
            sig = env * (4000 * np.sin(2 * np.pi * f0 * t)
                         + 2000 * np.sin(2 * np.pi * f1 * t))
            chunks.append(sig)
            chunks.append(np.zeros(int((0.15 + 0.1 * rng.rand())
                                       * SAMP_FREQ)))
        wave = np.concatenate(chunks) + 30 * rng.randn(
            sum(len(c) for c in chunks)
        )
        path = os.path.join(wav_dir, f"{key}_{u}.wav")
        write_wave(path, WaveData(SAMP_FREQ, wave[None, :].astype(
            np.float32)))
        texts[f"{key}_{u}"] = " ".join(words)
    return texts


def prepare_data(root: str, texts: Dict[str, str], wav_dir: str):
    """local/prepare_data.sh equivalent: train/test split + data dirs."""
    keys = sorted(texts)
    half = len(keys) // 2
    split = {"train_yesno": keys[:half], "test_yesno": keys[half:]}
    dirs = {}
    for name, utts in split.items():
        d = DataDir(path=os.path.join(root, "data", name))
        for k in utts:
            d.wav_scp[k] = os.path.join(wav_dir, f"{k}.wav")
            d.text[k] = texts[k]
            d.utt2spk[k] = "global"
        d.save()
        dirs[name] = d
    return dirs


def make_mfcc(root: str, d: DataDir, name: str) -> None:
    """steps/make_mfcc.sh + compute_cmvn_stats.sh equivalent."""
    mfcc_dir = os.path.join(root, "mfcc")
    os.makedirs(mfcc_dir, exist_ok=True)
    frame_opts = FrameExtractionOptions(samp_freq=SAMP_FREQ, dither=0.0)
    mfcc = Mfcc(frame_opts, MelBanksOptions(num_bins=23))
    stats = None
    ark = os.path.join(mfcc_dir, f"raw_mfcc_{name}.ark")
    scp = os.path.join(mfcc_dir, f"raw_mfcc_{name}.scp")
    with matrix_writer(f"ark,scp:{ark},{scp}") as w:
        for utt in sorted(d.wav_scp):
            wav = read_wave(d.wav_scp[utt])
            feats = np.asarray(mfcc(wav.data[0]))
            w[utt] = feats
            stats = acc_cmvn_stats(feats, stats)
    d.feats_scp = dict(
        line.split(None, 1) for line in open(scp).read().splitlines()
    )
    d.save()
    np.save(os.path.join(mfcc_dir, f"cmvn_{name}.npy"), stats)


def load_feats(root: str, d: DataDir, name: str) -> Dict[str, np.ndarray]:
    stats = np.load(os.path.join(root, "mfcc", f"cmvn_{name}.npy"))
    out = {}
    for utt, feats in sequential_matrix_reader(
        f"scp:{os.path.join(root, 'mfcc', f'raw_mfcc_{name}.scp')}"
    ):
        out[utt] = np.asarray(apply_cmvn(jnp.asarray(feats), stats))
    return out


def run(root: str = "exp_yesno", num_utts: int = 60) -> float:
    t0 = time.time()
    wav_dir = os.path.join(root, "waves_yesno")
    texts = synthesize_corpus(wav_dir, num_utts=num_utts)
    dirs = prepare_data(root, texts, wav_dir)
    logger.info("data prepared: %d train, %d test utts",
                len(dirs["train_yesno"].text), len(dirs["test_yesno"].text))

    for name, d in dirs.items():
        make_mfcc(root, d, name)
    train_feats = load_feats(root, dirs["train_yesno"], "train_yesno")
    test_feats = load_feats(root, dirs["test_yesno"], "test_yesno")

    # lang prep from the reference task files (input/lexicon.txt +
    # task.arpabo consumed verbatim)
    lex_text, arpa_text = load_task_inputs()
    lex = Lexicon.from_text(lex_text)
    lang = Lang.build(lex)
    transcripts = {u: t.split() for u, t in
                   dirs["train_yesno"].text.items()}

    trainer = MonophoneTrainer(
        lang, opts=MonoTrainOptions(num_iters=12, totgauss=120,
                                    realign_iters="1 2 3 4 5 6 8 10"),
    )
    am, tm = trainer.train(train_feats, transcripts)
    logger.info("mono trained: %d pdfs, %d gaussians",
                am.num_pdfs, int(am.num_gauss_per_pdf.sum()))

    # graph from the reference ARPA LM + beam-pruned lattice decode
    # (decode.sh role: latgen → lattice ark → best-path → WER)
    G = arpa_to_fst(arpa_text, lang.words)
    hclg = make_decode_graph(lang, G, tm)
    packed = PackedGraph.from_fst(hclg)
    lut = tm.alignment_to_pdfs(np.arange(tm.num_transition_ids + 1))
    decoder = BeamSearchDecoder(
        CsrGraph.from_packed(packed), lut, acoustic_scale=1.0,
        beam=32.0, max_active=512, chunk=128,
    )
    am_packed = am.pack()

    lat_path = os.path.join(root, "lat.ark")
    hyps, refs = {}, {}
    decode_time = 0.0
    audio_time = 0.0
    with lattice_writer(f"ark:{lat_path}") as latw:
        for utt, feats in test_feats.items():
            t1 = time.time()
            ll = np.asarray(gmm_loglikes(jnp.asarray(feats), *am_packed))
            words, _, _, lat = decoder.decode_lattice(
                ll, lattice_beam=8.0)
            decode_time += time.time() - t1
            audio_time += len(feats) * 0.01
            latw[utt] = lattice_to_state(lat)
            refs[utt] = dirs["test_yesno"].text[utt].split()
    # score from the on-disk lattices (score_basic.sh role)
    for utt, slat in sequential_lattice_reader(f"ark:{lat_path}"):
        words, _, _ = state_lattice_best_path(slat)
        hyps[utt] = [lang.words.sym(w) for w in words]
    stats = score_utterances(refs, hyps)
    rtf = decode_time / max(audio_time, 1e-9)
    logger.info("%s", stats.report())
    logger.info("decode RTF %.4f; total pipeline %.1fs",
                rtf, time.time() - t0)
    print(stats.report())
    print(f"RTF {rtf:.4f}")
    return stats.wer


if __name__ == "__main__":
    wer = run(sys.argv[1] if len(sys.argv) > 1 else "exp_yesno")
    sys.exit(0 if wer < 5.0 else 1)
