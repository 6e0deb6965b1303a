"""Linear-chain CRF + punctuation processor tests (reference:
src/aslp-online/punctuation-processor.{h,cc} CRF++-based tagger —
reimplemented as a pure-JAX CRF in ops/crf.py)."""

import numpy as np
import pytest

from kaldi_aslp_tpu.ops.crf import (
    crf_log_likelihood,
    crf_tag,
    crf_train,
    crf_viterbi,
    init_crf,
)
from kaldi_aslp_tpu.online.punctuation import (
    MARKS,
    TAGS,
    PunctuationProcessor,
    token_features,
)

import jax.numpy as jnp


def test_crf_loglik_matches_brute_force(rng):
    """Exact log-likelihood vs explicit enumeration on a tiny chain."""
    F, Y, T, K = 16, 3, 4, 2
    params = init_crf(F, Y)
    import jax
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32)),
        params)
    feat_ids = rng.randint(0, F, (T, K)).astype(np.int32)
    tags = rng.randint(0, Y, T).astype(np.int32)
    mask = np.ones(T, np.float32)

    em = np.zeros((T, Y))
    for t in range(T):
        for k in range(K):
            em[t] += np.asarray(params.emission)[feat_ids[t, k]]
    trans = np.asarray(params.transition)
    start, end = np.asarray(params.start), np.asarray(params.end)

    def path_score(seq):
        s = start[seq[0]] + em[0, seq[0]]
        for t in range(1, T):
            s += trans[seq[t - 1], seq[t]] + em[t, seq[t]]
        return s + end[seq[-1]]

    import itertools
    all_scores = [path_score(seq)
                  for seq in itertools.product(range(Y), repeat=T)]
    logz = np.log(np.sum(np.exp(all_scores)))
    want = path_score(tags) - logz
    got = float(crf_log_likelihood(
        params, jnp.asarray(feat_ids), jnp.asarray(tags),
        jnp.asarray(mask)))
    assert got == pytest.approx(want, abs=1e-4)

    # viterbi finds the argmax path
    best = max(itertools.product(range(Y), repeat=T), key=path_score)
    got_tags = crf_viterbi(params, jnp.asarray(feat_ids),
                           jnp.asarray(mask))
    assert list(np.asarray(got_tags)) == list(best)


def _toy_corpus(n=60, seed=0):
    """Synthetic pattern: sentences end with 'stop'→period tag,
    'huh' always gets a question mark, 'and' precedes a comma-tagged
    token."""
    rng = np.random.RandomState(seed)
    vocab = ["alpha", "beta", "gamma", "delta"]
    corpus = []
    for _ in range(n):
        tokens, tags = [], []
        for _ in range(rng.randint(2, 5)):
            tokens.append(vocab[rng.randint(len(vocab))])
            tags.append("N")
        if rng.rand() < 0.5:
            tokens.append("huh")
            tags.append("W")
        tokens.append("stop")
        tags.append("J")
        corpus.append((tokens, tags))
    return corpus


def test_punctuation_processor_learns_pattern():
    proc = PunctuationProcessor.train(_toy_corpus(), num_epochs=12,
                                      learn_rate=0.5)
    tags = proc.tag(["alpha", "beta", "huh", "stop"])
    assert tags[-1] == "J"
    assert tags[2] == "W"
    assert tags[0] == "N"
    out = proc.process("alpha beta huh stop")
    assert out.endswith("stop" + MARKS["J"])
    assert "huh" + MARKS["W"] in out


def test_punctuation_save_load(tmp_path):
    proc = PunctuationProcessor.train(_toy_corpus(20), num_epochs=4)
    path = str(tmp_path / "punc.crf")
    proc.save(path)
    proc2 = PunctuationProcessor.load(path)
    toks = ["alpha", "stop"]
    assert proc.tag(toks) == proc2.tag(toks)


def test_session_applies_punctuation():
    """The decode session's final path runs the processor (reference:
    decode-thread.cc final-result chain)."""
    class FakeDecoder:
        num_frames_decoded = 5

        def finalize_decoding(self):
            return [1, 2], np.zeros(5, np.int32), 0.0

        def reset(self):
            pass

    class FakeFeatures:
        dim = 4

        def reset(self):
            pass

    class Syms:
        def sym(self, w):
            return {1: "alpha", 2: "stop"}[w]

    proc = PunctuationProcessor.train(_toy_corpus(20), num_epochs=6)
    from kaldi_aslp_tpu.online.server import DecodeSession
    sess = DecodeSession.__new__(DecodeSession)
    sess.decoder = FakeDecoder()
    sess.features = FakeFeatures()
    sess.word_syms = Syms()
    sess.punctuation = proc
    sess.finals = []
    sess._pending = np.zeros((0, 4), np.float32)
    out = sess.finalize()
    assert out["text"].endswith(MARKS["J"])
