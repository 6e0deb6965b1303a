"""CTC loss tests: brute-force path enumeration, torch cross-check,
custom-VJP gradient vs numerical/autodiff gradients.

(reference behavior: src/aslp-nnet/ctc-loss.cc EvalParallel; the
GPU-vs-CPU equivalence testing pattern of SURVEY.md §4 maps here to
jax-vs-torch and jax-vs-bruteforce.)"""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaldi_aslp_tpu.ops.ctc import (
    collapse_ctc_path,
    ctc_loss,
    expand_labels,
)


def brute_force_ctc_nll(log_probs, labels, blank=0):
    """Sum over all alignments of length T that collapse to `labels`."""
    T, V = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(V), repeat=T):
        if collapse_ctc_path(path, T, blank) == list(labels):
            lp = sum(log_probs[t, path[t]] for t in range(T))
            total = np.logaddexp(total, lp)
    return -total


def test_expand_labels():
    labels = jnp.array([[1, 2, 3]])
    exp = expand_labels(labels)
    np.testing.assert_array_equal(exp[0], [0, 1, 0, 2, 0, 3, 0])


def test_ctc_matches_brute_force(rng):
    T, V = 5, 4
    logits = rng.randn(1, T, V).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0]
    for labels in ([1], [1, 2], [2, 2], [3, 1, 3]):
        U = len(labels)
        lab = jnp.asarray([labels], dtype=jnp.int32)
        nll = ctc_loss(
            jnp.asarray(logits), lab,
            jnp.array([T]), jnp.array([U]),
        )
        want = brute_force_ctc_nll(log_probs, labels)
        assert float(nll[0]) == pytest.approx(want, rel=1e-4), labels


def test_ctc_matches_torch(rng):
    torch = pytest.importorskip("torch")
    S, T, V, U = 4, 20, 10, 6
    logits = rng.randn(S, T, V).astype(np.float32)
    labels = rng.randint(1, V, size=(S, U)).astype(np.int32)
    in_lens = np.array([20, 17, 12, 9])
    lab_lens = np.array([6, 4, 3, 1])

    nll = ctc_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray(in_lens), jnp.asarray(lab_lens),
    )

    tl = torch.tensor(logits, requires_grad=True)
    log_probs = torch.log_softmax(tl, dim=-1).transpose(0, 1)  # [T, S, V]
    want = torch.nn.functional.ctc_loss(
        log_probs, torch.tensor(labels.astype(np.int64)),
        torch.tensor(in_lens), torch.tensor(lab_lens),
        blank=0, reduction="none",
    )
    np.testing.assert_allclose(
        np.asarray(nll), want.detach().numpy(), rtol=1e-4, atol=1e-4
    )

    # gradient cross-check (custom VJP vs torch autograd)
    g = jax.grad(
        lambda lg: ctc_loss(
            lg, jnp.asarray(labels), jnp.asarray(in_lens),
            jnp.asarray(lab_lens)
        ).sum()
    )(jnp.asarray(logits))
    want.sum().backward()
    np.testing.assert_allclose(
        np.asarray(g), tl.grad.numpy(), rtol=1e-3, atol=1e-4
    )


def test_ctc_gradient_zero_on_padding(rng):
    S, T, V = 2, 10, 5
    logits = rng.randn(S, T, V).astype(np.float32)
    g = jax.grad(
        lambda lg: ctc_loss(
            lg, jnp.asarray([[1, 2], [3, 0]]),
            jnp.asarray([10, 6]), jnp.asarray([2, 1]),
        ).sum()
    )(jnp.asarray(logits))
    # frames beyond input length must get zero gradient
    assert np.abs(np.asarray(g)[1, 6:]).max() == 0.0
    assert np.abs(np.asarray(g)[1, :6]).max() > 0.0


def test_ctc_jit_and_impossible(rng):
    # label longer than T/2 rule: U=5 labels need >= 2*5-1... with T=3,
    # impossible alignment → +inf-ish loss (very large), not NaN
    logits = jnp.asarray(rng.randn(1, 3, 6).astype(np.float32))
    nll = jax.jit(ctc_loss)(
        logits, jnp.asarray([[1, 2, 3, 4, 5]]),
        jnp.asarray([3]), jnp.asarray([5]),
    )
    assert np.isfinite(np.asarray(nll)).all() == False or float(nll[0]) > 1e9


def test_collapse_path():
    assert collapse_ctc_path([0, 1, 1, 0, 2, 2, 0], 7) == [1, 2]
    assert collapse_ctc_path([1, 1, 2], 3) == [1, 2]
    assert collapse_ctc_path([1, 0, 1], 3) == [1, 1]
