"""CTC blank-saddle detector tests (train/saddle.py) + the newbob
hold-mode protocol it drives (reference role: the generic CTC
robustness machinery of src/aslp-nnet/ctc-loss.cc:229-344 — here the
pathology managed is the all-blank saddle)."""

import numpy as np

from kaldi_aslp_tpu.train.newbob import NewbobOptions, NewbobScheduler
from kaldi_aslp_tpu.train.saddle import SaddleDetector, SaddleOptions


def _sched(tmp_path, lr=0.06, **kw):
    return NewbobScheduler(str(tmp_path), initial_lr=lr,
                           opts=NewbobOptions(**kw))


def test_hold_blocks_halving_and_force_accepts(tmp_path):
    s = _sched(tmp_path, max_iters=20)
    # worse CV loss than "best" would normally reject + start halving;
    # under hold it is accepted and the lr untouched
    assert s.report(1.0, hold=True) is True
    assert s.report(1.2, hold=True) is True          # loss RISES
    assert s.learn_rate == 0.06
    assert s.state.halving is False
    # baseline tracks the CURRENT loss: releasing the hold right after
    # a drop counts as improvement, not as "worse than the saddle min"
    assert s.state.best_cv_loss == 1.2
    assert s.report(1.0) is True                     # newbob resumes


def test_detector_holds_on_plateau_not_during_descent(tmp_path):
    s = _sched(tmp_path, max_iters=100)
    det = SaddleDetector(SaddleOptions(
        blank_thresh=0.9, escalate_iters=3, lr_factor=2.0, max_lr=0.5))
    # all-blank but loss falling healthily: detector stays out of the
    # way (newbob cannot halve during >=1% improvement anyway)
    assert det.update(1.0, 1.00, s) is False
    assert det.update(1.0, 0.90, s) is False
    assert det.update(1.0, 0.80, s) is False
    assert abs(s.learn_rate - 0.06) < 1e-9
    # all-blank AND plateaued: hold; 3 held epochs -> lr x2
    assert det.update(1.0, 0.799, s) is True
    assert det.update(1.0, 0.799, s) is True
    assert det.update(1.0, 0.799, s) is True
    assert abs(s.learn_rate - 0.12) < 1e-9
    assert det.update(1.0, 0.799, s) is True
    assert det.update(1.0, 0.799, s) is True
    assert det.update(1.0, 0.799, s) is True
    assert abs(s.learn_rate - 0.24) < 1e-9
    # crossing releases the hold permanently
    assert det.update(0.5, 0.70, s) is False
    assert det.crossed
    assert det.update(0.99, 0.70, s) is False  # never re-enters


def test_escalation_capped(tmp_path):
    s = _sched(tmp_path, max_iters=100)
    det = SaddleDetector(SaddleOptions(
        blank_thresh=0.9, escalate_iters=1, lr_factor=10.0, max_lr=0.1))
    det.update(1.0, 1.0, s)   # first epoch: no prev loss -> rel_impr=1
    det.update(1.0, 1.0, s)
    assert abs(s.learn_rate - 0.1) < 1e-9
    det.update(1.0, 1.0, s)
    assert abs(s.learn_rate - 0.1) < 1e-9  # capped, no further growth


def test_disabled_detector_never_holds(tmp_path):
    s = _sched(tmp_path, max_iters=100)
    det = SaddleDetector(SaddleOptions(enabled=False))
    assert det.update(1.0, 1.0, s) is False
    assert det.update(1.0, 1.0, s) is False


def test_hold_still_bounded_by_max_iters(tmp_path):
    s = _sched(tmp_path, max_iters=3)
    for _ in range(3):
        s.report(1.0, hold=True)
    assert s.done


def test_ctc_recipe_crosses_saddle_with_auto_policy(tmp_path):
    """End-to-end: a toy CTC task trained with the detector in place of
    hand-tuned keep_lr_iters; the model must leave the all-blank regime
    and reach a sane greedy PER — the property that previously needed
    per-corpus schedule tuning (config validated by a parameter scan:
    3-4 frames/label crosses; the detector's plateau+blank criterion
    holds through the saddle and releases for newbob afterwards)."""
    from kaldi_aslp_tpu.fst import Lang, Lexicon
    from kaldi_aslp_tpu.recipes.ctc import CtcRecipe, CtcRecipeOptions

    rng = np.random.RandomState(0)
    lex = Lexicon.from_text("<SIL> SIL\na p1\nb p2\nc p3\n")
    lang = Lang.build(lex)

    def utt(words):
        segs = []
        for w in words:
            pid = {"a": 0, "b": 1, "c": 2}[w]
            f = np.zeros((4, 4), np.float32)
            f[:, pid] = 2.0
            segs.append(f + 0.1 * rng.randn(4, 4).astype(np.float32))
        return np.concatenate(segs, 0)

    texts = {}
    feats = {}
    for i in range(24):
        ws = [["a", "b", "c"][rng.randint(3)] for _ in range(4)]
        u = f"u{i:02d}"
        texts[u] = ws
        feats[u] = utt(ws)
    ctc = CtcRecipe(lang, CtcRecipeOptions(
        model_type="lstm", hidden_dim=16, num_layers=1,
        learn_rate=0.1, auto_saddle=True, max_iters=60,
        num_streams=4, bucket_time=32, bucket_labels=8))
    ctc.run(feats, texts, feats, texts, work_dir=str(tmp_path))
    assert ctc.greedy_per < 50.0, ctc.greedy_per
