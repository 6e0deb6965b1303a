"""FST / KWS CLI tools (reference: src/aslp-kwsbin/ — aslp-fst-init,
aslp-fst-info, aslp-fst-to-dot, aslp-kws-score; src/fstbin/ roles)."""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

from kaldi_aslp_tpu.utils.config import Config, parse_options
from kaldi_aslp_tpu.fst.fst import Fst, SymbolTable
from kaldi_aslp_tpu.io import sequential_matrix_reader


def fst_init(argv):
    """Text topo → our FST text format (reference: aslp-fst-init.cc)."""
    args = parse_options(argv, [], "aslp-fst-init topo.txt fst.txt", 2, 2)
    with open(args[0]) as f:
        fst = Fst.from_text(f.read())
    with open(args[1], "w") as f:
        f.write(fst.to_text())
    return 0


def fst_info(argv):
    args = parse_options(argv, [], "aslp-fst-info fst.txt", 1, 1)
    with open(args[0]) as f:
        fst = Fst.from_text(f.read())
    print(f"num-states {fst.num_states}")
    print(f"num-arcs {fst.num_arcs}")
    print(f"num-final {len(fst.finals)}")
    print(f"start {fst.start}")
    eps_arcs = sum(1 for s in range(fst.num_states)
                   for a in fst.arcs[s] if a.ilabel == 0)
    print(f"num-eps-input-arcs {eps_arcs}")
    return 0


def fst_to_dot(argv):
    args = parse_options(argv, [], "aslp-fst-to-dot fst.txt [dot]", 1, 2)
    with open(args[0]) as f:
        fst = Fst.from_text(f.read())
    lines = ["digraph fst {", "rankdir=LR;"]
    for s in range(fst.num_states):
        shape = "doublecircle" if s in fst.finals else "circle"
        lines.append(f'  {s} [shape={shape}];')
        for a in fst.arcs[s]:
            lines.append(
                f'  {s} -> {a.nextstate} '
                f'[label="{a.ilabel}:{a.olabel}/{a.weight:g}"];'
            )
    lines.append("}")
    dot = "\n".join(lines)
    if len(args) > 1:
        with open(args[1], "w") as f:
            f.write(dot)
    else:
        print(dot)
    return 0


def kws_score(argv):
    """Posterior arks → keyword hits (reference: aslp-kws-score.cc)."""
    @dataclasses.dataclass
    class Flags(Config):
        keywords: str = ""   # "name:1,2,3;other:4,5"
        confidence_threshold: float = 0.5

    flags = Flags()
    args = parse_options(
        argv, [flags], "aslp-kws-score --keywords=... post-rspec", 1, 1
    )
    from kaldi_aslp_tpu.kws import KeywordSpotter, KwsOptions

    keywords = {}
    for spec in flags.keywords.split(";"):
        if not spec:
            continue
        name, cols = spec.split(":")
        keywords[name] = [int(c) for c in cols.split(",")]
    spotter = KeywordSpotter(
        keywords,
        KwsOptions(confidence_threshold=flags.confidence_threshold),
    )
    for utt, post in sequential_matrix_reader(args[0]):
        for hit in spotter.spot(np.asarray(post)):
            print(f"{utt} {hit.keyword} {hit.confidence:.4f} "
                  f"{hit.start_frame} {hit.end_frame}")
    return 0
