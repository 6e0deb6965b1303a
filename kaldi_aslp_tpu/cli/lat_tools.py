"""Lattice CLI tools (reference: src/latbin/ — lattice-best-path.cc,
lattice-scale.cc, lattice-copy.cc, lattice-determinize.cc roles)."""

from __future__ import annotations

import dataclasses
import sys

from kaldi_aslp_tpu.utils.config import Config, parse_options


def lattice_best_path_cli(argv):
    """(reference: latbin/lattice-best-path.cc)."""
    @dataclasses.dataclass
    class Flags(Config):
        acoustic_scale: float = 1.0
        lm_scale: float = 1.0

    flags = Flags()
    args = parse_options(
        argv, [flags],
        "lattice-best-path lats-rspecifier transcription-wspecifier "
        "[ali-wspecifier]", 2, 3,
    )
    from kaldi_aslp_tpu.io import (int_vector_writer,
                                   sequential_lattice_reader)
    from kaldi_aslp_tpu.decoder import (CompactLattice,
                                        compact_lattice_best_path,
                                        state_lattice_best_path)

    n_done, n_fail = 0, 0
    tra = int_vector_writer(args[1])
    ali_w = int_vector_writer(args[2]) if len(args) > 2 else None
    for utt, lat in sequential_lattice_reader(args[0]):
        try:
            if isinstance(lat, CompactLattice):
                words, ali, _cost = compact_lattice_best_path(
                    lat, flags.lm_scale, flags.acoustic_scale)
            else:
                words, ali, _cost = state_lattice_best_path(
                    lat, flags.lm_scale, flags.acoustic_scale)
        except RuntimeError as e:
            print(f"lattice-best-path: {utt}: {e}", file=sys.stderr)
            n_fail += 1
            continue
        tra[utt] = words
        if ali_w is not None:
            ali_w[utt] = ali
        n_done += 1
    tra.close()
    if ali_w is not None:
        ali_w.close()
    print(f"Done {n_done} lattices, failed {n_fail}", file=sys.stderr)
    return 0 if n_done else 1


def lattice_scale_cli(argv):
    """(reference: latbin/lattice-scale.cc)."""
    @dataclasses.dataclass
    class Flags(Config):
        acoustic_scale: float = 1.0
        lm_scale: float = 1.0
        inv_acoustic_scale: float = 1.0

    flags = Flags()
    args = parse_options(
        argv, [flags], "lattice-scale lats-rspecifier lats-wspecifier",
        2, 2,
    )
    from kaldi_aslp_tpu.io import (lattice_writer,
                                   sequential_lattice_reader)
    from kaldi_aslp_tpu.decoder import scale_lattice

    acwt = flags.acoustic_scale
    if flags.inv_acoustic_scale != 1.0:
        if flags.acoustic_scale != 1.0:
            print("use only one of --acoustic-scale and "
                  "--inv-acoustic-scale", file=sys.stderr)
            return 1
        acwt = 1.0 / flags.inv_acoustic_scale
    n = 0
    with lattice_writer(args[1]) as w:
        for utt, lat in sequential_lattice_reader(args[0]):
            w[utt] = scale_lattice(lat, flags.lm_scale, acwt)
            n += 1
    print(f"Done {n} lattices", file=sys.stderr)
    return 0


def lattice_copy_cli(argv):
    """(reference: latbin/lattice-copy.cc) — also the binary↔text
    converter."""
    args = parse_options(
        argv, [], "lattice-copy lats-rspecifier lats-wspecifier", 2, 2,
    )
    from kaldi_aslp_tpu.io import (lattice_writer,
                                   sequential_lattice_reader)

    n = 0
    with lattice_writer(args[1]) as w:
        for utt, lat in sequential_lattice_reader(args[0]):
            w[utt] = lat
            n += 1
    print(f"Copied {n} lattices", file=sys.stderr)
    return 0


def lattice_determinize_cli(argv):
    """(reference: latbin/lattice-determinize.cc /
    lattice-determinize-pruned.cc — state lattices in, compact
    determinized lattices out)."""
    @dataclasses.dataclass
    class Flags(Config):
        beam: float = 0.0   # 0 = no pruning

    flags = Flags()
    args = parse_options(
        argv, [flags],
        "lattice-determinize lats-rspecifier clats-wspecifier", 2, 2,
    )
    from kaldi_aslp_tpu.io import (compact_lattice_writer,
                                   sequential_lattice_reader)
    from kaldi_aslp_tpu.decoder import (CompactLattice,
                                        determinize_lattice,
                                        state_to_lattice)

    n = 0
    prune = flags.beam if flags.beam > 0 else None
    with compact_lattice_writer(args[1]) as w:
        for utt, lat in sequential_lattice_reader(args[0]):
            if isinstance(lat, CompactLattice):
                w[utt] = lat
            else:
                w[utt] = determinize_lattice(
                    state_to_lattice(lat), prune=prune)
            n += 1
    print(f"Determinized {n} lattices", file=sys.stderr)
    return 0
