"""Import reference .nnet model files for parity testing.

Reads the reference's binary graph-network format (reference:
src/aslp-nnet/nnet-nnet.cc Nnet::Read/Write at :606+, per-component
framing Component::Write nnet-component.cc:328-343 — token, out-dim,
in-dim, optional <Name>, id, input int-vector, offset int-vector, then
component data) and the plain nnet1 "standard" chain format
(WriteStandard, no id/input/offset).

Component payloads handled (formats read from the reference headers):
  AffineTransform  <LearnRateCoef> <BiasLearnRateCoef> <MaxNorm> M V
                   (nnet-affine-transform.h:145)
  LinearTransform  <LearnRateCoef> M          (nnet-linear-transform.h:99)
  LstmProjectedStreams  <CellDim> <ClipGradient> M M V V V V M
                   (nnet-lstm-projected-streams.h:161)
  BLstmProjectedStreams same x2 (fwd then bwd)
                   (nnet-blstm-projected-streams.h:233)
  Splice           int-vector of frame offsets   (nnet-various.h:125)
  Copy             int-vector of 1-based indices (nnet-various.h:279)
  activations      no payload

Imported gate order is g,i,f,o — identical to ours by design, so the
arrays drop straight into our param pytrees."""

from __future__ import annotations

import io
from typing import BinaryIO, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from kaldi_aslp_tpu.io import kaldi_io
from kaldi_aslp_tpu.io.kaldi_io import KaldiIOError
from kaldi_aslp_tpu.models.nnet import Nnet, Node
from kaldi_aslp_tpu.models import simple as S
from kaldi_aslp_tpu.models import recurrent as R


def _peek(f: BinaryIO) -> bytes:
    pos = f.tell()
    b = f.read(1)
    f.seek(pos)
    return b


def _skip_space(f: BinaryIO) -> None:
    while _peek(f) in b" \t\n\r":
        f.read(1)


def _read_float(f: BinaryIO) -> float:
    return kaldi_io.read_basic_float(f)


def _read_int(f: BinaryIO) -> int:
    return kaldi_io.read_basic_int32(f)


_ACTIVATIONS = {
    "<Sigmoid>": S.Sigmoid,
    "<Tanh>": S.Tanh,
    "<Softmax>": S.Softmax,
    "<ReLU>": S.ReLU,
    "<LengthNormComponent>": S.LengthNorm,
    "<Transmit>": S.Transmit,
}


def read_kaldi_nnet(path_or_file) -> Tuple[Nnet, Dict[str, dict]]:
    """Returns (net, params).  Accepts graph or standard chain format."""
    if hasattr(path_or_file, "read"):
        f = path_or_file
    else:
        f = open(path_or_file, "rb")
    if not kaldi_io.peek_binary_marker(f):
        raise KaldiIOError("only binary .nnet files supported")
    kaldi_io.expect_token(f, "<Nnet>")

    comps: List[Tuple[object, dict, Optional[int],
                      Optional[List[int]], Optional[List[int]], str]] = []
    while True:
        _skip_space(f)
        token = kaldi_io.read_token(f)
        if token == "</Nnet>":
            break
        dim_out = _read_int(f)
        dim_in = _read_int(f)
        # graph format: optional <Name>, then id + input/offset vectors.
        # standard format: payload follows immediately (starts with '<'
        # tag, 'FM'/'FV' matrix token, or int-vector size byte \x04 for
        # Splice — disambiguate by trying to parse id (int32) + two int
        # vectors and backtracking on failure.
        pos = f.tell()
        name = None
        comp_id = None
        inputs = None
        offsets = None
        try:
            _skip_space(f)
            if _peek(f) == b"<":
                tok_pos = f.tell()
                tok = kaldi_io.read_token(f)
                if tok == "<Name>":
                    name = kaldi_io.read_token(f)
                else:
                    f.seek(tok_pos)
                    raise KaldiIOError("standard format")
            comp_id = _read_int(f)
            inputs = list(kaldi_io.read_int_vector(f))
            offsets = list(kaldi_io.read_int_vector(f))
        except (KaldiIOError, Exception):
            f.seek(pos)
            comp_id, inputs, offsets = None, None, None
        comp, params = _read_component_data(f, token, dim_in, dim_out)
        comps.append((comp, params, comp_id, inputs, offsets, token))

    # graph-format files carry <InputLayer>/<OutputLayer> pseudo
    # components (reference: nnet-io.h:19,40; Nnet::InitInputOutput
    # collects them as the net's MIMO ports).  The k-th InputLayer
    # becomes a Transmit node fed from network input k.
    input_ordinal: Dict[int, int] = {}
    for _c, _p, cid, _i, _o, tok in comps:
        if tok == "<InputLayer>" and cid is not None:
            input_ordinal[cid] = len(input_ordinal)
    net = Nnet(num_inputs=max(1, len(input_ordinal)))
    all_params: Dict[str, dict] = {}
    id_to_index = {}
    for idx, (comp, _p, cid, _i, _o, _t) in enumerate(comps):
        if cid is not None:
            id_to_index[cid] = idx
    for idx, (comp, params, cid, inputs, offsets, tok) in enumerate(comps):
        if tok == "<InputLayer>" and cid in input_ordinal:
            edge = [(f"in:{input_ordinal[cid]}", 0)]
        elif inputs is None or not inputs or inputs[0] == -1:
            edge = None  # chain default / network input
        else:
            edge = [
                (id_to_index.get(src, src), off)
                for src, off in zip(inputs, offsets)
            ]
        net.add(comp, inputs=edge)
        all_params[str(idx)] = params
    return net, all_params


def _read_component_data(f: BinaryIO, token: str, dim_in: int,
                         dim_out: int):
    if token in _ACTIVATIONS:
        return _ACTIVATIONS[token](dim_in, dim_out), {}
    if token in ("<InputLayer>", "<OutputLayer>"):
        # identity pass-throughs, no payload (nnet-io.h:19,40)
        return S.Transmit(dim_in, dim_out), {}
    if token == "<ScaleLayer>":
        # constant scalar scale (nnet-io.h ScaleLayer WriteData)
        kaldi_io.expect_token(f, "<Scale>")
        scale = _read_float(f)
        comp = S.Rescale(dim_in, dim_out)
        return comp, {"s": jnp.full((dim_in,), scale, jnp.float32)}
    if token == "<AffineTransform>":
        kaldi_io.expect_token(f, "<LearnRateCoef>")
        lrc = _read_float(f)
        kaldi_io.expect_token(f, "<BiasLearnRateCoef>")
        blrc = _read_float(f)
        _skip_space(f)
        mn = 0.0
        if _peek(f) == b"<":
            kaldi_io.expect_token(f, "<MaxNorm>")
            mn = _read_float(f)
        w = kaldi_io.read_matrix(f)
        b = kaldi_io.read_vector(f)
        comp = S.AffineTransform(dim_in, dim_out, learn_rate_coef=lrc,
                                 bias_learn_rate_coef=blrc, max_norm=mn)
        return comp, {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    if token == "<LinearTransform>":
        kaldi_io.expect_token(f, "<LearnRateCoef>")
        lrc = _read_float(f)
        w = kaldi_io.read_matrix(f)
        return (S.LinearTransform(dim_in, dim_out, learn_rate_coef=lrc),
                {"w": jnp.asarray(w)})
    if token == "<Splice>":
        offs = list(kaldi_io.read_int_vector(f))
        return S.Splice(dim_in, dim_out, build_vector=offs), {}
    if token == "<Copy>":
        idx = [i - 1 for i in kaldi_io.read_int_vector(f)]  # 1-based
        return S.CopyComponent(dim_in, dim_out, build_vector=idx), {}
    if token == "<LstmProjectedStreams>":
        kaldi_io.expect_token(f, "<CellDim>")
        cell = _read_int(f)
        kaldi_io.expect_token(f, "<ClipGradient>")
        _clip = _read_float(f)
        params = _read_lstmp_params(f)
        comp = R.LstmProjectedStreams(dim_in, dim_out, cell_dim=cell)
        return comp, params
    if token == "<BLstmProjectedStreams>":
        kaldi_io.expect_token(f, "<CellDim>")
        cell = _read_int(f)
        kaldi_io.expect_token(f, "<ClipGradient>")
        _clip = _read_float(f)
        fwd = _read_lstmp_params(f)
        bwd = _read_lstmp_params(f)
        comp = R.BLstmProjectedStreams(dim_in, dim_out, cell_dim=cell)
        return comp, {"fwd": fwd, "bwd": bwd}
    raise KaldiIOError(f"unsupported component {token!r} in .nnet import")


def _read_lstmp_params(f: BinaryIO) -> dict:
    return {
        "w_gifo_x": jnp.asarray(kaldi_io.read_matrix(f)),
        "w_gifo_r": jnp.asarray(kaldi_io.read_matrix(f)),
        "bias": jnp.asarray(kaldi_io.read_vector(f)),
        "peephole_i_c": jnp.asarray(kaldi_io.read_vector(f)),
        "peephole_f_c": jnp.asarray(kaldi_io.read_vector(f)),
        "peephole_o_c": jnp.asarray(kaldi_io.read_vector(f)),
        "w_r_m": jnp.asarray(kaldi_io.read_matrix(f)),
    }


# ---------------------------------------------------------------------------
# writer for the standard chain format (WriteStandard equivalent) so our
# models can also be inspected by reference tooling
# ---------------------------------------------------------------------------

def write_kaldi_nnet_standard(path_or_file, net: Nnet, params) -> None:
    f = (path_or_file if hasattr(path_or_file, "write")
         else open(path_or_file, "wb"))
    f.write(kaldi_io.BINARY_MARKER)
    kaldi_io.write_token(f, "<Nnet>")
    for i, node in enumerate(net.nodes):
        comp = node.comp
        p = params.get(str(i), {})
        kaldi_io.write_token(f, comp.token)
        kaldi_io.write_basic_int32(f, comp.output_dim)
        kaldi_io.write_basic_int32(f, comp.input_dim)
        if isinstance(comp, S.AffineTransform):
            kaldi_io.write_token(f, "<LearnRateCoef>")
            kaldi_io.write_basic_float(
                f, float(comp.attrs.get("learn_rate_coef", 1.0)))
            kaldi_io.write_token(f, "<BiasLearnRateCoef>")
            kaldi_io.write_basic_float(
                f, float(comp.attrs.get("bias_learn_rate_coef", 1.0)))
            kaldi_io.write_token(f, "<MaxNorm>")
            kaldi_io.write_basic_float(f, comp.max_norm)
            kaldi_io.write_matrix(f, np.asarray(p["w"]))
            kaldi_io.write_vector(f, np.asarray(p["b"]))
        elif isinstance(comp, S.LinearTransform):
            kaldi_io.write_token(f, "<LearnRateCoef>")
            kaldi_io.write_basic_float(
                f, float(comp.attrs.get("learn_rate_coef", 1.0)))
            kaldi_io.write_matrix(f, np.asarray(p["w"]))
        elif isinstance(comp, S.Splice):
            kaldi_io.write_int_vector(
                f, np.asarray(comp.offsets, np.int32))
        elif isinstance(comp, R.BLstmProjectedStreams):
            kaldi_io.write_token(f, "<CellDim>")
            kaldi_io.write_basic_int32(f, comp.fwd.cell_dim)
            kaldi_io.write_token(f, "<ClipGradient>")
            kaldi_io.write_basic_float(f, 5.0)
            for d in ("fwd", "bwd"):
                _write_lstmp_params(f, p[d])
        elif isinstance(comp, R.LstmProjectedStreams):
            kaldi_io.write_token(f, "<CellDim>")
            kaldi_io.write_basic_int32(f, comp.cell_dim)
            kaldi_io.write_token(f, "<ClipGradient>")
            kaldi_io.write_basic_float(f, 5.0)
            _write_lstmp_params(f, p)
        elif type(comp) in _ACTIVATIONS.values():
            pass
        else:
            raise KaldiIOError(
                f"cannot export component {comp.token} to .nnet"
            )
    kaldi_io.write_token(f, "</Nnet>")


def _write_lstmp_params(f, p) -> None:
    kaldi_io.write_matrix(f, np.asarray(p["w_gifo_x"]))
    kaldi_io.write_matrix(f, np.asarray(p["w_gifo_r"]))
    kaldi_io.write_vector(f, np.asarray(p["bias"]))
    kaldi_io.write_vector(f, np.asarray(p["peephole_i_c"]))
    kaldi_io.write_vector(f, np.asarray(p["peephole_f_c"]))
    kaldi_io.write_vector(f, np.asarray(p["peephole_o_c"]))
    kaldi_io.write_matrix(f, np.asarray(p["w_r_m"]))
