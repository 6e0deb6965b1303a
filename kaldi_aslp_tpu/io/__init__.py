from kaldi_aslp_tpu.io.kaldi_io import (
    read_matrix,
    write_matrix,
    read_vector,
    write_vector,
    read_int_vector,
    write_int_vector,
    read_posterior,
    write_posterior,
    KaldiIOError,
)
from kaldi_aslp_tpu.io.table import (
    SequentialTableReader,
    RandomAccessTableReader,
    TableWriter,
    sequential_matrix_reader,
    sequential_vector_reader,
    sequential_int_vector_reader,
    sequential_posterior_reader,
    random_access_matrix_reader,
    random_access_vector_reader,
    random_access_int_vector_reader,
    random_access_posterior_reader,
    matrix_writer,
    vector_writer,
    int_vector_writer,
    posterior_writer,
)
from kaldi_aslp_tpu.io.wave import WaveData, read_wave, write_wave
from kaldi_aslp_tpu.io.htk import HtkHeader, read_htk, write_htk
from kaldi_aslp_tpu.io.lattice_io import (
    CompactLatticeHolder,
    LatticeHolder,
    compact_lattice_writer,
    lattice_writer,
    random_access_lattice_reader,
    read_lattice_binary,
    read_lattice_text,
    sequential_lattice_reader,
    write_lattice_binary,
    write_lattice_text,
)
from kaldi_aslp_tpu.io.datadir import DataDir, split_data_dir
