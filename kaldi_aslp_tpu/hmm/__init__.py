from kaldi_aslp_tpu.hmm.topology import HmmTopology, HmmState, TopologyEntry
from kaldi_aslp_tpu.hmm.transition_model import TransitionModel, TransitionState
from kaldi_aslp_tpu.hmm.convert_ali import convert_alignment, phone_segments
