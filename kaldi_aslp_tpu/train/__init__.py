from kaldi_aslp_tpu.train.sgd import (
    NnetTrainOptions,
    init_velocity,
    make_sgd_update,
)
from kaldi_aslp_tpu.train.newbob import (
    NewbobOptions,
    NewbobScheduler,
    NewbobState,
)
from kaldi_aslp_tpu.train.trainer import FrameTrainer, CtcTrainer
from kaldi_aslp_tpu.train.saddle import SaddleDetector, SaddleOptions
from kaldi_aslp_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from kaldi_aslp_tpu.train.pretrain import (
    insert_components,
    last_updatable_index,
    pretrain_layerwise,
)
