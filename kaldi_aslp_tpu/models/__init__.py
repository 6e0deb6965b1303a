from kaldi_aslp_tpu.models.component import (
    Component,
    build_component,
    component_from_token,
    known_tokens,
    parse_proto_line,
)
# importing the modules registers every component token
from kaldi_aslp_tpu.models import simple as _simple  # noqa: F401
from kaldi_aslp_tpu.models import recurrent as _recurrent  # noqa: F401
from kaldi_aslp_tpu.models import conv as _conv  # noqa: F401
from kaldi_aslp_tpu.models import fsmn as _fsmn  # noqa: F401
from kaldi_aslp_tpu.models import batchnorm as _batchnorm  # noqa: F401
from kaldi_aslp_tpu.models.simple import (
    AffineTransform,
    LinearTransform,
    Sigmoid,
    Tanh,
    ReLU,
    Softmax,
    BlockSoftmax,
    Dropout,
    Pnorm,
    Maxout,
    LengthNorm,
    AddShift,
    Rescale,
    CopyComponent,
    Transmit,
    Splice,
)
from kaldi_aslp_tpu.models.recurrent import (
    Lstm,
    LstmProjectedStreams,
    LstmCifgProjectedStreams,
    GruStreams,
    BLstm,
    BLstmProjectedStreams,
    BLstmProjectedStreamsLC,
)
from kaldi_aslp_tpu.models.conv import ConvolutionalComponent, MaxPoolingComponent
from kaldi_aslp_tpu.models.fsmn import CompactFsmn, RowConvolution
from kaldi_aslp_tpu.models.batchnorm import BatchNormalization, merge_bn_stats
from kaldi_aslp_tpu.models.nnet import Nnet, Node
from kaldi_aslp_tpu.models.losses import (
    xent_loss,
    mse_loss,
    MultiTaskSpec,
    multitask_loss,
    ctc_batch_loss,
    ctc_loss_spike_mask,
    LossReporter,
)
