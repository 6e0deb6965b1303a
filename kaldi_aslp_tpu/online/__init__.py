from kaldi_aslp_tpu.online.feature_pipeline import (
    OnlineFeatureOptions,
    OnlineFeaturePipeline,
)
from kaldi_aslp_tpu.online.endpoint import (
    OnlineEndpointConfig,
    EndpointRule,
    endpoint_detected,
)
from kaldi_aslp_tpu.online.server import (
    DecodeSession,
    OnlineServerOptions,
    OnlineTcpServer,
)
from kaldi_aslp_tpu.online.vad_pipeline import OnlineVadFeaturePipeline
from kaldi_aslp_tpu.online.vad_session import VadDecodeSession
from kaldi_aslp_tpu.online.punctuation import (
    PunctuationProcessor,
    token_features,
)
from kaldi_aslp_tpu.online.batching import (
    AcousticBatcher,
    BatchedDecodeSession,
)
