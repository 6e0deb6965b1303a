from kaldi_aslp_tpu.utils.log import get_logger, set_verbose_level
from kaldi_aslp_tpu.utils.config import Config, ConfigError, parse_options
from kaldi_aslp_tpu.utils.profile import AccuProfiler, ThroughputMeter
