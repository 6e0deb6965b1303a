from kaldi_aslp_tpu.utils.log import get_logger, set_verbose_level
from kaldi_aslp_tpu.utils.config import Config, ConfigError, parse_options
