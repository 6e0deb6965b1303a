from kaldi_aslp_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    is_main_host,
    initialize_distributed,
)
from kaldi_aslp_tpu.parallel.bsp import make_bsp_train_step, shard_batch
from kaldi_aslp_tpu.parallel.bmuf import (
    BmufOptions,
    BmufState,
    bmuf_sync,
    make_bmuf_block_step,
    stack_block_states,
)
from kaldi_aslp_tpu.parallel.optimizers import (
    OptimizerOptions,
    make_optimizer,
)
from kaldi_aslp_tpu.parallel.sod import SodState, sod_sync, model_average_sync
from kaldi_aslp_tpu.parallel.ps import (
    PsOptions,
    PsState,
    easgd_pair_sync,
    asgd_pair_sync,
    masgd_pair_sync,
    ps_sync_round,
    make_ps_round_step,
    stack_worker_states,
)
