from tsdiff_tpu.train.scheduler import ExpMinScheduler, PlateauScheduler, get_scheduler  # noqa: F401
# mesh utilities live in tsdiff_tpu.parallel; re-exported here because the
# training loop is their main consumer (cli/train.py)
from tsdiff_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    shard_ensemble_params,
)
from tsdiff_tpu.train.trainer import (  # noqa: F401
    TrainState,
    get_checkpoint_path,
    init_model_params,
    init_train_state,
    load_checkpoint,
    select_params,
    restore_opt_state,
    make_eval_step,
    make_optimizer,
    make_resident_eval_step,
    make_resident_train_step,
    make_train_step,
    save_checkpoint,
)
