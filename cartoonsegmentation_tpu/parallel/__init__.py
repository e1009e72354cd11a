from .dsla import dynamic_soft_label_assign  # noqa: F401
from .mesh import make_mesh, batch_sharding, replicated, shard_batch  # noqa: F401
from .train import (  # noqa: F401
    TrainState, create_train_state, detector_loss, ema_decay_schedule,
    ema_update, make_train_step,
)
from .tp import (  # noqa: F401
    TRANSFORMER_TP_RULES, shard_params, tp_sharded_fraction, tp_shardings,
)
from .depth_train import (  # noqa: F401
    SimpleState, make_depth_train_step, make_refine_train_step,
    make_zoe_train_step, silog_loss, zoe_optimizer,
)
