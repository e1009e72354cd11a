from .dsla import dynamic_soft_label_assign  # noqa: F401
from .mesh import make_mesh, batch_sharding, replicated, shard_batch  # noqa: F401
from .train import (  # noqa: F401
    TrainState, create_train_state, detector_loss, make_train_step,
)
