"""Device-mesh data parallelism: the TPU-native replacement for the
reference's Lightning-DP strategy (reference SURVEY §2.16 / §5)."""
from .mesh import make_mesh, batch_sharding, replicated_sharding  # noqa: F401
from .multihost import (  # noqa: F401
    maybe_initialize_distributed,
    make_global_batch,
)
from .tp import (  # noqa: F401
    make_mesh_2d,
    shard_train_state,
    train_state_shardings,
)
from .train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step, training_key,
    make_eval_step,
)
