from nerfmlp_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding
from nerfmlp_tpu.parallel.render_parallel import render_image_sharded
from nerfmlp_tpu.parallel.train_step import TrainState, make_train_step, create_train_state

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "render_image_sharded",
    "TrainState",
    "make_train_step",
    "create_train_state",
]
