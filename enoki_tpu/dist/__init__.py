"""enoki_tpu.dist -- device-mesh sharding and distributed render/train."""

from .mesh import (make_mesh, image_sharding, replicated,  # noqa: F401
                   init_distributed)
from .render import (  # noqa: F401
    render_sharded, mse_loss, make_train_step, make_train_step_shardmap,
    fit_scene,
)
