from algp_tpu.parallel import sharded as sharded  # noqa: F401
from algp_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    sharded_fit,
    sharded_training_step,
)
