from algp_tpu.parallel import dist_linalg as dist_linalg  # noqa: F401
from algp_tpu.parallel import sharded as sharded  # noqa: F401
from algp_tpu.parallel import sharded_mi as sharded_mi  # noqa: F401
from algp_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    sharded_fit,
    sharded_fit_icm,
    sharded_training_step,
)
from algp_tpu.parallel.sharded_mi import (  # noqa: F401
    sharded_greedy_select_mi,
)
from algp_tpu.parallel import sharded_lowrank as sharded_lowrank  # noqa: F401
from algp_tpu.parallel.sharded_lowrank import (  # noqa: F401
    sharded_greedy_select_mi_lowrank,
)
