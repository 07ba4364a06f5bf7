from algp_tpu.utils import checkpoint as checkpoint  # noqa: F401
from algp_tpu.utils import metrics as metrics  # noqa: F401
