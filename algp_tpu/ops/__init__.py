from algp_tpu.ops import gram as gram  # noqa: F401
from algp_tpu.ops import kernels as kernels  # noqa: F401
from algp_tpu.ops import linalg as linalg  # noqa: F401
from algp_tpu.ops import updates as updates  # noqa: F401
