from algp_tpu.models import gp as gp  # noqa: F401
from algp_tpu.models import networks as networks  # noqa: F401
from algp_tpu.models import sparse_gp as sparse_gp  # noqa: F401
from algp_tpu.models.gp import ExactGP, Posterior, neg_mll  # noqa: F401
from algp_tpu.models.networks import MLPSpec, fit_deep  # noqa: F401
from algp_tpu.models.sparse_gp import SparseGP, neg_elbo  # noqa: F401
