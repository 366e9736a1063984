from .feast import (feast, feast_compiled, gen_feast, dual_gen_feast,
                    FeastResult, DualFeastResult)
from .nlfeast import (nlfeast, nlfeast_it, nlfeast_moments, NlfeastResult,
                      beyn_svd_extract, beyn_qr_extract, beyn_rr_extract,
                      beyn_rr2_extract)
from .beyn import beyn, block_ss, BeynResult
from .companion import companion, CompanionResult
from .stochastic import contour_estimate_eig
from .ifeast import ifeast, feast_iterative
from .nlfeast_experimental import nlfeast_moments_all, nlfeast_moments_ss, nlfeast_rr
