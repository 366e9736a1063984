from .feast import feast, gen_feast, dual_gen_feast, FeastResult, DualFeastResult
