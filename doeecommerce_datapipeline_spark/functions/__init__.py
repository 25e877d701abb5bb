from .scalars import dec_sum, dsum, exact_avg  # noqa: F401
