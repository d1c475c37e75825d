from . import dp, dp_pallas, myers, rank, window  # noqa: F401
