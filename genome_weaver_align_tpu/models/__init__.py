from . import bidirectional, exact, one_mismatch, paired, pipeline, staircase, suffix_filter  # noqa: F401
