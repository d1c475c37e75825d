from . import sais, build, files  # noqa: F401
