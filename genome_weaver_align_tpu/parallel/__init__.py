from . import mesh, multihost, sharded_index, sharded_pipeline  # noqa: F401
