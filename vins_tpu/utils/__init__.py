from . import lie, camera  # noqa: F401
