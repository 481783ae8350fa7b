from . import gaussian, projections  # noqa: F401
