"""Shared fixtures (re-exported from the library's synthetic-scene module)."""

from gaustar_tpu.utils.synthetic import ring_cameras, synthetic_frame  # noqa: F401
