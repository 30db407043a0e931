"""Multi-chip parallel serving layer."""

from .serving import ServingContext, serve_seg, serve_vqa  # noqa: F401
