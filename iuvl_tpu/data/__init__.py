"""Data layer. Importing this package populates the dataset registry
(mirrors the reference's registration side-effect on
``import datasets.registration``, registration/__init__.py:1-21)."""

from . import datasets as _datasets  # noqa: F401
from . import eval_datasets as _eval_datasets  # noqa: F401
from . import vlp_datasets as _vlp_datasets  # noqa: F401
from . import real_datasets as _real_datasets  # noqa: F401
from .datasets import (  # noqa: F401
    DATASET_REGISTRY,
    JointLoader,
    batched_iterator,
    build_dataset,
    register_dataset,
)
