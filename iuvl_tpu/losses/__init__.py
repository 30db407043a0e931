from .criterion import SegCriterion, SegTargets  # noqa: F401
from .matcher import hungarian_match  # noqa: F401
