from .semseg import SemSegEvaluator  # noqa: F401
from .grounding import GroundingEvaluator  # noqa: F401
from .interactive import InteractiveEvaluator  # noqa: F401
from .retrieval import RetrievalEvaluator  # noqa: F401
from .classification import ClassificationEvaluator  # noqa: F401
from .captioning import CaptioningEvaluator  # noqa: F401
from .panoptic import PanopticEvaluator  # noqa: F401
from .instance import InstanceAPEvaluator  # noqa: F401
