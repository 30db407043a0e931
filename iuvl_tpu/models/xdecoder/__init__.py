from .lang_encoder import LanguageEncoder, TextTransformer  # noqa: F401
from .pixel_decoder import DeformablePixelDecoder, MSDeformAttn  # noqa: F401
from .unified_decoder import UnifiedDecoder  # noqa: F401
