from .postprocess import (  # noqa: F401
    instance_inference,
    panoptic_merge,
    semantic_inference,
    sem_seg_postprocess,
)
