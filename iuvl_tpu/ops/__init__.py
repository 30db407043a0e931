from .rel_pos_attention import (  # noqa: F401
    decomposed_rel_pos_bias,
    rel_pos_attention,
    rel_pos_table,
)
