from tethys_tpu.ops.activations import gelu  # noqa: F401
from tethys_tpu.ops.norms import ReferenceGroupNorm  # noqa: F401
from tethys_tpu.ops.posenc import sinusoidal_table  # noqa: F401
from tethys_tpu.ops.masks import (  # noqa: F401
    causal_additive_mask,
    apply_time_mask,
    apply_feature_mask,
)
from tethys_tpu.ops.attention import multi_head_attention  # noqa: F401
