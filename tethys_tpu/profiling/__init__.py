from tethys_tpu.profiling.tensorsize import (  # noqa: F401
    TensorProfiler,
    value_skewness,
    tensor_inventory_from_tree,
    intermediate_inventory,
)
from tethys_tpu.profiling.hlo_comm import collective_traffic_report  # noqa: F401
