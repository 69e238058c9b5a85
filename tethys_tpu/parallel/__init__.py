from tethys_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    job_identity,
    make_data_mesh,
    num_replicas,
)
from tethys_tpu.parallel.dp import (  # noqa: F401
    TrainState,
    make_train_step,
)
