from .auto import (  # noqa: F401
    auto_shard_batch,
    auto_shard_state,
    make_auto_inference,
    make_auto_pipeline,
    make_auto_projector_steps,
    make_auto_regression_step,
)
from .mesh import make_mesh, pad_leading, replicate, shard_batch  # noqa: F401
from .parallel import (  # noqa: F401
    make_parallel_fused_step,
    make_parallel_inference,
    make_parallel_pipeline,
    make_parallel_predict,
    make_parallel_projector_steps,
    make_parallel_regression_step,
)
