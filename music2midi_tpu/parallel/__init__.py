from .distributed import (  # noqa: F401
    maybe_initialize as maybe_initialize_distributed,
)
from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicate,
    stacked_batch_sharding,
)
