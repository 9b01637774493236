from diffpure_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    eot_fold,
    eot_unfold,
    initialize_distributed,
)

__all__ = ["make_mesh", "shard_batch", "replicate",
           "eot_fold", "eot_unfold", "initialize_distributed"]
