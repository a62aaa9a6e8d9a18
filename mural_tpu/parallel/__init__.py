from mural_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from mural_tpu.parallel.sharded_predict import sharded_predict

from mural_tpu.parallel.distributed import initialize as initialize_distributed

__all__ = ["make_mesh", "batch_sharding", "replicated", "sharded_predict",
           "initialize_distributed"]
