from mural_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from mural_tpu.parallel.sharded_predict import sharded_predict
from mural_tpu.parallel.dp_train import make_dp_train_step

__all__ = ["make_mesh", "batch_sharding", "replicated", "sharded_predict",
           "make_dp_train_step"]
