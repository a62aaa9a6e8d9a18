from mural_tpu.data.dataset import SiteDataset, prepare_dataset
from mural_tpu.data.batcher import segment_pool_batches, Batch

__all__ = ["SiteDataset", "prepare_dataset", "segment_pool_batches", "Batch"]
